"""Classical SIMCA on cheese FTIR spectra (reference simca_new_cheese.py).

Pipeline: SavGol(15, 2, deriv=1) preprocessing (simca_new_cheese.py:34-39),
SIMCA(n_components=10, model_class=0, type='alt', t2lim='Fdist', qlim='jm')
(:41-42), conformity metrics, the [1, 0]-row-order confusion matrix (:56,
SURVEY.md quirk Q8) and T2-Q acceptance-plane figures (:103-155).

Run on synthetic cheese-shaped data (default) or the real IR_ML.mat:
    python examples/simca_cheese.py [--data-path IR_ML.mat] [--out-dir figs]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback
import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Config:
    data_path: str | None = None
    out_dir: str = "out/simca_cheese"
    n_components: int = 10
    model_class: int = 0
    decision_type: str = "alt"
    t2lim: str = "Fdist"
    qlim: str = "jm"
    savgol_window: int = 15
    savgol_polyorder: int = 2
    savgol_deriv: int = 1


def main(cfg: Config) -> dict:
    from ocm_tpu.models.simca import SIMCA, reduced_train_distances
    from ocm_tpu.ops.preprocess import savgol_filter
    from ocm_tpu.stats.metrics import confusion_matrix_2xc
    from ocm_tpu.utils.report import plot_confusion, plot_t2q

    if cfg.data_path:
        from ocm_tpu.utils.io import load_cheese_mat
        x_tr, y_tr, x_ts, y_ts = load_cheese_mat(cfg.data_path)
    else:
        import _synthetic
        x_tr, y_tr, x_ts, y_ts = _synthetic.cheese_like()

    x_tr = np.asarray(savgol_filter(jnp.asarray(x_tr), cfg.savgol_window,
                                    cfg.savgol_polyorder, cfg.savgol_deriv))
    x_ts = np.asarray(savgol_filter(jnp.asarray(x_ts), cfg.savgol_window,
                                    cfg.savgol_polyorder, cfg.savgol_deriv))

    model = SIMCA(n_components=cfg.n_components, model_class=cfg.model_class,
                  type=cfg.decision_type, t2lim=cfg.t2lim, qlim=cfg.qlim)
    model.fit(x_tr, y_tr)
    y_pred = np.ravel(model.predict(x_ts, y_true=y_ts)).astype(int)

    # quirk Q8: SIMCA drivers use predicted-row order [1, 0]
    conf = np.asarray(confusion_matrix_2xc(
        jnp.asarray(y_pred), jnp.asarray(y_ts),
        int(np.max(y_ts)) + 1, pred_row_order=(1, 0)))
    print("confusion (rows pred=[1,0]):\n", conf)

    os.makedirs(cfg.out_dir, exist_ok=True)
    fitted = model._model[cfg.model_class]
    t2red_tr, qred_tr = reduced_train_distances(fitted, cfg.decision_type)
    plot_t2q(np.asarray(t2red_tr), np.asarray(qred_tr),
             d_limit=float(fitted.d_limit), decision_type=cfg.decision_type,
             title="train T2-Q", save_path=os.path.join(cfg.out_dir,
                                                        "t2q_train.png"))
    _, t2red_ts, _, qred_ts = model.transform(x_ts)
    plot_t2q(np.asarray(t2red_ts), np.asarray(qred_ts), labels=y_ts,
             d_limit=float(fitted.d_limit), decision_type=cfg.decision_type,
             title="test T2-Q", save_path=os.path.join(cfg.out_dir,
                                                       "t2q_test.png"))
    plot_confusion(conf, sorted(np.unique(y_ts)),
                   pred_labels=("pred 1", "pred 0"),
                   save_path=os.path.join(cfg.out_dir, "confusion.png"))
    return {"metrics": model.metrics[cfg.model_class], "confusion": conf}


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(Config):
        arg = "--" + f.name.replace("_", "-")
        if f.type == "int":
            p.add_argument(arg, type=int, default=f.default)
        else:
            p.add_argument(arg, type=str, default=f.default)
    main(Config(**vars(p.parse_args())))
