"""Per-nut one-class SIMCA on SWIR hyperspectral pixel spectra
(reference simca_nuts.py + simca_nuts_analysis.py).

Pipeline per target nut: SNV + SavGol(5, 2, deriv=1) (simca_nuts.py:48-52),
object-aware 70/15/15 split with PCA-Mahalanobis outlier removal
(:73-150 / utils/data_utils.py), SIMCA(12, 0, 'alt', 'Fdist', 'jm') (:186),
conformity metrics and log-scale T2-Q planes (:294-299).

    python examples/simca_nuts.py [--store-path nuts.h5] [--target almond]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback

import jax.numpy as jnp
import numpy as np


def run_target(data, nut_types, target, n_wavelengths, n_components,
               out_dir):
    from ocm_tpu.models.simca import SIMCA
    from ocm_tpu.ops.preprocess import snv_savgol
    from ocm_tpu.utils.report import plot_t2q
    from ocm_tpu.utils.splits import object_aware_splits

    res = object_aware_splits(data, nut_types, target, n_wavelengths,
                              verbose=False)
    prep = lambda a: np.asarray(snv_savgol(jnp.asarray(a), 5, 2, 1))
    x_cal = prep(res.x_cal)
    x_test = prep(res.x_test)
    y_test = res.y_test

    model = SIMCA(n_components=n_components, model_class=0, type="alt",
                  t2lim="Fdist", qlim="jm", verbose=False)
    model.fit(x_cal, np.zeros(x_cal.shape[0], dtype=int))
    model.predict(x_test, y_true=y_test)
    metrics = model.metrics[0]

    _, t2red, _, qred = model.transform(x_test)
    os.makedirs(out_dir, exist_ok=True)
    plot_t2q(np.maximum(np.asarray(t2red), 1e-9),
             np.maximum(np.asarray(qred), 1e-9), labels=y_test,
             d_limit=float(model._model[0].d_limit), log_scale=True,
             title=f"{target} T2-Q (log)",
             save_path=os.path.join(out_dir, f"t2q_{target}.png"))
    return metrics


def main(store_path=None, target=None, n_components=12,
         out_dir="out/simca_nuts"):
    if store_path:
        from ocm_tpu.utils.io import read_object_store
        data = read_object_store(store_path)
    else:
        import _synthetic
        data = _synthetic.nut_objects()
    nut_types = list(data)
    n_wavelengths = next(
        np.asarray(o["spectral_data"] if isinstance(o, dict) else o).shape[1]
        for objs in data.values() for o in objs)

    targets = [target] if target else nut_types
    all_metrics = {}
    for t in targets:
        m = run_target(data, nut_types, t, n_wavelengths, n_components,
                       out_dir)
        all_metrics[t] = m
        print(f"{t}: sens={m['sensitivity']:.2f} spec={m['specificity']:.2f} "
              f"eff={m['efficiency']:.2f}")
    return all_metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store-path", default=None,
                   help="HDF5 object store from examples/nut_data_prep.py")
    p.add_argument("--target", default=None, help="one nut type, or all")
    p.add_argument("--n-components", type=int, default=12)
    p.add_argument("--out-dir", default="out/simca_nuts")
    main(**vars(p.parse_args()))
