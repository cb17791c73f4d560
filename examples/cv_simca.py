"""Cross-validated SIMCA component selection (reference utils/CVSIMCA.py
usage): class-wise k-fold with external validation, LV sweep, best-LV refit
and the CV curve plot — the whole (fold x LV) grid as one batched device
solve.

    python examples/cv_simca.py [--lv-min 2 --lv-max 12 --n-splits 5]
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


def main(lv_min=2, lv_max=12, n_splits=5, refit_metric="eff", solver="svd",
         out_dir="out/cv_simca"):
    from ocm_tpu.models.cv import (ClasswiseKFoldWithExternalVal,
                                   cross_validate_simca_grid)
    from ocm_tpu.models.simca import SIMCA
    from ocm_tpu.ops.preprocess import savgol_filter
    from ocm_tpu.utils.report import plot_cv

    import _synthetic

    x_tr, y_tr, _, _ = _synthetic.cheese_like()
    x_tr = np.asarray(savgol_filter(jnp.asarray(x_tr), 15, 2, 1))

    est = SIMCA(model_class=0, type="alt", t2lim="Fdist", qlim="jm",
                verbose=False, solver=solver)
    cv = ClasswiseKFoldWithExternalVal(n_splits=n_splits, cls_label=0)
    res = cross_validate_simca_grid(
        est, x_tr, y_tr, cv, LV_min=lv_min, LV_max=lv_max,
        param_grid={"type": ["alt", "sim"]}, refit_metric=refit_metric,
        print_summary=True)

    os.makedirs(out_dir, exist_ok=True)
    plot_cv(res, metric=refit_metric,
            save_path=os.path.join(out_dir, "cv_curve.png"))
    print(f"best: LV={res['best_LV']} params={res['best_params']} "
          f"{refit_metric}={res['best_score']:.3f}")

    # TPU-first extension: EVERY class's whole (fold x LV) grid in one
    # jitted program (the reference loops target classes in the driver)
    from ocm_tpu.models.cv import cv_simca_sweep_multiclass

    classes = sorted(int(c) for c in np.unique(y_tr))
    mc = cv_simca_sweep_multiclass(
        x_tr, y_tr, classes, list(range(lv_min, lv_max + 1)),
        n_splits=n_splits,
        solver="rsvd" if solver == "rsvd" else "eigh")
    for i, c in enumerate(classes):
        j = int(np.argmax(mc["eff"][i]))
        print(f"  class {c}: best LV={lv_min + j} "
              f"eff={mc['eff'][i][j]:.3f}")
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lv-min", type=int, default=2)
    p.add_argument("--lv-max", type=int, default=12)
    p.add_argument("--n-splits", type=int, default=5)
    p.add_argument("--refit-metric", default="eff",
                   choices=["eff", "spec", "sens"])
    p.add_argument("--out-dir", default="out/cv_simca")
    p.add_argument("--solver", default="svd", choices=["svd", "rsvd"],
                   help="'rsvd' = GEMM-only randomized fits (TPU "
                        "production path; 16x sweep throughput)")
    main(**vars(p.parse_args()))
