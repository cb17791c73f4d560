"""Cheese EDA + PLS-DA baseline (reference data_cheese.py / C16): PCA score
plot, PLS-DA calibration/CV F1 curves over component counts, best-k refit
with test confusion, PLS loadings and normalized LDA discriminant vectors
back-projected into spectral space.

    python examples/cheese_eda_plsda.py [--max-components 25]
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


def main(data_path=None, max_components=25, n_folds=5,
         out_dir="out/cheese_plsda"):
    from ocm_tpu.models.plsda import (discriminant_vectors, plsda_f1_curves,
                                      plsda_fit_predict)
    from ocm_tpu.ops.linalg import pca_fit
    from ocm_tpu.utils.io import cheese_wavelengths
    from ocm_tpu.utils.report import _plt, plot_confusion

    if data_path:
        from ocm_tpu.utils.io import load_cheese_mat
        x_tr, y_tr, x_ts, y_ts = load_cheese_mat(data_path)
    else:
        import _synthetic
        x_tr, y_tr, x_ts, y_ts = _synthetic.cheese_like()

    os.makedirs(out_dir, exist_ok=True)
    wv = cheese_wavelengths(x_tr.shape[1])
    plt = _plt()

    # --- PCA score plot (data_cheese.py:81-177) ---
    fit = pca_fit(jnp.asarray(x_tr))
    scores = np.asarray(fit.scores)
    fig, ax = plt.subplots(figsize=(7, 6))
    for c in np.unique(y_tr):
        m = y_tr == c
        ax.scatter(scores[m, 0], scores[m, 1], s=10, alpha=0.6,
                   label=f"class {c}")
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "pca_scores.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    # --- PLS-DA F1 curves (data_cheese.py:193-224) ---
    curves = plsda_f1_curves(x_tr, y_tr, max_components=max_components,
                             n_folds=n_folds)
    ks = np.arange(1, max_components + 1)
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.plot(ks, curves["f1_cal"], marker="o", label="F1 cal")
    ax.plot(ks, curves["f1_cv"], marker="s", label="F1 CV")
    ax.axvline(curves["best_n_components"], color="r", linestyle="--")
    ax.set_xlabel("number of latent variables")
    ax.set_ylabel("macro F1")
    ax.legend()
    ax.grid(True, linestyle="--", alpha=0.6)
    fig.savefig(os.path.join(out_dir, "plsda_f1_curve.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)
    print("best n_components:", curves["best_n_components"])

    # --- best-k refit + test confusion (data_cheese.py:256-280) ---
    res = plsda_fit_predict(x_tr, y_tr, x_ts, y_ts,
                            curves["best_n_components"])
    print("test macro F1:", round(res.f1_test, 4))
    plot_confusion(res.confusion,
                   [f"class{c + 1}" for c in range(res.confusion.shape[1])],
                   pred_labels=[f"class{c + 1}"
                                for c in range(res.confusion.shape[0])],
                   title="PLS-DA test confusion",
                   save_path=os.path.join(out_dir, "plsda_confusion.png"))

    # --- loadings + discriminant vectors (data_cheese.py:286-328) ---
    loadings = np.asarray(res.pls.loadings)
    fig, ax = plt.subplots(figsize=(10, 6))
    for i in range(min(5, loadings.shape[1])):
        ax.plot(wv, loadings[:, i], label=f"LV{i + 1}")
    ax.set_xlabel("wavelength")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "pls_loadings.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    d = discriminant_vectors(res.pls, res.lda)
    fig, ax = plt.subplots(figsize=(8, 6))
    for i in range(d.shape[1]):
        ax.plot(wv, d[:, i], label=f"DV {i + 1}")
    ax.set_xlabel("wavelength")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "lda_discriminant_vectors.png"),
                dpi=150, bbox_inches="tight")
    plt.close(fig)
    return curves, res


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", default=None)
    p.add_argument("--max-components", type=int, default=25)
    p.add_argument("--n-folds", type=int, default=5)
    p.add_argument("--out-dir", default="out/cheese_plsda")
    main(**vars(p.parse_args()))
