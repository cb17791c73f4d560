"""PCA score-space Mahalanobis outlier removal.

The reference removes pixel-level outliers before splitting with a
PCA(<=10)-score Mahalanobis distance thresholded at the 95th percentile
(``utils/data_utils.py:65-85``; the same logic with squared distances inlined
at ``simca_nuts.py:127-150``).  Hyperspectral nut images yield 10^4-10^6 pixel
spectra, so this runs jitted on device: one SVD + one GEMM + reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ocm_tpu.ops.linalg import cov, pca_fit, pca_topk_cov, pinv_psd


@functools.partial(jax.jit,
                   static_argnames=("n_components", "squared", "solver"))
def mahalanobis_outlier_mask(x_proc, n_components: int = 10,
                             percentile: float = 95.0,
                             squared: bool = False, solver: str = "svd"):
    """(keep_mask, distances, threshold) for rows of ``x_proc``.

    ``squared=False`` takes the sqrt like ``utils/data_utils.py:79``;
    ``squared=True`` matches the inlined variant of ``simca_nuts.py:138-144``
    (monotone in the distance, so the keep decision is identical).
    Keep rule is ``distance <= percentile(distances)``.

    ``solver='rsvd'`` uses the GEMM-only randomized top-k fit — the
    Mahalanobis score only needs the top ``n_components`` subspace, and a
    full SVD of a big per-object pixel matrix lowers to the TPU QDWH
    while-loop cliff (docs/BENCHMARKS.md); right for HSI-scale prep.
    """
    if solver == "rsvd":
        mean = jnp.mean(x_proc, axis=0)
        xc = x_proc - mean[None, :]
        with jax.default_matmul_precision("highest"):
            c = (xc.T @ xc) / (x_proc.shape[0] - 1.0)
            s_sub = min(n_components + 10, x_proc.shape[1],
                        x_proc.shape[0] - 1)
            _, vecs = pca_topk_cov(c, s_sub)
            t = xc @ vecs[:, :n_components]
    elif solver == "svd":
        fit = pca_fit(x_proc)
        t = fit.scores[:, :n_components]
    else:
        raise ValueError(f"unknown solver {solver!r}; expected 'svd' or"
                         " 'rsvd'")
    mean_scores = jnp.mean(t, axis=0)
    cov_inv = pinv_psd(cov(t))
    d = t - mean_scores[None, :]
    mahal = jnp.einsum("ij,jk,ik->i", d, cov_inv, d)
    if not squared:
        mahal = jnp.sqrt(mahal)
    threshold = jnp.percentile(mahal, percentile)
    return mahal <= threshold, mahal, threshold


def effective_n_components(n_samples: int, n_features: int,
                           cap: int = 10) -> int:
    """min(cap, L, n-1) guard of utils/data_utils.py:66."""
    return min(cap, n_features, max(1, n_samples - 1))
