"""Streaming / incremental SIMCA: single-pass sufficient statistics.

The reference can only refit from the full calibration matrix held in
memory (``utils/SIMCA.py:62-75`` — sklearn PCA over all rows); adding new
calibration spectra to a deployed model means re-assembling X and paying
the full fit again.  This module is the TPU-native alternative for
production screening loops: spectra are ingested **once**, batch by batch,
into an O(L^2) sufficient statistic (count, mean, centered scatter), and a
full ``SIMCAModel`` is fitted from the moments alone — no (N, L) matrix is
ever resident, and the ingest cost per batch is one GEMM.

Design:

- ``SpectraMoments`` is an exact sufficient statistic for (mean,
  covariance): merging uses the pairwise (Chan et al.) update, which is
  numerically stable under large common modes (no raw second moments are
  ever formed) and **associative**, so batches may arrive in any order,
  on any chip — per-device partial moments combine with two ``psum``-style
  reductions (see ``parallel.simca_dist.moments_update_sharded``).
- ``fit_simca_moments`` reproduces ``fit_simca`` exactly for every
  statistic that is a function of (n, mean, covariance): loadings,
  eigenvalues, T^2 score covariance (cov(t) == P C P^T identically),
  F-distribution / chi^2 T^2 limits, theta-based Q limits (Jackson-
  Mudholkar, chi2box), and the 'sim'/'alt'/'ci' critical distances.
  Per-sample statistics (percentile limits, Pomerantsev 'chi2pom' moment
  matching, and the 'dd' decision built on it) genuinely require the
  training scores and are rejected with a pointing error — a streaming
  model cannot see individual past samples by construction.

All covariance-scale GEMMs run at ``jax.default_matmul_precision
("highest")`` (TPU default bf16 passes measurably corrupt theta-scale
residual moments — see ops.linalg.pca_topk_cov).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import ocm_tpu.stats.limits as L
from ocm_tpu.models.simca import SIMCAModel
from ocm_tpu.ops.linalg import (deflated_thetas, eigh_desc_signed,
                                pca_topk_cov, pinv_psd)

MOMENT_T2_METHODS = ("Fdistrig", "Fdist", "chi2")
MOMENT_Q_METHODS = ("jm", "chi2box")
MOMENT_DECISION_TYPES = ("sim", "alt", "ci")


class SpectraMoments(NamedTuple):
    """Exact streaming sufficient statistic for (mean, covariance).

    ``scatter`` is the CENTERED scatter sum_i (x_i - mean)(x_i - mean)^T
    (so covariance = scatter / (n - 1)); keeping it centered instead of the
    raw second moment is what makes the merge stable for spectra with a
    large common mode.  ``n`` is a float scalar (exact for counts below
    2^24 in f32; pass f64 moments under x64 if you stream more).
    """

    n: jnp.ndarray        # () float count
    mean: jnp.ndarray     # (L,)
    scatter: jnp.ndarray  # (L, L)


def moments_init(length: int, dtype=jnp.float32) -> SpectraMoments:
    """Empty statistic: the identity element of :func:`moments_merge`."""
    return SpectraMoments(n=jnp.zeros((), dtype),
                          mean=jnp.zeros((length,), dtype),
                          scatter=jnp.zeros((length, length), dtype))


def moments_update(mom: SpectraMoments, x, w=None) -> SpectraMoments:
    """Ingest one batch of spectra (rows of ``x``) into the statistic.

    Jittable; one (L, B) @ (B, L) GEMM per call.  ``w`` (optional,
    (B,) 0/1 or weights) masks rows — the masked form is what the
    class-labelled ingest (:func:`moments_update_classes`) vmaps over, and
    an all-zero ``w`` is a valid no-op (identity update).
    """
    x = jnp.asarray(x)
    dt = mom.mean.dtype
    x = x.astype(dt)
    if x.shape[0] == 0:          # static shape: an empty batch is a no-op
        return mom
    if w is None:
        nb = jnp.asarray(x.shape[0], dt)
        mu_b = jnp.mean(x, axis=0)
        xc = x - mu_b[None, :]
    else:
        # 0/1 masks or frequency weights; the where() guard keeps an
        # all-zero mask an exact no-op without corrupting fractional sums
        w = jnp.asarray(w, dt)
        nb = jnp.sum(w)
        safe_nb = jnp.where(nb > 0, nb, 1.0)
        mu_b = jnp.sum(w[:, None] * x, axis=0) / safe_nb
        xc = (x - mu_b[None, :]) * jnp.sqrt(w)[:, None]
    with jax.default_matmul_precision("highest"):
        scatter_b = xc.T @ xc
    return _merge(mom, SpectraMoments(nb, mu_b, scatter_b))


def moments_merge(a: SpectraMoments, b: SpectraMoments) -> SpectraMoments:
    """Combine two partial statistics (associative, order-independent to
    float reassociation; pairwise/Chan covariance update)."""
    return _merge(a, b)


def _merge(a: SpectraMoments, b: SpectraMoments) -> SpectraMoments:
    n = a.n + b.n
    safe_n = jnp.where(n > 0, n, 1.0)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.n / safe_n)
    # cross term: na*nb/n * outer(delta, delta); exact for either side empty
    coeff = a.n * b.n / safe_n
    scatter = a.scatter + b.scatter + coeff * (delta[:, None] * delta[None, :])
    return SpectraMoments(n=n, mean=mean, scatter=scatter)


def moments_from(x, dtype=None) -> SpectraMoments:
    """One-shot statistic of a matrix (== ingesting it in one batch)."""
    x = jnp.asarray(x)
    dt = dtype or x.dtype
    return moments_update(moments_init(x.shape[1], dt), x)


def moments_cov(mom: SpectraMoments):
    """np.cov(ddof=1)-equivalent covariance of everything ingested."""
    return mom.scatter / jnp.where(mom.n > 1, mom.n - 1.0, 1.0)


def moments_std(mom: SpectraMoments, ddof: int = 1):
    """Per-wavelength standard deviation of everything ingested (the
    spectral standardization statistic: feeds ``TrainConfig`` /
    ``spec_stats`` so VAE training can standardize against a stream it
    never held)."""
    return jnp.sqrt(jnp.diagonal(mom.scatter)
                    / jnp.where(mom.n > ddof, mom.n - ddof, 1.0))


def moments_update_classes(moms: SpectraMoments, x, y,
                           class_labels: Sequence) -> SpectraMoments:
    """Ingest one labelled batch into C stacked per-class statistics.

    ``moms`` carries a leading class axis on every leaf (build it with
    :func:`moments_init_classes`).  All C masked updates run as one vmapped
    program — a labelled production stream feeds every class model in a
    single dispatch.  ``y`` entries not in ``class_labels`` are ignored.
    """
    x = jnp.asarray(x)
    y = np.asarray(y)
    masks = jnp.asarray(
        np.stack([(y == c) for c in class_labels]).astype(np.float32))
    return jax.vmap(lambda m, w: moments_update(m, x, w=w))(moms, masks)


def moments_init_classes(n_classes: int, length: int,
                         dtype=jnp.float32) -> SpectraMoments:
    """C stacked empty statistics (class axis on every leaf)."""
    return jax.vmap(lambda _: moments_init(length, dtype))(
        jnp.arange(n_classes))


def save_moments(path: str, mom: SpectraMoments) -> None:
    """Persist the statistic (msgpack, same mechanics as save_bundle) —
    a production stream must survive process restarts; the statistic IS
    the whole ingest state, so save/ingest/load/merge compose freely."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(mom._asdict()))


def load_moments(path: str, length: Optional[int] = None) -> SpectraMoments:
    """Load a statistic saved by :func:`save_moments`.  ``length`` is
    only validated if given (the msgpack payload carries shapes)."""
    from flax import serialization

    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    mom = SpectraMoments(n=jnp.asarray(state["n"]),
                         mean=jnp.asarray(state["mean"]),
                         scatter=jnp.asarray(state["scatter"]))
    if length is not None and mom.mean.shape[-1] != length:
        raise ValueError(
            f"stored statistic is for L={mom.mean.shape[-1]} spectra, "
            f"expected L={length}")
    return mom


def _validate_moment_methods(decision_type, t2_method, q_method):
    if t2_method not in MOMENT_T2_METHODS:
        raise ValueError(
            f"t2_method {t2_method!r} needs the per-sample training T^2 "
            "scores, which a streaming statistic does not retain; "
            f"moment-exact choices are {MOMENT_T2_METHODS} (or use "
            "fit_simca on the full matrix)")
    if q_method not in MOMENT_Q_METHODS:
        raise ValueError(
            f"q_method {q_method!r} needs the per-sample training Q "
            "scores, which a streaming statistic does not retain; "
            f"moment-exact choices are {MOMENT_Q_METHODS} (or use "
            "fit_simca on the full matrix)")
    if decision_type not in MOMENT_DECISION_TYPES:
        raise ValueError(
            f"decision_type {decision_type!r} is built on Pomerantsev "
            "moment matching of the training scores; streaming fits "
            f"support {MOMENT_DECISION_TYPES}")


def fit_simca_moments(mom: SpectraMoments, n_components: int,
                      decision_type: str = "alt", t2_method: str = "Fdist",
                      q_method: str = "jm", t2_cl: float = 0.95,
                      q_cl: float = 0.95, d_cl: float = 0.95,
                      solver: str = "eigh", oversample: int = 10,
                      subspace_iters: int = 4) -> SIMCAModel:
    """Fit a SIMCA model from a streaming statistic alone.

    Produces the same model ``fit_simca`` fits from the full matrix — for
    every statistic that is a function of (n, mean, covariance), to float
    tolerance (tests/test_streaming.py asserts field-level parity and
    decision equality against fit_simca on the concatenated stream).  The
    default (t2_method='Fdist', q_method='jm', decision_type='alt') is
    exactly ``fit_simca``'s default configuration, so the common case
    needs no changes.  Per-sample limit methods raise (see module doc).

    ``solver='eigh'`` decomposes the (L, L) covariance densely (strict
    parity with fit_simca(solver='svd') statistics); ``'rsvd'`` is the
    GEMM-only production path (parity with fit_simca(solver='rsvd')
    provided the stream holds at least ``n_components + oversample + 1``
    spectra: the count is traced, so the sketch width cannot be capped at
    the data rank n-1 the way fit_simca's static-shape path caps it —
    below that, extraction past the rank perturbs the deflated theta
    moments).

    The returned model's ``t2_train``/``q_train`` are empty — a streaming
    fit has no retained training scores (they only feed plots and the
    unsupported 'dd' path).
    """
    _validate_moment_methods(decision_type, t2_method, q_method)
    if solver not in ("eigh", "rsvd"):
        raise ValueError(f"unknown solver {solver!r}; expected 'eigh' or"
                         " 'rsvd'")
    length = mom.mean.shape[0]
    dt = mom.mean.dtype
    c = moments_cov(mom)
    if solver == "rsvd":
        s = min(n_components + oversample, length)
        with jax.default_matmul_precision("highest"):
            eigenvalues, eigvecs = pca_topk_cov(c, s, iters=subspace_iters)
        thetas = deflated_thetas(c, eigenvalues, eigvecs, n_components)
    else:
        eigenvalues, eigvecs = eigh_desc_signed(c)
        # mask junk eigenvalue slots beyond the data rank, as fit_simca's
        # full-SVD spectrum is naturally truncated at min(n, L)
        thetas = L.residual_thetas(eigenvalues, n_components,
                                   max_rank=jnp.minimum(mom.n, length))
    p = eigvecs[:, :n_components].T
    # cov of the training scores t = xc @ p.T is EXACTLY p C p^T (t is
    # centered because xc is) — no samples needed
    with jax.default_matmul_precision("highest"):
        invcovT = pinv_psd(p @ c @ p.T)

    empty = jnp.zeros((0,), dt)
    t2_res = L.t2_limit(empty, n_components, t2_method, t2_cl,
                        n_samples=mom.n)
    q_res = L.q_limit(empty, q_method, q_cl, thetas=thetas)
    d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                  n_components=n_components, thetas=thetas,
                                  dcl=d_cl)
    return SIMCAModel(
        mean=mom.mean, components=p, invcovT=invcovT,
        eigenvalues=eigenvalues, t2_res=t2_res, q_res=q_res,
        d_limit=d_limit, t2_train=empty, q_train=empty,
        n_samples=mom.n.astype(jnp.int32) if jnp.issubdtype(
            mom.n.dtype, jnp.floating) else mom.n,
    )


def fit_classes_moments(moms: SpectraMoments, n_components: int,
                        **kwargs) -> SIMCAModel:
    """Fit C stacked per-class models from stacked statistics as one
    vmapped program; the result feeds ``predict_classes`` / serving
    directly (the streaming sibling of ``fit_classes``)."""
    return jax.vmap(
        lambda m: fit_simca_moments(m, n_components, **kwargs))(moms)
