"""Pooled chi^2 "full distance" scorers for VAE one-class decisions.

The reference has two flavors of the f-distance decision:

1. ``compute_q_h_f`` (vae_model.py:162-181, used by vae_simca_bce.py,
   vae_bce_nut.py, optim_bce_nuts.py): q = squared spectral residual,
   h = row leverage from the SVD of the *standardized latent of the scored
   batch itself*, dofs moment-matched on that same batch.  This makes scoring
   batch-size dependent (SURVEY.md quirk Q3) — reproduced here as
   ``qhf_batch`` — while ``qhf_calibrated`` offers the corrected variant with
   statistics frozen on the calibration set.

2. ``utils/final_vaesimca.py:511-533``: h = plain squared Euclidean distance
   of the latent mean to the calibration latent mean, moments taken on the
   *test* set (quirk Q4).  Reproduced by ``full_distance`` with
   ``moments=None`` (compat) or frozen calibration moments (corrected).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ocm_tpu.ops.linalg import pinv_psd
from ocm_tpu.ops.special import chi2_ppf


class QHFResult(NamedTuple):
    q: jnp.ndarray
    h: jnp.ndarray
    f: jnp.ndarray
    q_crit: jnp.ndarray
    h_crit: jnp.ndarray
    f_crit: jnp.ndarray


def _moment_dof(values):
    """N = 2 * (mean/std)^2 with unbiased std (vae_model.py:165-166)."""
    m = jnp.mean(values)
    s = jnp.std(values, ddof=1)
    return 2.0 * (m / s) ** 2, m


def _leverage_from_batch(z, eps: float = 1e-12):
    """Row leverage h_i = sum_j U_ij^2 of the standardized latent batch.

    Equivalent to the reference's SVD formulation (vae_model.py:170-172):
    with Z* the column-standardized batch and U from its thin SVD,
    sum(U^2, axis=1) = diag(Z* (Z*^T Z*)^+ Z*^T), computed here via the
    Gram pseudo-inverse (one (k,k) eigh instead of an (N,k) SVD — cheaper
    and identical to float tolerance).
    """
    z_std = (z - jnp.mean(z, axis=0)) / (jnp.std(z, axis=0, ddof=1) + eps)
    gram_pinv = pinv_psd(z_std.T @ z_std)
    return jnp.einsum("ij,jk,ik->i", z_std, gram_pinv, z_std)


def qhf_batch(x, x_rec, z, cl: float = 0.95) -> QHFResult:
    """Reference-compatible ``compute_q_h_f`` (vae_model.py:162-181).

    All statistics (q0, Nq, h0, Nh and the critical values) are derived from
    the batch being scored — including test batches (quirk Q3).
    """
    q = jnp.sum((x - x_rec) ** 2, axis=1)
    nq, q0 = _moment_dof(q)
    h = _leverage_from_batch(z)
    nh, h0 = _moment_dof(h)
    f = (h / h0) * nh + (q / q0) * nq
    return QHFResult(q, h, f, chi2_ppf(cl, nq), chi2_ppf(cl, nh),
                     chi2_ppf(cl, nh + nq))


def qhf_batch_host(x_std, r_std, z):
    """HOST float64 twin of ``qhf_batch``'s statistics, for deployment-
    pinned variant-'f' decisions.

    Quirk Q3 computes moments and leverage from an eigh/SVD of the scored
    batch itself; lowered through XLA those statistics shift at f32
    rounding scale with ANY compilation-context change (stacked vs single
    scorer, fusion differences), flipping ~1% of boundary-adjacent accepts
    on TPU (docs/PARITY.md Q3).  This twin takes the network outputs and
    computes q/h/f entirely in NumPy float64 on the host, so the decision
    is a pure (bit-stable) function of the network outputs.  What remains
    between compilations is the network forward's own f32 rounding
    (~1e-5 relative, measured) — three orders below the in-program
    statistics' flip band.  Returns ``(q, h, f)`` as float64 arrays
    (criticals are not recomputed: the serving decision compares f
    against the calibration-frozen ``threshold_f``).
    """
    import numpy as np

    x64 = np.asarray(x_std, np.float64)
    r64 = np.asarray(r_std, np.float64)
    z64 = np.asarray(z, np.float64)
    q = np.sum((x64 - r64) ** 2, axis=1)
    nq, q0 = 2.0 * (q.mean() / q.std(ddof=1)) ** 2, q.mean()
    z_c = (z64 - z64.mean(axis=0)) / (z64.std(axis=0, ddof=1) + 1e-12)
    gram_pinv = np.linalg.pinv(z_c.T @ z_c, hermitian=True)
    h = np.einsum("ij,jk,ik->i", z_c, gram_pinv, z_c)
    nh, h0 = 2.0 * (h.mean() / h.std(ddof=1)) ** 2, h.mean()
    return q, h, (h / h0) * nh + (q / q0) * nq


class QHFCalibration(NamedTuple):
    """Frozen calibration statistics for the corrected q/h/f decision."""

    z_mean: jnp.ndarray
    z_std: jnp.ndarray
    gram_pinv: jnp.ndarray
    q0: jnp.ndarray
    nq: jnp.ndarray
    h0: jnp.ndarray
    nh: jnp.ndarray
    q_crit: jnp.ndarray
    h_crit: jnp.ndarray
    f_crit: jnp.ndarray


def qhf_fit(x_cal, x_rec_cal, z_cal, cl: float = 0.95) -> QHFCalibration:
    """Fit frozen q/h/f statistics on the calibration set (corrected Q3)."""
    q = jnp.sum((x_cal - x_rec_cal) ** 2, axis=1)
    nq, q0 = _moment_dof(q)
    z_mean = jnp.mean(z_cal, axis=0)
    z_sd = jnp.std(z_cal, axis=0, ddof=1) + 1e-12
    z_std = (z_cal - z_mean) / z_sd
    gram_pinv = pinv_psd(z_std.T @ z_std)
    h = jnp.einsum("ij,jk,ik->i", z_std, gram_pinv, z_std)
    nh, h0 = _moment_dof(h)
    return QHFCalibration(z_mean, z_sd, gram_pinv, q0, nq, h0, nh,
                          chi2_ppf(cl, nq), chi2_ppf(cl, nh),
                          chi2_ppf(cl, nh + nq))


def qhf_calibrated(x, x_rec, z, calib: QHFCalibration) -> QHFResult:
    """Score new samples against frozen calibration statistics."""
    q = jnp.sum((x - x_rec) ** 2, axis=1)
    z_std = (z - calib.z_mean) / calib.z_std
    h = jnp.einsum("ij,jk,ik->i", z_std, calib.gram_pinv, z_std)
    f = (h / calib.h0) * calib.nh + (q / calib.q0) * calib.nq
    return QHFResult(q, h, f, calib.q_crit, calib.h_crit, calib.f_crit)


class FullDistanceResult(NamedTuple):
    f: jnp.ndarray
    f_crit: jnp.ndarray
    nh: jnp.ndarray
    nq: jnp.ndarray


def full_distance(mu, latent_mean, q_errors, alpha: float = 0.05,
                  moments=None) -> FullDistanceResult:
    """final_vaesimca full-distance decision (utils/final_vaesimca.py:511-533).

    h = ||mu - latent_mean||^2 (plain Euclidean, no covariance);
    q = the spectral reconstruction errors.  With ``moments=None`` the
    moment-matched dofs come from the scored set itself — the reference's
    test-set behavior (quirk Q4, note std here is the *biased* np.std).
    Pass ``moments=(h0, sh, q0, sq)`` frozen on calibration for the
    corrected variant.  Accept when f <= f_crit.
    """
    h = jnp.sum((mu - latent_mean[None, :]) ** 2, axis=1)
    q = q_errors
    if moments is None:
        h0, sh = jnp.mean(h), jnp.std(h)
        q0, sq = jnp.mean(q), jnp.std(q)
    else:
        h0, sh, q0, sq = moments
    nh = 2.0 * (h0 / sh) ** 2
    nq = 2.0 * (q0 / sq) ** 2
    f = h / h0 * nh + q / q0 * nq
    f_crit = chi2_ppf(1.0 - alpha, nh + nq)
    return FullDistanceResult(f, f_crit, nh, nq)
