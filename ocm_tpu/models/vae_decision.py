"""VAE one-class decision layers: SURVEY.md section 2.3 variants 2-4.

2. latent D^2 percentile       (utils/new_vae_simca.py:404,456)
3. latent D^2 AND spectral Q   (utils/new_vae_simca_Q.py:447,502-503)
4. pooled chi^2 full distance  (vae_model.py:162-181 / utils/final_vaesimca.py:511-533)

``fit_thresholds`` reproduces the reference's best-epoch calibration pass
(utils/final_vaesimca.py:402-445): latent mean + inverse covariance
(np.cov + 1e-6*I), D^2 = 95th percentile of calibration Mahalanobis,
Q = 95th percentile of calibration squared reconstruction error (per-sample
min-max-scaled residuals for the BCE loss), and the q/h/f critical values of
``compute_q_h_f`` on the calibration set (vae_simca_bce.py:395-411).  All
thresholds are stored in the OCMBundle so one serialized pytree is a complete
deployable model.

Reference quirk: the calibration reconstruction error uses the STOCHASTIC
forward (z sampled even under eval, utils/final_vaesimca.py:419) — pass
``rng`` to reproduce it; the default (rng=None) scores through the
deterministic mu path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ocm_tpu.models.bundle import (OCMBundle, decode, encode, forward,
                                   standardize)
from ocm_tpu.models.vae import ConvVAE1D
from ocm_tpu.ops.linalg import mahalanobis_sq, pinv_psd
from ocm_tpu.stats.qhf import qhf_batch, qhf_calibrated


def latent_d2(model: ConvVAE1D, bundle: OCMBundle, x):
    """Squared Mahalanobis distance of encoder mu to the calibration latent
    distribution (utils/new_vae_simca.py:451-456)."""
    mu, _ = encode(model, bundle, x)
    return mahalanobis_sq(mu, bundle.latent_mean, bundle.latent_cov_inv)


def reconstruction_errors(model: ConvVAE1D, bundle: OCMBundle, x,
                          loss_type: str = "cosine",
                          rng: Optional[jax.Array] = None):
    """Per-sample squared spectral reconstruction error (Q).

    BCE models compare in per-sample min-max-scaled space
    (utils/final_vaesimca.py:417-427); other losses in raw spectral space.
    ``rng`` switches to the reference's stochastic forward.
    """
    if rng is None:
        mu, _ = encode(model, bundle, x)
        x_rec = decode(model, bundle, mu)
    else:
        x_rec, mu, _ = forward(model, bundle, x, rng)
    if loss_type in ("bce", "bce_prob"):
        x_min = jnp.min(x, axis=1, keepdims=True)
        x_max = jnp.max(x, axis=1, keepdims=True)
        scale = lambda v: jnp.clip((v - x_min) / (x_max - x_min + 1e-8),
                                   0.0, 1.0)
        diff = scale(x) - scale(x_rec)
    else:
        diff = x - x_rec
    return jnp.sum(diff * diff, axis=1), mu, x_rec


def compute_rec_error(x, x_rec, mode: str = "euclidean"):
    """Per-sample reconstruction error (utils/new_vae_simca_Q.py:192-217):
    'euclidean' = squared L2; 'cosine' = chord distance sqrt(2(1-cos))."""
    x = jnp.asarray(x)
    x_rec = jnp.asarray(x_rec)
    if mode == "euclidean":
        return jnp.sum((x - x_rec) ** 2, axis=1)
    if mode == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True),
                             1e-12)
        rn = x_rec / jnp.maximum(
            jnp.linalg.norm(x_rec, axis=1, keepdims=True), 1e-12)
        return jnp.sqrt(2.0 * (1.0 - jnp.sum(xn * rn, axis=1)))
    raise ValueError(
        f"unknown mode {mode!r}, choose 'euclidean' or 'cosine'")


def fit_thresholds(model: ConvVAE1D, bundle: OCMBundle, x_cal,
                   loss_type: str = "cosine", percentile: float = 95.0,
                   rng: Optional[jax.Array] = None,
                   x_threshold=None) -> OCMBundle:
    """Best-epoch calibration pass (utils/final_vaesimca.py:402-445 +
    vae_simca_bce.py:395-411): returns a bundle with latent stats and all
    four thresholds set.

    ``x_threshold`` (corrective option the reference lacks): latent
    statistics always come from ``x_cal``, but the D^2/Q percentile
    thresholds are taken over these spectra instead — pass held-out
    same-class objects so thresholds transfer to unseen objects.  With the
    reference's protocol (thresholds from the training calibration set),
    the acceptance region shrinks around the training objects as the VAE
    specializes (see docs/QUALITY.md).
    """
    x_cal = jnp.asarray(x_cal)
    q_err, mu, x_rec = reconstruction_errors(model, bundle, x_cal, loss_type,
                                             rng=rng)
    latent_mean = jnp.mean(mu, axis=0)
    muc = mu - latent_mean[None, :]
    cov = (muc.T @ muc) / (mu.shape[0] - 1) + 1e-6 * jnp.eye(
        mu.shape[1], dtype=mu.dtype)
    cov_inv = pinv_psd(cov)
    if x_threshold is not None:
        q_thr, mu_thr, _ = reconstruction_errors(
            model, bundle, jnp.asarray(x_threshold), loss_type, rng=rng)
        d_thr = mu_thr - latent_mean[None, :]
        d2 = jnp.einsum("ij,jk,ik->i", d_thr, cov_inv, d_thr)
        threshold = jnp.percentile(d2, percentile)
        threshold_q = jnp.percentile(q_thr, percentile)
    else:
        d2 = jnp.einsum("ij,jk,ik->i", muc, cov_inv, muc)
        threshold = jnp.percentile(d2, percentile)
        threshold_q = jnp.percentile(q_err, percentile)

    # q/h/f critical values on the calibration batch (vae_simca_bce.py:395-411)
    res = qhf_batch(standardize(bundle, x_cal),
                    standardize(bundle, x_rec), mu)
    return bundle._replace(
        latent_mean=latent_mean, latent_cov_inv=cov_inv,
        threshold=threshold, threshold_q=threshold_q,
        threshold_h=res.h_crit, threshold_f=res.f_crit)


class VAEDecision(NamedTuple):
    accept: jnp.ndarray        # bool per sample
    d2: jnp.ndarray
    q: jnp.ndarray


def decide_d2(model: ConvVAE1D, bundle: OCMBundle, x) -> VAEDecision:
    """Variant 2: D^2 <= threshold (utils/new_vae_simca.py:456-457)."""
    d2 = latent_d2(model, bundle, x)
    return VAEDecision(d2 <= bundle.threshold, d2, jnp.zeros_like(d2))


def decide_d2_q(model: ConvVAE1D, bundle: OCMBundle, x,
                loss_type: str = "cosine") -> VAEDecision:
    """Variant 3: (D^2 <= thr) AND (q <= q_thr)
    (utils/new_vae_simca_Q.py:502-503)."""
    q, mu, _ = reconstruction_errors(model, bundle, x, loss_type)
    d2 = mahalanobis_sq(mu, bundle.latent_mean, bundle.latent_cov_inv)
    return VAEDecision((d2 <= bundle.threshold) & (q <= bundle.threshold_q),
                       d2, q)


def decide_f(model: ConvVAE1D, bundle: OCMBundle, x,
             calibration=None) -> VAEDecision:
    """Variant 4 (compute_q_h_f flavor): f <= threshold_f
    (vae_simca_bce.py:438-452, vae_bce_nut.py:263-264).

    Default reproduces quirk Q3: q0/Nq/h0/Nh are moment-matched on the batch
    being scored (vae_model.py:162-181).  Pass a ``QHFCalibration`` from
    ``ocm_tpu.stats.qhf.qhf_fit`` for the corrected frozen-statistics mode.
    """
    x = jnp.asarray(x)
    mu, _ = encode(model, bundle, x)
    x_rec = decode(model, bundle, mu)
    x_std, r_std = standardize(bundle, x), standardize(bundle, x_rec)
    if calibration is None:
        res = qhf_batch(x_std, r_std, mu)
    else:
        res = qhf_calibrated(x_std, r_std, mu, calibration)
    return VAEDecision(res.f <= bundle.threshold_f, res.h, res.q)


def decide_full_distance(model: ConvVAE1D, bundle: OCMBundle, x,
                         alpha: float = 0.05,
                         moments=None) -> VAEDecision:
    """Variant 4 (final_vaesimca flavor): plain-Euclidean h + spectral q with
    moment-matched dofs, accept when f <= chi2_{1-alpha}(Nh+Nq)
    (utils/final_vaesimca.py:500-533).  ``moments=None`` reproduces quirk Q4
    (moments from the scored set); pass calibration moments to correct it.
    """
    from ocm_tpu.stats.qhf import full_distance

    q, mu, _ = reconstruction_errors(model, bundle, x, "euclidean")
    res = full_distance(mu, bundle.latent_mean, q, alpha=alpha,
                        moments=moments)
    return VAEDecision(res.f <= res.f_crit,
                       jnp.sum((mu - bundle.latent_mean) ** 2, axis=1), q)
