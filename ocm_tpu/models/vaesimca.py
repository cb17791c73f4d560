"""VAESIMCA: SIMCA limit machinery applied in VAE latent space (variant 5).

Re-design of ``VAE_SIMCA.py:215-382``: T^2 = Mahalanobis of encoder mu
against the calibration latent distribution; Q = latent round-trip residual
``||z - encode(decode(z))||^2``; acceptance limits and combined decision per
SIMCA type.

The reference's limit engines here deliberately DIVERGE from the classical
``SIMCA`` ones under the same flag names (SURVEY.md quirk Q5) — all
reproduced exactly:

- T2 'Fdist' scales an empirical percentile by k(n-1)/(n-k)
  (VAE_SIMCA.py:286-288) instead of using the F ppf; 'chi2' is a plain
  percentile (:289-290).
- T2/Q 'chi2pom' scale a percentile by mean/dof instead of a chi^2 quantile
  (:291-297, :319-323).
- Q 'jm' takes theta moments of the Q VALUES themselves (:306-318), not of
  residual eigenvalues.
- D 'ci' multiplies by a Q percentile (:335-339); 'dd' is t2dof + qdof
  (:340-343), not a chi^2 quantile.

Additional quirk reproduced under ``compat_double_standardize`` (on by
default): the reference feeds the decoder's STANDARDIZED output through the
standardization again before re-encoding (``VAE_SIMCA.py:257-259,367-369``
— ``decode`` returns standardized spectra, then ``(x_hat - mean)/std`` is
applied on top).  Set False for the corrected single-standardization
round trip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ocm_tpu.models.bundle import OCMBundle, standardize
from ocm_tpu.models.vae import ConvVAE1D
from ocm_tpu.ops.linalg import mahalanobis_sq, pinv_psd
from ocm_tpu.ops.special import erfinv


class VAESIMCAModel(NamedTuple):
    """Per-class latent SIMCA state (VAE_SIMCA.py:266-279)."""

    latent_mean: jnp.ndarray
    invcovT: jnp.ndarray
    t2_limit: jnp.ndarray
    q_limit: jnp.ndarray
    d_limit: jnp.ndarray
    t2_dof: jnp.ndarray
    t2_scale: jnp.ndarray
    q_dof: jnp.ndarray
    q_scale: jnp.ndarray
    n_components: jnp.ndarray


def _t2_limit(t2, n_components, method: str, cl: float):
    """VAE_SIMCA.py:281-300 (quirk Q5 formulas)."""
    n = t2.shape[0]
    perc = jnp.percentile(t2, cl * 100.0)
    one = jnp.ones((), t2.dtype)
    if method == "perc" or method == "chi2":
        return perc, one, one
    if method == "Fdist":
        k = n_components
        return k * (n - 1.0) / (n - k) * perc, one, one
    if method == "chi2pom":
        h0 = jnp.mean(t2)
        var = jnp.var(t2, ddof=1) if n > 1 else jnp.zeros((), t2.dtype)
        nh = jnp.maximum(jnp.where(var > 0,
                                   jnp.round(2.0 * h0 * h0 / var), 1.0), 1.0)
        return h0 * perc / nh, nh, h0
    raise ValueError(f"T2 limit type {method!r} not implemented")


def _q_limit(q, method: str, cl: float):
    """VAE_SIMCA.py:302-327 (theta moments of the Q values, quirk Q5)."""
    one = jnp.ones((), q.dtype)
    if method == "perc":
        return jnp.percentile(q, cl * 100.0), one, one
    if method == "jm":
        theta1 = jnp.sum(q)
        theta2 = jnp.sum(q * q)
        theta3 = jnp.sum(q ** 3)
        safe1 = jnp.where(theta1 > 0, theta1, 1.0)
        safe2 = jnp.where(theta2 > 0, theta2, 1.0)
        h0 = jnp.maximum(1.0 - (2.0 * theta1 * theta3) / (3.0 * safe2 * safe2),
                         1e-3)
        ca = jnp.sqrt(2.0) * erfinv(2.0 * cl - 1.0)
        h1 = ca * jnp.sqrt(2.0 * theta2 * h0 * h0) / safe1
        h2 = theta2 * h0 * (h0 - 1.0) / (safe1 * safe1)
        lim = theta1 * (1.0 + h1 + h2) ** (1.0 / h0)
        return jnp.where(theta1 > 0, lim, 0.0), one, one
    if method == "chi2pom":
        v0 = jnp.mean(q)
        nv = jnp.maximum(jnp.round(2.0 * v0 * v0 / jnp.var(q, ddof=1)), 1.0)
        return v0 * jnp.percentile(q, cl * 100.0) / nv, nv, v0
    raise ValueError(f"Q limit type {method!r} not implemented")


def _d_limit(decision_type: str, t2_limit, q_limit, t2, q, n_components,
             t2_dof, q_dof, dcl: float):
    """VAE_SIMCA.py:329-346 (quirk Q5: 'ci' uses a Q percentile, 'dd' is
    the dof sum)."""
    if decision_type == "sim":
        return jnp.ones((), t2.dtype)
    if decision_type == "alt":
        return jnp.asarray(jnp.sqrt(2.0), t2.dtype)
    if decision_type == "ci":
        tr1 = n_components / t2_limit + jnp.sum(q) / q_limit
        tr2 = (n_components / (t2_limit * t2_limit)
               + jnp.sum(q * q) / (q_limit * q_limit))
        gd = tr2 / tr1
        return gd * jnp.percentile(q, dcl * 100.0)
    if decision_type == "dd":
        return t2_dof + q_dof
    raise ValueError(f"D type {decision_type!r} not implemented")


def _latent_roundtrip_q(model: ConvVAE1D, bundle: OCMBundle, z,
                        compat_double_standardize: bool):
    """Q = ||z - encode(decode(z))||^2 (VAE_SIMCA.py:256-259)."""
    variables = {"params": bundle.params}
    if bundle.batch_stats:
        variables["batch_stats"] = bundle.batch_stats
    x_hat_std = model.apply(variables, z, train=False,
                            method=ConvVAE1D.decode)
    if compat_double_standardize:
        # reference re-standardizes the already-standardized decode output
        x_hat_std = standardize(bundle, x_hat_std)
    z_hat, _ = model.apply(variables, x_hat_std, train=False,
                           method=ConvVAE1D.encode)
    # residual in f32 even under a reduced-precision (bf16) serving model:
    # Q feeds the acceptance limits, which live at f32 scale
    acc = jnp.promote_types(z.dtype, jnp.float32)
    return jnp.sum((z.astype(acc) - z_hat.astype(acc)) ** 2, axis=1)


def fit_vaesimca(model: ConvVAE1D, bundle: OCMBundle, x_cal,
                 decision_type: str = "alt", t2lim: str = "Fdist",
                 t2cl: float = 0.95, qlim: str = "jm", qcl: float = 0.95,
                 dcl: float = 0.95,
                 compat_double_standardize: bool = True,
                 classical_limits: bool = False) -> VAESIMCAModel:
    """Fit latent-SIMCA thresholds on the calibration set
    (VAE_SIMCA.py:230-279).

    ``classical_limits=True`` is the CORRECTED quirk-Q5 mode: the T2/Q
    limits come from the classical chemometric engines
    (ocm_tpu.stats.limits — true F/chi2 quantiles and chi2-based combined
    distances) instead of the reference's percentile-scaled formulas.
    'jm' stays the Q-value-moment variant in both modes (latent residuals
    have no eigenvalue spectrum to take theta moments of).
    """
    from ocm_tpu.models.bundle import encode

    x_cal = jnp.asarray(x_cal)
    mu, _ = encode(model, bundle, x_cal)
    k = mu.shape[1]
    latent_mean = jnp.mean(mu, axis=0)
    muc = mu - latent_mean[None, :]
    cov = (muc.T @ muc) / (mu.shape[0] - 1) + 1e-12 * jnp.eye(k, dtype=mu.dtype)
    invcovT = pinv_psd(cov)
    t2 = jnp.einsum("ij,jk,ik->i", muc, invcovT, muc)
    q = _latent_roundtrip_q(model, bundle, mu, compat_double_standardize)
    if classical_limits:
        from ocm_tpu.stats import limits as L

        t2_res = L.t2_limit(t2, k, t2lim, t2cl)
        if qlim == "jm":
            q_limit, q_dof, q_scale = _q_limit(q, qlim, qcl)
            q_res = L.LimitResult(q_limit, q_dof, q_scale)
        else:
            q_res = L.q_limit(q, qlim, qcl)
        d_limit = L.critical_distance(
            decision_type, t2_res, q_res, n_components=k,
            thetas=(jnp.sum(q), jnp.sum(q * q), jnp.sum(q ** 3)), dcl=dcl)
        return VAESIMCAModel(latent_mean, invcovT, t2_res.limit,
                             q_res.limit, d_limit, t2_res.dof, t2_res.scale,
                             q_res.dof, q_res.scale, jnp.asarray(k))
    t2_limit, t2_dof, t2_scale = _t2_limit(t2, k, t2lim, t2cl)
    q_limit, q_dof, q_scale = _q_limit(q, qlim, qcl)
    d_limit = _d_limit(decision_type, t2_limit, q_limit, t2, q, k,
                       t2_dof, q_dof, dcl)
    return VAESIMCAModel(latent_mean, invcovT, t2_limit, q_limit, d_limit,
                         t2_dof, t2_scale, q_dof, q_scale,
                         jnp.asarray(k))


def predict_vaesimca(model: ConvVAE1D, bundle: OCMBundle,
                     vs: VAESIMCAModel, x, decision_type: str = "alt",
                     compat_double_standardize: bool = True):
    """(accept, T2, Q) for new spectra (VAE_SIMCA.py:348-382)."""
    from ocm_tpu.models.bundle import encode

    x = jnp.asarray(x)
    mu, _ = encode(model, bundle, x)
    # decision statistics in f32 regardless of the network compute dtype:
    # a bf16 serving twin (ConvVAE1D(..., dtype=jnp.bfloat16) over the
    # same bundle) feeds bf16 latents, but T2/Q/limit comparisons stay f32
    mu32 = mu.astype(jnp.promote_types(mu.dtype, jnp.float32))
    t2 = mahalanobis_sq(mu32, vs.latent_mean, vs.invcovT)
    q = _latent_roundtrip_q(model, bundle, mu, compat_double_standardize)
    d = reduced_d(vs, t2, q, decision_type)
    return d < vs.d_limit, t2, q


def reduced_d(vs: VAESIMCAModel, t2, q, decision_type: str = "alt"):
    """Combined reduced distance compared against ``vs.d_limit``
    (VAE_SIMCA.py:361-376; the decision is ``reduced_d(...) < vs.d_limit``)."""
    if decision_type == "alt":
        return jnp.sqrt((t2 / vs.t2_limit) ** 2 + (q / vs.q_limit) ** 2)
    if decision_type == "dd":
        return t2 * vs.t2_dof / vs.t2_scale + q * vs.q_dof / vs.q_scale
    return jnp.maximum(t2 / vs.t2_limit, q / vs.q_limit)


class VAESIMCA:
    """Estimator-style wrapper mirroring ``VAE_SIMCA.py:215-382``."""

    def __init__(self, model: ConvVAE1D, bundle: OCMBundle, type: str = "alt",
                 t2lim: str = "Fdist", t2cl: float = 0.95, qlim: str = "jm",
                 qcl: float = 0.95, dcl: float = 0.95, verbose: bool = True,
                 compat_double_standardize: bool = True):
        self.model = model
        self.bundle = bundle
        self.type = type
        self.t2lim = t2lim
        self.t2cl = t2cl
        self.qlim = qlim
        self.qcl = qcl
        self.dcl = dcl
        self.verbose = verbose
        self.compat_double_standardize = compat_double_standardize
        self._model = {}
        self.model_class = None

    def fit_thresholds(self, x_cal, class_label: int = 0):
        self.model_class = [class_label]
        self._model[class_label] = fit_vaesimca(
            self.model, self.bundle, x_cal, self.type, self.t2lim, self.t2cl,
            self.qlim, self.qcl, self.dcl, self.compat_double_standardize)
        return self

    def predict(self, x):
        if not self._model:
            raise RuntimeError("call fit_thresholds before predict")
        vs = self._model[self.model_class[0]]
        return predict_vaesimca(self.model, self.bundle, vs, x, self.type,
                                self.compat_double_standardize)


def save_vaesimca_model(path: str, vs: VAESIMCAModel) -> str:
    """Template-free msgpack persistence of a (possibly class-stacked)
    fitted latent-SIMCA state (all leaves are plain arrays, unlike the
    flax param pytree in ``bundle.save_bundle``).  The reference carries
    its equivalent state only as an in-memory dict per class
    (VAE_SIMCA.py:266-279)."""
    import numpy as np
    from flax import serialization

    tree = {f: np.asarray(getattr(vs, f)) for f in vs._fields}
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(tree))
    return path


def load_vaesimca_model(path: str) -> VAESIMCAModel:
    """Inverse of :func:`save_vaesimca_model` (no template required)."""
    from flax import serialization

    with open(path, "rb") as fh:
        tree = serialization.msgpack_restore(fh.read())
    return VAESIMCAModel(**{f: jnp.asarray(tree[f])
                            for f in VAESIMCAModel._fields})
