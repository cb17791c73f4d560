"""Acceptance-limit engines for one-class models.

Re-derivation of the reference's statistical-limit layer
(``utils/SIMCA.py:156-236``) as pure jittable functions:

- Hotelling T^2 limits: 'perc', 'Fdistrig', 'Fdist', 'chi2', 'chi2pom'
- Q residual limits:    'perc', 'jm' (Jackson-Mudholkar), 'chi2box',
                        'chi2pom' (Pomerantsev moment-matched chi^2)
- combined critical distance per decision type: 'sim', 'alt', 'ci', 'dd'

All quantile inversions run on device (ocm_tpu.ops.special), so limits can be
computed inside vmapped batched fits (folds x LV x grid) without host sync.
Float64 reproduces the scipy reference to tight tolerance
(tests/test_limits.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ocm_tpu.ops.special import chi2_ppf, erfinv, f_ppf

T2_METHODS = ("perc", "Fdistrig", "Fdist", "chi2", "chi2pom")
Q_METHODS = ("perc", "jm", "chi2box", "chi2pom")
DECISION_TYPES = ("sim", "alt", "ci", "dd")


class LimitResult(NamedTuple):
    """An acceptance limit plus the moment-matching state 'dd' needs.

    ``dof``/``scale`` are only meaningful for 'chi2pom' (the reference stores
    them on the estimator as ``_t2dof/_t2scfact/_qdof/_qscfact``,
    utils/SIMCA.py:179-180,215-216); they are 1.0 otherwise so the pytree
    keeps a static structure under vmap.
    """

    limit: jnp.ndarray
    dof: jnp.ndarray
    scale: jnp.ndarray


def _pom_dof(values):
    """Pomerantsev moment-matched chi^2 dof: max(round(2*m^2/var), 1).

    Matches ``int(np.round(...))`` / ``round(...)`` in the reference
    (utils/SIMCA.py:177,213) — NumPy and Python 3 both round half to even,
    as does jnp.round.
    """
    m = jnp.mean(values)
    var = jnp.var(values, ddof=1)
    dof = jnp.where(var > 0, jnp.round(2.0 * (m * m) / var), 1.0)
    return jnp.maximum(dof, 1.0), m


def t2_limit(t2, n_components, method: str = "Fdist", cl: float = 0.95,
             n_samples=None) -> LimitResult:
    """Hotelling T^2 acceptance limit (utils/SIMCA.py:156-182).

    ``n_components`` may be a traced integer; ``n_samples`` defaults to
    len(t2) but can be passed explicitly for masked/padded batched fits.
    """
    if method not in T2_METHODS:
        raise ValueError(f"unknown t2 limit method {method!r}")
    n = jnp.asarray(len(t2) if n_samples is None else n_samples, dtype=t2.dtype)
    k = jnp.asarray(n_components, dtype=t2.dtype)
    one = jnp.ones((), dtype=t2.dtype)

    if method == "perc":
        lim = jnp.percentile(t2, cl * 100.0)
    elif method == "Fdistrig":
        fval = f_ppf(cl, k, n - k)
        lim = (k / n) * (n * n - 1.0) / (n - k) * fval
    elif method == "Fdist":
        fval = f_ppf(cl, k, n - k)
        lim = k * (n - 1.0) / (n - k) * fval
    elif method == "chi2":
        lim = chi2_ppf(cl, k)
    else:  # chi2pom
        dof, scale = _pom_dof(t2)
        lim = scale * chi2_ppf(cl, dof) / dof
        return LimitResult(lim, dof, scale)
    return LimitResult(lim, one, one)


def residual_thetas(eigenvalues, n_components, max_rank=None):
    """theta_m = sum of the m-th powers of the residual eigenvalues.

    (utils/SIMCA.py:189-191).  ``n_components`` may be traced: the slice is
    realized as a mask over the full spectrum so the same code runs inside
    a vmapped LV sweep.  ``max_rank`` masks out padded eigenvalue slots.
    """
    r = eigenvalues.shape[0]
    idx = jnp.arange(r)
    mask = idx >= jnp.asarray(n_components)
    if max_rank is not None:
        mask = mask & (idx < jnp.asarray(max_rank))
    e = jnp.where(mask, eigenvalues, 0.0)
    return jnp.sum(e), jnp.sum(e * e), jnp.sum(e * e * e)


def q_limit(q, method: str = "jm", cl: float = 0.95, thetas=None) -> LimitResult:
    """Q residual acceptance limit (utils/SIMCA.py:184-217).

    'jm' and 'chi2box' need the residual eigenvalue moments: pass
    ``thetas = residual_thetas(eigenvalues, n_components)``.
    """
    if method not in Q_METHODS:
        raise ValueError(f"unknown q limit method {method!r}")
    one = jnp.ones((), dtype=q.dtype)

    if method == "perc":
        lim = jnp.percentile(q, cl * 100.0)
    elif method == "jm":
        lim = jm_limit(thetas, cl)
    elif method == "chi2box":
        theta1, theta2, _ = thetas
        g = theta2 / theta1
        ng = (theta1 * theta1) / theta2
        lim = g * chi2_ppf(cl, ng)
    else:  # chi2pom
        dof, scale = _pom_dof(q)
        lim = scale * chi2_ppf(cl, dof) / dof
        return LimitResult(lim, dof, scale)
    return LimitResult(lim, one, one)


def jm_limit(thetas, cl: float = 0.95):
    """Jackson-Mudholkar Q limit from residual eigenvalue moments
    (utils/SIMCA.py:188-200), including the reference's h0 >= 0.001 clamp
    and the theta1 == 0 -> 0 short-circuit (expressed as where())."""
    theta1, theta2, theta3 = thetas
    safe1 = jnp.where(theta1 > 0, theta1, 1.0)
    safe2 = jnp.where(theta2 > 0, theta2, 1.0)
    h0 = 1.0 - (2.0 * theta1 * theta3) / (3.0 * safe2 * safe2)
    h0 = jnp.maximum(h0, 0.001)
    ca = jnp.sqrt(2.0) * erfinv(2.0 * cl - 1.0)
    h1 = ca * jnp.sqrt(2.0 * theta2 * h0 * h0) / safe1
    h2 = theta2 * h0 * (h0 - 1.0) / (safe1 * safe1)
    lim = theta1 * (h1 + 1.0 + h2) ** (1.0 / h0)
    return jnp.where(theta1 > 0, lim, 0.0)


def critical_distance(decision_type: str, t2: LimitResult, q: LimitResult,
                      n_components=None, thetas=None, dcl: float = 0.95):
    """Combined decision boundary (utils/SIMCA.py:219-236).

    'sim' -> 1; 'alt' -> sqrt(2); 'ci' -> chi^2 of the trace-combined g/h;
    'dd' -> chi^2 with the pooled Pomerantsev dofs.
    """
    if decision_type == "sim":
        return jnp.asarray(1.0, dtype=t2.limit.dtype)
    if decision_type == "alt":
        return jnp.asarray(jnp.sqrt(2.0), dtype=t2.limit.dtype)
    if decision_type == "ci":
        theta1, theta2, _ = thetas
        k = jnp.asarray(n_components, dtype=t2.limit.dtype)
        tr1 = k / t2.limit + theta1 / q.limit
        tr2 = k / (t2.limit * t2.limit) + theta2 / (q.limit * q.limit)
        gd = tr2 / tr1
        hd = (tr1 * tr1) / tr2
        return gd * chi2_ppf(dcl, hd)
    if decision_type == "dd":
        return chi2_ppf(dcl, t2.dof + q.dof)
    raise ValueError(f"unknown decision type {decision_type!r}")


def reduced_distance(decision_type: str, t2, q, t2_res: LimitResult,
                     q_res: LimitResult):
    """Combined reduced distance per sample (utils/SIMCA.py:131-144)."""
    if decision_type == "sim":
        return jnp.maximum(t2 / t2_res.limit, q / q_res.limit)
    if decision_type == "alt":
        return jnp.sqrt((t2 / t2_res.limit) ** 2 + (q / q_res.limit) ** 2)
    if decision_type == "ci":
        return t2 / t2_res.limit + q / q_res.limit
    if decision_type == "dd":
        return t2_res.dof * t2 / t2_res.scale + q_res.dof * q / q_res.scale
    raise ValueError(f"unknown decision type {decision_type!r}")
