"""Acceptance-limit engines vs a NumPy/scipy oracle.

The oracle functions below re-derive the reference formulas
(utils/SIMCA.py:156-236) directly in NumPy/scipy; the device engines must
match them at float64.
"""

import numpy as np
import pytest
import scipy.stats as stats
from scipy.special import erfinv

import jax.numpy as jnp

from ocm_tpu.stats import limits


def _oracle_tlim(t2, k, method, cl):
    n = len(t2)
    if method == "perc":
        return np.percentile(t2, cl * 100)
    if method == "Fdistrig":
        f = stats.f.ppf(cl, k, n - k)
        return (k / n) * (n**2 - 1) / (n - k) * f
    if method == "Fdist":
        f = stats.f.ppf(cl, k, n - k)
        return k * (n - 1) / (n - k) * f
    if method == "chi2":
        return stats.chi2.ppf(cl, k)
    if method == "chi2pom":
        h0 = float(np.mean(t2))
        var = float(np.var(t2, ddof=1))
        nh = max(int(np.round(2 * h0**2 / var)) if var > 0 else 1, 1)
        return h0 * stats.chi2.ppf(cl, nh) / nh
    raise ValueError(method)


def _oracle_qlim(q, eigs, k, method, cl):
    if method == "perc":
        return np.percentile(q, cl * 100)
    if method == "jm":
        t1 = eigs[k:].sum()
        t2_ = (eigs[k:] ** 2).sum()
        t3 = (eigs[k:] ** 3).sum()
        if t1 == 0:
            return 0.0
        h0 = max(1 - (2 * t1 * t3) / (3 * t2_**2), 0.001)
        ca = np.sqrt(2) * erfinv(2 * cl - 1)
        h1 = ca * np.sqrt(2 * t2_ * h0**2) / t1
        h2 = t2_ * h0 * (h0 - 1) / t1**2
        return t1 * (h1 + 1 + h2) ** (1 / h0)
    if method == "chi2box":
        t1 = eigs[k:].sum()
        t2_ = (eigs[k:] ** 2).sum()
        return (t2_ / t1) * stats.chi2.ppf(cl, t1**2 / t2_)
    if method == "chi2pom":
        v0 = np.mean(q)
        nv = max(round(2 * v0**2 / np.var(q, ddof=1)), 1)
        return v0 * stats.chi2.ppf(cl, nv) / nv
    raise ValueError(method)


@pytest.fixture
def t2_q_eigs(rng):
    t2 = rng.chisquare(5, size=200) * 1.7
    q = rng.chisquare(3, size=200) * 0.05
    eigs = np.sort(rng.exponential(1.0, size=40))[::-1].copy()
    return t2, q, eigs


@pytest.mark.parametrize("method", limits.T2_METHODS)
def test_t2_limits(t2_q_eigs, method):
    t2, _, _ = t2_q_eigs
    k = 5
    want = _oracle_tlim(t2, k, method, 0.95)
    got = limits.t2_limit(jnp.asarray(t2), k, method, 0.95)
    assert float(got.limit) == pytest.approx(want, rel=1e-9)


@pytest.mark.parametrize("method", limits.Q_METHODS)
def test_q_limits(t2_q_eigs, method):
    _, q, eigs = t2_q_eigs
    k = 5
    want = _oracle_qlim(q, eigs, k, method, 0.95)
    thetas = limits.residual_thetas(jnp.asarray(eigs), k)
    got = limits.q_limit(jnp.asarray(q), method, 0.95, thetas=thetas)
    assert float(got.limit) == pytest.approx(want, rel=1e-9)


def test_jm_zero_residual():
    """theta1 == 0 -> limit 0 (utils/SIMCA.py:193-194)."""
    eigs = jnp.asarray([3.0, 2.0, 0.0, 0.0])
    thetas = limits.residual_thetas(eigs, 2)
    got = limits.q_limit(jnp.asarray([0.1, 0.2]), "jm", 0.95, thetas=thetas)
    assert float(got.limit) == 0.0


def test_critical_distances(t2_q_eigs):
    t2, q, eigs = t2_q_eigs
    k = 5
    cl = 0.95
    t2j, qj, ej = jnp.asarray(t2), jnp.asarray(q), jnp.asarray(eigs)
    thetas = limits.residual_thetas(ej, k)

    # sim / alt
    tres = limits.t2_limit(t2j, k, "Fdist", cl)
    qres = limits.q_limit(qj, "jm", cl, thetas=thetas)
    assert float(limits.critical_distance("sim", tres, qres)) == 1.0
    assert float(limits.critical_distance("alt", tres, qres)) == pytest.approx(np.sqrt(2))

    # ci (utils/SIMCA.py:224-232)
    t2l, ql = float(tres.limit), float(qres.limit)
    t1 = eigs[k:].sum()
    t2m = (eigs[k:] ** 2).sum()
    tr1 = k / t2l + t1 / ql
    tr2 = k / t2l**2 + t2m / ql**2
    want_ci = (tr2 / tr1) * stats.chi2.ppf(cl, tr1**2 / tr2)
    got_ci = limits.critical_distance("ci", tres, qres, n_components=k,
                                      thetas=thetas, dcl=cl)
    assert float(got_ci) == pytest.approx(want_ci, rel=1e-9)

    # dd (utils/SIMCA.py:233-234): chi2pom limits feed pooled dofs
    tres_dd = limits.t2_limit(t2j, k, "chi2pom", cl)
    qres_dd = limits.q_limit(qj, "chi2pom", cl)
    h0 = np.mean(t2)
    nh = max(int(np.round(2 * h0**2 / np.var(t2, ddof=1))), 1)
    v0 = np.mean(q)
    nv = max(round(2 * v0**2 / np.var(q, ddof=1)), 1)
    want_dd = stats.chi2.ppf(cl, nh + nv)
    got_dd = limits.critical_distance("dd", tres_dd, qres_dd, dcl=cl)
    assert float(got_dd) == pytest.approx(want_dd, rel=1e-9)
    assert float(tres_dd.dof) == nh
    assert float(qres_dd.dof) == nv


def test_reduced_distances(t2_q_eigs):
    t2, q, _ = t2_q_eigs
    t2j, qj = jnp.asarray(t2), jnp.asarray(q)
    tres = limits.LimitResult(jnp.asarray(2.0), jnp.asarray(3.0), jnp.asarray(1.5))
    qres = limits.LimitResult(jnp.asarray(0.5), jnp.asarray(2.0), jnp.asarray(0.25))
    np.testing.assert_allclose(
        np.asarray(limits.reduced_distance("sim", t2j, qj, tres, qres)),
        np.maximum(t2 / 2.0, q / 0.5))
    np.testing.assert_allclose(
        np.asarray(limits.reduced_distance("alt", t2j, qj, tres, qres)),
        np.sqrt((t2 / 2.0) ** 2 + (q / 0.5) ** 2))
    np.testing.assert_allclose(
        np.asarray(limits.reduced_distance("ci", t2j, qj, tres, qres)),
        t2 / 2.0 + q / 0.5)
    np.testing.assert_allclose(
        np.asarray(limits.reduced_distance("dd", t2j, qj, tres, qres)),
        3.0 * t2 / 1.5 + 2.0 * q / 0.25)
