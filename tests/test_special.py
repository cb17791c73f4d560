"""Device quantile functions vs scipy."""

import numpy as np
import pytest
import scipy.stats as stats

import jax
import jax.numpy as jnp

from ocm_tpu.ops import special


@pytest.mark.parametrize("df", [1, 2, 3, 5, 10, 21, 100, 2.7, 37.3])
@pytest.mark.parametrize("p", [0.01, 0.5, 0.9, 0.95, 0.99, 0.999])
def test_chi2_ppf_matches_scipy(df, p):
    got = float(special.chi2_ppf(p, df))
    want = stats.chi2.ppf(p, df)
    assert got == pytest.approx(want, rel=1e-10, abs=1e-12)


@pytest.mark.parametrize("dfn,dfd", [(2, 10), (10, 90), (12, 300), (1, 5), (21.5, 33.3)])
@pytest.mark.parametrize("p", [0.05, 0.5, 0.95, 0.99])
def test_f_ppf_matches_scipy(dfn, dfd, p):
    got = float(special.f_ppf(p, dfn, dfd))
    want = stats.f.ppf(p, dfn, dfd)
    assert got == pytest.approx(want, rel=1e-9)


def test_vectorized_and_jittable():
    dfs = jnp.asarray([1.0, 4.0, 9.0, 30.0])
    ps = jnp.asarray([0.9, 0.95, 0.99, 0.5])
    got = jax.jit(special.chi2_ppf)(ps, dfs)
    want = stats.chi2.ppf(np.asarray(ps), np.asarray(dfs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)

    got_f = jax.vmap(lambda p: special.f_ppf(p, 3.0, 50.0))(ps)
    want_f = stats.f.ppf(np.asarray(ps), 3, 50)
    np.testing.assert_allclose(np.asarray(got_f), want_f, rtol=1e-9)


def test_edge_cases():
    assert float(special.chi2_ppf(0.0, 5)) == 0.0
    assert np.isinf(float(special.chi2_ppf(1.0, 5)))
    assert float(special.f_ppf(0.0, 3, 10)) == 0.0
    assert np.isinf(float(special.f_ppf(1.0, 3, 10)))


def test_cdf_roundtrip():
    x = special.chi2_ppf(0.95, 7.3)
    assert float(special.chi2_cdf(x, 7.3)) == pytest.approx(0.95, abs=1e-12)
    xf = special.f_ppf(0.9, 4, 40)
    assert float(special.f_cdf(xf, 4, 40)) == pytest.approx(0.9, abs=1e-10)
