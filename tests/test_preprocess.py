"""Preprocessing vs scipy/NumPy references."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from ocm_tpu.ops import preprocess


def _ref_snv(x, eps=1e-8):
    m = np.mean(x, axis=1, keepdims=True)
    s = np.std(x, axis=1, keepdims=True)
    return (x - m) / (s + eps)


def test_snv_matches_reference(spectra):
    got = np.asarray(preprocess.snv(jnp.asarray(spectra)))
    np.testing.assert_allclose(got, _ref_snv(spectra), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("window,poly,deriv", [(5, 2, 1), (15, 2, 1), (7, 3, 0), (9, 4, 2)])
def test_savgol_matches_scipy(spectra, window, poly, deriv):
    want = scipy.signal.savgol_filter(spectra, window_length=window,
                                      polyorder=poly, deriv=deriv, axis=1)
    got = np.asarray(preprocess.savgol_filter(jnp.asarray(spectra), window, poly, deriv))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_savgol_coeffs_match_scipy():
    for w, p, d in [(5, 2, 1), (15, 2, 1), (11, 3, 0), (9, 4, 2)]:
        want = scipy.signal.savgol_coeffs(w, p, deriv=d)
        got = preprocess.savgol_coeffs(w, p, d)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_snv_savgol_pipeline_matches_reference(spectra):
    """The simca_nuts.py:48-52 pipeline: SNV then SavGol(5,2,deriv=1)."""
    ref = scipy.signal.savgol_filter(_ref_snv(spectra), 5, 2, deriv=1, axis=1)
    got = np.asarray(preprocess.snv_savgol(jnp.asarray(spectra)))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_minmax_scale_matches_reference(spectra):
    eps = 1e-8
    x_min = spectra.min(axis=1, keepdims=True)
    x_max = spectra.max(axis=1, keepdims=True)
    want = np.clip((spectra - x_min) / (x_max - x_min + eps), 0.0, 1.0)
    got = np.asarray(preprocess.minmax_scale(jnp.asarray(spectra)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_standardize_and_minmax(rng):
    import jax.numpy as jnp

    from ocm_tpu.ops.preprocess import minmax_scale, standardize

    x = jnp.asarray(rng.normal(2.0, 3.0, (10, 20)))
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0)
    z = standardize(x, mean, std)
    np.testing.assert_allclose(np.asarray(jnp.mean(z, axis=0)), 0.0,
                               atol=1e-12)
    m = minmax_scale(x)
    assert float(jnp.min(m)) >= 0.0 and float(jnp.max(m)) <= 1.0
    # constant row stays finite (eps guard, vae_model.py:149-151)
    const = jnp.ones((1, 20)) * 5.0
    mc = minmax_scale(const)
    assert np.isfinite(np.asarray(mc)).all()


def test_savgol_window_exceeds_length_raises():
    import jax.numpy as jnp

    from ocm_tpu.ops.preprocess import savgol_filter

    with pytest.raises(ValueError):
        savgol_filter(jnp.ones((2, 10)), 15, 2, 1)
    with pytest.raises(ValueError):
        savgol_filter(jnp.ones((2, 30)), 5, 7, 1)   # polyorder >= window
