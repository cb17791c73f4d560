"""Pallas kernel correctness in interpret mode (CPU; compiled path runs on
TPU — same kernel code, interpret=False)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.simca import fit_simca
from ocm_tpu.ops.kernels import reparam_loss_pallas, t2_q_scores_pallas
from ocm_tpu.ops.linalg import t2_q_scores

from oracles import make_class_spectra


@pytest.fixture(scope="module")
def simca_model():
    rng = np.random.default_rng(0)
    x = make_class_spectra(rng, 200, 96)
    return fit_simca(jnp.asarray(x, jnp.float32), 8), x


def test_t2q_kernel_matches_xla(simca_model):
    model, _ = simca_model
    rng = np.random.default_rng(1)
    x_new = jnp.asarray(make_class_spectra(rng, 300, 96, center_shift=0.3),
                        jnp.float32)
    t2_ref, q_ref, _ = t2_q_scores(x_new, model.mean, model.components,
                                   model.invcovT)
    t2_k, q_k = t2_q_scores_pallas(x_new, model.mean, model.components,
                                   model.invcovT, tile_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(t2_k), np.asarray(t2_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref),
                               rtol=2e-4, atol=1e-5)


def test_t2q_kernel_ragged_tail(simca_model):
    """N not a multiple of the tile: padding rows must not leak."""
    model, x = simca_model
    x_new = jnp.asarray(x[:137], jnp.float32)
    t2_ref, q_ref, _ = t2_q_scores(x_new, model.mean, model.components,
                                   model.invcovT)
    t2_k, q_k = t2_q_scores_pallas(x_new, model.mean, model.components,
                                   model.invcovT, tile_n=64, interpret=True)
    assert t2_k.shape == (137,)
    np.testing.assert_allclose(np.asarray(t2_k), np.asarray(t2_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref),
                               rtol=2e-4, atol=1e-5)


def test_reparam_kernel_matches_formula():
    """z = mu + eps*exp(0.5 lv) and the KL must match the analytic values
    exactly (explicit-eps path; the PRNG path is compiled-TPU only and is
    exercised by bench/verify on hardware)."""
    rng = np.random.default_rng(2)
    n, k = 300, 16   # ragged vs tile_n=128 on purpose
    mu = jnp.asarray(rng.normal(0, 1, (n, k)), jnp.float32)
    logvar = jnp.asarray(rng.normal(-1, 0.2, (n, k)), jnp.float32)
    eps = jnp.asarray(rng.normal(0, 1, (n, k)), jnp.float32)
    z, kl = reparam_loss_pallas(mu, logvar, eps, tile_n=128, interpret=True)
    assert z.shape == (n, k)
    z_ref = np.asarray(mu) + np.asarray(eps) * np.exp(
        0.5 * np.asarray(logvar))
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=1e-5, atol=1e-6)
    kl_ref = -0.5 * np.sum(1 + np.asarray(logvar) - np.asarray(mu) ** 2
                           - np.exp(np.asarray(logvar)), axis=1)
    np.testing.assert_allclose(np.asarray(kl), kl_ref, rtol=1e-4)


def test_fused_reparam_kl_gradients_match_pure_jax():
    """The custom VJP equals autodiff through the plain-JAX formulation."""
    from ocm_tpu.ops.kernels import fused_reparam_kl

    rng = np.random.default_rng(5)
    mu = jnp.asarray(rng.normal(0, 1, (32, 8)), jnp.float32)
    lv = jnp.asarray(rng.normal(-1, 0.2, (32, 8)), jnp.float32)
    eps = jnp.asarray(rng.normal(0, 1, (32, 8)), jnp.float32)

    def loss_fused(mu, lv):
        z, kl = fused_reparam_kl(mu, lv, eps, True)
        return jnp.sum(z ** 2) + 3.0 * jnp.mean(kl)

    def loss_plain(mu, lv):
        z = mu + eps * jnp.exp(0.5 * lv)
        kl = -0.5 * jnp.sum(1 + lv - mu * mu - jnp.exp(lv), axis=1)
        return jnp.sum(z ** 2) + 3.0 * jnp.mean(kl)

    v_f = loss_fused(mu, lv)
    v_p = loss_plain(mu, lv)
    np.testing.assert_allclose(float(v_f), float(v_p), rtol=1e-5)
    g_f = jax.grad(loss_fused, argnums=(0, 1))(mu, lv)
    g_p = jax.grad(loss_plain, argnums=(0, 1))(mu, lv)
    for a, b in zip(g_f, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
