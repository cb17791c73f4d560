"""Fused BatchNorm+activation (ocm_tpu.ops.bn / models.vae.BatchNormAct).

Oracle is flax.linen.BatchNorm composed with the activation — forward,
backward (via jax.grad), running-statistics updates, and the cross-replica
pmean path must all match to float tolerance.  The Pallas kernels run in
interpret mode here (CPU); the same code compiles on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ocm_tpu.models.vae import BatchNormAct, ConvVAE1D, init_vae
from ocm_tpu.ops.bn import (act_grad, apply_act, bn_act_normalize,
                            bn_act_stats, fused_bn_act)


class FlaxBNAct(nn.Module):
    """The round-1 formulation: flax BatchNorm followed by the activation."""

    act: str = "elu"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name,
                         dtype=jnp.float32, name="bn")(x)
        return apply_act(h, self.act)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(0, 1.5, shape), jnp.float32)


@pytest.mark.parametrize("act", ["elu", "gelu", "none"])
def test_fused_forward_matches_flax(rng, act):
    x = _rand(rng, 16, 21, 24)
    gamma = _rand(rng, 24) * 0.2 + 1.0
    beta = _rand(rng, 24) * 0.1

    out, mean, var = fused_bn_act(x, gamma, beta, 1e-5, act, interpret=True)

    mean_ref, var_ref = bn_act_stats(x)
    out_ref = bn_act_normalize(x, mean_ref, var_ref, gamma, beta, 1e-5, act)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["elu", "gelu"])
def test_fused_gradients_match_flax_autodiff(rng, act):
    x = _rand(rng, 12, 17, 10)
    gamma = _rand(rng, 10) * 0.2 + 1.0
    beta = _rand(rng, 10) * 0.1
    w = _rand(rng, 12, 17, 10)   # random cotangent directions via weighting

    def loss_fused(x, gamma, beta):
        out, _, _ = fused_bn_act(x, gamma, beta, 1e-5, act, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(x, gamma, beta):
        mean, var = bn_act_stats(x)
        out = bn_act_normalize(x, mean, var, gamma, beta, 1e-5, act)
        return jnp.sum(out * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_act_grad_matches_autodiff(rng):
    y = _rand(rng, 6, 130)
    for act in ("elu", "gelu", "none"):
        ref = jax.vmap(jax.vmap(jax.grad(lambda v: apply_act(v, act))))(y)
        np.testing.assert_allclose(np.asarray(act_grad(y, act)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["fused", "reference"])
def test_module_matches_flax_train_and_eval(rng, impl):
    x = _rand(rng, 9, 14, 6)
    ref = FlaxBNAct(act="elu")
    mod = BatchNormAct(act="elu", impl=impl)
    v_ref = ref.init(jax.random.key(0), x, train=False)
    v_mod = mod.init(jax.random.key(0), x, train=False)

    # identical variable trees (checkpoint compatibility) modulo the extra
    # flax submodule level ('bn')
    ref_params = v_ref["params"]["bn"]
    assert set(ref_params) == set(v_mod["params"])
    assert set(v_ref["batch_stats"]["bn"]) == set(v_mod["batch_stats"])

    # seed non-trivial affine params + running stats on both sides
    gamma = _rand(rng, 6) * 0.3 + 1.0
    beta = _rand(rng, 6) * 0.2
    ra_m = _rand(rng, 6) * 0.1
    ra_v = jnp.abs(_rand(rng, 6)) + 0.5
    v_ref = {"params": {"bn": {"scale": gamma, "bias": beta}},
             "batch_stats": {"bn": {"mean": ra_m, "var": ra_v}}}
    v_mod = {"params": {"scale": gamma, "bias": beta},
             "batch_stats": {"mean": ra_m, "var": ra_v}}

    # eval: running-average normalization
    out_ref = ref.apply(v_ref, x, train=False)
    out_mod = mod.apply(v_mod, x, train=False)
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)

    # train: batch statistics + running update
    out_ref, mut_ref = ref.apply(v_ref, x, train=True,
                                 mutable=["batch_stats"])
    out_mod, mut_mod = mod.apply(v_mod, x, train=True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_mod["batch_stats"][key]),
            np.asarray(mut_ref["batch_stats"]["bn"][key]),
            rtol=1e-5, atol=1e-6)


def test_module_pmean_path_matches_global_batch(rng):
    """Cross-replica BN: per-shard stats pmean'd over the mesh must equal
    flax's single-device statistics on the full batch."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = 8
    x = _rand(rng, n_dev * 4, 7, 6)
    gamma = _rand(rng, 6) * 0.3 + 1.0
    beta = _rand(rng, 6) * 0.2
    variables = {"params": {"scale": gamma, "bias": beta},
                 "batch_stats": {"mean": jnp.zeros(6), "var": jnp.ones(6)}}

    mod_sync = BatchNormAct(act="elu", axis_name="data")
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))

    def shard_fn(xs):
        out, _ = mod_sync.apply(variables, xs, train=True,
                                mutable=["batch_stats"])
        return out

    out_sharded = shard_map(shard_fn, mesh=mesh, in_specs=P("data"),
                            out_specs=P("data"))(x)

    ref = FlaxBNAct(act="elu")
    v_ref = {"params": {"bn": {"scale": gamma, "bias": beta}},
             "batch_stats": {"bn": {"mean": jnp.zeros(6),
                                    "var": jnp.ones(6)}}}
    out_ref, _ = ref.apply(v_ref, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["fused", "reference"])
def test_vae_train_step_loss_matches_across_impls(rng, impl):
    """The full VAE training step with the new BatchNormAct must produce
    the same loss and gradients as before (impl='reference' is the exact
    flax math; 'fused' the Pallas kernel in interpret mode)."""
    from ocm_tpu.models.trainer import TrainConfig, make_train_step, torch_adam

    model = ConvVAE1D(input_length=40, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32, bn_impl=impl)
    params, batch_stats = init_vae(model, jax.random.key(0))
    assert batch_stats, "BatchNorm stats expected in the variable tree"
    cfg = TrainConfig(epochs=1, batch_size=8, lr=1e-3, loss_type="cosine")
    tx = torch_adam(cfg.lr, cfg.weight_decay)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    xb = _rand(rng, 8, 40)

    p1, bs1, _, loss = step(params, batch_stats, opt_state, xb,
                            jax.random.key(1))
    assert np.isfinite(float(loss))

    # cross-impl equality of the loss, gradients and updated batch stats on
    # the same init.  (Post-Adam parameters are NOT compared: Adam divides
    # by sqrt(second moment), so a 1e-8 gradient difference on a
    # near-zero-gradient element becomes a full-size update difference.)
    model2 = model.clone(bn_impl="fused" if impl == "reference"
                         else "reference")

    def loss_of(m):
        def f(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                rngs={"reparam": jax.random.key(1)},
                mutable=["batch_stats"])
            x_rec, mu, logvar = out
            from ocm_tpu.models.vae import beta_vae_loss
            total, _, _ = beta_vae_loss(xb, x_rec, mu, logvar,
                                        loss_type=cfg.loss_type)
            return total, mut["batch_stats"]
        return jax.value_and_grad(f, has_aux=True)

    (l1, bs1), g1 = loss_of(model)(params)
    (l2, bs2), g2 = loss_of(model2)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5), g1, g2)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5), bs1, bs2)
