"""Orbax checkpoint tier: pytree save/load and versioned training resume."""

import jax
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from ocm_tpu.models.trainer import TrainConfig, torch_adam, train_vae
from ocm_tpu.models.vae import ConvVAE1D, init_vae
from ocm_tpu.utils.checkpoint import TrainCheckpointer, load_pytree, save_pytree


def make_data(rng, n=64, length=48):
    t = np.linspace(0, 1, length)
    return (rng.normal(1, 0.05, (n, 1)) * np.sin(2 * np.pi * 3 * t)
            + rng.normal(0, 0.02, (n, length))).astype(np.float32)


def test_pytree_roundtrip(tmp_path):
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    params, bs = init_vae(model, jax.random.key(0))
    path = str(tmp_path / "ckpt")
    save_pytree(path, params)
    params2, _ = init_vae(model, jax.random.key(1))
    loaded = load_pytree(path, params2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_checkpointer_resume(tmp_path):
    rng = np.random.default_rng(0)
    x_cal, x_val = make_data(rng), make_data(rng, 24)
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    key = jax.random.key(3)
    cfg4 = TrainConfig(epochs=4, batch_size=32, lr=2e-3,
                       loss_type="euclidean")

    part1 = train_vae(model, x_cal, x_val, cfg4, key)
    ckpt = TrainCheckpointer(str(tmp_path / "mgr"), max_to_keep=2)
    ckpt.save(4, part1.final_params, part1.final_batch_stats,
              part1.final_opt_state)
    ckpt.close()

    # fresh process equivalent: restore and continue
    ckpt2 = TrainCheckpointer(str(tmp_path / "mgr"))
    params_t, bs_t = init_vae(model, jax.random.key(9))
    tx = torch_adam(cfg4.lr, cfg4.weight_decay)
    restored = ckpt2.restore(params_t, bs_t, tx.init(params_t))
    assert restored is not None
    r_params, r_bs, r_opt, epoch = restored
    assert epoch == 4
    part2 = train_vae(model, x_cal, x_val, cfg4, key,
                      init_state=(r_params, r_bs, r_opt), epoch_offset=4)

    full = train_vae(model, x_cal, x_val,
                     TrainConfig(epochs=8, batch_size=32, lr=2e-3,
                                 loss_type="euclidean"), key)
    np.testing.assert_allclose(np.asarray(part2.train_losses),
                               np.asarray(full.train_losses)[4:], rtol=1e-5)
    ckpt2.close()
