"""Mid-training resume: split training must equal one continuous run."""

import jax
import numpy as np

from ocm_tpu.models.trainer import TrainConfig, train_vae
from ocm_tpu.models.vae import ConvVAE1D


def make_data(rng, n=64, length=48):
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * 3 * t)
    return (rng.normal(1, 0.05, (n, 1)) * base
            + rng.normal(0, 0.02, (n, length))).astype(np.float32)


def test_resume_equals_continuous_run():
    rng = np.random.default_rng(0)
    x_cal, x_val = make_data(rng), make_data(rng, 24)
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    key = jax.random.key(3)

    cfg8 = TrainConfig(epochs=8, batch_size=32, lr=2e-3,
                       loss_type="euclidean")
    full = train_vae(model, x_cal, x_val, cfg8, key)

    cfg4 = TrainConfig(epochs=4, batch_size=32, lr=2e-3,
                       loss_type="euclidean")
    part1 = train_vae(model, x_cal, x_val, cfg4, key)
    part2 = train_vae(model, x_cal, x_val, cfg4, key,
                      init_state=(part1.final_params,
                                  part1.final_batch_stats,
                                  part1.final_opt_state),
                      epoch_offset=4)

    np.testing.assert_allclose(
        np.concatenate([np.asarray(part1.train_losses),
                        np.asarray(part2.train_losses)]),
        np.asarray(full.train_losses), rtol=1e-5)
    # final parameters identical leaf-by-leaf
    for a, b in zip(jax.tree.leaves(part2.final_params),
                    jax.tree.leaves(full.final_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
    # global best epoch is offset-adjusted
    assert 0 <= int(part2.best_epoch) < 8


def test_val_every_skips_validation():
    rng = np.random.default_rng(1)
    x_cal, x_val = make_data(rng), make_data(rng, 24)
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    r = train_vae(model, x_cal, x_val,
                  TrainConfig(epochs=6, batch_size=32, loss_type="euclidean",
                              val_every=3), jax.random.key(0))
    vl = np.asarray(r.val_losses)
    assert np.isinf(vl[[0, 1, 3, 4]]).all()      # skipped epochs
    assert np.isfinite(vl[[2, 5]]).all()         # validated epochs
    assert int(r.best_epoch) in (2, 5)
    # default cadence unchanged: every epoch finite
    r1 = train_vae(model, x_cal, x_val,
                   TrainConfig(epochs=3, batch_size=32,
                               loss_type="euclidean"), jax.random.key(0))
    assert np.isfinite(np.asarray(r1.val_losses)).all()


def test_loss_space_raw_differs_and_trains():
    """'raw' loss space (the reference's exact objective) produces different
    cosine losses than standardized space and still trains."""
    rng = np.random.default_rng(2)
    # non-trivial per-wavelength scale so the affine map matters
    x_cal = make_data(rng) * np.linspace(0.5, 3.0, 48) + 2.0
    x_val = make_data(rng, 24) * np.linspace(0.5, 3.0, 48) + 2.0
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    key = jax.random.key(7)
    r_std = train_vae(model, x_cal, x_val,
                      TrainConfig(epochs=3, batch_size=32,
                                  loss_type="cosine"), key)
    r_raw = train_vae(model, x_cal, x_val,
                      TrainConfig(epochs=3, batch_size=32,
                                  loss_type="cosine", loss_space="raw"), key)
    assert np.all(np.isfinite(np.asarray(r_raw.train_losses)))
    assert not np.allclose(np.asarray(r_std.train_losses),
                           np.asarray(r_raw.train_losses), rtol=1e-3)
