"""Inverse migration: OCMBundle -> reference-format torch checkpoint.

Two layers of evidence:
1. the export is the exact inverse of the importer (state-dict round trip
   reproduces every parameter bit-for-bit);
2. a briefly TPU-trained model exports to a ``.pth`` that the reference's
   own ``ConvVAE1D`` (/root/reference/vae_model.py) loads with
   ``strict=True`` and whose forward pass matches the flax model to float
   tolerance — the reference's torch serving path runs TPU-trained models
   without retraining.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ocm_tpu.models.bundle import OCMBundle, new_bundle  # noqa: E402
from ocm_tpu.models.torch_export import (numpy_state_dict_from_bundle,  # noqa: E402
                                         save_torch_checkpoint)
from ocm_tpu.models.torch_import import bundle_from_torch_state_dict  # noqa: E402
from ocm_tpu.models.vae import ConvVAE1D, init_vae  # noqa: E402

REF = "/root/reference"

ARCH = dict(input_length=64, latent_dim=6, conv_blocks=2, n_filters=8,
            kernel_size=9, stride=2, hidden_fc=32)


def _bundle(rng_key, model, length):
    params, batch_stats = init_vae(model, rng_key)
    rng = np.random.default_rng(3)
    bundle = new_bundle(params, batch_stats,
                        jnp.asarray(rng.normal(0, 1, length), jnp.float32),
                        jnp.asarray(rng.uniform(0.5, 2, length),
                                    jnp.float32),
                        model.latent_dim)
    return bundle._replace(
        threshold=jnp.asarray(3.5, jnp.float32),
        threshold_q=jnp.asarray(1.25, jnp.float32),
        threshold_h=jnp.asarray(0.5, jnp.float32),
        threshold_f=jnp.asarray(9.0, jnp.float32),
        latent_mean=jnp.asarray(rng.normal(0, 1, model.latent_dim),
                                jnp.float32),
        latent_cov_inv=jnp.asarray(np.eye(model.latent_dim) * 2.0,
                                   jnp.float32))


def test_state_dict_roundtrip():
    model = ConvVAE1D(**ARCH)
    bundle = _bundle(jax.random.key(0), model, ARCH["input_length"])
    state = numpy_state_dict_from_bundle(bundle, model)
    back = bundle_from_torch_state_dict(state, model)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        bundle.params, back.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        bundle.batch_stats, back.batch_stats)
    for field in ("spec_mean", "spec_std", "latent_mean", "latent_cov_inv",
                  "threshold", "threshold_q", "threshold_h", "threshold_f"):
        np.testing.assert_array_equal(
            np.asarray(getattr(bundle, field)),
            np.asarray(getattr(back, field)), err_msg=field)


def test_state_dict_roundtrip_dropout_no_bn():
    model = ConvVAE1D(**{**ARCH, "input_length": 48}, use_batchnorm=False,
                      dropout=0.1)
    bundle = _bundle(jax.random.key(1), model, 48)
    state = numpy_state_dict_from_bundle(bundle, model)
    back = bundle_from_torch_state_dict(state, model)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        bundle.params, back.params)


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference mount not available")
def test_export_loads_into_actual_reference(tmp_path):
    """Train briefly in ocm_tpu, export, load with the REFERENCE's torch
    ConvVAE1D (strict=True), and match the forward pass."""
    from ocm_tpu.models.trainer import TrainConfig, train_vae

    length = ARCH["input_length"]
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, length)
    x = (rng.normal(1, 0.06, (96, 1)) * np.sin(2 * np.pi * 3 * t)
         + rng.normal(0, 0.02, (96, length))).astype(np.float32)

    model = ConvVAE1D(**ARCH)
    r = train_vae(model, x, x[:32],
                  TrainConfig(epochs=3, batch_size=32,
                              loss_type="euclidean"),
                  jax.random.key(0))
    bundle = r.bundle._replace(threshold=jnp.asarray(2.0, jnp.float32))
    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(path, bundle, model)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from vae_model import ConvVAE1D as RefVAE

    ref = RefVAE(input_length=length, latent_dim=ARCH["latent_dim"],
                 mean=np.asarray(bundle.spec_mean),
                 std=np.asarray(bundle.spec_std),
                 conv_blocks=ARCH["conv_blocks"],
                 n_filters=ARCH["n_filters"],
                 kernel_size=ARCH["kernel_size"], stride=ARCH["stride"],
                 hidden_fc=ARCH["hidden_fc"])
    state = torch.load(path, map_location="cpu", weights_only=True)
    ref.load_state_dict(state, strict=True)   # every key must line up
    ref.eval()
    assert float(ref.threshold) == pytest.approx(2.0)

    # deterministic forward parity: encoder on standardized spectra and
    # decoder on fixed latents
    x_std = ((x - np.asarray(bundle.spec_mean))
             / np.asarray(bundle.spec_std)).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = ref.encode(torch.tensor(x_std))
    variables = {"params": bundle.params, "batch_stats": bundle.batch_stats}
    mu_j, lv_j = model.apply(variables, jnp.asarray(x_std), train=False,
                             method=ConvVAE1D.encode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(),
                               rtol=1e-4, atol=1e-5)

    z = np.asarray(mu_j, np.float32)
    with torch.no_grad():
        xr_t = ref.decode(torch.tensor(z))
    xr_j = model.apply(variables, jnp.asarray(z), train=False,
                       method=ConvVAE1D.decode)
    np.testing.assert_allclose(np.asarray(xr_j), xr_t.numpy(),
                               rtol=1e-4, atol=1e-5)
