"""Import reference torch checkpoints into ocm_tpu bundles.

The reference deploys one-class models as torch ``state_dict`` files whose
registered buffers carry the full decision state (``vae_model.py:29-32,
83-88``; saved at ``utils/final_vaesimca.py:439-445``).  This module converts
such a checkpoint into an ``OCMBundle`` so a user of the reference can bring
their TRAINED models to this framework without retraining:

    bundle = load_torch_checkpoint("VAE_class0_best.pth", model)
    accept = vae_decision.decide_d2(model, bundle, x)

Weight-layout mapping (validated numerically in tests/test_torch_import.py —
imported weights reproduce the torch forward pass to float tolerance, which
also proves the architecture parity of ocm_tpu.models.vae.ConvVAE1D):

- Conv1d      (out, in, k)   -> flax Conv kernel (k, in, out): transpose
- ConvTranspose1d (in, out, k) -> flax ConvTranspose kernel (k, in, out)
  with the kernel axis FLIPPED (torch computes the conv adjoint; flax
  correlates the dilated input with the kernel as-is)
- Linear      (out, in)      -> flax Dense kernel (in, out): transpose
- BatchNorm1d weight/bias/running_mean/running_var -> scale/bias +
  batch_stats mean/var
- buffers spec_mean/spec_std/latent_mean/latent_cov_inv/threshold* ->
  OCMBundle fields (missing thresholds default to 0, the reference's
  initial buffer values)

The reference's torch ``Sequential`` indices depend on use_batchnorm /
dropout, reconstructed here from the architecture hyperparameters.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ocm_tpu.models.bundle import OCMBundle
from ocm_tpu.models.vae import ConvVAE1D


def _np(state: Mapping, key: str) -> np.ndarray:
    v = state[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv(state, prefix):
    w = _np(state, f"{prefix}.weight")          # (out, in, k)
    b = _np(state, f"{prefix}.bias")
    return {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0))),
            "bias": jnp.asarray(b)}


def _conv_transpose(state, prefix):
    w = _np(state, f"{prefix}.weight")          # (in, out, k)
    b = _np(state, f"{prefix}.bias")
    kernel = np.transpose(w, (2, 0, 1))[::-1]   # (k, in, out), flipped
    return {"kernel": jnp.asarray(np.ascontiguousarray(kernel)),
            "bias": jnp.asarray(b)}


def _dense(state, prefix):
    w = _np(state, f"{prefix}.weight")          # (out, in)
    b = _np(state, f"{prefix}.bias")
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _bn(state, prefix):
    return ({"scale": jnp.asarray(_np(state, f"{prefix}.weight")),
             "bias": jnp.asarray(_np(state, f"{prefix}.bias"))},
            {"mean": jnp.asarray(_np(state, f"{prefix}.running_mean")),
             "var": jnp.asarray(_np(state, f"{prefix}.running_var"))})


def bundle_from_torch_state_dict(state: Mapping,
                                 model: ConvVAE1D) -> OCMBundle:
    """Convert a reference ``ConvVAE1D.state_dict()`` into an OCMBundle for
    ``model`` (which must be constructed with the same hyperparameters)."""
    params: dict = {}
    batch_stats: dict = {}

    # torch Sequential stride per block: Conv [+ BN] + act [+ Dropout]
    step = 2 + int(model.use_batchnorm) + int(model.dropout > 0)
    for b in range(model.conv_blocks):
        base = b * step
        params[f"enc_conv{b}"] = _conv(state, f"encoder_conv.{base}")
        if model.use_batchnorm:
            scale, stats = _bn(state, f"encoder_conv.{base + 1}")
            params[f"enc_bn{b}"] = scale
            batch_stats[f"enc_bn{b}"] = stats

    # flatten-order permutation: torch flattens (B, C, L') channel-major,
    # the channels-last model flattens (B, L', C) — reindex the FC weights
    # touching the flattened activation
    enc_ch, enc_len = model.enc_shape
    w_fc = _np(state, "fc.0.weight")            # (hidden, C*L')
    w_fc = w_fc.reshape(-1, enc_ch, enc_len).transpose(0, 2, 1).reshape(
        w_fc.shape[0], -1)
    params["fc"] = {"kernel": jnp.asarray(w_fc.T),
                    "bias": jnp.asarray(_np(state, "fc.0.bias"))}
    params["fc_mu"] = _dense(state, "fc_mu")
    params["fc_logvar"] = _dense(state, "fc_logvar")
    params["fc_dec0"] = _dense(state, "fc_dec.0")
    # fc_dec Sequential: Linear, act, Dropout|Identity, Linear, act;
    # fc_dec.3 OUTPUTS the flattened activation -> permute rows + bias
    w_d = _np(state, "fc_dec.3.weight")         # (C*L', hidden)
    b_d = _np(state, "fc_dec.3.bias")
    w_d = w_d.reshape(enc_ch, enc_len, -1).transpose(1, 0, 2).reshape(
        enc_ch * enc_len, -1)
    b_d = b_d.reshape(enc_ch, enc_len).T.reshape(-1)
    params["fc_dec1"] = {"kernel": jnp.asarray(w_d.T),
                         "bias": jnp.asarray(b_d)}

    for b in range(model.conv_blocks):
        base = b * step
        params[f"dec_conv{b}"] = _conv_transpose(state,
                                                 f"decoder_conv.{base}")
        if model.use_batchnorm:
            scale, stats = _bn(state, f"decoder_conv.{base + 1}")
            params[f"dec_bn{b}"] = scale
            batch_stats[f"dec_bn{b}"] = stats
    params["dec_out"] = _conv(state,
                              f"decoder_conv.{model.conv_blocks * step}")

    def buf(name, default):
        if name in state:
            return jnp.asarray(_np(state, name))
        return default

    latent_dim = model.latent_dim
    spec_mean = jnp.asarray(_np(state, "spec_mean"))
    spec_std = jnp.asarray(_np(state, "spec_std"))
    zero = jnp.zeros((), spec_mean.dtype)
    return OCMBundle(
        params=params, batch_stats=batch_stats,
        spec_mean=spec_mean, spec_std=spec_std,
        latent_mean=buf("latent_mean", jnp.zeros((latent_dim,))),
        latent_cov_inv=buf("latent_cov_inv", jnp.eye(latent_dim)),
        threshold=buf("threshold", zero),
        threshold_q=buf("threshold_q", buf("q_threshold", zero)),
        threshold_h=buf("threshold_h", zero),
        threshold_f=buf("threshold_f", zero),
    )


def load_torch_checkpoint(path: str, model: ConvVAE1D) -> OCMBundle:
    """Load a reference ``.pth`` checkpoint file (torch required)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return bundle_from_torch_state_dict(state, model)
