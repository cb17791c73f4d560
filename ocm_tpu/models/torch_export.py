"""Export ocm_tpu bundles to reference-format torch checkpoints.

Inverse of ocm_tpu.models.torch_import: a TPU-trained ``OCMBundle``
serializes to a ``state_dict`` that the reference's torch ``ConvVAE1D``
(``/root/reference/vae_model.py:6-129``) loads with ``strict=True`` —
weights, BatchNorm running statistics, and the registered decision buffers
(``threshold``/``threshold_q``/``threshold_h``/``threshold_f``,
``spec_mean``/``spec_std``, ``latent_mean``/``latent_cov_inv``,
vae_model.py:29-32,83-88) — so models trained in this framework deploy
into the reference's torch serving path without retraining.

Layout transforms are the exact inverses of the importer's
(torch_import.py docstring); the round trip and the export-then-torch
forward pass are verified numerically in tests/test_torch_export.py and
the end-to-end migration test.
"""

from __future__ import annotations

import numpy as np

from ocm_tpu.models.bundle import OCMBundle
from ocm_tpu.models.vae import ConvVAE1D


def _conv_w(params: dict):
    k = np.asarray(params["kernel"])            # (k, in, out)
    return np.ascontiguousarray(k.transpose(2, 1, 0)), np.asarray(
        params["bias"])


def _conv_transpose_w(params: dict):
    k = np.asarray(params["kernel"])[::-1]      # unflip -> (k, in, out)
    return np.ascontiguousarray(k.transpose(1, 2, 0)), np.asarray(
        params["bias"])


def _dense_w(params: dict):
    return np.ascontiguousarray(np.asarray(params["kernel"]).T), np.asarray(
        params["bias"])


def numpy_state_dict_from_bundle(bundle: OCMBundle,
                                 model: ConvVAE1D) -> dict:
    """Reference ``state_dict`` keys -> numpy arrays (torch-free core)."""
    params = bundle.params
    batch_stats = bundle.batch_stats or {}
    state: dict = {}

    def put(prefix, w, b):
        state[f"{prefix}.weight"] = w
        state[f"{prefix}.bias"] = b

    def put_bn(prefix, name):
        state[f"{prefix}.weight"] = np.asarray(params[name]["scale"])
        state[f"{prefix}.bias"] = np.asarray(params[name]["bias"])
        state[f"{prefix}.running_mean"] = np.asarray(
            batch_stats[name]["mean"])
        state[f"{prefix}.running_var"] = np.asarray(batch_stats[name]["var"])
        state[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    # torch Sequential stride per block: Conv [+ BN] + act [+ Dropout]
    step = 2 + int(model.use_batchnorm) + int(model.dropout > 0)
    for b in range(model.conv_blocks):
        base = b * step
        put(f"encoder_conv.{base}", *_conv_w(params[f"enc_conv{b}"]))
        if model.use_batchnorm:
            put_bn(f"encoder_conv.{base + 1}", f"enc_bn{b}")

    # flatten-order permutation: the channels-last model flattens (B, L', C)
    # where torch flattens (B, C, L') — permute the FC weights touching the
    # flattened activation back to torch's channel-major order
    enc_ch, enc_len = model.enc_shape
    k_fc = np.asarray(params["fc"]["kernel"])       # (L'*C, hidden)
    w_fc = k_fc.T.reshape(-1, enc_len, enc_ch).transpose(0, 2, 1).reshape(
        k_fc.shape[1], -1)
    put("fc.0", np.ascontiguousarray(w_fc), np.asarray(params["fc"]["bias"]))
    put("fc_mu", *_dense_w(params["fc_mu"]))
    put("fc_logvar", *_dense_w(params["fc_logvar"]))
    put("fc_dec.0", *_dense_w(params["fc_dec0"]))
    k_d = np.asarray(params["fc_dec1"]["kernel"])   # (hidden, L'*C)
    w_d = k_d.T.reshape(enc_len, enc_ch, -1).transpose(1, 0, 2).reshape(
        enc_len * enc_ch, -1)
    b_d = np.asarray(params["fc_dec1"]["bias"]).reshape(
        enc_len, enc_ch).T.reshape(-1)
    put("fc_dec.3", np.ascontiguousarray(w_d), np.ascontiguousarray(b_d))

    for b in range(model.conv_blocks):
        base = b * step
        put(f"decoder_conv.{base}",
            *_conv_transpose_w(params[f"dec_conv{b}"]))
        if model.use_batchnorm:
            put_bn(f"decoder_conv.{base + 1}", f"dec_bn{b}")
    put(f"decoder_conv.{model.conv_blocks * step}",
        *_conv_w(params["dec_out"]))

    state["threshold"] = np.asarray(bundle.threshold, np.float32)
    state["threshold_q"] = np.asarray(bundle.threshold_q, np.float32)
    state["threshold_h"] = np.asarray(bundle.threshold_h, np.float32)
    state["threshold_f"] = np.asarray(bundle.threshold_f, np.float32)
    state["spec_mean"] = np.asarray(bundle.spec_mean, np.float32)
    state["spec_std"] = np.asarray(bundle.spec_std, np.float32)
    state["latent_mean"] = np.asarray(bundle.latent_mean, np.float32)
    state["latent_cov_inv"] = np.asarray(bundle.latent_cov_inv, np.float32)
    return state


def torch_state_dict_from_bundle(bundle: OCMBundle, model: ConvVAE1D):
    """Reference-format ``state_dict`` of torch tensors."""
    import torch

    # copy: jax-backed numpy views are read-only, torch wants writable
    return {k: torch.from_numpy(np.array(v))
            for k, v in numpy_state_dict_from_bundle(bundle, model).items()}


def save_torch_checkpoint(path: str, bundle: OCMBundle,
                          model: ConvVAE1D) -> str:
    """Write a ``.pth`` the reference loads with
    ``ConvVAE1D(...).load_state_dict(torch.load(path), strict=True)``."""
    import torch

    torch.save(torch_state_dict_from_bundle(bundle, model), path)
    return path
