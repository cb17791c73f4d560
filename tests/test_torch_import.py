"""Torch-checkpoint import: a trained reference-format state_dict must
reproduce the torch forward pass through ocm_tpu to float tolerance.

The torch fixture builds the published checkpoint interface (the
``encoder_conv.N`` / ``fc`` / ``fc_mu`` / ``decoder_conv.N`` key schema with
registered decision buffers) from the same hyperparameters — passing these
tests is a numerical proof that ConvVAE1D matches the reference
architecture layer for layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models import bundle as B
from ocm_tpu.models.torch_import import bundle_from_torch_state_dict
from ocm_tpu.models.vae import ConvVAE1D

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


def build_torch_vae(length, latent, blocks, nf, k, stride, hidden,
                    use_bn=True, dropout=0.0):
    """Reference-format torch module (checkpoint interface fixture)."""
    pad = k // 2

    class TorchVAE(nn.Module):
        def __init__(self):
            super().__init__()
            act = nn.ELU
            enc, in_ch, filters, out_len = [], 1, nf, length
            for b in range(blocks):
                s = 1 if b == 0 else stride
                enc.append(nn.Conv1d(in_ch, filters, k, s, pad))
                if use_bn:
                    enc.append(nn.BatchNorm1d(filters))
                enc.append(act())
                if dropout > 0:
                    enc.append(nn.Dropout(dropout))
                in_ch, filters = filters, min(filters * 2, 1024)
                out_len = (out_len + 2 * pad - (k - 1) - 1) // s + 1
            self.encoder_conv = nn.Sequential(*enc)
            self._ch, self._len = in_ch, out_len
            fc_in = in_ch * out_len
            self.fc = nn.Sequential(
                nn.Linear(fc_in, hidden), act(),
                nn.Dropout(dropout) if dropout > 0 else nn.Identity())
            self.fc_mu = nn.Linear(hidden, latent)
            self.fc_logvar = nn.Linear(hidden, latent)
            self.fc_dec = nn.Sequential(
                nn.Linear(latent, hidden), act(),
                nn.Dropout(dropout) if dropout > 0 else nn.Identity(),
                nn.Linear(hidden, fc_in), act())
            dec, filters = [], in_ch
            for b in range(blocks):
                nxt = max(filters // 2, nf)
                s = stride if b < blocks - 1 else 1
                dec.append(nn.ConvTranspose1d(filters, nxt, k, s, pad,
                                              output_padding=s - 1))
                if use_bn:
                    dec.append(nn.BatchNorm1d(nxt))
                dec.append(act())
                if dropout > 0:
                    dec.append(nn.Dropout(dropout))
                filters = nxt
            dec.append(nn.Conv1d(filters, 1, 1))
            self.decoder_conv = nn.Sequential(*dec)
            self.register_buffer("spec_mean", torch.zeros(length))
            self.register_buffer("spec_std", torch.ones(length))
            self.register_buffer("latent_mean", torch.zeros(latent))
            self.register_buffer("latent_cov_inv", torch.eye(latent))
            self.register_buffer("threshold", torch.tensor(1.5))
            self.register_buffer("threshold_q", torch.tensor(2.5))

        def encode(self, x):
            h = self.encoder_conv(x.unsqueeze(1)).flatten(1)
            h = self.fc(h)
            return self.fc_mu(h), self.fc_logvar(h)

        def decode(self, z):
            h = self.fc_dec(z).view(z.size(0), self._ch, self._len)
            xr = self.decoder_conv(h).squeeze(1)
            return xr[..., :length] if xr.shape[-1] >= length else xr

    return TorchVAE()


PARAMS = dict(length=100, latent=8, blocks=3, nf=16, k=9, stride=2,
              hidden=64)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = build_torch_vae(**PARAMS)
    tmodel.eval()
    # randomize BN running stats so stats mapping is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
        tmodel.spec_mean.normal_(0, 1)
        tmodel.spec_std.uniform_(0.5, 2.0)
    jmodel = ConvVAE1D(input_length=PARAMS["length"],
                       latent_dim=PARAMS["latent"],
                       conv_blocks=PARAMS["blocks"],
                       n_filters=PARAMS["nf"], kernel_size=PARAMS["k"],
                       stride=PARAMS["stride"], hidden_fc=PARAMS["hidden"])
    bundle = bundle_from_torch_state_dict(tmodel.state_dict(), jmodel)
    return tmodel, jmodel, bundle


def test_buffers_imported(pair):
    tmodel, _, bundle = pair
    np.testing.assert_allclose(np.asarray(bundle.spec_mean),
                               tmodel.spec_mean.numpy())
    np.testing.assert_allclose(np.asarray(bundle.spec_std),
                               tmodel.spec_std.numpy())
    assert float(bundle.threshold) == pytest.approx(1.5)
    assert float(bundle.threshold_q) == pytest.approx(2.5)
    assert float(bundle.threshold_f) == 0.0   # absent -> default


def test_encode_matches_torch(pair):
    tmodel, jmodel, bundle = pair
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (8, PARAMS["length"])).astype(np.float32)
    x_std = (x - tmodel.spec_mean.numpy()) / tmodel.spec_std.numpy()
    with torch.no_grad():
        mu_t, lv_t = tmodel.encode(torch.tensor(x_std))
    mu_j, lv_j = B.encode(jmodel, bundle, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_decode_matches_torch(pair):
    tmodel, jmodel, bundle = pair
    rng = np.random.default_rng(2)
    z = rng.normal(0, 1, (8, PARAMS["latent"])).astype(np.float32)
    with torch.no_grad():
        xr_t = tmodel.decode(torch.tensor(z)).numpy()
    xr_j_std = (np.asarray(B.decode(jmodel, bundle, jnp.asarray(z)))
                - np.asarray(bundle.spec_mean)) / np.asarray(bundle.spec_std)
    np.testing.assert_allclose(xr_j_std, xr_t, rtol=1e-3, atol=1e-4)


def test_roundtrip_decision_consistency(pair):
    """Imported bundles drive the decision layer end to end."""
    from ocm_tpu.models.vae_decision import decide_d2

    tmodel, jmodel, bundle = pair
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (16, PARAMS["length"])).astype(np.float32)
    dec = decide_d2(jmodel, bundle, jnp.asarray(x))
    assert dec.accept.shape == (16,)
    assert np.all(np.isfinite(np.asarray(dec.d2)))


def test_no_batchnorm_import():
    torch.manual_seed(1)
    tmodel = build_torch_vae(**{**PARAMS, "blocks": 2}, use_bn=False)
    tmodel.eval()
    jmodel = ConvVAE1D(input_length=PARAMS["length"],
                       latent_dim=PARAMS["latent"], conv_blocks=2,
                       n_filters=PARAMS["nf"], kernel_size=PARAMS["k"],
                       stride=PARAMS["stride"], hidden_fc=PARAMS["hidden"],
                       use_batchnorm=False)
    bundle = bundle_from_torch_state_dict(tmodel.state_dict(), jmodel)
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (4, PARAMS["length"])).astype(np.float32)
    with torch.no_grad():
        mu_t, _ = tmodel.encode(torch.tensor(x))
    mu_j, _ = B.encode(jmodel, bundle, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-4,
                               atol=1e-5)