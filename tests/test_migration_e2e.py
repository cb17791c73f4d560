"""End-to-end migration: a torch-TRAINED reference-format model imports
into ocm_tpu and the full decision stack runs on it with sane quality.

This is the user journey the framework promises: train (or re-use a
checkpoint) in the reference's torch stack, switch to ocm_tpu for
thresholding, decisions, serving — no retraining.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_import import build_torch_vae  # noqa: E402

from ocm_tpu.models import vae_decision as D  # noqa: E402
from ocm_tpu.models.torch_import import bundle_from_torch_state_dict  # noqa: E402
from ocm_tpu.models.vae import ConvVAE1D  # noqa: E402
from ocm_tpu.serving import VAEScorer  # noqa: E402

ARCH = dict(length=64, latent=6, blocks=2, nf=8, k=9, stride=2, hidden=32)


def make_data(rng, n, shift=0.0):
    t = np.linspace(0, 1, ARCH["length"])
    base = np.sin(2 * np.pi * (3 + shift) * t) + shift
    return (rng.normal(1, 0.06, (n, 1)) * base
            + rng.normal(0, 0.02, (n, ARCH["length"]))).astype(np.float32)


@pytest.fixture(scope="module")
def migrated():
    rng = np.random.default_rng(0)
    x_cal = make_data(rng, 128)
    mean = x_cal.mean(axis=0)
    std = x_cal.std(axis=0) + 1e-12

    torch.manual_seed(0)
    tm = build_torch_vae(**ARCH)
    with torch.no_grad():
        tm.spec_mean.copy_(torch.tensor(mean))
        tm.spec_std.copy_(torch.tensor(std))

    # short torch training in the reference's style (euclidean beta-VAE)
    opt = torch.optim.Adam(tm.parameters(), lr=2e-3)
    x_std_t = torch.tensor((x_cal - mean) / std)
    tm.train()
    for step in range(40):
        opt.zero_grad()
        mu, lv = tm.encode(x_std_t)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
        xr = tm.decode(z)
        recon = torch.mean((xr - x_std_t) ** 2)
        kl = -0.5 * torch.mean(torch.sum(1 + lv - mu**2 - lv.exp(), dim=1))
        (recon + 0.1 * kl).backward()
        opt.step()
    tm.eval()

    jm = ConvVAE1D(input_length=ARCH["length"], latent_dim=ARCH["latent"],
                   conv_blocks=ARCH["blocks"], n_filters=ARCH["nf"],
                   kernel_size=ARCH["k"], stride=ARCH["stride"],
                   hidden_fc=ARCH["hidden"])
    bundle = bundle_from_torch_state_dict(tm.state_dict(), jm)
    bundle = D.fit_thresholds(jm, bundle, x_cal, loss_type="euclidean")
    return tm, jm, bundle, x_cal


def test_imported_model_reconstructs(migrated):
    tm, jm, bundle, x_cal = migrated
    from ocm_tpu.models.bundle import reconstruct

    x_rec, mu = reconstruct(jm, bundle, jnp.asarray(x_cal[:16]))
    # trained model reconstructs far better than the spectral std scale
    err = float(jnp.mean((x_rec - jnp.asarray(x_cal[:16])) ** 2))
    base = float(jnp.mean(jnp.var(jnp.asarray(x_cal[:16]), axis=0)))
    assert err < base


def test_imported_model_decisions_separate(migrated):
    _, jm, bundle, x_cal = migrated
    rng = np.random.default_rng(5)
    x_out = make_data(rng, 64, shift=2.0)
    acc_in = D.decide_d2(jm, bundle, jnp.asarray(x_cal)).accept
    acc_out = D.decide_d2(jm, bundle, jnp.asarray(x_out)).accept
    assert float(jnp.mean(acc_in)) > 0.85
    assert float(jnp.mean(acc_out)) < 0.3


def test_imported_model_serves(migrated):
    _, jm, bundle, x_cal = migrated
    scorer = VAEScorer(jm, bundle, variant="d2", chunk_size=64)
    out = scorer.score(x_cal)
    assert out["accept"].shape == (128,)
    assert out["accept"].mean() > 0.85
