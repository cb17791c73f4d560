"""ConvVAE1D architecture/loss parity and end-to-end training tests.

Architecture parity is asserted against ad-hoc torch modules built from the
same hyperparameters (length arithmetic of Conv1d / ConvTranspose1d), and
losses against torch.nn.functional — the reference's substrate — so the JAX
model provably has the reference's shape/loss semantics without sharing any
code with it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models import bundle as B
from ocm_tpu.models import vae as V
from ocm_tpu.models import vae_decision as D
from ocm_tpu.models import vaesimca as VS
from ocm_tpu.models.trainer import TrainConfig, torch_adam, train_vae

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


SMALL = dict(input_length=64, latent_dim=4, conv_blocks=2, n_filters=8,
             kernel_size=9, stride=2, hidden_fc=32)


def small_model(**over):
    kw = {**SMALL, **over}
    return V.ConvVAE1D(**kw)


def make_data(rng, n=96, length=64, shift=0.0):
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * (3 + shift) * t) + shift
    amp = rng.normal(1.0, 0.08, size=(n, 1))
    return (amp * base[None, :]
            + rng.normal(0, 0.02, size=(n, length))).astype(np.float32)


# ---------------------------------------------------------------------------
# Shape arithmetic parity with torch conv stacks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("length,blocks,k,stride", [
    (64, 2, 9, 2), (100, 3, 9, 2), (501, 3, 7, 2), (128, 3, 5, 3),
    (97, 2, 11, 2),
])
def test_encoder_length_matches_torch(length, blocks, k, stride):
    pad = k // 2
    x = torch.zeros(1, 1, length)
    in_ch, filters = 1, 8
    for b in range(blocks):
        s = 1 if b == 0 else stride
        x = torch.nn.Conv1d(in_ch, filters, k, stride=s, padding=pad)(x)
        in_ch, filters = filters, min(filters * 2, 1024)
    ch, out_len = V.encoder_shapes(length, blocks, 8, k, stride)
    assert (ch, out_len) == (x.shape[1], x.shape[2])


@pytest.mark.parametrize("length,blocks,k,stride", [
    (64, 2, 9, 2), (100, 3, 9, 2), (501, 3, 7, 2), (97, 2, 11, 2),
])
def test_decoder_output_padded_to_input_length(length, blocks, k, stride):
    model = small_model(input_length=length, conv_blocks=blocks,
                        kernel_size=k, stride=stride)
    params, bs = V.init_vae(model, jax.random.key(0))
    z = jnp.zeros((3, model.latent_dim))
    variables = {"params": params}
    if bs:
        variables["batch_stats"] = bs
    x_rec = model.apply(variables, z, train=False, method=V.ConvVAE1D.decode)
    assert x_rec.shape == (3, length)


def test_transpose_conv_length_matches_torch():
    """Our explicit-padding ConvTranspose produces torch's pre-crop lengths
    (vae_model.py:64-81 stack)."""
    k, stride, pad = 9, 2, 4
    for in_len in (13, 16, 25):
        x = torch.zeros(1, 4, in_len)
        y = torch.nn.ConvTranspose1d(4, 4, k, stride=stride, padding=pad,
                                     output_padding=stride - 1)(x)
        assert y.shape[2] == in_len * stride
        y1 = torch.nn.ConvTranspose1d(4, 4, k, stride=1, padding=pad,
                                      output_padding=0)(x)
        assert y1.shape[2] == in_len


def test_param_count_matches_torch_reference_arch():
    """Parameter count of the JAX model equals the torch architecture built
    from the same hyperparameters (vae_model.py:6-97)."""
    length, latent, blocks, nf, k, s, hid = 100, 8, 3, 16, 9, 2, 64
    pad = k // 2

    layers = []
    in_ch, filters, out_len = 1, nf, length
    for b in range(blocks):
        sb = 1 if b == 0 else s
        layers.append(torch.nn.Conv1d(in_ch, filters, k, stride=sb,
                                      padding=pad))
        layers.append(torch.nn.BatchNorm1d(filters))
        in_ch, filters = filters, min(filters * 2, 1024)
        out_len = (out_len + 2 * pad - (k - 1) - 1) // sb + 1
    fc_in = in_ch * out_len
    layers += [torch.nn.Linear(fc_in, hid), torch.nn.Linear(hid, latent),
               torch.nn.Linear(hid, latent), torch.nn.Linear(latent, hid),
               torch.nn.Linear(hid, fc_in)]
    dec_f = in_ch
    for b in range(blocks):
        nxt = max(dec_f // 2, nf)
        sb = s if b < blocks - 1 else 1
        layers.append(torch.nn.ConvTranspose1d(dec_f, nxt, k, stride=sb,
                                               padding=pad,
                                               output_padding=sb - 1))
        layers.append(torch.nn.BatchNorm1d(nxt))
        dec_f = nxt
    layers.append(torch.nn.Conv1d(dec_f, 1, 1))
    n_torch = sum(p.numel() for m in layers for p in m.parameters())
    # torch BatchNorm1d counts only affine params; running stats are buffers

    model = V.ConvVAE1D(input_length=length, latent_dim=latent,
                        conv_blocks=blocks, n_filters=nf, kernel_size=k,
                        stride=s, hidden_fc=hid)
    params, batch_stats = V.init_vae(model, jax.random.key(0))
    n_jax = sum(x.size for x in jax.tree.leaves(params))
    assert n_jax == n_torch


# ---------------------------------------------------------------------------
# Loss parity with torch.nn.functional
# ---------------------------------------------------------------------------

@pytest.fixture
def loss_inputs(rng):
    x = rng.normal(0, 1, (16, 40)).astype(np.float64)
    xr = rng.normal(0, 1, (16, 40)).astype(np.float64)
    mu = rng.normal(0, 1, (16, 6)).astype(np.float64)
    logvar = rng.normal(0, 0.3, (16, 6)).astype(np.float64)
    return x, xr, mu, logvar


def _torch_kl(mu, logvar):
    mu, logvar = torch.tensor(mu), torch.tensor(logvar)
    return (-0.5 * torch.mean(
        torch.sum(1 + logvar - mu.pow(2) - logvar.exp(), dim=1))).item()


def test_kl_matches_torch(loss_inputs):
    _, _, mu, logvar = loss_inputs
    np.testing.assert_allclose(V.kl_divergence(jnp.asarray(mu),
                                               jnp.asarray(logvar)),
                               _torch_kl(mu, logvar), rtol=1e-10)


def test_cosine_loss_matches_torch(loss_inputs):
    x, xr, mu, logvar = loss_inputs
    xt, xrt = torch.tensor(x), torch.tensor(xr)
    xn = F.normalize(xt, p=2, dim=1)
    rn = F.normalize(xrt, p=2, dim=1)
    cos = torch.clamp(torch.sum(xn * rn, dim=1), -1 + 1e-8, 1 - 1e-8)
    expected = torch.mean(torch.sqrt(2 * (1 - cos))).item()
    got = V.cosine_recon_loss(jnp.asarray(x), jnp.asarray(xr))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_bce_logits_loss_matches_torch(loss_inputs):
    x, xr, _, _ = loss_inputs
    xt, xrt = torch.tensor(x), torch.tensor(xr)
    x_min = xt.min(dim=1, keepdim=True)[0]
    x_max = xt.max(dim=1, keepdim=True)[0]
    tgt = ((xt - x_min) / (x_max - x_min + 1e-8)).clamp(0, 1)
    expected = F.binary_cross_entropy_with_logits(xrt, tgt,
                                                  reduction="mean").item()
    got = V.bce_logits_recon_loss(jnp.asarray(x), jnp.asarray(xr))
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_euclidean_loss_matches_torch(loss_inputs):
    x, xr, _, _ = loss_inputs
    expected = F.mse_loss(torch.tensor(xr), torch.tensor(x),
                          reduction="mean").item()
    got = V.euclidean_recon_loss(jnp.asarray(x), jnp.asarray(xr))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_bce_prob_loss_matches_torch(rng):
    # reconstruction within the (min, max) band so no clipping differences
    x = rng.uniform(0, 1, (12, 30))
    xr = 0.2 + 0.6 * rng.uniform(0, 1, (12, 30))
    xr = x * 0.5 + xr * 0.5
    xt, xrt = torch.tensor(x), torch.tensor(xr)
    x_min = xt.min(dim=1, keepdim=True)[0]
    x_max = xt.max(dim=1, keepdim=True)[0]
    tgt = ((xt - x_min) / (x_max - x_min + 1e-8)).clamp(0, 1)
    rec = ((xrt - x_min) / (x_max - x_min + 1e-8)).clamp(0, 1)
    expected = F.binary_cross_entropy(rec, tgt, reduction="mean").item()
    got = V.bce_prob_recon_loss(jnp.asarray(x), jnp.asarray(xr))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_beta_vae_loss_combines(loss_inputs):
    x, xr, mu, logvar = loss_inputs
    total, recon, kl = V.beta_vae_loss(jnp.asarray(x), jnp.asarray(xr),
                                       jnp.asarray(mu), jnp.asarray(logvar),
                                       beta=2.5, loss_type="euclidean")
    np.testing.assert_allclose(total, recon + 2.5 * kl, rtol=1e-12)
    with pytest.raises(ValueError):
        V.beta_vae_loss(x, xr, mu, logvar, loss_type="nope")


def test_torch_adam_matches_torch_on_quadratic():
    """torch_adam == torch.optim.Adam(weight_decay=...) trajectories."""
    w0 = np.array([1.0, -2.0, 3.0])
    lr, wd = 1e-2, 0.1

    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for _ in range(25):
        opt.zero_grad()
        loss = (wt ** 2).sum()
        loss.backward()
        opt.step()

    tx = torch_adam(lr, wd)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    grad_fn = jax.grad(lambda w: jnp.sum(w ** 2))
    for _ in range(25):
        updates, state = tx.update(grad_fn(wj), state, wj)
        wj = wj + updates
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end training + decisions
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    x_cal = make_data(rng, n=96)
    x_val = make_data(rng, n=32)
    model = small_model()
    cfg = TrainConfig(epochs=12, batch_size=32, lr=2e-3, loss_type="euclidean")
    result = train_vae(model, x_cal, x_val, cfg, jax.random.key(1))
    bundle = D.fit_thresholds(model, result.bundle, x_cal,
                              loss_type="euclidean")
    return model, bundle, result, x_cal


def test_training_reduces_loss(trained):
    _, _, result, _ = trained
    tl = np.asarray(result.train_losses)
    assert tl[-1] < tl[0]
    assert np.all(np.isfinite(tl))
    assert 0 <= int(result.best_epoch) < 12


def test_thresholds_fitted(trained):
    _, bundle, _, _ = trained
    assert float(bundle.threshold) > 0
    assert float(bundle.threshold_q) > 0
    assert float(bundle.threshold_f) > 0
    assert np.all(np.isfinite(np.asarray(bundle.latent_cov_inv)))


def test_d2_decision_separates_anomalies(trained):
    model, bundle, _, x_cal = trained
    rng = np.random.default_rng(7)
    x_out = make_data(rng, n=64, shift=2.0)   # different class entirely
    acc_in = D.decide_d2(model, bundle, x_cal).accept
    acc_out = D.decide_d2(model, bundle, x_out).accept
    assert float(jnp.mean(acc_in)) > 0.85     # ~95th pct threshold
    assert float(jnp.mean(acc_out)) < 0.5


def test_d2q_and_f_decisions_run(trained):
    model, bundle, _, x_cal = trained
    d3 = D.decide_d2_q(model, bundle, x_cal, loss_type="euclidean")
    assert d3.accept.shape == (x_cal.shape[0],)
    d4 = D.decide_f(model, bundle, x_cal)
    assert float(jnp.mean(d4.accept)) > 0.5
    d4c = D.decide_full_distance(model, bundle, x_cal)
    assert d4c.accept.shape == (x_cal.shape[0],)


def test_qhf_calibrated_consistency(trained):
    """Frozen-calibration scoring equals batch scoring ON the calibration
    set itself (where the quirk Q3 stats coincide)."""
    from ocm_tpu.stats.qhf import qhf_batch, qhf_calibrated, qhf_fit

    model, bundle, _, x_cal = trained
    x = jnp.asarray(x_cal)
    mu, _ = B.encode(model, bundle, x)
    x_rec = B.decode(model, bundle, mu)
    xs, rs = B.standardize(bundle, x), B.standardize(bundle, x_rec)
    batch = qhf_batch(xs, rs, mu)
    calib = qhf_fit(xs, rs, mu)
    frozen = qhf_calibrated(xs, rs, mu, calib)
    np.testing.assert_allclose(np.asarray(batch.f), np.asarray(frozen.f),
                               rtol=1e-4)


def test_vaesimca_fit_predict(trained):
    model, bundle, _, x_cal = trained
    rng = np.random.default_rng(3)
    x_out = make_data(rng, n=48, shift=2.0)
    for dt in ("sim", "alt", "ci", "dd"):
        t2lim = "chi2pom" if dt == "dd" else "Fdist"
        qlim = "chi2pom" if dt == "dd" else "jm"
        vs = VS.VAESIMCA(model, bundle, type=dt, t2lim=t2lim, qlim=qlim)
        vs.fit_thresholds(x_cal)
        acc, t2, q = vs.predict(x_cal)
        assert acc.shape == (x_cal.shape[0],)
        assert np.all(np.isfinite(np.asarray(t2)))
        assert np.all(np.isfinite(np.asarray(q)))
    vs = VS.VAESIMCA(model, bundle, type="alt")
    vs.fit_thresholds(x_cal)
    acc_in, _, _ = vs.predict(x_cal)
    acc_out, _, _ = vs.predict(x_out)
    assert float(np.mean(np.asarray(acc_in))) > float(
        np.mean(np.asarray(acc_out)))


def test_vaesimca_unfitted_raises(trained):
    model, bundle, _, x_cal = trained
    with pytest.raises(RuntimeError):
        VS.VAESIMCA(model, bundle).predict(x_cal)


def test_bundle_save_load_roundtrip(tmp_path, trained):
    model, bundle, _, x_cal = trained
    path = str(tmp_path / "model.msgpack")
    B.save_bundle(path, bundle)
    params, bs = V.init_vae(model, jax.random.key(9))
    mean, std = B.spectral_stats(x_cal)
    template = B.new_bundle(params, bs, jnp.asarray(mean, jnp.float32),
                            jnp.asarray(std, jnp.float32), model.latent_dim)
    loaded = B.load_bundle(path, template)
    d_orig = D.decide_d2(model, bundle, x_cal)
    d_load = D.decide_d2(model, loaded, x_cal)
    np.testing.assert_allclose(np.asarray(d_orig.d2), np.asarray(d_load.d2),
                               rtol=1e-6)


def test_batchnorm_and_dropout_variants_train():
    rng = np.random.default_rng(5)
    x_cal, x_val = make_data(rng, 64), make_data(rng, 32)
    model = small_model(dropout=0.1, use_batchnorm=True, activation="gelu",
                        init_nonlinearity="relu")
    cfg = TrainConfig(epochs=3, batch_size=32, lr=1e-3, weight_decay=1e-4,
                      loss_type="cosine")
    result = train_vae(model, x_cal, x_val, cfg, jax.random.key(2))
    assert np.all(np.isfinite(np.asarray(result.train_losses)))


def test_no_batchnorm_variant_trains():
    rng = np.random.default_rng(6)
    x_cal, x_val = make_data(rng, 64), make_data(rng, 32)
    model = small_model(use_batchnorm=False)
    cfg = TrainConfig(epochs=3, batch_size=64, lr=1e-3, loss_type="bce")
    result = train_vae(model, x_cal, x_val, cfg, jax.random.key(3))
    assert np.all(np.isfinite(np.asarray(result.train_losses)))


def test_bf16_mixed_precision_training():
    """ConvVAE1D(dtype=bf16) under the canonical trainer: network compute
    in bf16 (MXU-native tier), but f32 master params/Adam moments and —
    via the trainer's output upcast — f32 losses and KL reductions.
    The trajectory must stay finite, reduce the loss, and land in the
    same neighborhood as the f32 run."""
    rng = np.random.default_rng(13)
    x_cal, x_val = make_data(rng, 96), make_data(rng, 32)
    cfg = TrainConfig(epochs=10, batch_size=32, lr=2e-3,
                      loss_type="euclidean")
    r32 = train_vae(small_model(), x_cal, x_val, cfg, jax.random.key(3))
    r16 = train_vae(small_model(dtype=jnp.bfloat16), x_cal, x_val, cfg,
                    jax.random.key(3))
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(r16.final_params))
    assert r16.train_losses.dtype == jnp.float32
    tl = np.asarray(r16.train_losses)
    assert np.all(np.isfinite(tl)) and tl[-1] < tl[0]
    v32 = float(np.min(np.asarray(r32.val_losses)))
    v16 = float(np.min(np.asarray(r16.val_losses)))
    assert abs(v16 - v32) < 0.15 * abs(v32) + 1e-3


def test_fit_thresholds_on_heldout(trained):
    """x_threshold: latent stats from calibration, percentiles from held-out
    spectra — thresholds widen to cover the held-out distribution."""
    model, bundle, _, x_cal = trained
    rng = np.random.default_rng(11)
    # held-out same-class spectra, slightly shifted amplitude regime
    x_held = make_data(rng, n=48) * 1.05
    b_cal = D.fit_thresholds(model, bundle, x_cal, loss_type="euclidean")
    b_held = D.fit_thresholds(model, bundle, x_cal, loss_type="euclidean",
                              x_threshold=x_held)
    # latent stats identical (both from x_cal)
    np.testing.assert_allclose(np.asarray(b_cal.latent_mean),
                               np.asarray(b_held.latent_mean), rtol=1e-6)
    # ~95% of the held-out set falls under its own thresholds
    dec = D.decide_d2_q(model, b_held, jnp.asarray(x_held),
                        loss_type="euclidean")
    assert float(jnp.mean(dec.accept)) > 0.85
