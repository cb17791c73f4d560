"""Serving layer: chunked resident scorers match one-shot scoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.simca import fit_simca, simca_decide
from ocm_tpu.serving import SIMCAScorer, VAEScorer

from oracles import make_class_spectra


@pytest.fixture(scope="module")
def simca_model():
    rng = np.random.default_rng(0)
    x = make_class_spectra(rng, 150, 48)
    return fit_simca(jnp.asarray(x, jnp.float32), 5), x


def test_simca_scorer_matches_oneshot(simca_model):
    model, _ = simca_model
    rng = np.random.default_rng(1)
    x = make_class_spectra(rng, 333, 48, center_shift=0.3).astype(np.float32)
    scorer = SIMCAScorer(model, chunk_size=128)
    out = scorer.score(x)
    acc_ref, dred_ref, t2_ref, q_ref = simca_decide(model, jnp.asarray(x))
    np.testing.assert_array_equal(out["accept"], np.asarray(acc_ref))
    np.testing.assert_allclose(out["dred"], np.asarray(dred_ref), rtol=1e-5)
    assert out["t2"].shape == (333,)


def test_simca_scorer_stream(simca_model):
    model, _ = simca_model
    rng = np.random.default_rng(2)
    frames = [make_class_spectra(rng, n, 48).astype(np.float32)
              for n in (64, 200, 17)]
    scorer = SIMCAScorer(model, chunk_size=100)
    results = list(scorer.score_stream(frames))
    assert [r["accept"].shape[0] for r in results] == [64, 200, 17]
    # streamed == concatenated
    whole = scorer.score(np.concatenate(frames))
    np.testing.assert_array_equal(
        np.concatenate([r["accept"] for r in results]), whole["accept"])


def test_simca_scorer_empty(simca_model):
    model, _ = simca_model
    assert SIMCAScorer(model).score(np.zeros((0, 48), np.float32)) == {}


def test_simca_scorer_sharded(simca_model):
    from ocm_tpu.parallel.mesh import make_mesh

    model, _ = simca_model
    mesh = make_mesh((8,), ("data",))
    rng = np.random.default_rng(3)
    x = make_class_spectra(rng, 300, 48).astype(np.float32)
    scorer = SIMCAScorer(model, chunk_size=160, mesh=mesh)  # 160 % 8 == 0
    out = scorer.score(x)
    acc_ref, _, _, _ = simca_decide(model, jnp.asarray(x))
    np.testing.assert_array_equal(out["accept"], np.asarray(acc_ref))


@pytest.fixture(scope="module")
def vae_bundle():
    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.models.vae_decision import fit_thresholds

    rng = np.random.default_rng(4)
    x = make_class_spectra(rng, 96, 48).astype(np.float32)
    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    r = train_vae(model, x, x[:24],
                  TrainConfig(epochs=4, batch_size=32,
                              loss_type="euclidean"), jax.random.key(0))
    bundle = fit_thresholds(model, r.bundle, x, loss_type="euclidean")
    return model, bundle, x


@pytest.mark.parametrize("variant", ["d2", "d2_q", "f", "full"])
def test_vae_scorer_variants(vae_bundle, variant):
    model, bundle, x = vae_bundle
    scorer = VAEScorer(model, bundle, variant=variant,
                       loss_type="euclidean", chunk_size=64)
    out = scorer.score(x)
    assert out["accept"].shape == (96,)
    assert np.isfinite(out["d2"]).all()


def test_vae_scorer_bad_variant(vae_bundle):
    model, bundle, _ = vae_bundle
    with pytest.raises(ValueError):
        VAEScorer(model, bundle, variant="nope")


def test_vae_scorer_from_torch_checkpoint(tmp_path, vae_bundle):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_torch_import import PARAMS, build_torch_vae

    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    tm = build_torch_vae(**PARAMS)
    tm.eval()
    path = str(tmp_path / "ref.pth")
    torch.save(tm.state_dict(), path)
    model = __import__("ocm_tpu.models.vae", fromlist=["ConvVAE1D"]).ConvVAE1D(
        input_length=PARAMS["length"], latent_dim=PARAMS["latent"],
        conv_blocks=PARAMS["blocks"], n_filters=PARAMS["nf"],
        kernel_size=PARAMS["k"], stride=PARAMS["stride"],
        hidden_fc=PARAMS["hidden"])
    scorer = VAEScorer.from_torch_checkpoint(path, model, chunk_size=32)
    rng = np.random.default_rng(5)
    out = scorer.score(rng.normal(0, 1, (50, PARAMS["length"]))
                       .astype(np.float32))
    assert out["accept"].shape == (50,)

def test_vae_scorer_vaesimca_variant(vae_bundle):
    from ocm_tpu.models.vaesimca import fit_vaesimca, predict_vaesimca

    model, bundle, x = vae_bundle
    vs = fit_vaesimca(model, bundle, x)
    scorer = VAEScorer(model, bundle, variant="vaesimca",
                       vaesimca_model=vs, chunk_size=40)
    out = scorer.score(x)
    acc_ref, t2_ref, q_ref = predict_vaesimca(model, bundle, vs,
                                              jnp.asarray(x))
    np.testing.assert_array_equal(out["accept"], np.asarray(acc_ref))
    np.testing.assert_allclose(out["t2"], np.asarray(t2_ref), rtol=1e-5)
    with pytest.raises(ValueError, match="vaesimca_model"):
        VAEScorer(model, bundle, variant="vaesimca")


def test_simca_scorer_bf16_store(simca_model):
    """store_dtype=bf16: host-side f32 centering + bf16 residual shipping;
    decisions match the f32 scorer (quantization error scales with the
    residual, not the common mode)."""
    model, x_new = simca_model
    s32 = SIMCAScorer(model, chunk_size=64)
    s16 = SIMCAScorer(model, chunk_size=64, store_dtype=jnp.bfloat16)
    r32 = s32.score(x_new)
    r16 = s16.score(x_new)
    assert np.mean(r32["accept"] == r16["accept"]) >= 0.995
    np.testing.assert_allclose(
        r16["dred"], r32["dred"],
        atol=3e-2 * float(np.abs(r32["dred"]).max()))
    with pytest.raises(ValueError, match="bfloat16"):
        SIMCAScorer(model, store_dtype=jnp.float16)


@pytest.fixture(scope="module")
def stacked_models():
    from ocm_tpu.models.simca import fit_classes

    rng = np.random.default_rng(7)
    blocks = [make_class_spectra(rng, 80, 48, center_shift=0.6 * c)
              for c in range(3)]
    x = np.concatenate(blocks).astype(np.float32)
    y = np.repeat(np.arange(3), 80)
    return fit_classes(x, y, [0, 1, 2], 5), x


def test_simca_scorer_multiclass_matches_single_scorers(stacked_models):
    """A stacked-model scorer screens all C classes from one HBM pass;
    decisions must equal C independent single-class scorers (the serving
    gap round-2 left: the fused path was unreachable through serving)."""
    models, x = stacked_models
    rng = np.random.default_rng(8)
    x_new = make_class_spectra(rng, 257, 48, center_shift=0.4
                               ).astype(np.float32)
    fused = SIMCAScorer(models, chunk_size=96)
    out = fused.score(x_new)
    assert out["accept"].shape == (257, 3)
    for c in range(3):
        single = SIMCAScorer(jax.tree.map(lambda a: a[c], models),
                             chunk_size=96)
        ref = single.score(x_new)
        np.testing.assert_array_equal(out["accept"][:, c], ref["accept"])
        np.testing.assert_allclose(out["dred"][:, c], ref["dred"],
                                   rtol=1e-4, atol=1e-5)


def test_simca_scorer_multiclass_raw_common_mode():
    """Raw-count-scale spectra (common mode ~1e4): the multi-class scorer
    must agree with per-class scorers even in f32 — the fused Q expansion
    carries ~eps*||x||^2 cancellation error, so the scorer ALWAYS centers
    chunks on the host against the shared mean-of-class-means offset
    (regression: the round-3 f32 path scored raw spectra uncentered and
    only ~73% of accept decisions matched)."""
    from ocm_tpu.models.simca import fit_classes

    rng = np.random.default_rng(11)
    blocks = [1e4 + 50.0 * make_class_spectra(rng, 90, 64,
                                              center_shift=0.5 * c)
              for c in range(3)]
    x = np.concatenate(blocks).astype(np.float32)
    y = np.repeat(np.arange(3), 90)
    models = fit_classes(x, y, [0, 1, 2], 4)
    x_new = (1e4 + 50.0 * make_class_spectra(rng, 211, 64, center_shift=0.3)
             ).astype(np.float32)
    fused = SIMCAScorer(models, chunk_size=96)
    out = fused.score(x_new)
    for c in range(3):
        single = SIMCAScorer(jax.tree.map(lambda a: a[c], models),
                             chunk_size=96)
        ref = single.score(x_new)
        assert np.mean(out["accept"][:, c] == ref["accept"]) >= 0.999
        np.testing.assert_allclose(out["q"][:, c], ref["q"], rtol=1e-3)


def test_simca_scorer_multiclass_bf16(stacked_models):
    """bf16 multi-class serving: one shared f32 offset, residuals shipped
    bf16, decisions match the f32 fused scorer."""
    models, x = stacked_models
    s32 = SIMCAScorer(models, chunk_size=96)
    s16 = SIMCAScorer(models, chunk_size=96, store_dtype=jnp.bfloat16)
    r32 = s32.score(x)
    r16 = s16.score(x)
    assert r16["accept"].shape == r32["accept"].shape == (x.shape[0], 3)
    assert np.mean(r32["accept"] == r16["accept"]) >= 0.995
    np.testing.assert_allclose(
        r16["dred"], r32["dred"],
        atol=3e-2 * float(np.abs(r32["dred"]).max()))


def test_simca_scorer_multiclass_stream(stacked_models):
    models, x = stacked_models
    scorer = SIMCAScorer(models, chunk_size=100)
    frames = [x[:64], x[64:190], x[190:]]
    results = list(scorer.score_stream(frames))
    whole = scorer.score(x)
    np.testing.assert_array_equal(
        np.concatenate([r["accept"] for r in results]), whole["accept"])


def test_vae_scorer_bf16_twin(vae_bundle):
    """compute_dtype=bf16 builds a reduced-precision serving twin over the
    same bundle; decision statistics stay full precision and decisions
    track the f32 scorer."""
    model, bundle, x = vae_bundle
    s32 = VAEScorer(model, bundle, variant="d2", chunk_size=64)
    s16 = VAEScorer(model, bundle, variant="d2", chunk_size=64,
                    compute_dtype=jnp.bfloat16)
    r32 = s32.score(x)
    r16 = s16.score(x)
    assert all(v.dtype.itemsize >= 4 for k, v in r16.items()
               if k != "accept")
    assert np.mean(r32["accept"] == r16["accept"]) >= 0.98


def test_simca_scorer_int8_store(simca_model):
    """store_dtype=int8: host centering + per-row int8 residual shipping
    (quarter the f32 bytes, exact integer accumulation); decisions match
    the f32 scorer."""
    model, x_new = simca_model
    s32 = SIMCAScorer(model, chunk_size=64)
    s8 = SIMCAScorer(model, chunk_size=64, store_dtype=jnp.int8)
    r32 = s32.score(x_new)
    r8 = s8.score(x_new)
    assert r8["accept"].shape == r32["accept"].shape
    assert np.mean(r32["accept"] == r8["accept"]) >= 0.995
    np.testing.assert_allclose(
        r8["dred"], r32["dred"],
        atol=3e-2 * float(np.abs(r32["dred"]).max()))


def test_simca_scorer_multiclass_int8(stacked_models):
    """int8 multi-class serving: one shared f32 offset, residuals shipped
    as (int8, scale, sumsq); decisions match the f32 fused scorer."""
    models, x = stacked_models
    s32 = SIMCAScorer(models, chunk_size=96)
    s8 = SIMCAScorer(models, chunk_size=96, store_dtype=jnp.int8)
    r32 = s32.score(x)
    r8 = s8.score(x)
    assert r8["accept"].shape == r32["accept"].shape == (x.shape[0], 3)
    assert np.mean(r32["accept"] == r8["accept"]) >= 0.995
    np.testing.assert_allclose(
        r8["dred"], r32["dred"],
        atol=3e-2 * float(np.abs(r32["dred"]).max()))


def test_simca_scorer_int8_raw_common_mode():
    """Raw-count-scale spectra (common mode ~1e4): int8 quantization acts
    on the HOST-CENTERED residual, so the common mode never reaches the
    quantizer — agreement with per-class f32 scorers stays at the
    centered level even at 1e4 counts."""
    from ocm_tpu.models.simca import fit_classes

    rng = np.random.default_rng(13)
    blocks = [1e4 + 50.0 * make_class_spectra(rng, 90, 64,
                                              center_shift=0.5 * c)
              for c in range(3)]
    x = np.concatenate(blocks).astype(np.float32)
    y = np.repeat(np.arange(3), 90)
    models = fit_classes(x, y, [0, 1, 2], 4)
    x_new = (1e4 + 50.0 * make_class_spectra(rng, 211, 64, center_shift=0.3)
             ).astype(np.float32)
    out = SIMCAScorer(models, chunk_size=96,
                      store_dtype=jnp.int8).score(x_new)
    for c in range(3):
        single = SIMCAScorer(jax.tree.map(lambda a: a[c], models),
                             chunk_size=96)
        ref = single.score(x_new)
        assert np.mean(out["accept"][:, c] == ref["accept"]) >= 0.99


def test_simca_scorer_multiclass_sharded_int8(stacked_models):
    """Mesh-sharded multi-class serving at every storage width (f32,
    bf16, int8): the jit's single batch sharding broadcasts over the
    2-arg (chunk, sumsq) and 3-arg (chunk, scale, sumsq) tuples."""
    from ocm_tpu.parallel.mesh import make_mesh

    models, x = stacked_models
    mesh = make_mesh((8,), ("data",))
    ref = SIMCAScorer(models, chunk_size=96).score(x)
    for dt in (None, jnp.bfloat16, jnp.int8):
        out = SIMCAScorer(models, chunk_size=96, mesh=mesh,
                          store_dtype=dt).score(x)
        assert np.mean(out["accept"] == ref["accept"]) >= 0.995


def test_prepare_score_prepared(stacked_models, vae_bundle):
    """prepare()/score_prepared(): ingest-once storage — repeated screens
    of the prepared chunks equal score(x) bit-for-bit on every
    store_dtype, and VAEScorer inherits the same contract."""
    models, x = stacked_models
    for dt in (None, jnp.bfloat16, jnp.int8):
        scorer = SIMCAScorer(models, chunk_size=96, store_dtype=dt)
        ref = scorer.score(x)
        prepared = scorer.prepare(x)
        for _ in range(2):
            out = scorer.score_prepared(prepared)
            np.testing.assert_array_equal(out["accept"], ref["accept"])
            np.testing.assert_array_equal(out["dred"], ref["dred"])
    assert scorer.score_prepared([]) == {}

    model, bundle, x_vae = vae_bundle
    vs = VAEScorer(model, bundle, variant="d2", chunk_size=64)
    ref = vs.score(x_vae)
    out = vs.score_prepared(vs.prepare(x_vae))
    np.testing.assert_array_equal(out["accept"], ref["accept"])


def test_score_prefetch_equivalence(stacked_models):
    """The prefetch pipeline (host prep of chunk i+1 overlapping chunk
    i's device fetch) is bit-equal to the sequential loop at every
    storage width and prefetch depth."""
    models, x = stacked_models
    for dt in (None, jnp.int8):
        scorer = SIMCAScorer(models, chunk_size=64, store_dtype=dt)
        ref = scorer.score(x, prefetch=0)
        for pf in (1, 3):
            out = scorer.score(x, prefetch=pf)
            np.testing.assert_array_equal(out["accept"], ref["accept"])
            np.testing.assert_array_equal(out["dred"], ref["dred"])


def test_rescreen_prepared_with_updated_models(stacked_models):
    """The ingest-once workflow across model updates: chunks prepared by
    one scorer re-screen against UPDATED models via center= pinning —
    equal to scoring the raw spectra with the new models directly."""
    from ocm_tpu.models.simca import fit_classes, fit_simca

    models, x = stacked_models
    rng = np.random.default_rng(17)
    x_new = make_class_spectra(rng, 190, 48, center_shift=0.3
                               ).astype(np.float32)
    # updated models: different k, refit on a perturbed calibration set
    x2 = x + rng.normal(0, 0.01, x.shape).astype(np.float32)
    y = np.repeat(np.arange(3), 80)
    updated = fit_classes(x2, y, [0, 1, 2], 7)

    for dt in (None, jnp.int8):
        old = SIMCAScorer(models, chunk_size=64, store_dtype=dt)
        prepared = old.prepare(x_new)
        renew = SIMCAScorer(updated, chunk_size=64, store_dtype=dt,
                            center=old.center)
        out = renew.score_prepared(prepared)
        ref = SIMCAScorer(updated, chunk_size=64, store_dtype=dt).score(x_new)
        # same storage width, different center -> near-equal decisions
        # (int8 re-quantizes vs a slightly different offset in ref)
        agree = np.mean(out["accept"] == ref["accept"])
        assert agree >= (1.0 if dt is None else 0.995), agree

    # single-class pinned center (f32 path, center != model mean)
    m0 = jax.tree.map(lambda a: a[0], models)
    mu = np.asarray(jnp.mean(models.mean, axis=0), np.float32)
    s_pin = SIMCAScorer(m0, chunk_size=64, center=mu)
    ref = SIMCAScorer(m0, chunk_size=64).score(x_new)
    out = s_pin.score(x_new)
    np.testing.assert_array_equal(out["accept"], ref["accept"])
    np.testing.assert_allclose(out["dred"], ref["dred"], rtol=1e-4,
                               atol=1e-5)


@pytest.fixture(scope="module")
def stacked_vae():
    """Three same-arch one-class VAEs (distinct params + calibration
    classes), their fitted bundles / VAESIMCA models, and a mixed test set."""
    from ocm_tpu.models.bundle import (new_bundle, spectral_stats,
                                       stack_bundles)
    from ocm_tpu.models.vae import ConvVAE1D, init_vae
    from ocm_tpu.models.vae_decision import fit_thresholds
    from ocm_tpu.models.vaesimca import fit_vaesimca

    model = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                      n_filters=8, hidden_fc=32)
    rng = np.random.default_rng(7)
    bundles, vs_models = [], []
    for c in range(3):
        x = make_class_spectra(rng, 80, 48,
                               center_shift=0.4 * c).astype(np.float32)
        params, bs = init_vae(model, jax.random.key(10 + c))
        sm, ss = spectral_stats(x)
        b = new_bundle(params, bs, jnp.asarray(sm), jnp.asarray(ss), 4)
        bundles.append(fit_thresholds(model, b, x, loss_type="euclidean"))
        vs_models.append(fit_vaesimca(model, bundles[-1], x))
    xt = np.concatenate([
        make_class_spectra(rng, 40, 48, center_shift=0.4 * c)
        for c in range(3)]).astype(np.float32)
    return (model, bundles, vs_models, stack_bundles(bundles),
            stack_bundles(vs_models), xt)


@pytest.mark.parametrize("variant", ["d2", "d2_q", "f", "full"])
def test_vae_scorer_multiclass_matches_single(stacked_vae, variant):
    """One stacked VAEScorer == C single scorers, per class, per variant
    (incl. the quirk-Q3 per-class batch statistics of variant 'f').

    Exact on CPU (tests run there).  On TPU variant 'f' is only
    boundary-tolerant (~1% flips at f32 rounding scale) because its
    criticals come from an SVD of the scored batch — any compilation-
    context difference shifts them; measured identically for the vmap
    and lax.map lowerings (docs/PARITY.md Q3 note)."""
    model, bundles, _, stacked, _, xt = stacked_vae
    out = VAEScorer(model, stacked, variant=variant,
                    loss_type="euclidean", chunk_size=64).score(xt)
    assert out["accept"].shape == (xt.shape[0], 3)
    for c, b in enumerate(bundles):
        ref = VAEScorer(model, b, variant=variant, loss_type="euclidean",
                        chunk_size=64).score(xt)
        np.testing.assert_array_equal(out["accept"][:, c], ref["accept"])
        for k in ref:
            if k != "accept":
                np.testing.assert_allclose(out[k][:, c], ref[k],
                                           rtol=2e-4, atol=1e-5)


def test_vae_scorer_multiclass_vaesimca(stacked_vae):
    model, bundles, vs_models, stacked, vs_stacked, xt = stacked_vae
    out = VAEScorer(model, stacked, variant="vaesimca",
                    vaesimca_model=vs_stacked, chunk_size=64).score(xt)
    assert out["accept"].shape == (xt.shape[0], 3)
    for c, (b, vm) in enumerate(zip(bundles, vs_models)):
        ref = VAEScorer(model, b, variant="vaesimca", vaesimca_model=vm,
                        chunk_size=64).score(xt)
        np.testing.assert_array_equal(out["accept"][:, c], ref["accept"])
        np.testing.assert_allclose(out["t2"][:, c], ref["t2"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(out["q"][:, c], ref["q"],
                                   rtol=2e-4, atol=1e-5)


def test_vae_scorer_multiclass_needs_stacked_vaesimca(stacked_vae):
    model, _, vs_models, stacked, _, _ = stacked_vae
    with pytest.raises(ValueError, match="stacked"):
        VAEScorer(model, stacked, variant="vaesimca",
                  vaesimca_model=vs_models[0])


def test_stack_bundles_validates():
    from ocm_tpu.models.bundle import new_bundle, stack_bundles
    from ocm_tpu.models.vae import ConvVAE1D, init_vae

    with pytest.raises(ValueError, match="at least one"):
        stack_bundles([])
    m4 = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=2,
                   n_filters=8, hidden_fc=32)
    m6 = ConvVAE1D(input_length=48, latent_dim=6, conv_blocks=2,
                   n_filters=8, hidden_fc=32)
    m3b = ConvVAE1D(input_length=48, latent_dim=4, conv_blocks=3,
                    n_filters=8, hidden_fc=32)
    sm = jnp.zeros(48, jnp.float32)
    ss = jnp.ones(48, jnp.float32)

    def bundle_of(model, latent_dim, seed):
        params, bs = init_vae(model, jax.random.key(seed))
        return new_bundle(params, bs, sm, ss, latent_dim)

    # same structure, different leaf shapes (latent size) -> shape error
    with pytest.raises(ValueError, match="shapes differ"):
        stack_bundles([bundle_of(m4, 4, 0), bundle_of(m6, 6, 1)])
    # different depth -> structure error
    with pytest.raises(ValueError, match="structure"):
        stack_bundles([bundle_of(m4, 4, 0), bundle_of(m3b, 4, 1)])


def test_vae_scorer_shape1_threshold_is_single_class(vae_bundle):
    """A (1,)-shaped threshold buffer (hand-built checkpoint) must not be
    mistaken for a stacked class axis — detection keys on latent_mean."""
    model, bundle, x = vae_bundle
    b1 = bundle._replace(threshold=jnp.reshape(bundle.threshold, (1,)))
    out = VAEScorer(model, b1, variant="d2", chunk_size=64).score(x)
    ref = VAEScorer(model, bundle, variant="d2", chunk_size=64).score(x)
    np.testing.assert_array_equal(out["accept"], ref["accept"])


def test_vae_scorer_inconsistent_stack_raises(stacked_vae):
    model, _, _, stacked, _, _ = stacked_vae
    bad = stacked._replace(threshold=stacked.threshold[:2])
    with pytest.raises(ValueError, match="inconsistent"):
        VAEScorer(model, bad, variant="d2")


# --- camera-native raw ingest (preprocess_fn) ---------------------------


@pytest.fixture(scope="module")
def raw_ingest_setup():
    """Models fit on preprocessed COUNTS (uint16 camera scale), plus the
    raw test pixels, for the device-side-ingest path."""
    from ocm_tpu.models.simca import fit_classes
    from ocm_tpu.ops.preprocess import snv_savgol

    prep = lambda a: snv_savgol(a, 5, 2, 1)  # noqa: E731
    rng = np.random.default_rng(11)
    blocks = [make_class_spectra(rng, 80, 48, center_shift=0.6 * c)
              for c in range(3)]
    counts = np.round(np.clip(np.concatenate(blocks), 0, None) * 1e4)
    counts_u16 = counts.astype(np.uint16)
    y = np.repeat(np.arange(3), 80)
    xp = np.asarray(prep(jnp.asarray(counts, jnp.float32)))
    models = fit_classes(xp, y, [0, 1, 2], 5)
    return models, counts_u16, prep


def test_simca_scorer_raw_ingest_multiclass(raw_ingest_setup):
    """Raw device-side ingest (preprocess -> center -> decide fused in one
    program, chunk ships at uint16) decides EXACTLY like host-prepping the
    same f32 values and scoring through the standard multi-class path —
    same arithmetic, different placement."""
    models, counts_u16, prep = raw_ingest_setup
    host = SIMCAScorer(models, chunk_size=64)
    x_prep = np.asarray(prep(jnp.asarray(counts_u16, jnp.float32)))
    ref = host.score(x_prep)
    raw = SIMCAScorer(models, chunk_size=64, preprocess_fn=prep)
    out = raw.score(counts_u16)
    np.testing.assert_array_equal(out["accept"], ref["accept"])
    # the raw path's ||xc||^2 reduces on DEVICE (the host path ships a
    # numpy sum): reduction order differs, and the fused Q expansion
    # amplifies it near cancellation — statistics agree to ~1e-3
    np.testing.assert_allclose(out["dred"], ref["dred"], rtol=2e-3)
    assert out["accept"].shape == (240, 3)


def test_simca_scorer_raw_ingest_single_class(raw_ingest_setup):
    from ocm_tpu.models.simca import fit_simca
    from ocm_tpu.models.simca import simca_decide

    models, counts_u16, prep = raw_ingest_setup
    x_prep = jnp.asarray(np.asarray(
        prep(jnp.asarray(counts_u16, jnp.float32))))
    model = fit_simca(x_prep[:80], 5)
    raw = SIMCAScorer(model, chunk_size=64, preprocess_fn=prep)
    out = raw.score(counts_u16)
    acc_ref, dred_ref, _, _ = simca_decide(model, x_prep)
    np.testing.assert_array_equal(out["accept"], np.asarray(acc_ref))
    np.testing.assert_allclose(out["dred"], np.asarray(dred_ref),
                               rtol=1e-5)


def test_simca_scorer_raw_ingest_prefetch_and_stream(raw_ingest_setup):
    models, counts_u16, prep = raw_ingest_setup
    raw = SIMCAScorer(models, chunk_size=50, preprocess_fn=prep)
    seq = raw.score(counts_u16, prefetch=0)
    pipe = raw.score(counts_u16, prefetch=2)
    np.testing.assert_array_equal(seq["accept"], pipe["accept"])
    frames = list(raw.score_stream([counts_u16[:70], counts_u16[70:]]))
    np.testing.assert_array_equal(
        np.concatenate([f["accept"] for f in frames]), seq["accept"])


def test_simca_scorer_raw_ingest_validation(raw_ingest_setup, simca_model):
    models, _, prep = raw_ingest_setup
    model, _ = simca_model
    with pytest.raises(ValueError, match="mutually exclusive"):
        SIMCAScorer(models, preprocess_fn=prep, store_dtype=jnp.int8)
    with pytest.raises(ValueError, match="mutually exclusive"):
        SIMCAScorer(models, preprocess_fn=prep, store_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="re-screening"):
        SIMCAScorer(model, preprocess_fn=prep,
                    center=np.zeros(48, np.float32))


# --- deployment-pinned variant 'f' (quirk Q3 stabilization) -------------


def test_vae_scorer_pinned_f_matches_unpinned_decisions(stacked_vae):
    """pin_f_stats moves the quirk-Q3 batch statistics to host float64;
    on CPU (exact lowering) the pinned decisions must equal the compiled
    in-program ones, including on a ragged padded tail chunk."""
    model, bundles, _, _, _, xt = stacked_vae
    kw = dict(variant="f", loss_type="euclidean", chunk_size=50)  # ragged
    ref = VAEScorer(model, bundles[0], **kw).score(xt)
    out = VAEScorer(model, bundles[0], pin_f_stats=True, **kw).score(xt)
    np.testing.assert_array_equal(out["accept"], ref["accept"])
    # values differ at f64-vs-f32 statistic precision, not decisions
    np.testing.assert_allclose(out["d2"], ref["d2"], rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(out["q"], ref["q"], rtol=5e-3, atol=1e-6)


def test_vae_scorer_pinned_f_stable_across_compilations(stacked_vae):
    """THE deployment property (round-4 verdict item 6): variant-'f'
    decisions in pinned mode are identical whether the scorer compiles
    as a stacked multi-class program or as a single-class program.
    The statistics are a pure host-f64 function of the network outputs;
    what remains between lowerings is the network forward's own f32
    rounding (~1e-5 relative — vs the in-program statistics' ~1%
    decision flips on TPU, PARITY.md Q3)."""
    model, bundles, _, stacked, _, xt = stacked_vae
    kw = dict(variant="f", loss_type="euclidean", chunk_size=64,
              pin_f_stats=True)
    out = VAEScorer(model, stacked, **kw).score(xt)          # lax.map body
    assert out["accept"].shape == (120, 3)
    for c, b in enumerate(bundles):
        single = VAEScorer(model, b, **kw).score(xt)         # dense program
        np.testing.assert_array_equal(out["accept"][:, c], single["accept"])
        np.testing.assert_allclose(out["d2"][:, c], single["d2"],
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(out["q"][:, c], single["q"],
                                   rtol=1e-4, atol=1e-7)


def test_vae_scorer_pinned_f_validation(stacked_vae):
    model, bundles, _, _, _, _ = stacked_vae
    with pytest.raises(ValueError, match="pin_f_stats"):
        VAEScorer(model, bundles[0], variant="d2", pin_f_stats=True)
