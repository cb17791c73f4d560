"""SIMCA model core vs the reference-mirroring oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocm_tpu.models import simca
from ocm_tpu.ops.linalg import pca_fit

from oracles import SimcaOracle, make_class_spectra


@pytest.fixture
def class_data(rng):
    x_in = make_class_spectra(rng, 150, 80)
    x_out = make_class_spectra(rng, 60, 80, center_shift=0.8)
    return x_in, x_out


def test_pca_fit_matches_sklearn(class_data):
    from sklearn.decomposition import PCA

    x, _ = class_data
    ref = PCA(n_components=None, svd_solver="full")
    t_ref = ref.fit_transform(x)
    fit = pca_fit(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fit.mean), ref.mean_, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fit.eigenvalues),
                               ref.explained_variance_, rtol=1e-8, atol=1e-12)
    # signs must match too (svd_flip convention)
    k = 10
    np.testing.assert_allclose(np.asarray(fit.scores[:, :k]), t_ref[:, :k],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fit.components[:k]),
                               ref.components_[:k], rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("dtype_,t2m,qm", [
    ("alt", "Fdist", "jm"),
    ("sim", "perc", "perc"),
    ("ci", "chi2", "chi2box"),
    ("dd", "chi2pom", "chi2pom"),
    ("alt", "Fdistrig", "chi2pom"),
])
def test_fit_and_decide_match_oracle(class_data, dtype_, t2m, qm):
    x_in, x_out = class_data
    k = 8
    oracle = SimcaOracle(dtype_, t2m, qm).fit(x_in, k)
    model = simca.fit_simca(jnp.asarray(x_in), k, dtype_, t2m, qm)

    np.testing.assert_allclose(np.asarray(model.t2_train), oracle.t2,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(model.q_train), oracle.q,
                               rtol=1e-6, atol=1e-10)
    assert float(model.t2_res.limit) == pytest.approx(oracle.t2_limit, rel=1e-7)
    assert float(model.q_res.limit) == pytest.approx(oracle.q_limit, rel=1e-7)
    assert float(model.d_limit) == pytest.approx(oracle.d_limit, rel=1e-7)

    x_test = np.vstack([x_in[:40], x_out])
    want_acc, want_dred, want_t2, want_q = oracle.decide(x_test)
    accept, dred, t2, q = simca.simca_decide(model, jnp.asarray(x_test), dtype_)
    np.testing.assert_allclose(np.asarray(t2), want_t2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q), want_q, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dred), want_dred, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(accept), want_acc)


def test_fit_is_jittable(class_data):
    x_in, _ = class_data
    jitted = jax.jit(lambda x: simca.fit_simca(x, 5))
    model = jitted(jnp.asarray(x_in))
    assert float(model.d_limit) == pytest.approx(np.sqrt(2))


def test_masked_fit_matches_dense(class_data, rng):
    x_in, x_out = class_data
    n = x_in.shape[0]
    pad = 40
    x_pad = np.vstack([x_in, np.repeat(x_in[:1], pad, axis=0)])
    w = np.concatenate([np.ones(n), np.zeros(pad)])

    for t2m, qm in [("Fdist", "jm"), ("perc", "perc"), ("chi2pom", "chi2pom")]:
        dense = simca.fit_simca(jnp.asarray(x_in), 6, "alt", t2m, qm)
        masked = simca.fit_simca_masked(jnp.asarray(x_pad), jnp.asarray(w), 6,
                                        "alt", t2m, qm, max_rank=min(n, 80))
        assert float(masked.t2_res.limit) == pytest.approx(
            float(dense.t2_res.limit), rel=1e-6)
        assert float(masked.q_res.limit) == pytest.approx(
            float(dense.q_res.limit), rel=1e-6)
        a_d, *_ = simca.simca_decide(dense, jnp.asarray(x_out))
        a_m, *_ = simca.simca_decide(masked, jnp.asarray(x_out))
        np.testing.assert_array_equal(np.asarray(a_d), np.asarray(a_m))


def test_wrapper_multiclass_matches_oracle(rng):
    xs, ys = [], []
    for c, shift in enumerate([0.0, 0.5, 1.1]):
        xs.append(make_class_spectra(rng, 100, 60, center_shift=shift))
        ys.append(np.full(100, c))
    x = np.vstack(xs)
    y = np.concatenate(ys)

    est = simca.SIMCA(n_components=6, type="alt", t2lim="Fdist", qlim="jm",
                      verbose=False)
    est.fit(x, y)
    pred = est.predict(x, y_true=y)
    assert pred.shape == (300, 3)

    for c in range(3):
        oracle = SimcaOracle("alt", "Fdist", "jm").fit(xs[c], 6)
        want, *_ = oracle.decide(x)
        np.testing.assert_array_equal(pred[:, c].astype(bool), want)
        m = est.metrics[c]
        # oracle conformity metrics (utils/SIMCA.py:238-266)
        tc = (y == c).astype(int)
        tp = np.sum((pred[:, c] == 1) & (tc == 1))
        fn = np.sum((pred[:, c] == 0) & (tc == 1))
        assert m["sensitivity"] == pytest.approx(tp / (tp + fn) * 100)


def test_wrapper_transform_quirk_q1(rng):
    """transform returns only the LAST class's tuple (utils/SIMCA.py:101-117)."""
    x0 = make_class_spectra(rng, 80, 50)
    x1 = make_class_spectra(rng, 80, 50, center_shift=0.7)
    x = np.vstack([x0, x1])
    y = np.repeat([0, 1], 80)
    est = simca.SIMCA(n_components=4, verbose=False).fit(x, y)
    t2, t2red, q, qred = est.transform(x)
    oracle = SimcaOracle("alt", "Fdist", "jm").fit(x1, 4)
    want_t2, want_q = oracle.scores(x)
    np.testing.assert_allclose(np.asarray(t2), want_t2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qred), want_q / oracle.q_limit,
                               rtol=1e-6)


def test_wrapper_dd_coercion_and_shared_state(rng, capsys):
    """'dd' forces chi2pom limits (utils/SIMCA.py:42-48) and shares the
    last class's dofs across classes (quirk Q7)."""
    x0 = make_class_spectra(rng, 90, 50)
    x1 = make_class_spectra(rng, 90, 50, center_shift=0.6)
    x = np.vstack([x0, x1])
    y = np.repeat([0, 1], 90)
    est = simca.SIMCA(n_components=4, type="dd", t2lim="Fdist", qlim="jm",
                      verbose=False).fit(x, y)
    out = capsys.readouterr().out
    assert "t2lim set as chi2pom" in out and "qlim set as chi2pom" in out
    assert est.t2lim == "chi2pom" and est.qlim == "chi2pom"

    pred_compat = est.predict(x)
    # compat (the reference's exact mixed state, utils/SIMCA.py:141-144):
    # class-0 reduced distances use class-1's dofs/scales, but the
    # threshold stays class-0's OWN D_limit
    o1 = SimcaOracle("dd").fit(x1, 4)
    o0 = SimcaOracle("dd").fit(x0, 4)
    t2_0, q_0 = o0.scores(x)
    dred = o1.t2dof * t2_0 / o1.t2scale + o1.qdof * q_0 / o1.qscale
    want = dred < o0.d_limit
    np.testing.assert_array_equal(pred_compat[:, 0].astype(bool), want)

    est.compat_dd_shared_state = False
    pred_fixed = est.predict(x)
    want_fixed, *_ = o0.decide(x)
    np.testing.assert_array_equal(pred_fixed[:, 0].astype(bool), want_fixed)


def test_fit_classes_vmap_matches_loop(rng):
    xs = [make_class_spectra(rng, 70, 40, center_shift=s) for s in (0.0, 0.4, 0.9)]
    x = np.vstack(xs)
    y = np.repeat([0, 1, 2], 70)
    models = simca.fit_classes(x, y, [0, 1, 2], 5)
    accept, dred, t2, q = simca.predict_classes(models, jnp.asarray(x))
    assert accept.shape == (3, 210)
    for c in range(3):
        single = simca.fit_simca(jnp.asarray(xs[c]), 5)
        a, d, *_ = simca.simca_decide(single, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(accept[c]), np.asarray(a))
        np.testing.assert_allclose(np.asarray(dred[c]), np.asarray(d), rtol=1e-8)


def test_fit_classes_unequal_sizes(rng):
    xs = [make_class_spectra(rng, n, 40, center_shift=s)
          for n, s in [(50, 0.0), (90, 0.5)]]
    x = np.vstack(xs)
    y = np.repeat([0, 1], [50, 90])
    models = simca.fit_classes(x, y, [0, 1], 5)
    accept, *_ = simca.predict_classes(models, jnp.asarray(x))
    for c, xc in enumerate(xs):
        single = simca.fit_simca(jnp.asarray(xc), 5)
        a, *_ = simca.simca_decide(single, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(accept[c]), np.asarray(a))


def test_fit_classes_rejects_k_above_smallest_class(rng):
    """n_components above min(count, L) for ANY class raises up front on
    the masked (unequal-size) path too — a silent fit there produces NaN
    limits that corrupt argmin prediction (round-4 advisor finding)."""
    xs = [make_class_spectra(rng, n, 40, center_shift=s)
          for n, s in [(3, 0.0), (90, 0.5)]]
    x = np.vstack(xs)
    y = np.repeat([0, 1], [3, 90])
    with pytest.raises(ValueError, match="exceeds the effective bound"):
        simca.fit_classes(x, y, [0, 1], 4)
    # the bound itself still fits
    simca.fit_classes(x, y, [0, 1], 2)


@pytest.mark.parametrize("dt,t2m,qm", [("alt", "Fdist", "jm"),
                                       ("dd", "chi2pom", "chi2pom"),
                                       ("ci", "perc", "perc")])
def test_predict_classes_fused_matches_per_class(rng, dt, t2m, qm):
    """The single-GEMM multi-class scorer (one HBM pass over x) equals the
    per-class vmap formulation: scores to tight tolerance, decisions
    exactly."""
    xs = [make_class_spectra(rng, 60, 35, center_shift=s) for s in
          (0.0, 1.0, 2.5)]
    x = np.concatenate(xs)
    classes = np.repeat([0, 1, 2], 60)
    models = simca.fit_classes(jnp.asarray(x), classes, [0, 1, 2], 4,
                               decision_type=dt, t2_method=t2m, q_method=qm)
    x_new = jnp.asarray(np.concatenate(
        [make_class_spectra(rng, 25, 35, center_shift=s) for s in
         (0.0, 1.0, 2.5, 4.0)]))
    a_f, d_f, t2_f, q_f = simca.predict_classes(models, x_new, dt,
                                                fused=True)
    a_v, d_v, t2_v, q_v = simca.predict_classes(models, x_new, dt,
                                                fused=False)
    np.testing.assert_allclose(np.asarray(t2_f), np.asarray(t2_v),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_v),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_v),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_v))


def make_multirank_spectra(rng, n, length, n_modes=8):
    """Spectra with ``n_modes`` well-separated principal directions
    (geometrically decaying mode amplitudes) — every top-k eigenvalue has a
    clear gap, so randomized and dense solvers must agree tightly."""
    t = np.linspace(0, 1, length)
    modes = np.stack([np.sin(2 * np.pi * (2 + j) * t + 0.3 * j)
                      for j in range(n_modes)])
    amps = rng.normal(1.0, 0.3, size=(n, n_modes)) * \
        (0.7 ** np.arange(n_modes))[None, :]
    return (amps @ modes + rng.normal(0, 1e-3, size=(n, length))
            ).astype(np.float64)


def test_rsvd_fit_matches_svd_separated_spectrum(rng):
    """On data with gapped eigenvalues the GEMM-only rsvd fit reproduces
    the dense-SVD fit: eigenvalues, loadings (sign convention included),
    train statistics, limits and out-of-class decisions."""
    x_in = make_multirank_spectra(rng, 200, 90)
    x_out = make_multirank_spectra(rng, 50, 90) + 0.4
    k = 5
    for t2m, qm in [("Fdist", "jm"), ("perc", "perc"),
                    ("chi2pom", "chi2pom")]:
        m_svd = simca.fit_simca(jnp.asarray(x_in), k, "alt", t2m, qm)
        m_rs = simca.fit_simca(jnp.asarray(x_in), k, "alt", t2m, qm,
                               solver="rsvd")
        np.testing.assert_allclose(np.asarray(m_rs.eigenvalues[:k]),
                                   np.asarray(m_svd.eigenvalues[:k]),
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(m_rs.components),
                                   np.asarray(m_svd.components),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m_rs.t2_train),
                                   np.asarray(m_svd.t2_train), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m_rs.q_train),
                                   np.asarray(m_svd.q_train), rtol=1e-3,
                                   atol=1e-12)
        assert float(m_rs.t2_res.limit) == pytest.approx(
            float(m_svd.t2_res.limit), rel=1e-5)
        assert float(m_rs.q_res.limit) == pytest.approx(
            float(m_svd.q_res.limit), rel=1e-3)
        a_svd, *_ = simca.simca_decide(m_svd, jnp.asarray(x_out))
        a_rs, *_ = simca.simca_decide(m_rs, jnp.asarray(x_out))
        np.testing.assert_array_equal(np.asarray(a_svd), np.asarray(a_rs))


def test_rsvd_fit_degenerate_tail_invariants(class_data):
    """On one-strong-mode + iid-noise spectra the top-k basis beyond the
    first component is an arbitrary rotation of a near-degenerate cluster
    (true for ANY solver).  Rotation-invariant quantities must still agree
    with the dense fit: leading eigenvalue, residual moments (deflation vs
    full spectrum), theta-based limits, and accept/reject decisions."""
    x_in, x_out = class_data
    k = 6
    m_svd = simca.fit_simca(jnp.asarray(x_in), k, "alt", "Fdist", "jm")
    m_rs = simca.fit_simca(jnp.asarray(x_in), k, "alt", "Fdist", "jm",
                           solver="rsvd")
    np.testing.assert_allclose(np.asarray(m_rs.eigenvalues[0]),
                               np.asarray(m_svd.eigenvalues[0]), rtol=1e-9)
    # partial traces over the (rotation-ambiguous) top-k cluster
    np.testing.assert_allclose(float(jnp.sum(m_rs.eigenvalues[:k])),
                               float(jnp.sum(m_svd.eigenvalues[:k])),
                               rtol=3e-4)
    assert float(m_rs.q_res.limit) == pytest.approx(
        float(m_svd.q_res.limit), rel=2e-2)
    assert float(m_rs.t2_res.limit) == pytest.approx(
        float(m_svd.t2_res.limit), rel=1e-6)
    for x_eval in (x_in, x_out):
        a_svd, *_ = simca.simca_decide(m_svd, jnp.asarray(x_eval))
        a_rs, *_ = simca.simca_decide(m_rs, jnp.asarray(x_eval))
        assert np.mean(np.asarray(a_svd) == np.asarray(a_rs)) >= 0.99


def test_deflated_thetas_match_full_spectrum(rng):
    """theta_m from covariance deflation == theta_m from the full spectrum
    (exact trace identities), across k."""
    from ocm_tpu.ops.linalg import deflated_thetas, pca_topk_cov
    from ocm_tpu.stats import limits as L

    x = make_multirank_spectra(rng, 120, 60)
    xc = x - x.mean(0)
    c = jnp.asarray(xc.T @ xc / (x.shape[0] - 1.0))
    full, fvecs = np.linalg.eigh(np.asarray(c))
    full = full[::-1]
    fvecs = fvecs[:, ::-1]
    # (a) with EXACT eigenpairs the trace identities are exact for any k,
    # including cuts inside the degenerate noise cluster
    for k in (2, 5, 9):
        ref = L.residual_thetas(jnp.asarray(full), k)
        got = deflated_thetas(c, jnp.asarray(full[:16]),
                              jnp.asarray(fvecs[:, :16]), k)
        for r, g in zip(ref, got):
            assert float(g) == pytest.approx(float(r), rel=1e-6, abs=1e-18)
    # (b) with rsvd eigenpairs they hold tightly while k stays within the
    # gapped part of the spectrum (the production regime); a cut inside the
    # noise floor is only approximate (Ritz values of a random subspace of
    # a degenerate cluster sit slightly below the true ones)
    vals, vecs = pca_topk_cov(c, 16)
    for k in (2, 5):
        ref = L.residual_thetas(jnp.asarray(full), k)
        got = deflated_thetas(c, vals, vecs, k)
        for r, g in zip(ref, got):
            assert float(g) == pytest.approx(float(r), rel=1e-5, abs=1e-18)


def test_predict_classes_bf16_serving_path(rng):
    """Spectra stored in bfloat16 stream through the fused scorer without
    an implicit upcast; statistics accumulate in f32 and decisions agree
    with the f32 path at the ~99% level — flips are confined to samples
    near the acceptance boundary, the inherent cost of 8-bit-mantissa
    input quantization (the serving fast path: the scoring GEMM is
    memory-bound, bf16 storage halves the streamed bytes)."""
    xs = [make_class_spectra(rng, 70, 40, center_shift=s).astype(np.float32)
          for s in (0.0, 1.2)]
    x = np.concatenate(xs)
    classes = np.repeat([0, 1], 70)
    models = simca.fit_classes(jnp.asarray(x), classes, [0, 1], 4)
    x_new = jnp.asarray(np.concatenate(
        [make_class_spectra(rng, 60, 40, center_shift=s) for s in
         (0.0, 1.2, 3.0)]).astype(np.float32))

    a32, d32, t32, q32 = simca.predict_classes(models, x_new)
    a16, d16, t16, q16 = simca.predict_classes(models,
                                               x_new.astype(jnp.bfloat16))
    # outputs stay full precision (accumulation dtype), not bf16
    assert d16.dtype in (jnp.float32, jnp.float64)
    scale = float(jnp.max(t32))
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32),
                               atol=2e-2 * scale)
    agree = np.mean(np.asarray(a16) == np.asarray(a32))
    assert agree >= 0.95          # raw-x quantization: lossy but close

    # PRE-CENTERED bf16 serving: quantize the residual against a fixed
    # reference spectrum and fold the offset into the class means — the
    # accurate fast path
    mu0 = jnp.mean(models.mean, axis=0)
    xc16 = (x_new - mu0[None, :]).astype(jnp.bfloat16)
    a16c, d16c, t16c, _ = simca.predict_classes(models, xc16, x_offset=mu0)
    assert np.mean(np.asarray(a16c) == np.asarray(a32)) >= 0.995
    np.testing.assert_allclose(np.asarray(d16c), np.asarray(d32),
                               atol=5e-3 * float(jnp.max(d32)))


def test_theta_tables_match_direct_deflation(rng):
    """The O(s)-per-k table expansion equals direct covariance deflation
    for every cut, including cuts inside the noise floor (both share the
    same fully-deflated residual, so there is no lambda_1-scale
    cancellation in either form)."""
    from ocm_tpu.ops.linalg import (deflated_theta_tables, deflated_thetas,
                                    pca_topk_cov, thetas_from_tables)

    for maker in (make_multirank_spectra,
                  lambda r, n, l: make_class_spectra(r, n, l)):
        x = maker(rng, 130, 70)
        xc = x - x.mean(0)
        c = jnp.asarray(xc.T @ xc / (x.shape[0] - 1.0))
        vals, vecs = pca_topk_cov(c, 16)
        tab = deflated_theta_tables(c, vals, vecs)
        for k in (1, 4, 9, 14):
            direct = deflated_thetas(c, vals, vecs, k)
            table = thetas_from_tables(tab, k)
            for d, t in zip(direct, table):
                assert float(t) == pytest.approx(float(d), rel=1e-8,
                                                 abs=1e-20)


def test_fit_classes_rsvd_unequal_sizes(rng):
    """solver='rsvd' reaches the masked fit for unequal class sizes (the
    padded vmap branch) and matches the svd path's decisions."""
    xs = [make_class_spectra(rng, n, 40, center_shift=s)
          for n, s in [(50, 0.0), (90, 0.9)]]
    x = np.vstack(xs)
    y = np.repeat([0, 1], [50, 90])
    m_svd = simca.fit_classes(jnp.asarray(x), y, [0, 1], 4)
    m_rs = simca.fit_classes(jnp.asarray(x), y, [0, 1], 4, solver="rsvd")
    a_svd, *_ = simca.predict_classes(m_svd, jnp.asarray(x))
    a_rs, *_ = simca.predict_classes(m_rs, jnp.asarray(x))
    assert np.mean(np.asarray(a_svd) == np.asarray(a_rs)) >= 0.99
    np.testing.assert_allclose(np.asarray(m_rs.t2_res.limit),
                               np.asarray(m_svd.t2_res.limit), rtol=1e-6)


def test_masked_rsvd_matches_masked_eigh(class_data):
    x_in, x_out = class_data
    w = jnp.ones(x_in.shape[0])
    m_e = simca.fit_simca_masked(jnp.asarray(x_in), w, 6)
    m_r = simca.fit_simca_masked(jnp.asarray(x_in), w, 6, solver="rsvd")
    assert float(m_r.t2_res.limit) == pytest.approx(
        float(m_e.t2_res.limit), rel=1e-6)
    assert float(m_r.q_res.limit) == pytest.approx(
        float(m_e.q_res.limit), rel=2e-2)
    a_e, *_ = simca.simca_decide(m_e, jnp.asarray(x_out))
    a_r, *_ = simca.simca_decide(m_r, jnp.asarray(x_out))
    assert np.mean(np.asarray(a_e) == np.asarray(a_r)) >= 0.99
    with pytest.raises(ValueError, match="solver"):
        simca.fit_simca_masked(jnp.asarray(x_in), w, 6, solver="qr")


def test_rsvd_fit_wide_data(rng):
    """n << L: the covariance is rank-deficient (rank n-1).  The rsvd fit
    must clamp its subspace size, keep limits finite, and agree with the
    svd fit's decisions."""
    x_in = make_class_spectra(rng, 40, 300)      # rank 39 covariance
    x_out = make_class_spectra(rng, 30, 300, center_shift=0.9)
    for k in (3, 10):
        m_svd = simca.fit_simca(jnp.asarray(x_in), k)
        m_rs = simca.fit_simca(jnp.asarray(x_in), k, solver="rsvd")
        assert np.isfinite(float(m_rs.q_res.limit))
        assert np.isfinite(float(m_rs.t2_res.limit))
        assert float(m_rs.t2_res.limit) == pytest.approx(
            float(m_svd.t2_res.limit), rel=1e-6)
        a_svd, *_ = simca.simca_decide(m_svd, jnp.asarray(x_out))
        a_rs, *_ = simca.simca_decide(m_rs, jnp.asarray(x_out))
        assert np.mean(np.asarray(a_svd) == np.asarray(a_rs)) >= 0.95


def test_quantize_rows_int8_roundtrip(rng):
    """Per-row int8 quantization: dequantization error bounded by half a
    step, sumsq is the exact norm of the quantized rows, np and jnp paths
    agree, zero rows are safe."""
    from ocm_tpu.ops.linalg import quantize_rows_int8

    a = np.concatenate([rng.normal(0, s, (5, 64)).astype(np.float32)
                        for s in (1e-3, 1.0, 1e4)])
    a = np.concatenate([a, np.zeros((1, 64), np.float32)])
    q, s, ss = quantize_rows_int8(a)
    assert q.dtype == np.int8 and s.dtype == np.float32
    deq = q.astype(np.float32) * s[:, None]
    assert np.all(np.abs(a - deq) <= s[:, None] * 0.5 * (1 + 1e-6))
    np.testing.assert_allclose(ss, np.sum(deq * deq, axis=1), rtol=1e-6)
    qj, sj, ssj = quantize_rows_int8(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(qj), q)
    np.testing.assert_allclose(np.asarray(sj), s, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(ssj), ss, rtol=1e-6)


def test_predict_classes_int8_serving_path(rng):
    """int8-stored pre-centered residuals (per-row scales, exact int32
    accumulation, precomputed ||x||^2): decisions track the f32 fused
    path at the same level as the bf16 pre-centered path."""
    from ocm_tpu.ops.linalg import quantize_rows_int8

    xs = [make_class_spectra(rng, 70, 40, center_shift=s).astype(np.float32)
          for s in (0.0, 1.2)]
    x = np.concatenate(xs)
    classes = np.repeat([0, 1], 70)
    models = simca.fit_classes(jnp.asarray(x), classes, [0, 1], 4)
    x_new = np.concatenate(
        [make_class_spectra(rng, 60, 40, center_shift=s) for s in
         (0.0, 1.2, 3.0)]).astype(np.float32)

    a32, d32, t32, q32 = simca.predict_classes(models,
                                               jnp.asarray(x_new))
    mu0 = np.asarray(jnp.mean(models.mean, axis=0), np.float32)
    xq, xsc, x2 = quantize_rows_int8(x_new - mu0[None, :])
    a8, d8, t8, q8 = simca.predict_classes_int8(
        models, jnp.asarray(xq), jnp.asarray(xsc), jnp.asarray(x2),
        x_offset=jnp.asarray(mu0))
    assert d8.dtype in (jnp.float32, jnp.float64)
    assert np.mean(np.asarray(a8) == np.asarray(a32)) >= 0.995
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d32),
                               atol=1e-2 * float(jnp.max(d32)))
    np.testing.assert_allclose(np.asarray(q8), np.asarray(q32),
                               atol=2e-2 * float(jnp.max(q32)))


def test_predict_classes_precomputed_sumsq(rng):
    """x_sumsq: shipping the precomputed ||x||^2 reproduces the fused
    path's own reduction (same f32 math, one fewer HBM pass)."""
    x = make_class_spectra(rng, 80, 40).astype(np.float32)
    classes = np.zeros(80, np.int32)
    models = simca.fit_classes(jnp.asarray(x), classes, [0], 4)
    x_new = make_class_spectra(rng, 50, 40, center_shift=0.5
                               ).astype(np.float32)
    a0, d0, t0, q0 = simca.predict_classes(models, jnp.asarray(x_new))
    ss = np.sum(np.square(x_new), axis=1)
    a1, d1, t1, q1 = simca.predict_classes(models, jnp.asarray(x_new),
                                           x_sumsq=jnp.asarray(ss))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


@pytest.mark.parametrize("dt_type", ["sim", "alt", "ci", "dd"])
def test_predict_classes_int8_all_decision_types(rng, dt_type):
    """int8 scoring across every combined-distance type: agreement >= 96%
    on a deliberately hard overlapping-class geometry, and every flip is
    CONFINED NEAR THE BOUNDARY (within 15% of the critical distance) —
    the quarter-width mode's contract is boundary-band flips only, never
    a systematic shift (the two-level operand fix killed the latter; the
    dd/sim rows exercise the chi2pom dof factors and the max-combine,
    which amplify the Q cancellation more than the default alt)."""
    from ocm_tpu.ops.linalg import quantize_rows_int8

    x = np.concatenate(
        [make_class_spectra(rng, 60, 40, center_shift=s).astype(np.float32)
         for s in (0.0, 1.0)])
    classes = np.repeat([0, 1], 60)
    t2m, qm = ("chi2pom", "chi2pom") if dt_type == "dd" else ("Fdist", "jm")
    models = simca.fit_classes(jnp.asarray(x), classes, [0, 1], 4,
                               t2_method=t2m, q_method=qm,
                               decision_type=dt_type)
    x_new = np.concatenate(
        [make_class_spectra(rng, 50, 40, center_shift=s) for s in
         (0.0, 1.0, 2.5)]).astype(np.float32)
    a32, d32, _, _ = simca.predict_classes(models, jnp.asarray(x_new),
                                           dt_type)
    mu0 = np.asarray(jnp.mean(models.mean, axis=0), np.float32)
    xq, xs_, x2 = quantize_rows_int8(x_new - mu0[None, :])
    a8 = simca.predict_classes_int8(models, jnp.asarray(xq),
                                    jnp.asarray(xs_), jnp.asarray(x2),
                                    dt_type, x_offset=jnp.asarray(mu0))[0]
    agree = np.mean(np.asarray(a8) == np.asarray(a32))
    assert agree >= 0.96
    d_lim = np.asarray(models.d_limit)
    for c, n in np.argwhere(np.asarray(a8) != np.asarray(a32)):
        margin = abs(np.asarray(d32)[c, n] - d_lim[c]) / d_lim[c]
        assert margin <= 0.15, (dt_type, c, n, margin)


def test_masked_pca_gram_side_parity(rng):
    """The Gram-side masked dense solve (N < L regime: eigh of the (N, N)
    sample Gram, loadings recovered from scores) equals the
    covariance-side solve AND an independent NumPy SVD oracle of the
    masked centered rows: same spectrum, same sklearn-signed loadings,
    same scores."""
    n, L = 48, 120
    x = make_class_spectra(rng, n, L).astype(np.float64)
    w = np.ones(n); w[40:] = 0.0               # mask 8 rows
    g = simca.masked_pca_eig(jnp.asarray(x), jnp.asarray(w), side="gram")
    c = simca.masked_pca_eig(jnp.asarray(x), jnp.asarray(w), side="cov")
    r = 39                                     # centered rank = n_eff - 1
    np.testing.assert_allclose(np.asarray(g.eigenvalues[:r]),
                               np.asarray(c.eigenvalues[:r]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g.eigvec[:, :10]),
                               np.asarray(c.eigvec[:, :10]),
                               rtol=1e-7, atol=1e-9)
    # independent oracle: numpy SVD of the masked centered train rows
    rows = x[w > 0]
    xc = rows - rows.mean(axis=0)
    _, s, vt = np.linalg.svd(xc, full_matrices=False)
    np.testing.assert_allclose(np.asarray(g.eigenvalues[:r]),
                               (s * s / (w.sum() - 1.0))[:r], rtol=1e-9)
    v_oracle = vt[:10]
    flip = np.sign(v_oracle[np.arange(10),
                            np.argmax(np.abs(v_oracle), axis=1)])
    np.testing.assert_allclose(np.asarray(g.eigvec[:, :10].T),
                               v_oracle * flip[:, None], rtol=1e-7,
                               atol=1e-9)
    # default side picks gram here (N < L); the full masked fit must
    # match the INDEPENDENT oracle fitted on the unmasked subset rows
    assert g.eigvec.shape == (L, n)
    m_auto = simca.fit_simca_masked(jnp.asarray(x), jnp.asarray(w), 6)
    oracle = SimcaOracle("alt", "Fdist", "jm").fit(rows, 6)
    assert float(m_auto.t2_res.limit) == pytest.approx(oracle.t2_limit,
                                                       rel=1e-7)
    assert float(m_auto.q_res.limit) == pytest.approx(oracle.q_limit,
                                                      rel=1e-7)
    x_new = make_class_spectra(rng, 64, L, center_shift=0.4
                               ).astype(np.float64)
    want_acc, want_dred, _, _ = oracle.decide(x_new)
    a1, d1, _, _ = simca.simca_decide(m_auto, jnp.asarray(x_new))
    np.testing.assert_allclose(np.asarray(d1), want_dred, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1), want_acc)


def test_fit_classes_gram_side_under_vmap(rng):
    """fit_classes on N < L data routes the vmapped masked fit through
    the Gram-side dense solve; decisions equal per-class svd fits."""
    x = np.concatenate(
        [make_class_spectra(rng, 30, 100, center_shift=s).astype(np.float32)
         for s in (0.0, 0.9)])
    y = np.repeat([0, 1], 30)
    models = simca.fit_classes(x, y, [0, 1], 4)
    a, d, _, _ = simca.predict_classes(models, jnp.asarray(x))
    assert bool(jnp.all(jnp.isfinite(d)))
    for c in range(2):
        single = simca.fit_simca(jnp.asarray(x[y == c]), 4)
        a1, d1, *_ = simca.simca_decide(single, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(a[c]), np.asarray(a1))
        np.testing.assert_allclose(np.asarray(d[c]), np.asarray(d1),
                                   rtol=5e-3)


def test_masked_pca_gram_degenerate_directions(rng):
    """Rank-deficient N < L data (duplicated rows + constant channels):
    the gram side's near-zero eigenvalues come back as roundoff, not
    exact zeros — junk columns must be ZEROED (cov-side null vectors
    contribute ~0 score; an unguarded division would inject O(lambda_max)
    into Q).  Checks column norms and fit agreement at k near the rank."""
    base = make_class_spectra(rng, 20, 80).astype(np.float64)
    x = np.concatenate([base, base[:12]])          # 32 rows, rank <= 19
    x[:, 40] = 1.0                                  # constant channel
    x[:, 41] = x[:, 40]
    w = np.ones(32)
    g = simca.masked_pca_eig(jnp.asarray(x), jnp.asarray(w), side="gram")
    c = simca.masked_pca_eig(jnp.asarray(x), jnp.asarray(w), side="cov")
    norms = np.linalg.norm(np.asarray(g.eigvec), axis=0)
    assert np.all(norms <= 1.0 + 1e-8)              # no junk blowup
    # resolved spectrum agrees; beyond-rank gram columns are exactly zero
    rank = 19
    np.testing.assert_allclose(np.asarray(g.eigenvalues[:rank]),
                               np.asarray(c.eigenvalues[:rank]),
                               rtol=1e-8, atol=1e-12)
    assert np.all(norms[rank + 2:] == 0.0)
    # full fit at k just under the rank matches the independent oracle
    # (sklearn full-SVD) fitted on the same degenerate rows
    m_g = simca.fit_simca_masked(jnp.asarray(x), jnp.asarray(w), 15)
    oracle = SimcaOracle("alt", "Fdist", "jm").fit(x, 15)
    assert float(m_g.t2_res.limit) == pytest.approx(oracle.t2_limit,
                                                    rel=1e-6)
    x_new = make_class_spectra(rng, 40, 80, center_shift=0.5
                               ).astype(np.float64)
    x_new[:, 40] = 1.0
    x_new[:, 41] = 1.0
    want_acc, want_dred, _, _ = oracle.decide(x_new)
    a_g, d_g, _, _ = simca.simca_decide(m_g, jnp.asarray(x_new))
    np.testing.assert_allclose(np.asarray(d_g), want_dred, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a_g), want_acc)


def test_fit_simca_rejects_excess_components(rng):
    """sklearn PCA raises when k > min(n, L); the functional fits must too
    (the SIMCA wrapper already validated — this pins the lower layer)."""
    x = make_class_spectra(rng, 6, 12)
    for solver in ("svd", "rsvd"):
        with pytest.raises(ValueError, match="n_components"):
            simca.fit_simca(x[:2], n_components=5, solver=solver)
        with pytest.raises(ValueError, match="n_components"):
            simca.fit_simca(x, n_components=0, solver=solver)
    with pytest.raises(ValueError, match="n_components"):
        simca.fit_simca_masked(jnp.asarray(x), jnp.ones(6),
                               n_components=13)
    # boundary k == min(n, L) is legal
    m = simca.fit_simca(x, n_components=6)
    assert m.components.shape == (6, 12)
