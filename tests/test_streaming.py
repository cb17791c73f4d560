"""Streaming SIMCA: sufficient-statistic ingest + moments-only fits.

Oracles are NumPy (np.mean / np.cov on the concatenated stream) — the
streaming statistic must be EXACT (to float reassociation) regardless of
batching, order, masking, or sharding, and the moments fit must match
fit_simca on the same data for every moment-derived statistic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.simca import fit_classes, fit_simca, predict_classes, \
    simca_decide
from ocm_tpu.models.streaming import (fit_classes_moments,
                                      fit_simca_moments, moments_cov,
                                      moments_from, moments_init,
                                      moments_init_classes, moments_merge,
                                      moments_std, moments_update,
                                      moments_update_classes)
from ocm_tpu.parallel.mesh import make_mesh
from ocm_tpu.parallel.simca_dist import moments_update_sharded


def _stream(rng, n=230, length=60, common_mode=0.0):
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * 3 * t)
    amp = rng.normal(1.0, 0.1, size=(n, 1))
    x = amp * base[None, :] + rng.normal(0, 0.02, size=(n, length))
    return (x + common_mode).astype(np.float64)


def test_moments_match_numpy_batched(rng):
    x = _stream(rng)
    mom = moments_init(x.shape[1], jnp.float64)
    for lo in range(0, x.shape[0], 37):          # ragged batch sizes
        mom = moments_update(mom, x[lo:lo + 37])
    assert float(mom.n) == x.shape[0]
    np.testing.assert_allclose(np.asarray(mom.mean), x.mean(0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(moments_cov(mom)),
                               np.cov(x, rowvar=False), atol=1e-12)


def test_moments_order_invariant_and_mergeable(rng):
    x = _stream(rng, n=150)
    a = moments_from(x[:40])
    b = moments_from(x[40:90])
    c = moments_from(x[90:])
    m1 = moments_merge(moments_merge(a, b), c)
    m2 = moments_merge(c, moments_merge(b, a))
    full = moments_from(x)
    for m in (m1, m2):
        np.testing.assert_allclose(np.asarray(m.mean),
                                   np.asarray(full.mean), atol=1e-12)
        np.testing.assert_allclose(np.asarray(m.scatter),
                                   np.asarray(full.scatter), rtol=1e-10)
    # identity element
    z = moments_merge(moments_init(x.shape[1], jnp.float64), full)
    np.testing.assert_array_equal(np.asarray(z.scatter),
                                  np.asarray(full.scatter))


def test_moments_stable_under_common_mode(rng):
    """The raison d'etre of the centered-scatter form: a 1e4 common mode
    must not eat the covariance (a raw-second-moment accumulator loses
    ~8 digits here)."""
    x = _stream(rng, common_mode=1e4)
    mom = moments_init(x.shape[1], jnp.float64)
    for lo in range(0, x.shape[0], 50):
        mom = moments_update(mom, x[lo:lo + 50])
    np.testing.assert_allclose(np.asarray(moments_cov(mom)),
                               np.cov(x, rowvar=False), rtol=1e-9,
                               atol=1e-12)


def test_moments_std_matches_numpy(rng):
    x = _stream(rng, n=90)
    mom = moments_from(x)
    np.testing.assert_allclose(np.asarray(moments_std(mom)),
                               x.std(0, ddof=1), rtol=1e-10)


def test_moments_masked_update(rng):
    x = _stream(rng, n=80)
    w = (rng.random(80) < 0.6).astype(np.float64)
    mom = moments_update(moments_init(x.shape[1], jnp.float64), x, w=w)
    kept = x[w > 0]
    assert float(mom.n) == kept.shape[0]
    np.testing.assert_allclose(np.asarray(moments_cov(mom)),
                               np.cov(kept, rowvar=False), atol=1e-12)
    # all-zero mask is the identity update
    m0 = moments_update(mom, x, w=np.zeros(80))
    np.testing.assert_array_equal(np.asarray(m0.scatter),
                                  np.asarray(mom.scatter))
    assert float(m0.n) == float(mom.n)


def test_moments_save_load_roundtrip(rng, tmp_path):
    """Persisted statistics resume exactly (incl. stacked class axes);
    length mismatch raises with the stored shape."""
    from ocm_tpu.models.streaming import load_moments, save_moments

    x = _stream(rng, n=70, length=32)
    mom = moments_from(x)
    p = str(tmp_path / "mom.msgpack")
    save_moments(p, mom)
    back = load_moments(p, length=32)
    np.testing.assert_array_equal(np.asarray(back.scatter),
                                  np.asarray(mom.scatter))
    # resume the stream and match a never-saved run
    more = _stream(rng, n=40, length=32)
    np.testing.assert_allclose(
        np.asarray(moments_update(back, more).scatter),
        np.asarray(moments_update(mom, more).scatter), rtol=1e-12)
    with pytest.raises(ValueError, match="L=32"):
        load_moments(p, length=64)
    # stacked per-class statistics persist as-is
    moms = moments_init_classes(3, 32, jnp.float64)
    moms = moments_update_classes(moms, x, np.zeros(70, int), [0, 1, 2])
    save_moments(p, moms)
    back_c = load_moments(p)
    assert back_c.scatter.shape == (3, 32, 32)
    np.testing.assert_array_equal(np.asarray(back_c.n), np.asarray(moms.n))


def test_moments_empty_batch_is_noop(rng):
    """A B=0 batch (ragged producer) must not poison the statistic."""
    x = _stream(rng, n=30)
    mom = moments_from(x)
    m0 = moments_update(mom, x[:0])
    np.testing.assert_array_equal(np.asarray(m0.scatter),
                                  np.asarray(mom.scatter))
    assert np.isfinite(np.asarray(m0.mean)).all()
    assert float(m0.n) == 30


def test_moments_fractional_weights(rng):
    """Frequency weights below 1 total must still use the true divisor
    (a max(nb, 1) guard would silently understate the mean)."""
    x = _stream(rng, n=4)
    w = np.array([0.3, 0.4, 0.0, 0.0])
    mom = moments_update(moments_init(x.shape[1], jnp.float64), x, w=w)
    mu = (0.3 * x[0] + 0.4 * x[1]) / 0.7
    np.testing.assert_allclose(np.asarray(mom.mean), mu, atol=1e-12)
    xc = (x[:2] - mu) * np.sqrt(w[:2, None])
    np.testing.assert_allclose(np.asarray(mom.scatter), xc.T @ xc,
                               atol=1e-12)


def test_moments_sharded_ingest_jit_is_cached(rng):
    """Per-batch ingest must reuse ONE cached executable (the CLAUDE.md
    closure-jit rule): same mesh+axis -> the same jitted callable."""
    from ocm_tpu.parallel.simca_dist import _moments_ingest_jit

    mesh = make_mesh((8,), ("data",))
    assert _moments_ingest_jit(mesh, "data") is _moments_ingest_jit(
        mesh, "data")


@pytest.mark.parametrize("solver", ["eigh", "rsvd"])
def test_fit_simca_moments_matches_fit_simca(rng, solver):
    """Every moment-derived statistic of the streaming fit must match the
    full-matrix fit, and decisions on new spectra must agree."""
    x = _stream(rng, n=220, length=60)
    mom = moments_init(x.shape[1], jnp.float64)
    for lo in range(0, x.shape[0], 64):
        mom = moments_update(mom, x[lo:lo + 64])
    k = 5
    ref_solver = "svd" if solver == "eigh" else "rsvd"
    for decision in ("sim", "alt", "ci"):
        ref = fit_simca(jnp.asarray(x), k, decision_type=decision,
                        solver=ref_solver)
        got = fit_simca_moments(mom, k, decision_type=decision,
                                solver=solver)
        np.testing.assert_allclose(np.asarray(got.mean),
                                   np.asarray(ref.mean), atol=1e-12)
        np.testing.assert_allclose(np.abs(np.asarray(got.components)),
                                   np.abs(np.asarray(ref.components)),
                                   rtol=1e-7, atol=1e-9)
        r = min(np.asarray(ref.eigenvalues).shape[0],
                np.asarray(got.eigenvalues).shape[0])
        np.testing.assert_allclose(np.asarray(got.eigenvalues)[:r],
                                   np.asarray(ref.eigenvalues)[:r],
                                   rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.t2_res.limit),
                                   np.asarray(ref.t2_res.limit), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(got.q_res.limit),
                                   np.asarray(ref.q_res.limit), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got.d_limit),
                                   np.asarray(ref.d_limit), rtol=1e-8)
        assert int(got.n_samples) == int(ref.n_samples)
        x_new = _stream(rng, n=64)
        acc_ref = np.asarray(simca_decide(ref, jnp.asarray(x_new),
                                          decision)[0])
        acc_got = np.asarray(simca_decide(got, jnp.asarray(x_new),
                                          decision)[0])
        np.testing.assert_array_equal(acc_got, acc_ref)


def test_fit_simca_moments_rejects_sample_methods(rng):
    mom = moments_from(_stream(rng, n=50))
    with pytest.raises(ValueError, match="per-sample training T"):
        fit_simca_moments(mom, 3, t2_method="perc")
    with pytest.raises(ValueError, match="per-sample training Q"):
        fit_simca_moments(mom, 3, q_method="perc")
    with pytest.raises(ValueError, match="per-sample training T"):
        fit_simca_moments(mom, 3, t2_method="chi2pom")
    with pytest.raises(ValueError, match="Pomerantsev"):
        fit_simca_moments(mom, 3, decision_type="dd")
    with pytest.raises(ValueError, match="solver"):
        fit_simca_moments(mom, 3, solver="qr")


def test_labelled_stream_matches_fit_classes(rng):
    """Per-class streaming ingest + stacked moments fit == fit_classes on
    the full labelled matrix (decision agreement on a mixed batch)."""
    length, labels = 48, [0, 1, 2]
    xs, ys = [], []
    for c in labels:
        xc = _stream(rng, n=70 + 15 * c, length=length) + 0.3 * c
        xs.append(xc)
        ys.append(np.full(xc.shape[0], c))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    perm = rng.permutation(x.shape[0])
    x, y = x[perm], y[perm]

    moms = moments_init_classes(len(labels), length, jnp.float64)
    for lo in range(0, x.shape[0], 41):
        moms = moments_update_classes(moms, x[lo:lo + 41], y[lo:lo + 41],
                                      labels)
    np.testing.assert_array_equal(np.asarray(moms.n),
                                  [np.sum(y == c) for c in labels])

    k = 4
    got = fit_classes_moments(moms, k)
    ref = fit_classes(jnp.asarray(x), y, labels, k)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean),
                               atol=1e-12)
    x_new = _stream(rng, n=100, length=length)
    acc_got = np.asarray(predict_classes(got, jnp.asarray(x_new))[0])
    acc_ref = np.asarray(predict_classes(ref, jnp.asarray(x_new))[0])
    np.testing.assert_array_equal(acc_got, acc_ref)


def test_moments_update_sharded_matches_local(rng):
    mesh = make_mesh((8,), ("data",))
    x = _stream(rng, n=210, length=40)          # 210 % 8 != 0 -> pad path
    mom_l = moments_init(40, jnp.float64)
    mom_s = moments_init(40, jnp.float64)
    for lo in range(0, x.shape[0], 70):
        mom_l = moments_update(mom_l, x[lo:lo + 70])
        mom_s = moments_update_sharded(mom_s, x[lo:lo + 70], mesh)
    assert float(mom_s.n) == float(mom_l.n)
    np.testing.assert_allclose(np.asarray(mom_s.mean),
                               np.asarray(mom_l.mean), atol=1e-12)
    np.testing.assert_allclose(np.asarray(mom_s.scatter),
                               np.asarray(mom_l.scatter), rtol=1e-10)
    # masked + sharded
    w = (rng.random(64) < 0.5).astype(np.float64)
    xb = _stream(rng, n=64, length=40)
    a = moments_update(mom_l, xb, w=w)
    b = moments_update_sharded(mom_s, xb, mesh, w=w)
    np.testing.assert_allclose(np.asarray(b.scatter),
                               np.asarray(a.scatter), rtol=1e-10)


def test_streaming_refresh_feeds_serving(rng):
    """End-to-end production loop: chunks prepared ONCE by a serving
    scorer re-screen (center= pinning) against stacked models refreshed
    from a labelled stream — decisions equal to scoring raw spectra with
    a from-scratch multi-class fit on everything ingested."""
    from ocm_tpu.serving import SIMCAScorer

    length, labels, k = 48, [0, 1, 2], 4
    blocks = []
    for c in labels:
        xc = _stream(rng, n=90, length=length) + 0.4 * c
        blocks.append((xc.astype(np.float32), np.full(90, c)))
    x1 = np.concatenate([b[0][:60] for b in blocks])
    y1 = np.concatenate([b[1][:60] for b in blocks])
    x2 = np.concatenate([b[0][60:] for b in blocks])
    y2 = np.concatenate([b[1][60:] for b in blocks])

    moms = moments_init_classes(len(labels), length, jnp.float64)
    moms = moments_update_classes(moms, x1, y1, labels)
    scorer = SIMCAScorer(fit_classes_moments(moms, k), chunk_size=64)
    x_probe = _stream(rng, n=150, length=length).astype(np.float32) + 0.2
    prepared = scorer.prepare(x_probe)

    # new confirmed spectra arrive -> refresh from the statistic alone
    moms = moments_update_classes(moms, x2, y2, labels)
    refreshed = fit_classes_moments(moms, k)
    renew = SIMCAScorer(refreshed, chunk_size=64, center=scorer.center)
    out = renew.score_prepared(prepared)

    ref_models = fit_classes(
        jnp.asarray(np.concatenate([x1, x2]), jnp.float64),
        np.concatenate([y1, y2]), labels, k)
    ref = SIMCAScorer(ref_models, chunk_size=64).score(x_probe)
    np.testing.assert_array_equal(out["accept"], ref["accept"])


def test_streaming_refresh_changes_decisions(rng):
    """The production loop: a model fitted from an early stream segment is
    refreshed by ingesting more spectra — the refreshed model equals a
    from-scratch fit on everything seen (not just approximately: same
    decisions)."""
    x = _stream(rng, n=300, length=50)
    mom = moments_from(x[:120])
    m_early = fit_simca_moments(mom, 4)
    mom = moments_update(mom, x[120:])
    m_late = fit_simca_moments(mom, 4)
    ref = fit_simca(jnp.asarray(x), 4, solver="svd")
    x_new = _stream(rng, n=80, length=50)
    np.testing.assert_array_equal(
        np.asarray(simca_decide(m_late, jnp.asarray(x_new), "alt")[0]),
        np.asarray(simca_decide(ref, jnp.asarray(x_new), "alt")[0]))
    # and the early model is a genuine (n=120) model, not a scaled copy
    assert int(m_early.n_samples) == 120
