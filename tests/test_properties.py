"""Property tests (the SURVEY.md §4 plan): statistical invariants that must
hold for ANY data, complementing the golden-value oracle tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.simca import fit_simca, simca_decide
from ocm_tpu.ops.special import chi2_cdf, chi2_ppf, f_cdf, f_ppf
from ocm_tpu.stats import limits as L

from oracles import make_class_spectra


@pytest.fixture(scope="module")
def fitted(request):
    rng = np.random.default_rng(5)
    x = make_class_spectra(rng, 150, 60)
    return x


@pytest.mark.parametrize("method", ["perc", "Fdistrig", "Fdist", "chi2",
                                    "chi2pom"])
def test_t2_limit_monotone_in_confidence(fitted, method):
    rng = np.random.default_rng(0)
    t2 = jnp.asarray(rng.chisquare(5, 200))
    lims = [float(L.t2_limit(t2, 5, method, cl).limit)
            for cl in (0.80, 0.90, 0.95, 0.99)]
    assert all(a < b for a, b in zip(lims, lims[1:]))


@pytest.mark.parametrize("method", ["perc", "jm", "chi2box", "chi2pom"])
def test_q_limit_monotone_in_confidence(fitted, method):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.chisquare(3, 200))
    eigs = jnp.asarray(np.sort(rng.uniform(0.01, 2.0, 40))[::-1].copy())
    thetas = L.residual_thetas(eigs, 5)
    lims = [float(L.q_limit(q, method, cl, thetas=thetas).limit)
            for cl in (0.80, 0.90, 0.95, 0.99)]
    assert all(a < b for a, b in zip(lims, lims[1:]))


def test_quantiles_invert_cdfs():
    """ppf and cdf are inverses over a broad dof grid — evaluated as ONE
    vectorized jitted call per family (the functions' contract is
    vectorized+jittable; 25 eager scalar bisections took minutes on the
    CPU backend for identical coverage)."""
    import jax

    ps, dofs = np.meshgrid([0.05, 0.5, 0.95, 0.999],
                           [0.7, 2.0, 9.0, 55.0])
    x = jax.jit(chi2_ppf)(ps, dofs)
    np.testing.assert_allclose(np.asarray(jax.jit(chi2_cdf)(x, dofs)),
                               ps, atol=1e-9)
    d12 = np.array([(2.0, 7.0), (10.0, 140.0), (1.0, 3.0)])
    pf, d1 = np.meshgrid([0.05, 0.5, 0.95], d12[:, 0])
    _, d2 = np.meshgrid([0.05, 0.5, 0.95], d12[:, 1])
    xf = jax.jit(f_ppf)(pf, d1, d2)
    np.testing.assert_allclose(np.asarray(jax.jit(f_cdf)(xf, d1, d2)),
                               pf, atol=1e-9)


def test_alt_boundary_is_quarter_circle(fitted):
    """'alt' acceptance region in reduced (T2, Q) coordinates is exactly the
    quarter disk of radius sqrt(2): points accepted iff
    (t2red^2 + qred^2) < 2."""
    model = fit_simca(jnp.asarray(fitted), 5, decision_type="alt")
    rng = np.random.default_rng(2)
    x_new = jnp.asarray(make_class_spectra(rng, 300, 60, center_shift=0.2))
    accept, dred, t2, q = simca_decide(model, x_new, "alt")
    t2red = np.asarray(t2) / float(model.t2_res.limit)
    qred = np.asarray(q) / float(model.q_res.limit)
    inside = t2red**2 + qred**2 < 2.0
    np.testing.assert_array_equal(np.asarray(accept), inside)


def test_training_coverage_tracks_confidence(fitted):
    """At confidence cl with 'perc' limits, ~cl of the TRAINING data falls
    inside each marginal limit."""
    x = jnp.asarray(fitted)
    for cl in (0.90, 0.95):
        model = fit_simca(x, 5, t2_method="perc", q_method="perc",
                          t2_cl=cl, q_cl=cl)
        frac_t2 = float(jnp.mean(model.t2_train <= model.t2_res.limit))
        frac_q = float(jnp.mean(model.q_train <= model.q_res.limit))
        assert abs(frac_t2 - cl) < 0.02
        assert abs(frac_q - cl) < 0.02


def test_decisions_invariant_to_sample_order(fitted):
    """Scoring is per-sample: permuting the batch permutes the outputs."""
    model = fit_simca(jnp.asarray(fitted), 5)
    rng = np.random.default_rng(3)
    x_new = jnp.asarray(make_class_spectra(rng, 64, 60, center_shift=0.5))
    perm = rng.permutation(64)
    acc1, dred1, _, _ = simca_decide(model, x_new, "alt")
    acc2, dred2, _, _ = simca_decide(model, x_new[perm], "alt")
    np.testing.assert_array_equal(np.asarray(acc1)[perm], np.asarray(acc2))
    np.testing.assert_allclose(np.asarray(dred1)[perm], np.asarray(dred2),
                               rtol=1e-10)


def test_fit_scale_equivariance(fitted):
    """Scaling the spectra scales T2 not at all (Mahalanobis) and Q by the
    square; decisions with percentile limits are scale-invariant."""
    x = jnp.asarray(fitted)
    m1 = fit_simca(x, 5, t2_method="perc", q_method="perc")
    m2 = fit_simca(3.0 * x, 5, t2_method="perc", q_method="perc")
    rng = np.random.default_rng(4)
    x_new = jnp.asarray(make_class_spectra(rng, 50, 60, center_shift=0.4))
    a1, _, t2_1, q_1 = simca_decide(m1, x_new, "alt")
    a2, _, t2_2, q_2 = simca_decide(m2, 3.0 * x_new, "alt")
    np.testing.assert_allclose(np.asarray(t2_2), np.asarray(t2_1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q_2), 9.0 * np.asarray(q_1),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.parametrize("spectrum", ["decay", "flat", "cluster", "rank1"])
def test_pca_topk_cov_invariants(spectrum):
    """Structural invariants of the randomized top-k engine across
    qualitatively different spectra: orthonormal vectors, descending
    nonnegative Ritz values never above lambda_1, eigen-residual small in
    the gapped region, and residual moments exactly consistent between
    the direct deflation and the table expansion."""
    from ocm_tpu.ops.linalg import (deflated_theta_tables, deflated_thetas,
                                    pca_topk_cov, thetas_from_tables)

    rng = np.random.default_rng(hash(spectrum) % (2 ** 31))
    l, s = 60, 12
    q, _ = np.linalg.qr(rng.normal(size=(l, l)))
    if spectrum == "decay":
        lam = 2.0 ** -np.arange(l, dtype=float)
    elif spectrum == "flat":
        lam = np.full(l, 0.3)
    elif spectrum == "cluster":
        lam = np.concatenate([np.full(3, 5.0), np.full(l - 3, 1e-3)])
    else:
        lam = np.concatenate([[10.0], np.full(l - 1, 1e-7)])
    c = jnp.asarray((q * lam) @ q.T)
    vals, vecs = pca_topk_cov(c, s)
    vals = np.asarray(vals)
    vecs = np.asarray(vecs)

    # orthonormality is guaranteed for directions carrying spectral
    # weight; an exactly rank-deficient tail (rank1 case) cannot yield
    # extra orthonormal directions from within range(C) and keeps
    # near-duplicate columns with near-zero Ritz weight instead
    live = vals > 1e-6 * vals[0]
    g = vecs[:, live].T @ vecs[:, live]
    np.testing.assert_allclose(g, np.eye(int(live.sum())), atol=1e-6)
    assert np.all(np.diff(vals) <= 1e-12)                  # descending
    assert np.all(vals >= 0.0)
    assert vals[0] <= lam.max() * (1 + 1e-9)               # Ritz bound
    if spectrum == "decay":
        # gapped spectrum: top Ritz values converge to the eigenvalues
        np.testing.assert_allclose(vals[:6], np.sort(lam)[::-1][:6],
                                   rtol=1e-8)

    tab = deflated_theta_tables(c, jnp.asarray(vals), jnp.asarray(vecs))
    for k in (1, 5, 11):
        direct = deflated_thetas(c, jnp.asarray(vals), jnp.asarray(vecs), k)
        table = thetas_from_tables(tab, k)
        for d, t in zip(direct, table):
            assert float(d) >= 0.0
            assert float(t) == pytest.approx(float(d), rel=1e-7,
                                             abs=1e-18)
