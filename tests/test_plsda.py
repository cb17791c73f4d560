"""PLS-DA parity tests against sklearn (the reference's substrate,
data_cheese.py:193-280)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.plsda import (discriminant_vectors, f1_macro, lda_fit,
                                  lda_predict, pls_fit, pls_predict,
                                  pls_transform, plsda_f1_curves,
                                  plsda_fit_predict,
                                  stratified_kfold_indices)

sklearn_cd = pytest.importorskip("sklearn.cross_decomposition")
from sklearn.discriminant_analysis import LinearDiscriminantAnalysis  # noqa: E402
from sklearn.metrics import f1_score  # noqa: E402


@pytest.fixture(scope="module")
def xy(request):
    rng = np.random.default_rng(17)
    n, length = 150, 40
    t = np.linspace(0, 1, length)
    xs, ys = [], []
    for c in range(3):
        base = np.sin(2 * np.pi * (2 + c) * t) + 0.4 * c
        amp = rng.normal(1, 0.1, (n // 3, 1))
        xs.append(amp * base + rng.normal(0, 0.05, (n // 3, length)))
        ys.append(np.full(n // 3, c))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    perm = rng.permutation(n)
    return x[perm], y[perm]


@pytest.mark.parametrize("k", [1, 3, 8])
def test_pls_matches_sklearn(xy, k):
    x, y = xy
    skl = sklearn_cd.PLSRegression(n_components=k).fit(x, y.astype(float))
    ours = pls_fit(jnp.asarray(x), jnp.asarray(y, jnp.float64), k)
    # scores/loadings match up to per-component sign
    t_skl = skl.x_scores_
    t_our = np.asarray(ours.scores)
    signs = np.sign(np.sum(t_skl * t_our, axis=0))
    np.testing.assert_allclose(t_our * signs, t_skl, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours.loadings) * signs,
                               skl.x_loadings_, atol=1e-8)
    # transform of new data
    rng = np.random.default_rng(1)
    x_new = x + rng.normal(0, 0.01, x.shape)
    np.testing.assert_allclose(np.asarray(pls_transform(ours, x_new)) * signs,
                               skl.transform(x_new), atol=1e-8)
    # regression prediction is sign-invariant
    np.testing.assert_allclose(np.asarray(pls_predict(ours, x_new)),
                               skl.predict(x_new).ravel(), atol=1e-8)


def test_prefix_property(xy):
    """The k-component model is a prefix of the K-component one — the basis
    of the single-fit component sweep."""
    x, y = xy
    big = pls_fit(jnp.asarray(x), jnp.asarray(y, jnp.float64), 8)
    small = pls_fit(jnp.asarray(x), jnp.asarray(y, jnp.float64), 3)
    np.testing.assert_allclose(np.asarray(big.scores)[:, :3],
                               np.asarray(small.scores), atol=1e-9)
    np.testing.assert_allclose(np.asarray(pls_transform(big, x, 3)),
                               np.asarray(pls_transform(small, x)),
                               atol=1e-9)


def test_lda_matches_sklearn_predictions(xy):
    x, y = xy
    ours_pls = pls_fit(jnp.asarray(x), jnp.asarray(y, jnp.float64), 5)
    t = np.asarray(ours_pls.scores)
    skl = LinearDiscriminantAnalysis().fit(t, y)
    ours = lda_fit(jnp.asarray(t), jnp.asarray(y), 3)
    pred = np.asarray(lda_predict(ours, jnp.asarray(t)))
    np.testing.assert_array_equal(pred, skl.predict(t))


def test_f1_macro_matches_sklearn(xy):
    _, y = xy
    rng = np.random.default_rng(2)
    pred = y.copy()
    flip = rng.integers(0, len(y), 30)
    pred[flip] = rng.integers(0, 3, 30)
    ours = float(f1_macro(jnp.asarray(y), jnp.asarray(pred), 3))
    theirs = f1_score(y, pred, average="macro")
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_stratified_kfold_proportions(xy):
    _, y = xy
    folds = stratified_kfold_indices(y, 5)
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test) == list(range(len(y)))  # partition
    for tr, te in folds:
        assert set(tr) | set(te) == set(range(len(y)))
        # class proportions preserved within 1 sample per class
        for c in range(3):
            n_c = (y[te] == c).sum()
            assert abs(n_c - (y == c).sum() / 5) <= 1


def test_f1_curves_and_final_fit(xy):
    x, y = xy
    curves = plsda_f1_curves(x, y, max_components=6, n_folds=4)
    assert curves["f1_cal"].shape == (6,)
    assert curves["f1_cv"].shape == (6,)
    assert 1 <= curves["best_n_components"] <= 6
    assert np.all(curves["f1_cal"] >= 0) and np.all(curves["f1_cal"] <= 1)
    # well-separated classes: high CV F1 at best k
    assert curves["f1_cv"].max() > 0.9

    res = plsda_fit_predict(x, y, x, y, curves["best_n_components"])
    assert res.confusion.sum() == len(y)
    assert res.f1_test > 0.9
    assert np.trace(res.confusion) >= 0.9 * len(y)

    d = discriminant_vectors(res.pls, res.lda)
    assert d.shape == (x.shape[1], 2)          # C-1 discriminant directions
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-9)
