"""sklearn facade: clone/GridSearchCV compatibility + parity with the
native cores (ocm_tpu/sklearn_api.py).

Shapes are deliberately tiny — the facade is plumbing over already-tested
cores, so these tests assert API contracts and decision parity, not
statistics.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.base import clone
from sklearn.exceptions import NotFittedError
from sklearn.model_selection import GridSearchCV, cross_val_score

from ocm_tpu.sklearn_api import (SIMCAClassifier, SIMCAOneClass,
                                 VAESIMCAOneClass)

L = 40


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    grid = np.linspace(0, 1, L)
    means = [np.sin(6 * grid), np.cos(6 * grid), 1.5 * grid]
    xs, ys = [], []
    for c, m in enumerate(means):
        xs.append(m[None, :] + 0.08 * rng.standard_normal((24, L)))
        ys.append(np.full(24, c))
    return np.concatenate(xs).astype(np.float64), np.concatenate(ys)


def test_one_class_api_and_parity(blobs):
    X, y = blobs
    est = SIMCAOneClass(n_components=3)
    with pytest.raises(NotFittedError):
        est.predict(X)
    est.fit(X[y == 0])

    df = est.decision_function(X)
    pred = est.predict(X)
    assert df.shape == (X.shape[0],)
    np.testing.assert_array_equal(pred, np.where(df > 0, 1, -1))
    np.testing.assert_allclose(
        est.score_samples(X), df - float(est.model_.d_limit))

    # decisions == the native core's accept (strict '<' boundary)
    from ocm_tpu.models.simca import simca_decide

    accept, _, _, _ = simca_decide(est.model_, jnp.asarray(X), "alt")
    np.testing.assert_array_equal(pred == 1, np.asarray(accept))

    # in-class mostly accepted at 95% limits, out-class mostly rejected
    assert (pred[y == 0] == 1).mean() > 0.8
    assert (pred[y != 0] == -1).mean() > 0.9

    # clone sees constructor args verbatim
    c = clone(est)
    assert c.get_params() == est.get_params()
    assert not hasattr(c, "model_")


def test_one_class_fit_predict_mixin(blobs):
    X, y = blobs
    fp = SIMCAOneClass(n_components=2).fit_predict(X[y == 1])
    assert set(np.unique(fp)) <= {-1, 1}
    assert (fp == 1).mean() > 0.8


@pytest.mark.parametrize("unequal", [False, True])
def test_classifier_parity_with_reference_wrapper(blobs, unequal):
    X, y = blobs
    if unequal:
        keep = np.ones(len(y), bool)
        keep[np.where(y == 2)[0][:7]] = False  # class sizes 24/24/17
        X, y = X[keep], y[keep]
    est = SIMCAClassifier(n_components=3).fit(X, y)

    pred = est.predict(X)
    assert pred.shape == (X.shape[0],)
    assert set(pred) <= set(est.classes_)
    assert (pred == y).mean() > 0.9  # well-separated blobs

    margin = est.decision_function(X)
    acc = est.accept_matrix(X)
    assert margin.shape == acc.shape == (X.shape[0], 3)
    np.testing.assert_array_equal(acc, margin > 0)

    # acceptance matrix == the strict-parity wrapper's 0/1 predictions.
    # Equal sizes share the exact dense-svd fit path; unequal sizes route
    # the facade through the masked-eigh fit, which matches the wrapper's
    # dense svd to float tolerance — decisions agree exactly away from
    # limit boundaries, which holds on these separated blobs.
    from ocm_tpu.models.simca import SIMCA

    ref = SIMCA(n_components=3, model_class=list(est.classes_),
                verbose=False, solver="svd")
    ref.fit(X, y)
    np.testing.assert_array_equal(acc.astype(float), ref.predict(X))


def test_classifier_gridsearch_and_cv(blobs):
    X, y = blobs
    gs = GridSearchCV(SIMCAClassifier(), {"n_components": [2, 4]},
                      cv=2, error_score="raise")
    gs.fit(X, y)
    assert gs.best_params_["n_components"] in (2, 4)
    assert gs.best_estimator_.predict(X).shape == (X.shape[0],)

    scores = cross_val_score(SIMCAClassifier(n_components=2), X, y, cv=2,
                             error_score="raise")
    assert scores.shape == (2,) and np.all(scores > 0.5)


def test_classifier_validation(blobs):
    X, y = blobs
    with pytest.raises(ValueError, match=">= 2 classes"):
        SIMCAClassifier().fit(X[y == 0], y[y == 0])
    with pytest.raises(ValueError, match="inconsistent lengths"):
        SIMCAClassifier().fit(X, y[:-1])
    with pytest.raises(NotFittedError):
        SIMCAClassifier().predict(X)


def test_classifier_unequal_sizes_warns_on_dtype(blobs):
    """A user-specified dtype cannot be honored on the masked
    (unequal-size) path — warn instead of silently changing compute
    dtype with class balance (round-4 advisor finding)."""
    X, y = blobs
    Xu, yu = X[3:], y[3:]  # drop 3 rows of class 0 -> unequal counts
    with pytest.warns(UserWarning, match="dtype.*ignored"):
        SIMCAClassifier(n_components=3, dtype=jnp.float32).fit(Xu, yu)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        SIMCAClassifier(n_components=3).fit(Xu, yu)  # default: no warning


def test_vaesimca_one_class(blobs):
    X, y = blobs
    x0 = X[y == 0].astype(np.float32)
    est = VAESIMCAOneClass(latent_dim=3, conv_blocks=2, n_filters=4,
                           hidden_fc=16, epochs=2, batch_size=16,
                           random_state=3)
    with pytest.raises(NotFittedError):
        est.predict(x0)
    est.fit(x0)

    assert est.train_losses_.shape == (2,)
    assert 0 <= est.best_epoch_ < 2
    df = est.decision_function(X)
    assert df.shape == (X.shape[0],) and np.all(np.isfinite(df))
    np.testing.assert_array_equal(est.predict(X), np.where(df > 0, 1, -1))

    # decisions == the native predict path on the fitted state
    from ocm_tpu.models.vaesimca import predict_vaesimca

    accept, _, _ = predict_vaesimca(est.network_, est.bundle_, est.vs_,
                                    jnp.asarray(X.astype(np.float32)))
    np.testing.assert_array_equal(est.predict(X) == 1, np.asarray(accept))

    c = clone(est)
    assert c.get_params()["latent_dim"] == 3
    assert not hasattr(c, "vs_")


def test_randomized_search_cv_end_to_end(blobs):
    """RandomizedSearchCV drives VAESIMCAOneClass as a search surface
    (round-5 verdict item 8): the shared-protocol objective via
    neg_val_loss, a pinned validation split via val_indices, a single
    trivial CV fold so each candidate trains once — and the reported
    incumbent is exactly the best per-candidate objective."""
    from scipy.stats import loguniform
    from sklearn.model_selection import RandomizedSearchCV

    from ocm_tpu.sklearn_api import neg_val_loss

    X, y = blobs
    x0 = X[y == 0].astype(np.float32)
    n = x0.shape[0]
    val_idx = np.arange(n - 6, n)          # pinned validation rows
    base = VAESIMCAOneClass(latent_dim=3, conv_blocks=2, n_filters=4,
                            hidden_fc=16, epochs=2, batch_size=16,
                            val_indices=val_idx, random_state=3)
    search = RandomizedSearchCV(
        base,
        {"lr": loguniform(1e-4, 1e-2), "beta": loguniform(1e-2, 2.0)},
        n_iter=3, scoring=neg_val_loss, cv=[(np.arange(n), np.arange(2))],
        random_state=11, refit=True, error_score="raise")
    search.fit(x0)

    # incumbent bookkeeping: best_score_ is the max of the per-candidate
    # objectives, and the refit best_estimator_ reproduces it
    assert search.cv_results_["mean_test_score"].shape == (3,)
    assert np.isfinite(search.cv_results_["mean_test_score"]).all()
    assert search.best_score_ == search.cv_results_["mean_test_score"].max()
    assert np.isclose(neg_val_loss(search.best_estimator_),
                      search.best_score_, rtol=1e-6)
    # the refit estimator is a working detector
    assert set(np.unique(search.best_estimator_.predict(x0))) <= {-1, 1}


def test_val_indices_pins_the_split(blobs):
    """val_indices must carve exactly those rows into the val set (the
    objective then matches tpe_vae_search on the same cal/val data)."""
    X, y = blobs
    x0 = X[y == 0].astype(np.float32)
    n = x0.shape[0]
    est = VAESIMCAOneClass(latent_dim=3, conv_blocks=2, n_filters=4,
                           hidden_fc=16, epochs=2, batch_size=16,
                           val_indices=np.arange(4), random_state=3)
    est.fit(x0)
    assert est.val_losses_.shape == (2,)

    with pytest.raises(ValueError, match="val_indices"):
        VAESIMCAOneClass(val_indices=np.array([n + 3])).fit(x0)
    with pytest.raises(ValueError, match="calibration"):
        VAESIMCAOneClass(val_indices=np.arange(n - 1)).fit(x0)
