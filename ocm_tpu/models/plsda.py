"""PLS-DA: partial least squares + linear discriminant analysis.

Re-design of the reference's cheese PLS-DA baseline (``data_cheese.py:193-280``):
``PLSRegression(n_components)`` on integer labels, LDA on the PLS scores,
StratifiedKFold macro-F1 curves per component count, best-k refit, test
confusion matrix, and the discriminant-vector back-projection
``D = P_scaled @ W_lda.T`` (``data_cheese.py:305-328``).

TPU-first structure:

- ``pls_fit`` is one jitted ``lax.scan`` over components implementing NIPALS
  PLS1 (deterministic closed form per deflation for a single target column —
  exactly what ``PLSRegression.fit(X, labels)`` runs).  NIPALS is GREEDY:
  the k-component model is a PREFIX of the K-component one, so the whole
  component sweep of ``data_cheese.py:201-224`` needs ONE fit per fold
  instead of K fits — the per-k work collapses to an LDA on the first k
  score columns (vmapped with column masks).
- ``lda_fit``/``lda_predict`` implement Gaussian LDA with a shared
  within-class covariance (sklearn's decision rule); masked dimensions are
  identity-padded so one vmap covers every component count.

sklearn parity is asserted in tests/test_plsda.py (scores, loadings,
predictions).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PLSModel(NamedTuple):
    """NIPALS PLS1 state (sklearn PLSRegression attribute names in the
    comments)."""

    x_mean: jnp.ndarray    # (L,)
    x_std: jnp.ndarray     # (L,)  all-ones when scale=False
    y_mean: jnp.ndarray    # ()
    y_std: jnp.ndarray     # ()
    weights: jnp.ndarray   # (L, K)  x_weights_
    loadings: jnp.ndarray  # (L, K)  x_loadings_
    y_loadings: jnp.ndarray  # (K,)
    rotations: jnp.ndarray  # (L, K)  x_rotations_ = W (P^T W)^-1
    scores: jnp.ndarray    # (N, K)  x_scores_ of the training data


@functools.partial(jax.jit, static_argnames=("n_components", "scale"))
def pls_fit(x, y, n_components: int, scale: bool = True) -> PLSModel:
    """NIPALS PLS1 fit equal to ``PLSRegression(n_components).fit(X, y)``
    for a single target column (data_cheese.py:202-203)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y, x.dtype)
    x_mean = jnp.mean(x, axis=0)
    y_mean = jnp.mean(y)
    if scale:
        # sklearn uses ddof=1 std and replaces 0 std with 1
        x_std = jnp.std(x, axis=0, ddof=1)
        x_std = jnp.where(x_std == 0, 1.0, x_std)
        y_std = jnp.std(y, ddof=1)
        y_std = jnp.where(y_std == 0, 1.0, y_std)
    else:
        x_std = jnp.ones_like(x_mean)
        y_std = jnp.ones((), x.dtype)
    xc = (x - x_mean) / x_std
    yc = (y - y_mean) / y_std

    def step(carry, _):
        xd, yd = carry
        w = xd.T @ yd                     # PLS1: one power iteration, exact
        w = w / jnp.linalg.norm(w)
        t = xd @ w
        tt = t @ t
        p = (xd.T @ t) / tt
        q = (yd @ t) / tt
        xd = xd - jnp.outer(t, p)
        yd = yd - t * q
        return (xd, yd), (w, p, q, t)

    (_, _), (ws, ps, qs, ts) = jax.lax.scan(step, (xc, yc),
                                            None, length=n_components)
    weights = ws.T          # (L, K)
    loadings = ps.T
    scores = ts.T           # (N, K)
    # rotations R = W (P^T W)^{-1}: triangular system, prefix-consistent
    rotations = weights @ jnp.linalg.inv(loadings.T @ weights)
    return PLSModel(x_mean, x_std, y_mean, y_std, weights, loadings, qs,
                    rotations, scores)


def pls_transform(model: PLSModel, x, n_components: Optional[int] = None):
    """Scores of new data; first k columns == PLSRegression(k).transform."""
    xc = (jnp.asarray(x) - model.x_mean) / model.x_std
    t = xc @ model.rotations
    if n_components is not None:
        t = t[:, :n_components]
    return t


def pls_predict(model: PLSModel, x):
    """Regression prediction y_hat (PLSRegression.predict)."""
    t = pls_transform(model, x)
    return (t @ model.y_loadings) * model.y_std + model.y_mean


class LDAModel(NamedTuple):
    means: jnp.ndarray      # (C, k) class means
    cov_inv: jnp.ndarray    # (k, k) shared within-class covariance inverse
    log_priors: jnp.ndarray  # (C,)
    coef: jnp.ndarray       # (C, k)   Sigma^-1 mu_c
    intercept: jnp.ndarray  # (C,)


def lda_fit(scores, labels, n_classes: int, dim_mask=None) -> LDAModel:
    """Gaussian LDA with shared covariance (sklearn's decision rule).

    ``dim_mask`` (k,) zeroes out trailing dimensions so a single vmap covers
    every PLS component count: masked dims get identity covariance and zero
    means, contributing nothing to discriminants.
    """
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels)
    k = scores.shape[1]
    if dim_mask is None:
        dim_mask = jnp.ones((k,), scores.dtype)
    s = scores * dim_mask[None, :]

    onehot = (labels[:, None] == jnp.arange(n_classes)[None, :]).astype(
        s.dtype)
    counts = jnp.sum(onehot, axis=0)
    means = (onehot.T @ s) / counts[:, None]
    centered = s - onehot @ means
    # sklearn: within-class covariance normalized by n - C (bias-corrected)
    cov = (centered.T @ centered) / (s.shape[0] - n_classes)
    cov = cov * jnp.outer(dim_mask, dim_mask) + jnp.diag(1.0 - dim_mask)
    cov_inv = jnp.linalg.inv(cov)
    log_priors = jnp.log(counts / s.shape[0])
    coef = means @ cov_inv
    intercept = -0.5 * jnp.sum(coef * means, axis=1) + log_priors
    return LDAModel(means, cov_inv, log_priors, coef, intercept)


def lda_predict(model: LDAModel, scores, dim_mask=None):
    s = jnp.asarray(scores)
    if dim_mask is not None:
        s = s * dim_mask[None, :]
    return jnp.argmax(s @ model.coef.T + model.intercept[None, :], axis=1)


def f1_macro(y_true, y_pred, n_classes: int):
    """Macro-averaged F1, matching sklearn f1_score(average='macro')
    (data_cheese.py:209): classes absent from BOTH y_true and y_pred still
    count as 0 toward the mean."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    cls = jnp.arange(n_classes)
    tp = jnp.sum((y_pred[:, None] == cls) & (y_true[:, None] == cls), axis=0)
    fp = jnp.sum((y_pred[:, None] == cls) & (y_true[:, None] != cls), axis=0)
    fn = jnp.sum((y_pred[:, None] != cls) & (y_true[:, None] == cls), axis=0)
    f1 = 2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1.0)
    return jnp.mean(f1)


# ---------------------------------------------------------------------------
# Component-sweep CV (data_cheese.py:193-224) as prefix evaluations.
# ---------------------------------------------------------------------------

def stratified_kfold_indices(labels, n_splits: int, shuffle: bool = True,
                             random_state: Optional[int] = 42):
    """Stratified fold assignment: per class, a seeded permutation dealt
    round-robin across folds.  Preserves class proportions per fold like
    sklearn StratifiedKFold; the exact index sets differ from sklearn's
    implementation (documented deviation — fold composition is a protocol
    detail, not an output of the reference)."""
    labels = np.asarray(labels)
    assign = np.zeros(len(labels), dtype=int)
    rng = np.random.RandomState(random_state)
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        if shuffle:
            idx = idx[rng.permutation(len(idx))]
        assign[idx] = np.arange(len(idx)) % n_splits
    return [(np.flatnonzero(assign != f), np.flatnonzero(assign == f))
            for f in range(n_splits)]


def plsda_f1_curves(x, y, max_components: int = 25, n_folds: int = 5,
                    random_state: int = 42, scale: bool = True):
    """Calibration + CV macro-F1 vs component count (data_cheese.py:193-224).

    One PLS(max_components) fit per fold (prefix property) + a vmapped
    masked LDA per component count — K x folds sklearn fits collapse into
    n_folds + 1 fits.
    Returns dict with 'f1_cal' (K,), 'f1_cv' (K,), 'best_n_components'.
    """
    x = jnp.asarray(x)
    y_np = np.asarray(y)
    n_classes = int(y_np.max()) + 1
    y_dev = jnp.asarray(y_np)
    ks = jnp.arange(1, max_components + 1)
    masks = (jnp.arange(max_components)[None, :] < ks[:, None]).astype(
        x.dtype)

    @jax.jit
    def curves_for(x_tr, y_tr, x_te, y_te):
        model = pls_fit(x_tr, y_tr.astype(x.dtype), max_components,
                        scale=scale)
        t_tr = pls_transform(model, x_tr)
        t_te = pls_transform(model, x_te)

        def per_k(mask):
            lda = lda_fit(t_tr, y_tr, n_classes, dim_mask=mask)
            pred = lda_predict(lda, t_te, dim_mask=mask)
            return f1_macro(y_te, pred, n_classes)

        return jax.vmap(per_k)(masks)

    f1_cal = np.asarray(curves_for(x, y_dev, x, y_dev))
    folds = stratified_kfold_indices(y_np, n_folds, True, random_state)
    f1_folds = [np.asarray(curves_for(x[jnp.asarray(tr)], y_dev[tr],
                                      x[jnp.asarray(te)], y_dev[te]))
                for tr, te in folds]
    f1_cv = np.mean(f1_folds, axis=0)
    return {"f1_cal": f1_cal, "f1_cv": f1_cv,
            "best_n_components": int(np.argmax(f1_cv)) + 1}


class PLSDAResult(NamedTuple):
    pls: PLSModel
    lda: LDAModel
    n_components: int
    y_pred: np.ndarray
    confusion: np.ndarray
    f1_test: float


def plsda_fit_predict(x_train, y_train, x_test, y_test,
                      n_components: int, scale: bool = True) -> PLSDAResult:
    """Final best-k PLS-DA fit + test evaluation (data_cheese.py:256-280)."""
    y_np = np.asarray(y_train)
    n_classes = int(max(y_np.max(), np.asarray(y_test).max())) + 1
    pls = pls_fit(jnp.asarray(x_train), jnp.asarray(y_np, jnp.float64
                                                    if jnp.asarray(x_train).dtype == jnp.float64
                                                    else jnp.float32),
                  n_components, scale=scale)
    t_tr = pls_transform(pls, x_train)
    t_te = pls_transform(pls, x_test)
    lda = lda_fit(t_tr, jnp.asarray(y_np), n_classes)
    pred = np.asarray(lda_predict(lda, t_te))
    conf = np.zeros((n_classes, n_classes), dtype=int)
    for t, p in zip(np.asarray(y_test), pred):
        conf[int(t), int(p)] += 1
    f1 = float(f1_macro(jnp.asarray(y_test), jnp.asarray(pred), n_classes))
    return PLSDAResult(pls, lda, n_components, pred, conf, f1)


def discriminant_vectors(pls: PLSModel, lda: LDAModel,
                         variance_scaled: bool = True):
    """Back-projected, normalized discriminant directions in spectral space
    (data_cheese.py:305-328): D = (P * sqrt(var(T))) @ W_lda^T, columns
    L2-normalized."""
    p = np.asarray(pls.loadings)
    w = np.asarray(lda.coef)[1:] if lda.coef.shape[0] > 1 else np.asarray(
        lda.coef)
    # the reference uses sklearn's LDA coef_ ((C-1, k) for C>2); the shared-
    # covariance coef rows differ by a constant shift that the normalized
    # projection removes — use pairwise differences to the first class
    w_full = np.asarray(lda.coef)
    w = w_full[1:] - w_full[0] if w_full.shape[0] > 1 else w_full
    if variance_scaled:
        var = np.var(np.asarray(pls.scores), axis=0, ddof=1)
        p = p * np.sqrt(var)[None, :]
    d = p @ w.T
    norms = np.linalg.norm(d, axis=0, keepdims=True)
    return d / np.where(norms == 0, 1.0, norms)
