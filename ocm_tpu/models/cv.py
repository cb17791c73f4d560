"""CV-SIMCA: cross-validated component selection as ONE batched solve.

The reference's ``cross_validate_simca_grid`` (utils/CVSIMCA.py:103-269) runs
a triple host loop — ParameterGrid combos x LV values x folds — refitting
sklearn PCA from scratch at every point (SURVEY.md section 3.3; the
BASELINE.json north-star target).  The TPU formulation exploits two
structural facts:

1. fold membership is a MASK, not a data layout: all fold fits share the
   padded (N_cls, L) matrix, so the per-fold eigendecompositions are one
   vmapped batched eigh;
2. the decomposition is independent of the LV count: scores/eigenvalues are
   computed once per fold and the whole LV sweep reduces to masked
   reductions + device-side quantile inversions (the exact-arithmetic
   identity cov(T) = diag(eigenvalues) removes the per-LV pinv the
   reference recomputes — T^2 = sum_j<k t_j^2 / lambda_j).

So a full (folds x LV) sweep is: F eigh + 2F GEMMs + elementwise work,
executed as one jitted program per preprocessing combo.

CV protocol parity (utils/CVSIMCA.py):
- ``ClasswiseKFoldWithExternalVal`` — KFold over target-class samples only;
  each fold's test set = held-out target fold + ALL other-class samples
  (:54-80).  KFold split sizes/order match sklearn (contiguous blocks,
  first n % k folds one larger; optional shuffle with seeded permutation).
- spec = mean over folds; sens = recomputed on pooled predictions;
  eff = sqrt(sens * spec) (:203-208).  The pooled prediction vector uses
  each target sample's own held-out fold (other-class samples are scored in
  every fold; the reference's overwrite-by-last-fold semantics only affect
  entries that never reach the sens computation).
- best = argmax of refit_metric with first-max tie-break (:228-233), refit
  on the full data (:251-258).
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ocm_tpu.models.simca import (SIMCA, MaskedPCA, masked_pca_eig,
                                  masked_q_limit, masked_t2_limit)
from ocm_tpu.ops.linalg import (deflated_theta_tables, pca_topk_cov,
                                thetas_from_tables)
from ocm_tpu.stats import limits as L


# ---------------------------------------------------------------------------
# Fold construction (host side, sklearn-compatible).
# ---------------------------------------------------------------------------

def kfold_slices(n: int, n_splits: int, shuffle: bool = False,
                 random_state: Optional[int] = None) -> list[np.ndarray]:
    """sklearn ``KFold`` fold indices: contiguous blocks, the first
    n % n_splits folds one element larger; seeded permutation if shuffled."""
    if n_splits < 2:
        raise ValueError("n_splits must be at least 2")
    if n < n_splits:
        raise ValueError(
            f"cannot split {n} samples into {n_splits} folds")
    idx = np.arange(n)
    if shuffle:
        rng = np.random.RandomState(random_state)
        rng.shuffle(idx)
    sizes = np.full(n_splits, n // n_splits, dtype=int)
    sizes[: n % n_splits] += 1
    out, start = [], 0
    for s in sizes:
        out.append(idx[start:start + s])
        start += s
    return out


class ClasswiseKFoldWithExternalVal:
    """K-fold over target-class samples with external validation
    (utils/CVSIMCA.py:39-80): train = target-class minus the held fold;
    test = held fold + ALL other-class samples.  Accepts ``cls_idx``
    (explicit indices or a scalar label) or ``cls_label``."""

    def __init__(self, n_splits: int = 5, cls_idx=None, cls_label=None,
                 shuffle: bool = False, random_state: Optional[int] = None):
        self.n_splits = n_splits
        self.cls_idx = None if cls_idx is None else np.asarray(cls_idx)
        self.cls_label = cls_label
        self.shuffle = shuffle
        self.random_state = random_state

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits

    def _resolve_cls_idx(self, X, y):
        cls_idx = self.cls_idx
        if cls_idx is None and self.cls_label is not None:
            if y is None:
                raise ValueError("cls_label requires y in split(X, y)")
            cls_idx = np.flatnonzero(np.asarray(y) == self.cls_label)
        if cls_idx is not None and np.ndim(cls_idx) == 0:
            if y is None:
                raise ValueError("scalar cls_idx needs y to resolve indices")
            cls_idx = np.flatnonzero(np.asarray(y) == int(cls_idx))
        if cls_idx is None or cls_idx.size == 0:
            raise ValueError("no target-class samples found")
        if cls_idx.size < self.n_splits:
            raise ValueError(
                f"{self.n_splits} splits > {cls_idx.size} target samples")
        return cls_idx

    def split(self, X, y=None, groups=None):
        cls_idx = self._resolve_cls_idx(X, y)
        others = np.setdiff1d(np.arange(np.shape(X)[0]), cls_idx)
        for fold_rel in kfold_slices(cls_idx.size, self.n_splits,
                                     self.shuffle, self.random_state):
            held = cls_idx[fold_rel]
            train_idx = np.setdiff1d(cls_idx, held)
            yield train_idx, np.concatenate([held, others])


def fold_masks(y, cls_label, n_splits: int, shuffle: bool = False,
               random_state: Optional[int] = None):
    """Fold membership as dense masks for the batched solve.

    Returns (train_masks (F, N), held_masks (F, N)): train = target class
    minus the held fold; held = the held-out target fold.  The external
    test set of fold f is held_masks[f] | (y != cls_label).
    """
    y = np.asarray(y)
    cls_idx = np.flatnonzero(y == cls_label)
    folds = kfold_slices(cls_idx.size, n_splits, shuffle, random_state)
    n = y.shape[0]
    train = np.zeros((n_splits, n), dtype=bool)
    held = np.zeros((n_splits, n), dtype=bool)
    for f, fold_rel in enumerate(folds):
        h = cls_idx[fold_rel]
        held[f, h] = True
        train[f, cls_idx] = True
        train[f, h] = False
    return train, held


# ---------------------------------------------------------------------------
# The batched (folds x LV) solve — SINGLE-SOURCE helpers.
#
# Every CV path (local cv_simca_sweep, 1-D cv_sweep_sharded, 2-D
# cv_sweep_sharded_2d) must fit each fold with EXACTLY the same math: the
# per-fold decomposition, the per-LV T2/Q identity and the pooled
# aggregation each have one implementation here, used everywhere.
# ---------------------------------------------------------------------------

def lv_t2_q(eigenvalues, t, xc2, k):
    """Per-LV T2 and Q from scores over the retained directions.

    The exact-arithmetic identity cov(T) = diag(eigenvalues) makes
    T2 = sum_{j<k} t_j^2 / lambda_j (with np.linalg.pinv's relative
    cutoff), and Q = ||xc||^2 - sum_{j<k} t_j^2 (orthonormal loadings) —
    so the whole LV sweep reuses one scores GEMM.
    """
    r = eigenvalues.shape[0]
    comp = jnp.arange(r) < k
    cutoff = 1e-15 * jnp.max(eigenvalues)
    inv_lam = jnp.where((eigenvalues > cutoff) & comp,
                        1.0 / jnp.maximum(eigenvalues, 1e-300), 0.0)
    t2 = jnp.sum(t * t * inv_lam[None, :], axis=1)
    q = jnp.maximum(
        xc2 - jnp.sum(jnp.where(comp[None, :], t * t, 0.0), axis=1), 0.0)
    return t2, q


def lv_limits(t2_train, q_train, w_train, n, k, thetas, decision_type,
              t2_method, q_method, t2_cl, q_cl, d_cl):
    """Masked limit engines + critical distance for one (fold, LV) cell."""
    t2_res = masked_t2_limit(t2_train, w_train, n, k, t2_method, t2_cl)
    q_res = masked_q_limit(q_train, w_train, n, q_method, q_cl, thetas)
    d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                  n_components=k, thetas=thetas, dcl=d_cl)
    return t2_res, q_res, d_limit


def _lv_metrics(pca: MaskedPCA, thetas, t_train, t_all, xc2_train, xc2_all,
                w_train, held_mask, other_mask, k,
                decision_type: str, t2_method: str, q_method: str,
                t2_cl: float, q_cl: float, d_cl: float):
    """Decide + score one (fold, LV) cell from the shared decomposition.

    ``t_train``/``t_all`` are score matrices over the decomposition's
    retained directions (one GEMM per fold, reused across every LV);
    ``xc2_*`` the row norms of the centered data; ``k`` the traced LV
    count; ``thetas`` the residual eigenvalue moments for this k (full
    spectrum sums on the eigh path, covariance deflation on the rsvd
    path).
    """
    t2_train, q_train = lv_t2_q(pca.eigenvalues, t_train, xc2_train, k)
    t2_res, q_res, d_limit = lv_limits(
        t2_train, q_train, w_train, pca.n, k, thetas, decision_type,
        t2_method, q_method, t2_cl, q_cl, d_cl)

    t2_all, q_all = lv_t2_q(pca.eigenvalues, t_all, xc2_all, k)
    dred = L.reduced_distance(decision_type, t2_all, q_all, t2_res, q_res)
    accept = dred < d_limit

    # fold-level conformity metrics over the external test set
    # (held target fold + all other-class samples), utils/CVSIMCA.py:195
    test_mask = held_mask | other_mask
    in_class = held_mask
    tp = jnp.sum(accept & in_class & test_mask)
    fn = jnp.sum(~accept & in_class & test_mask)
    fp = jnp.sum(accept & ~in_class & test_mask)
    tn = jnp.sum(~accept & ~in_class & test_mask)
    sens = tp / (tp + fn) * 100.0
    spec = tn / (tn + fp) * 100.0
    return accept, sens, spec


def fold_decomposition(x, w_train_b, solver: str, n_sub: int,
                       subspace_iters: int, side: str = "auto"):
    """THE per-fold decomposition (round-2 single-sourcing): masked mean +
    covariance + eigenpairs + per-LV residual-moment closure.

    Returns ``(pca, thetas_of)`` with ``thetas_of(k)`` yielding the
    residual eigenvalue moments for LV count ``k`` — full-spectrum sums on
    the dense-eigh path, O(s) covariance-deflation tables on the rsvd
    path.  Used verbatim by cv_simca_sweep AND the 1-D sharded sweep.
    """
    w = w_train_b.astype(x.dtype)
    if solver == "rsvd":
        # GEMM-only masked fit: covariance at full f32 matmul precision
        # (TPU default bf16 passes corrupt the residual moments — see
        # ops.linalg.pca_topk_cov), then randomized top-(max LV +
        # oversample) eigenpairs; per-LV thetas by deflation.
        n_eff = jnp.sum(w)
        with jax.default_matmul_precision("highest"):
            mean = jnp.sum(x * w[:, None], axis=0) / n_eff
            xc_w = (x - mean[None, :]) * w[:, None]
            c = (xc_w.T @ xc_w) / (n_eff - 1.0)
            vals, vecs = pca_topk_cov(c, n_sub, iters=subspace_iters)
        max_rank = jnp.minimum(n_eff, x.shape[1]).astype(jnp.int32)
        pca = MaskedPCA(mean, vecs, vals, n_eff, max_rank)
        # O(s) per-LV residual moments from once-per-fold tables
        tab = deflated_theta_tables(c, vals, vecs)
        thetas_of = lambda k: thetas_from_tables(tab, k)
    else:
        pca = masked_pca_eig(x, w_train_b, side=side)
        thetas_of = lambda k: L.residual_thetas(
            pca.eigenvalues, k, max_rank=pca.max_rank)
    return pca, thetas_of


def fold_lv_sweep(x, w_train_b, held_b, other_m, lvs, *, solver, n_sub,
                  subspace_iters, decision_type, t2_method, q_method,
                  t2_cl, q_cl, d_cl, side: str = "auto"):
    """One fold's full LV sweep: one decomposition + one scores GEMM +
    vmapped per-LV metrics.  The single implementation behind both the
    local and the 1-D sharded CV sweeps (round-2 VERDICT weak #3)."""
    pca, thetas_of = fold_decomposition(x, w_train_b, solver, n_sub,
                                        subspace_iters, side=side)
    w = w_train_b.astype(x.dtype)
    xc = x - pca.mean[None, :]
    with jax.default_matmul_precision("highest"):
        t_all = xc @ pca.eigvec      # one GEMM, shared by every LV
    t_train = t_all * w[:, None]
    xc2_all = jnp.sum(xc * xc, axis=1)
    xc2_train = xc2_all * w

    def per_lv(k):
        return _lv_metrics(pca, thetas_of(k), t_train, t_all,
                           xc2_train, xc2_all, w, held_b, other_m, k,
                           decision_type, t2_method, q_method, t2_cl,
                           q_cl, d_cl)

    return jax.vmap(per_lv)(lvs)     # (L, ...) per fold


def pooled_aggregate(accept, spec, held_m, other_m, dtype):
    """Per-LV aggregates matching utils/CVSIMCA.py:203-208: spec = fold
    mean, sens recomputed on pooled predictions (each target sample from
    its OWN held-out fold; other-class samples overwritten by the LAST
    fold, the reference's semantics), eff = sqrt(sens * spec).

    ``accept``: (F, L, N) bool; ``spec``: (F, L); ``held_m``: (F, N);
    ``other_m``: (N,).  Padded folds/columns must be sliced off before
    calling.  The single implementation behind every CV path.
    """
    spec_mean = jnp.mean(spec, axis=0)
    own = jnp.einsum("fln,fn->ln", accept.astype(dtype),
                     held_m.astype(dtype))
    pooled = jnp.where(other_m[None, :], accept[-1], own > 0)
    in_class = ~other_m
    tp = jnp.sum(pooled & in_class[None, :], axis=1)
    fn = jnp.sum((~pooled) & in_class[None, :], axis=1)
    sens_pooled = tp / (tp + fn) * 100.0
    eff = jnp.sqrt(sens_pooled * spec_mean)
    return {"pred": pooled, "sens": sens_pooled, "spec": spec_mean,
            "eff": eff}


def cv_simca_sweep(x, y, cls_label, lv_values: Sequence[int],
                   n_splits: int = 5, decision_type: str = "alt",
                   t2_method: str = "Fdist", q_method: str = "jm",
                   t2_cl: float = 0.95, q_cl: float = 0.95,
                   d_cl: float = 0.95, shuffle: bool = False,
                   random_state: Optional[int] = None,
                   convert: bool = True, solver: str = "eigh",
                   oversample: int = 10, subspace_iters: int = 4,
                   side: str = "auto"):
    """All (fold x LV) fits of one preprocessing combo in one jitted program.

    Returns dict with per-LV aggregates matching utils/CVSIMCA.py:203-208:
    ``spec`` (L,) fold-mean, ``sens`` (L,) pooled, ``eff`` (L,), plus the
    pooled prediction matrix ``pred`` (L, N) (target samples from their own
    held-out fold, other-class samples from the LAST fold, matching the
    reference's overwrite semantics).

    ``solver='eigh'`` (default) decomposes each fold's masked covariance
    densely — the strict parity path.  ``solver='rsvd'`` retains only the
    top-(max LV + oversample) eigenpairs via the GEMM-only randomized
    subspace iteration (ops.linalg.pca_topk_cov) with per-LV residual
    moments from covariance deflation — on TPU the dense eigh dominates
    the whole sweep (QDWH while-loop chains; docs/BENCHMARKS.md), so this
    is the production path for large sweeps.
    """
    x = jnp.asarray(x)
    y_np = np.asarray(y)
    train_np, held_np = fold_masks(y_np, cls_label, n_splits, shuffle,
                                   random_state)
    if decision_type == "dd":
        t2_method = "chi2pom"
        q_method = "chi2pom"
    if solver not in ("eigh", "rsvd"):
        raise ValueError(f"unknown solver {solver!r}; expected 'eigh' or"
                         " 'rsvd'")
    n_sub = min(int(max(lv_values)) + oversample, x.shape[1])
    out = _cv_sweep_jit(x, jnp.asarray(train_np), jnp.asarray(held_np),
                        jnp.asarray(y_np != cls_label),
                        jnp.asarray(list(lv_values), dtype=jnp.int32),
                        decision_type=decision_type, t2_method=t2_method,
                        q_method=q_method, t2_cl=t2_cl, q_cl=q_cl,
                        d_cl=d_cl, solver=solver, n_sub=n_sub,
                        subspace_iters=subspace_iters, side=side)
    if not convert:
        # leave results on device (callers composing further device work,
        # or environments where per-array D2H round trips dominate)
        return out
    return jax.tree.map(np.asarray, out)


@functools.partial(jax.jit, static_argnames=(
    "decision_type", "t2_method", "q_method", "t2_cl", "q_cl", "d_cl",
    "solver", "n_sub", "subspace_iters", "side"))
def _cv_sweep_jit(x, train_m, held_m, other_m, lvs, *, decision_type,
                  t2_method, q_method, t2_cl, q_cl, d_cl, solver="eigh",
                  n_sub=0, subspace_iters=4, side="auto"):
    """Cached compiled (fold x LV) solve — module-level jit so repeated
    sweeps (grid combos, benchmarks) reuse the compilation."""

    def per_fold(w_train_b, held_b):
        return fold_lv_sweep(
            x, w_train_b, held_b, other_m, lvs, solver=solver, n_sub=n_sub,
            subspace_iters=subspace_iters, decision_type=decision_type,
            t2_method=t2_method, q_method=q_method, t2_cl=t2_cl, q_cl=q_cl,
            d_cl=d_cl, side=side)

    accept, sens, spec = jax.vmap(per_fold)(train_m, held_m)
    # accept: (F, L, N); spec/sens: (F, L)
    out = pooled_aggregate(accept, spec, held_m, other_m, x.dtype)
    return {**out, "fold_sens": sens, "fold_spec": spec}


def cv_simca_sweep_multiclass(x, y, class_labels, lv_values: Sequence[int],
                              n_splits: int = 5, decision_type: str = "alt",
                              t2_method: str = "Fdist", q_method: str = "jm",
                              t2_cl: float = 0.95, q_cl: float = 0.95,
                              d_cl: float = 0.95, shuffle: bool = False,
                              random_state: Optional[int] = None,
                              solver: str = "eigh", oversample: int = 10,
                              subspace_iters: int = 4,
                              side: str = "auto") -> dict:
    """Every class's full (fold x LV) CV sweep in ONE jitted program.

    The reference runs its CV per target class from the driver loop
    (e.g. simca_new_cheese.py iterating ``class_index``, each invoking
    utils/CVSIMCA.py:103-269 from scratch).  Classes are just another
    batch axis over the SAME single-sourced fold solve
    (``fold_lv_sweep``), so C classes x F folds x L LVs lower to one
    vmap-of-vmap batched program — C x F decompositions and 2 C F GEMMs
    with zero host round trips in between.

    Returns the per-class aggregates stacked on a leading class axis:
    ``{"sens"/"spec"/"eff": (C, L), "pred": (C, L, N)}`` — row c matches
    ``cv_simca_sweep(x, y, class_labels[c], ...)`` exactly
    (tests/test_cv.py::test_multiclass_sweep_matches_per_class).
    """
    x = jnp.asarray(x)
    y_np = np.asarray(y)
    if solver not in ("eigh", "rsvd"):
        raise ValueError(f"unknown solver {solver!r}; expected 'eigh' or"
                         " 'rsvd'")
    if decision_type == "dd":
        t2_method = q_method = "chi2pom"
    trains, helds, others = [], [], []
    for c in class_labels:
        tr, he = fold_masks(y_np, c, n_splits, shuffle, random_state)
        trains.append(tr)
        helds.append(he)
        others.append(y_np != c)
    n_sub = min(int(max(lv_values)) + oversample, x.shape[1])
    lvs = jnp.asarray(list(lv_values), dtype=jnp.int32)

    out = _cv_sweep_multiclass_jit(
        x, jnp.asarray(np.stack(trains)), jnp.asarray(np.stack(helds)),
        jnp.asarray(np.stack(others)), lvs, decision_type=decision_type,
        t2_method=t2_method, q_method=q_method, t2_cl=t2_cl, q_cl=q_cl,
        d_cl=d_cl, solver=solver, n_sub=n_sub,
        subspace_iters=subspace_iters, side=side)
    return jax.tree.map(np.asarray, out)


@functools.partial(jax.jit, static_argnames=(
    "decision_type", "t2_method", "q_method", "t2_cl", "q_cl", "d_cl",
    "solver", "n_sub", "subspace_iters", "side"))
def _cv_sweep_multiclass_jit(x, train_m, held_m, other_m, lvs, *,
                             decision_type, t2_method, q_method, t2_cl,
                             q_cl, d_cl, solver, n_sub, subspace_iters,
                             side="auto"):
    def per_class(train_c, held_c, other_c):
        def per_fold(w_train_b, held_b):
            return fold_lv_sweep(
                x, w_train_b, held_b, other_c, lvs, solver=solver,
                n_sub=n_sub, subspace_iters=subspace_iters,
                decision_type=decision_type, t2_method=t2_method,
                q_method=q_method, t2_cl=t2_cl, q_cl=q_cl, d_cl=d_cl,
                side=side)

        accept, sens, spec = jax.vmap(per_fold)(train_c, held_c)
        return pooled_aggregate(accept, spec, held_c, other_c, x.dtype)

    return jax.vmap(per_class)(train_m, held_m, other_m)


# ---------------------------------------------------------------------------
# Grid search wrapper with the reference's API shape.
# ---------------------------------------------------------------------------

def parameter_grid(param_grid: dict):
    """sklearn ``ParameterGrid`` iteration order: keys sorted, itertools
    product with the LAST key varying fastest."""
    if not param_grid:
        yield {}
        return
    keys = sorted(param_grid)
    for values in itertools.product(*(param_grid[k] for k in keys)):
        yield dict(zip(keys, values))


def cross_validate_simca_grid(estimator: SIMCA, X, y, cv,
                              LV_min: int = 2, LV_max: int = 10,
                              param_grid: Optional[dict] = None,
                              refit_metric: str = "eff",
                              class_index=None, print_summary: bool = True,
                              store_predictions: bool = False):
    """Grid + LV sweep + classwise CV (utils/CVSIMCA.py:103-269), with the
    (fold x LV) inner loops executed as one batched device solve per combo.

    ``estimator`` is an ``ocm_tpu.models.simca.SIMCA``; ``cv`` a
    ``ClasswiseKFoldWithExternalVal`` (its n_splits/shuffle/seed are used).
    If the grid includes ``n_components`` the LV sweep is skipped
    (utils/CVSIMCA.py:135-140).  Returns the reference's dict shape:
    results / best_params / best_LV / best_score / best_estimator.
    """
    if param_grid is None:
        param_grid = {}
    if refit_metric not in ("eff", "spec", "sens"):
        raise ValueError(f"unknown refit_metric {refit_metric!r}")

    X = np.asarray(X)
    y = np.asarray(y)
    grid_includes_ncomp = any(k.endswith("n_components") for k in param_grid)
    cls_label = class_index
    if cls_label is None:
        mc = estimator.model_class
        cls_label = (mc[0] if isinstance(mc, list) else mc)
        if cls_label is None:
            cls_label = 1  # the reference's getattr(..., 'model_class', 1)

    results = []
    by_combo = []
    for combo in parameter_grid(param_grid):
        params = {**estimator.get_params(), **combo}
        lv_values = ([int(params["n_components"])] if grid_includes_ncomp
                     else list(range(LV_min, LV_max + 1)))
        # the estimator's solver choice carries into the sweep: 'rsvd'
        # selects the GEMM-only randomized fits; 'svd' (dense default)
        # maps to the sweep's dense masked eigh (identical spectrum)
        sweep_solver = "rsvd" if params.get("solver") == "rsvd" else "eigh"
        sweep = cv_simca_sweep(
            X, y, cls_label, lv_values, n_splits=cv.get_n_splits(X, y),
            decision_type=params["type"], t2_method=params["t2lim"],
            q_method=params["qlim"], t2_cl=params["t2cl"],
            q_cl=params["qcl"], d_cl=params["dcl"],
            shuffle=getattr(cv, "shuffle", False),
            random_state=getattr(cv, "random_state", None),
            solver=sweep_solver)
        for j, lv in enumerate(lv_values):
            rec = {"params": dict(combo), "LV": lv,
                   "spec": float(sweep["spec"][j]),
                   "sens": float(sweep["sens"][j]),
                   "eff": float(sweep["eff"][j])}
            results.append(rec)
            if store_predictions:
                by_combo.append({"params": dict(combo), "LV": lv,
                                 "prediction": sweep["pred"][j].astype(float)})

    best_idx = int(np.argmax([r[refit_metric] for r in results]))
    best = results[best_idx]

    if print_summary:
        for r in results:
            print(f"  LV={r['LV']:>2} | SPEC={r['spec']:.4f} | "
                  f"SENS={r['sens']:.4f} | EFF={r['eff']:.4f}")
        print(f"[best @ {refit_metric}] LV={best['LV']} | "
              f"score={best[refit_metric]:.4f} | params={best['params']}")

    best_estimator = SIMCA(**estimator.get_params())
    best_estimator.set_params(**best["params"])
    if not grid_includes_ncomp:
        best_estimator.set_params(n_components=best["LV"])
    best_estimator.set_params(model_class=cls_label)
    best_estimator.fit(X, y)

    out = {"results": results, "best_params": dict(best["params"]),
           "best_LV": best["LV"], "best_score": best[refit_metric],
           "best_estimator": best_estimator}
    if store_predictions:
        out["by_combo"] = by_combo
    return out
