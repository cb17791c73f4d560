"""Distributed SIMCA: sample-sharded fit and scoring over a device mesh.

TPU-native equivalent of scale the reference never had (SURVEY.md section
5.8): spectra shard across chips on the ``'data'`` mesh axis; the class
covariance accumulates with ``psum`` (sum_x, X^T X are the only cross-chip
traffic — O(L) and O(L^2), independent of sample count); the eigh and limit
engines run replicated on the tiny (L, L) covariance; scoring stays fully
sharded with zero collectives.

The fitted model is numerically identical to the single-chip
``fit_simca_masked`` (tests/test_parallel.py) because the math is the same
sums in a different order.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ocm_tpu.models.simca import (SIMCAModel, masked_q_limit,
                                  masked_t2_limit)
from ocm_tpu.ops.linalg import (deflated_theta_tables, deflated_thetas,
                                eigh_desc_signed, pca_topk_cov, pinv_psd,
                                thetas_from_tables)
from ocm_tpu.parallel.mesh import (DATA_AXIS, batch_sharding, cyclic_pad,
                                   pad_to_multiple, replicated)
from ocm_tpu.stats import limits as L


def _check_solver(solver: str):
    if solver not in ("eigh", "rsvd"):
        raise ValueError(f"unknown solver {solver!r}; expected 'eigh' or"
                         " 'rsvd'")


def fit_simca_sharded(x, w, n_components: int, mesh: Mesh,
                      decision_type: str = "alt", t2_method: str = "Fdist",
                      q_method: str = "jm", t2_cl: float = 0.95,
                      q_cl: float = 0.95, d_cl: float = 0.95,
                      axis: str = DATA_AXIS, solver: str = "eigh",
                      oversample: int = 10,
                      subspace_iters: int = 4) -> SIMCAModel:
    """Masked SIMCA fit with the sample axis sharded over ``mesh[axis]``.

    ``x``: (N, L) with N divisible by the axis size; ``w``: (N,) row mask
    (0 = padding/excluded).  Returns a fully-replicated SIMCAModel.

    ``solver='rsvd'`` replaces the replicated dense eigh of the psum'd
    covariance with the GEMM-only randomized subspace fit — on hardware
    the dense eigh dominates the whole sharded fit (TPU QDWH while-loop
    chains, docs/BENCHMARKS.md), and it runs REPLICATED on every chip, so
    its cost does not shrink with the mesh; the rsvd fit removes that
    serial term.  Residual moments come from covariance deflation.
    """
    _check_solver(solver)
    x = jnp.asarray(x)
    w = jnp.asarray(w, x.dtype)
    n_total, n_features = x.shape

    def fit_local(x_loc, w_loc):
        # ---- psum-accumulated class statistics --------------------------
        n = jax.lax.psum(jnp.sum(w_loc), axis)
        sum_x = jax.lax.psum(jnp.sum(x_loc * w_loc[:, None], axis=0), axis)
        mean = sum_x / n
        xc = (x_loc - mean[None, :]) * w_loc[:, None]
        with jax.default_matmul_precision("highest"):
            gram = jax.lax.psum(xc.T @ xc, axis)      # (L, L) cross-chip
            c = gram / (n - 1.0)

        # ---- replicated (chip-local) decomposition ----------------------
        if solver == "rsvd":
            s_sub = min(n_components + oversample, n_features)
            eigval, eigvec = pca_topk_cov(c, s_sub, iters=subspace_iters)
        else:
            eigval, eigvec = eigh_desc_signed(c)
        p = eigvec[:, :n_components].T

        # ---- sharded scores, psum score covariance ----------------------
        t = xc @ p.T                                   # (n_loc, k) local
        t_sum = jax.lax.psum(jnp.sum(t * w_loc[:, None], axis=0), axis)
        tm = t_sum / n
        tc = (t - tm[None, :]) * w_loc[:, None]
        invcovT = pinv_psd(jax.lax.psum(tc.T @ tc, axis) / (n - 1.0))
        t2_loc = jnp.einsum("ij,jk,ik->i", t, invcovT, t)
        q_loc = jnp.maximum(jnp.sum(xc * xc, axis=-1)
                            - jnp.sum(t * t, axis=-1), 0.0)

        # ---- limits on gathered train statistics (N scalars — tiny) -----
        t2_all = jax.lax.all_gather(t2_loc, axis, tiled=True)
        q_all = jax.lax.all_gather(q_loc, axis, tiled=True)
        w_all = jax.lax.all_gather(w_loc, axis, tiled=True)
        max_rank = jnp.minimum(n, n_features).astype(jnp.int32)
        if solver == "rsvd":
            thetas = deflated_thetas(c, eigval, eigvec, n_components)
        else:
            thetas = L.residual_thetas(eigval, n_components,
                                       max_rank=max_rank)
        t2_res = masked_t2_limit(t2_all, w_all, n, n_components,
                                 t2_method, t2_cl)
        q_res = masked_q_limit(q_all, w_all, n, q_method, q_cl, thetas)
        d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                      n_components=n_components,
                                      thetas=thetas, dcl=d_cl)
        return SIMCAModel(
            mean=mean, components=p, invcovT=invcovT, eigenvalues=eigval,
            t2_res=t2_res, q_res=q_res, d_limit=d_limit,
            t2_train=jnp.where(w_all > 0, t2_all, 0.0),
            q_train=jnp.where(w_all > 0, q_all, 0.0),
            n_samples=n.astype(jnp.int32))

    fit = shard_map(
        fit_local, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=SIMCAModel(
            mean=P(), components=P(), invcovT=P(), eigenvalues=P(),
            t2_res=L.LimitResult(P(), P(), P()),
            q_res=L.LimitResult(P(), P(), P()), d_limit=P(),
            t2_train=P(), q_train=P(), n_samples=P()),
        check_vma=False)
    return jax.jit(fit)(x, w)


def predict_sharded(model: SIMCAModel, x, mesh: Mesh,
                    decision_type: str = "alt", axis: str = DATA_AXIS):
    """Sharded batch scoring: each chip scores its spectra shard against the
    replicated model — zero collectives, linear scaling in chips.

    Returns (accept, dred, t2, q), all sharded along the sample axis.
    """
    from ocm_tpu.models.simca import simca_decide

    decide = functools.partial(simca_decide, decision_type=decision_type)
    fn = jax.jit(
        decide,
        in_shardings=(jax.tree.map(lambda _: replicated(mesh), model),
                      batch_sharding(mesh, axis)),
        out_shardings=batch_sharding(mesh, axis))
    return fn(model, jnp.asarray(x))


@functools.lru_cache(maxsize=None)
def _moments_ingest_jit(mesh: Mesh, axis: str):
    """Module-level jit cache for the streaming ingest (keyed on the mesh
    — a per-call closure jit would re-trace EVERY batch, defeating the
    point of a per-batch primitive; see the CLAUDE.md design rule)."""
    from ocm_tpu.models.streaming import SpectraMoments, moments_merge

    def ingest(mom_r, x_loc, w_loc):
        dt = mom_r.mean.dtype
        x_loc = x_loc.astype(dt)
        w_loc = w_loc.astype(dt)
        nb = jax.lax.psum(jnp.sum(w_loc), axis)
        safe_nb = jnp.where(nb > 0, nb, 1.0)
        mu_b = jax.lax.psum(
            jnp.sum(w_loc[:, None] * x_loc, axis=0), axis) / safe_nb
        xc = (x_loc - mu_b[None, :]) * jnp.sqrt(w_loc)[:, None]
        with jax.default_matmul_precision("highest"):
            scatter_b = jax.lax.psum(xc.T @ xc, axis)
        return moments_merge(mom_r, SpectraMoments(nb, mu_b, scatter_b))

    rep = SpectraMoments(P(), P(), P())
    return jax.jit(shard_map(ingest, mesh=mesh,
                             in_specs=(rep, P(axis), P(axis)),
                             out_specs=rep, check_vma=False))


def moments_update_sharded(mom, x, mesh: Mesh, w=None,
                           axis: str = DATA_AXIS):
    """Sharded streaming ingest: fold a sample-sharded batch into a
    replicated ``models.streaming.SpectraMoments``.

    The batch's spectra shard over ``mesh[axis]``; the only cross-chip
    traffic is the batch count, mean and (L, L) scatter (three ``psum``s,
    independent of batch size).  Exactly the same sums as the local
    ``moments_update`` in a different order, so the result matches to
    float reassociation (tests/test_streaming.py).  Rows are zero-padded
    to the axis size with a zero mask, so any batch size works; repeated
    same-shape batches hit one cached executable (the jit is keyed on the
    mesh at module level, not rebuilt per call).
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    n_dev = mesh.shape[axis]
    w_np = (jnp.ones((n,), x.dtype) if w is None
            else jnp.asarray(w, x.dtype))
    x_p, _ = pad_to_multiple(x, n_dev)
    w_p, _ = pad_to_multiple(w_np, n_dev)
    if x_p.shape[0] != n:            # padded rows must not count
        w_p = jnp.asarray(w_p).at[n:].set(0.0)
    run = _moments_ingest_jit(mesh, axis)
    return run(mom, jnp.asarray(x_p), jnp.asarray(w_p))


def _run_capture(run_jit, args, hlo_sink):
    """Execute a jitted runner, optionally capturing its compiled
    (post-GSPMD-partitioning) HLO text into ``hlo_sink``.

    The capture path compiles ahead-of-time and executes THE captured
    executable, so what tests/profilers inspect is exactly what ran —
    tests/test_partitioning.py asserts the collectives and per-shard
    operand shapes this module's sharding specs are supposed to produce
    (a forced-replication regression changes both)."""
    if hlo_sink is None:
        return run_jit(*args)
    compiled = run_jit.lower(*args).compile()
    hlo_sink.append(compiled.as_text())
    return compiled(*args)


def cv_sweep_sharded(x, y, cls_label, lv_values, mesh: Mesh,
                     n_splits: int = 5, model_axis: str = "model",
                     decision_type: str = "alt", t2_method: str = "Fdist",
                     q_method: str = "jm", t2_cl: float = 0.95,
                     q_cl: float = 0.95, d_cl: float = 0.95,
                     solver: str = "eigh", oversample: int = 10,
                     subspace_iters: int = 4, side: str = "auto",
                     hlo_sink=None):
    """CV fold axis sharded over the mesh: distinct fold fits on distinct
    chips (embarrassingly parallel — the 'model' axis of SURVEY.md 5.8).

    The (fold x LV) batched solve of ocm_tpu.models.cv runs unchanged —
    the per-fold math IS ``ocm_tpu.models.cv.fold_lv_sweep`` (one
    implementation, every default shared) — only the vmapped fold axis is
    placed on the mesh, so each chip computes n_splits / n_chips
    eigendecompositions.  Aggregation (fold means, pooled predictions)
    happens on the replicated outputs.

    When ``n_splits`` does not divide the model-axis size the fold axis is
    auto-padded by REPEATING folds cyclically (mirroring the sample-axis
    padding of the 2-D sweep); padded folds compute real (well-conditioned)
    fits but are excluded from every aggregate, so the reference's 5-fold
    protocol runs unchanged on an 8-chip model axis
    (tests/test_parallel.py::test_cv_sweep_sharded_fold_padding).
    """
    import numpy as np

    from ocm_tpu.models import cv as cv_mod

    _check_solver(solver)
    x = jnp.asarray(x)
    y_np = np.asarray(y)
    train_np, held_np = cv_mod.fold_masks(y_np, cls_label, n_splits)
    (train_np, held_np), f_pad = cyclic_pad(
        (train_np, held_np), mesh.shape[model_axis])
    lvs = jnp.asarray(list(lv_values), dtype=jnp.int32)
    other_m = jnp.asarray(y_np != cls_label)

    if decision_type == "dd":
        t2_method = q_method = "chi2pom"
    n_sub = min(int(max(lv_values)) + oversample, x.shape[1])

    def per_fold(w_train_b, held_b):
        return cv_mod.fold_lv_sweep(
            x, w_train_b, held_b, other_m, lvs, solver=solver, n_sub=n_sub,
            subspace_iters=subspace_iters, decision_type=decision_type,
            t2_method=t2_method, q_method=q_method, t2_cl=t2_cl, q_cl=q_cl,
            d_cl=d_cl, side=side)

    folds_sharding = NamedSharding(mesh, P(model_axis))
    run = jax.jit(jax.vmap(per_fold),
                  in_shardings=(folds_sharding, folds_sharding),
                  out_shardings=(folds_sharding, folds_sharding,
                                 folds_sharding))
    accept, sens, spec = _run_capture(
        run, (jnp.asarray(train_np), jnp.asarray(held_np)), hlo_sink)
    accept, spec = accept[:n_splits], spec[:n_splits]   # drop padded folds

    out = cv_mod.pooled_aggregate(accept, spec,
                                  jnp.asarray(held_np[:n_splits]),
                                  other_m, x.dtype)
    return jax.tree.map(np.asarray, out)


def cv_sweep_sharded_multiclass(x, y, class_labels, lv_values, mesh: Mesh,
                                n_splits: int = 5,
                                model_axis: str = "model",
                                decision_type: str = "alt",
                                t2_method: str = "Fdist",
                                q_method: str = "jm", t2_cl: float = 0.95,
                                q_cl: float = 0.95, d_cl: float = 0.95,
                                solver: str = "eigh", oversample: int = 10,
                                subspace_iters: int = 4,
                                side: str = "auto", hlo_sink=None):
    """EVERY class's CV sweep with the flattened (class x fold) axis
    sharded over ``mesh[model_axis]``.

    The reference's outermost protocol loop (target class) and its CV
    fold loop both become ONE device axis: C classes x F folds flatten to
    C*F independent fit units, pad cyclically to the mesh size, and each
    chip runs its units through the single-sourced
    ``models.cv.fold_lv_sweep``.  The cheese protocol's 5 classes x
    5 folds = 25 fits fill an 8-chip mesh in 4 waves with zero cross-chip
    traffic; per-class pooled aggregation runs on the replicated outputs.

    Per-class rows match ``cv_simca_sweep_multiclass`` (and therefore the
    local per-class sweeps) exactly
    (tests/test_parallel.py::test_cv_sweep_sharded_multiclass).
    """
    import numpy as np

    from ocm_tpu.models import cv as cv_mod

    _check_solver(solver)
    x = jnp.asarray(x)
    y_np = np.asarray(y)
    if decision_type == "dd":
        t2_method = q_method = "chi2pom"
    n_classes = len(class_labels)
    trains, helds, others = [], [], []
    for c in class_labels:
        tr, he = cv_mod.fold_masks(y_np, c, n_splits)
        trains.append(tr)
        helds.append(he)
        others.append(np.broadcast_to(y_np != c, tr.shape))
    flat_train = np.concatenate(trains)       # (C*F, N)
    flat_held = np.concatenate(helds)
    flat_other = np.concatenate(others)
    n_units = flat_train.shape[0]
    (flat_train, flat_held, flat_other), pad = cyclic_pad(
        (flat_train, flat_held, flat_other), mesh.shape[model_axis])
    lvs = jnp.asarray(list(lv_values), dtype=jnp.int32)
    n_sub = min(int(max(lv_values)) + oversample, x.shape[1])

    def per_unit(w_train_b, held_b, other_b):
        return cv_mod.fold_lv_sweep(
            x, w_train_b, held_b, other_b, lvs, solver=solver, n_sub=n_sub,
            subspace_iters=subspace_iters, decision_type=decision_type,
            t2_method=t2_method, q_method=q_method, t2_cl=t2_cl, q_cl=q_cl,
            d_cl=d_cl, side=side)

    sh = NamedSharding(mesh, P(model_axis))
    run = jax.jit(jax.vmap(per_unit), in_shardings=(sh, sh, sh),
                  out_shardings=(sh, sh, sh))
    accept, sens, spec = _run_capture(
        run, (jnp.asarray(flat_train), jnp.asarray(flat_held),
              jnp.asarray(flat_other)), hlo_sink)
    accept = accept[:n_units].reshape(n_classes, n_splits, *accept.shape[1:])
    spec = spec[:n_units].reshape(n_classes, n_splits, -1)

    out = jax.vmap(
        lambda acc_c, spec_c, held_c, other_c: cv_mod.pooled_aggregate(
            acc_c, spec_c, held_c, other_c, x.dtype)
    )(accept, spec, jnp.asarray(np.stack(helds)),
      jnp.asarray(np.stack([o[0] for o in others])))
    return jax.tree.map(np.asarray, out)


def cv_sweep_sharded_2d(x, y, cls_label, lv_values, mesh: Mesh,
                        n_splits: int = 5, model_axis: str = "model",
                        data_axis: str = "data", decision_type: str = "alt",
                        t2_method: str = "Fdist", q_method: str = "jm",
                        t2_cl: float = 0.95, q_cl: float = 0.95,
                        d_cl: float = 0.95, solver: str = "eigh",
                        oversample: int = 10, subspace_iters: int = 4,
                        hlo_sink=None):
    """CV sweep on a 2-D mesh: folds shard over ``model_axis`` AND the
    sample axis shards over ``data_axis`` — the full SURVEY.md 5.8 layout.

    Each (fold-shard, data-shard) block computes its partial class
    statistics; covariances and confusion counts reduce with psum over ICI
    along ``data_axis``; the small per-fold train statistics (T2/Q scalars)
    all_gather for the order-statistic limit engines; pooled aggregation
    runs replicated.  Numerically identical to cv_simca_sweep
    (tests/test_parallel.py).

    Both grid axes auto-pad: the sample axis to the data-axis size with
    rows carrying a zero validity mask (padding enters no statistic — fold
    masks exclude it from fits and the confusion counts intersect the
    validity mask), and the fold axis to the model-axis size by repeating
    folds cyclically (padded folds are dropped from every aggregate).
    """
    import numpy as np

    from ocm_tpu.models import cv as cv_mod

    _check_solver(solver)
    x = np.asarray(x)
    y_np = np.asarray(y)
    n = x.shape[0]
    n_model = mesh.shape[model_axis]
    n_data = mesh.shape[data_axis]
    if decision_type == "dd":
        t2_method = q_method = "chi2pom"

    train_np, held_np = cv_mod.fold_masks(y_np, cls_label, n_splits)
    (train_np, held_np), f_pad = cyclic_pad((train_np, held_np), n_model)
    other_np = (y_np != cls_label)
    valid_np = np.ones(n, dtype=bool)
    pad = (-n) % n_data
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), x.dtype)])
        zeros_f = np.zeros((train_np.shape[0], pad), dtype=bool)
        train_np = np.concatenate([train_np, zeros_f], axis=1)
        held_np = np.concatenate([held_np, zeros_f], axis=1)
        other_np = np.concatenate([other_np, np.ones(pad, dtype=bool)])
        valid_np = np.concatenate([valid_np, np.zeros(pad, dtype=bool)])
    x = jnp.asarray(x)
    lvs = jnp.asarray(list(lv_values), dtype=jnp.int32)
    n_features = x.shape[1]

    def block(x_loc, train_loc, held_loc, other_loc, valid_loc):
        # x_loc: (N/d, L); train/held: (F/m, N/d); other/valid: (N/d,)
        def per_fold(w_b, held_b):
            w = w_b.astype(x_loc.dtype)
            n_f = jax.lax.psum(jnp.sum(w), data_axis)
            sum_x = jax.lax.psum(jnp.sum(x_loc * w[:, None], axis=0),
                                 data_axis)
            mean = sum_x / n_f
            xc_w = (x_loc - mean[None, :]) * w[:, None]
            with jax.default_matmul_precision("highest"):
                gram = jax.lax.psum(xc_w.T @ xc_w, data_axis)
                c = gram / (n_f - 1.0)
            if solver == "rsvd":
                n_sub = min(int(max(lv_values)) + oversample, n_features)
                eigval, eigvec = pca_topk_cov(c, n_sub,
                                              iters=subspace_iters)
                theta_tab = deflated_theta_tables(c, eigval, eigvec)
                thetas_of = lambda k: thetas_from_tables(theta_tab, k)
            else:
                eigval, eigvec = eigh_desc_signed(c)
                max_rank = jnp.minimum(n_f, n_features).astype(jnp.int32)
                thetas_of = lambda k: L.residual_thetas(
                    eigval, k, max_rank=max_rank)

            xc = x_loc - mean[None, :]
            t_all = xc @ eigvec                       # local scores
            xc2_all = jnp.sum(xc * xc, axis=1)

            # gather per-fold train statistics (N scalars) for the
            # order-statistic limit engines
            w_g = jax.lax.all_gather(w, data_axis, tiled=True)

            def per_lv(k):
                # the per-LV T2/Q identity is single-sourced with the local
                # sweep; only the train-statistic GATHER is mesh-specific
                t2_loc, q_loc = cv_mod.lv_t2_q(eigval, t_all, xc2_all, k)
                t2_g = jax.lax.all_gather(t2_loc * w, data_axis, tiled=True)
                q_g = jax.lax.all_gather(q_loc * w, data_axis, tiled=True)
                t2_res, q_res, d_limit = cv_mod.lv_limits(
                    t2_g, q_g, w_g, n_f, k, thetas_of(k), decision_type,
                    t2_method, q_method, t2_cl, q_cl, d_cl)
                dred = L.reduced_distance(decision_type, t2_loc, q_loc,
                                          t2_res, q_res)
                accept = dred < d_limit
                test_m = (held_b | other_loc) & valid_loc
                tp = jax.lax.psum(jnp.sum(accept & held_b & test_m),
                                  data_axis)
                fn_ = jax.lax.psum(jnp.sum(~accept & held_b & test_m),
                                   data_axis)
                fp = jax.lax.psum(jnp.sum(accept & ~held_b & test_m),
                                  data_axis)
                tn = jax.lax.psum(jnp.sum(~accept & ~held_b & test_m),
                                  data_axis)
                sens = tp / (tp + fn_) * 100.0
                spec = tn / (tn + fp) * 100.0
                return accept, sens, spec

            return jax.vmap(per_lv)(lvs)

        return jax.vmap(per_fold)(train_loc, held_loc)

    run = shard_map(
        block, mesh=mesh,
        in_specs=(P(data_axis), P(model_axis, data_axis),
                  P(model_axis, data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(model_axis, None, data_axis),   # accept (F, L, N)
                   P(model_axis, None),              # sens (F, L)
                   P(model_axis, None)),             # spec (F, L)
        check_vma=False)
    accept, sens, spec = _run_capture(
        jax.jit(run),
        (x, jnp.asarray(train_np), jnp.asarray(held_np),
         jnp.asarray(other_np), jnp.asarray(valid_np)), hlo_sink)

    accept, spec = accept[:n_splits], spec[:n_splits]   # drop padded folds
    accept = accept[:, :, :n]                        # drop padded columns
    out = cv_mod.pooled_aggregate(
        accept, spec, jnp.asarray(held_np[:n_splits, :n]),
        jnp.asarray(other_np[:n]), x.dtype)
    return jax.tree.map(np.asarray, out)
