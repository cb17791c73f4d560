"""SIMCA: per-class PCA one-class models with chemometric acceptance limits.

TPU-first re-design of the reference estimator (``utils/SIMCA.py:12-278``):

- ``fit_simca`` is ONE jittable function built on a single SVD.  The
  reference fits sklearn PCA three times per class (full fit at
  utils/SIMCA.py:64, pinv at :69, n_components refit at :75); the top-k of
  one full SVD is identical to the refit (same data, same solver), so a
  single decomposition yields scores, loadings, eigenvalue spectrum, T2, Q,
  limits and the critical distance.
- ``simca_scores`` needs ONE GEMM per class and never materializes the
  (N, L) reconstruction (see ocm_tpu.ops.linalg.t2_q_scores).
- multi-class models are a vmapped axis (``fit_classes`` /
  ``predict_classes``) instead of the reference's Python loop.
- the sklearn-style ``SIMCA`` wrapper class reproduces the reference API
  surface including its documented quirks (SURVEY.md section 2.4): Q1
  (transform returns the last class's tuple), Q7 ('dd' uses the last-fitted
  class's pooled dofs), and the 'dd' -> chi2pom coercion prints.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ocm_tpu.ops.linalg import (cov, deflated_thetas, eigh_desc_signed,
                                pca_fit, pca_topk_cov, pinv_psd,
                                sign_columns, t2_q_scores)
from ocm_tpu.stats import limits as L
from ocm_tpu.stats.metrics import conformity_metrics


class SIMCAModel(NamedTuple):
    """One fitted single-class SIMCA model (a pytree of arrays).

    Mirrors the reference's per-class model dict (utils/SIMCA.py:83-99)
    minus host objects: everything needed to score is dense device data.
    """

    mean: jnp.ndarray           # (L,)
    components: jnp.ndarray     # (k, L)
    invcovT: jnp.ndarray        # (k, k)
    eigenvalues: jnp.ndarray    # (r,) full spectrum (explained_variance_)
    t2_res: L.LimitResult
    q_res: L.LimitResult
    d_limit: jnp.ndarray
    t2_train: jnp.ndarray       # (n,)
    q_train: jnp.ndarray        # (n,)
    n_samples: jnp.ndarray


def fit_simca(x_cls, n_components: int, decision_type: str = "alt",
              t2_method: str = "Fdist", q_method: str = "jm",
              t2_cl: float = 0.95, q_cl: float = 0.95, d_cl: float = 0.95,
              dtype=None, solver: str = "svd", oversample: int = 10,
              subspace_iters: int = 4) -> SIMCAModel:
    """Fit one single-class SIMCA model (utils/SIMCA.py:62-99) in one
    decomposition.

    solver='svd' (default) reproduces sklearn's full SVD bit-for-bit —
    the strict reference-parity path.  solver='rsvd' computes only the
    top-(k + oversample) eigenpairs of the covariance by GEMM-only
    randomized subspace iteration (ops.linalg.pca_topk_cov) with the
    residual moments recovered by exact deflation — the TPU production
    path: a dense (500, 500) decomposition lowers to a ~12 ms QDWH
    while-loop chain per class on one chip, while the rsvd fit is pure MXU
    work (< 0.2 ms); decisions agree with the svd fit (tests/test_simca.py).
    ``SIMCAModel.eigenvalues`` holds the full spectrum for 'svd' and the
    top-(k + oversample) spectrum for 'rsvd'.
    """
    max_k = min(x_cls.shape)
    if not 0 < n_components <= max_k:
        # the reference's sklearn PCA raises the equivalent bound error
        # (utils/SIMCA.py:66 via sklearn.decomposition.PCA.fit)
        raise ValueError(
            f"n_components={n_components} must be in [1, min(n_samples,"
            f" length)={max_k}]")
    if solver == "rsvd":
        return _fit_simca_rsvd(x_cls, n_components, decision_type,
                               t2_method, q_method, t2_cl, q_cl, d_cl,
                               dtype, oversample, subspace_iters)
    if solver != "svd":
        raise ValueError(f"unknown solver {solver!r}; expected 'svd' or"
                         " 'rsvd'")
    fit = pca_fit(x_cls, dtype=dtype)
    t = fit.scores[:, :n_components]
    p = fit.components[:n_components]
    invcovT = pinv_psd(cov(t))
    t2 = jnp.einsum("ij,jk,ik->i", t, invcovT, t)
    # Q against the full-rank reconstruction with k components == energy
    # not captured by the top-k scores (orthonormal loadings).
    xc = x_cls.astype(t.dtype) - fit.mean[None, :]
    q = jnp.maximum(jnp.sum(xc * xc, axis=-1) - jnp.sum(t * t, axis=-1), 0.0)

    max_rank = min(x_cls.shape)
    thetas = L.residual_thetas(fit.eigenvalues, n_components, max_rank=max_rank)
    t2_res = L.t2_limit(t2, n_components, t2_method, t2_cl)
    q_res = L.q_limit(q, q_method, q_cl, thetas=thetas)
    d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                  n_components=n_components, thetas=thetas,
                                  dcl=d_cl)
    return SIMCAModel(
        mean=fit.mean, components=p, invcovT=invcovT,
        eigenvalues=fit.eigenvalues, t2_res=t2_res, q_res=q_res,
        d_limit=d_limit, t2_train=t2, q_train=q,
        n_samples=jnp.asarray(x_cls.shape[0]),
    )


def _fit_simca_rsvd(x_cls, n_components, decision_type, t2_method, q_method,
                    t2_cl, q_cl, d_cl, dtype, oversample, subspace_iters):
    """GEMM-only SIMCA fit: randomized top-k PCA + deflated residual
    moments.  Same statistics as the svd path to float tolerance on data
    with a decaying spectrum; within degenerate eigenvalue clusters the
    basis differs by a rotation, to which T2/Q/limits are invariant."""
    if dtype is not None:
        x_cls = x_cls.astype(dtype)
    n, length = x_cls.shape
    s = min(n_components + oversample, length, n - 1)
    mean = jnp.mean(x_cls, axis=0)
    xc = x_cls - mean[None, :]
    # covariance and scores at full f32 matmul precision: the deflated
    # residual moments and the Q statistics live ~1e-2 below the leading
    # eigenvalue, which the TPU MXU's default bf16-mantissa passes perturb
    # at ~4e-3 relative (see ops.linalg.pca_topk_cov)
    with jax.default_matmul_precision("highest"):
        c = (xc.T @ xc) / (n - 1.0)
        eigenvalues, eigvecs = pca_topk_cov(c, s, iters=subspace_iters)
        p = eigvecs[:, :n_components].T
        t = xc @ p.T
    invcovT = pinv_psd(cov(t))
    t2 = jnp.einsum("ij,jk,ik->i", t, invcovT, t)
    q = jnp.maximum(jnp.sum(xc * xc, axis=-1) - jnp.sum(t * t, axis=-1), 0.0)

    thetas = deflated_thetas(c, eigenvalues, eigvecs, n_components)
    t2_res = L.t2_limit(t2, n_components, t2_method, t2_cl)
    q_res = L.q_limit(q, q_method, q_cl, thetas=thetas)
    d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                  n_components=n_components, thetas=thetas,
                                  dcl=d_cl)
    return SIMCAModel(
        mean=mean, components=p, invcovT=invcovT,
        eigenvalues=eigenvalues, t2_res=t2_res, q_res=q_res,
        d_limit=d_limit, t2_train=t2, q_train=q,
        n_samples=jnp.asarray(n),
    )


def simca_scores(model: SIMCAModel, x, use_pallas: bool = False):
    """T2 and Q for new samples (utils/SIMCA.py:127-130), one GEMM.

    ``use_pallas=True`` routes through the fused VMEM-resident kernel
    (ocm_tpu.ops.kernels.t2_q_scores_pallas) — same math, zero HBM
    intermediates; prefer it for very large scoring batches on TPU.
    """
    if x.dtype != jnp.bfloat16:
        x = x.astype(model.mean.dtype)
    if use_pallas:
        from ocm_tpu.ops.kernels import t2_q_scores_pallas
        return t2_q_scores_pallas(x.astype(model.mean.dtype), model.mean,
                                  model.components, model.invcovT)
    t2, q, _ = t2_q_scores(x, model.mean, model.components, model.invcovT)
    return t2, q


def simca_decide(model: SIMCAModel, x, decision_type: str = "alt"):
    """Accept/reject + reduced distance (utils/SIMCA.py:131-145).

    Returns (accept, dred, t2, q); accept uses the strict ``<`` of the
    reference.
    """
    t2, q = simca_scores(model, x)
    dred = L.reduced_distance(decision_type, t2, q, model.t2_res, model.q_res)
    return dred < model.d_limit, dred, t2, q


def reduced_train_distances(model: SIMCAModel, decision_type: str):
    """T2red/Qred of the training data (utils/SIMCA.py:76-81)."""
    if decision_type == "dd":
        t2red = model.t2_res.dof * model.t2_train / model.t2_res.scale
        qred = model.q_res.dof * model.q_train / model.q_res.scale
    else:
        t2red = model.t2_train / model.t2_res.limit
        qred = model.q_train / model.q_res.limit
    return t2red, qred


# ---------------------------------------------------------------------------
# Multi-class: classes as a vmapped axis.
# ---------------------------------------------------------------------------

def fit_classes(x, classes, class_labels, n_components: int, **kwargs):
    """Fit one model per class as a single batched solve.

    The reference loops classes on the host (utils/SIMCA.py:52-54).  Here
    class membership becomes a padded dense (C, n_max, L) batch + vmap, so C
    class fits are one XLA program.  All classes share ``n_components``
    (per-class k still works through the wrapper's Python loop).
    """
    x = jnp.asarray(x)
    classes = np.asarray(classes)
    counts = [int(np.sum(classes == c)) for c in class_labels]
    # n_components must fit the SMALLEST class: the masked path fits a
    # k-dim subspace per class from its effective rows, and k > count
    # yields NaN limits that silently corrupt argmin-based prediction.
    bad = [(c, cnt) for c, cnt in zip(class_labels, counts)
           if n_components > min(cnt, x.shape[1])]
    if bad:
        raise ValueError(
            f"n_components={n_components} exceeds the effective bound "
            f"min(count, L={x.shape[1]}) for class(es) "
            + ", ".join(f"{c!r} (count={cnt})" for c, cnt in bad))
    n_max = max(counts)
    stacked = np.zeros((len(class_labels), n_max, x.shape[1]), dtype=x.dtype)
    for i, c in enumerate(class_labels):
        rows = np.asarray(x)[classes == c]
        stacked[i, :rows.shape[0]] = rows
        # pad with repeats of the first row so padded fits stay full-rank;
        # masked statistics below ignore them
        if rows.shape[0] < n_max:
            stacked[i, rows.shape[0]:] = rows[0]
    masks = np.zeros((len(class_labels), n_max), dtype=bool)
    for i, cnt in enumerate(counts):
        masks[i, :cnt] = True

    if len(set(counts)) == 1:
        # equal class sizes: plain vmap over exact per-class blocks
        fit_fn = lambda xc: fit_simca(xc, n_components, **kwargs)
        return jax.vmap(fit_fn)(jnp.asarray(stacked))
    fit_fn = lambda xc, w: fit_simca_masked(xc, w, n_components, **kwargs)
    return jax.vmap(fit_fn)(jnp.asarray(stacked), jnp.asarray(masks))


def predict_classes(models: SIMCAModel, x, decision_type: str = "alt",
                    fused: bool = True, x_offset=None, x_sumsq=None):
    """Score one batch against C stacked models: (C, N) accept matrix.

    ``fused=True`` (default) computes ALL classes from one GEMM / one HBM
    pass over x (ops.linalg.t2_q_scores_multiclass — measured ~C-fold
    traffic reduction on the scoring roofline); ``fused=False`` keeps the
    per-class vmap, the formulation used for single-model scoring.

    Spectra passed in bfloat16 stay bfloat16 through the streaming read
    (serving fast path: half the HBM traffic, f32 accumulation and
    statistics); for accuracy, bf16 batches should be PRE-CENTERED: store
    ``x - x_offset`` (f32 reference spectrum, e.g. the mean of the class
    means) in bf16 and pass ``x_offset`` — see
    ops.linalg.t2_q_scores_multiclass.  Any other dtype is cast to the
    model dtype.

    Precision note: the fused path expands Q as ``||x||^2 - 2 x.m + ||m||^2
    - ||t||^2``, which carries ~eps * ||x||^2 cancellation error.  That is
    negligible for centered or SNV-style data, but for RAW f32 spectra
    with a large common mode AND Q limits tiny relative to the spectrum
    norm, the ``x_offset`` pre-centering recommendation applies to f32
    too (or use ``fused=False``, which centers before squaring).  The
    strict-parity ``SIMCA`` wrapper's decisions were verified identical
    either way on the reference protocols (tests/test_reference_parity.py).

    ``x_sumsq`` (fused path only): precomputed f32 ``||x||^2`` per row —
    serving layers that store residuals compute it once at storage time,
    removing the op's second full read of the spectra (the serving
    scorer ships it automatically; see ops.linalg.t2_q_scores_multiclass).
    """
    if fused:
        from ocm_tpu.ops.linalg import t2_q_scores_multiclass

        if x.dtype != jnp.bfloat16:
            x = x.astype(models.mean.dtype)
        t2, q, _ = t2_q_scores_multiclass(x, models.mean, models.components,
                                          models.invcovT, x_offset=x_offset,
                                          x_sumsq=x_sumsq)
        dred = jax.vmap(
            lambda t2c, qc, tr, qr: L.reduced_distance(
                decision_type, t2c, qc, tr, qr)
        )(t2, q, models.t2_res, models.q_res)
        return dred < models.d_limit[:, None], dred, t2, q
    return jax.vmap(lambda m: simca_decide(m, x, decision_type))(models)


def predict_classes_int8(models: SIMCAModel, xq, x_scale, x_sumsq,
                         decision_type: str = "alt", x_offset=None):
    """``predict_classes`` (fused path) over int8-quantized residuals.

    ``(xq, x_scale, x_sumsq)`` come from
    ``ops.linalg.quantize_rows_int8(x - x_offset)`` — quantize the
    PRE-CENTERED residual so the error scales with the residual, not the
    spectrum's common mode (same contract as the bf16 serving path), and
    pass the same ``x_offset`` here so it folds into the class means.
    One int8 HBM pass scores all C classes (the ||x||^2 term ships
    precomputed); statistics and limits stay f32.  Returns
    (accept, dred, t2, q), each (C, N).
    """
    from ocm_tpu.ops.linalg import t2_q_scores_multiclass_int8

    t2, q, _ = t2_q_scores_multiclass_int8(
        xq, x_scale, x_sumsq, models.mean, models.components,
        models.invcovT, x_offset=x_offset)
    dred = jax.vmap(
        lambda t2c, qc, tr, qr: L.reduced_distance(
            decision_type, t2c, qc, tr, qr)
    )(t2, q, models.t2_res, models.q_res)
    return dred < models.d_limit[:, None], dred, t2, q


class MaskedPCA(NamedTuple):
    """Full masked eigendecomposition shared by a whole LV sweep.

    The expensive work (one eigh + one scores GEMM) is independent of the
    number of components, so the CV engine computes it ONCE per fold and
    sweeps LV values with cheap masked reductions (ocm_tpu.models.cv) —
    where the reference refits sklearn PCA per (fold, LV)
    (utils/CVSIMCA.py:179-188).
    """

    mean: jnp.ndarray          # (L,)
    eigvec: jnp.ndarray        # (L, m) columns = loadings, sklearn signs;
    #                            m = L (cov side), min(N, L) (gram side),
    #                            or the subspace width s (rsvd) — consumers
    #                            must index columns only up to max_rank
    eigenvalues: jnp.ndarray   # (m,) descending, clipped at 0
    n: jnp.ndarray             # effective sample count sum(w)
    max_rank: jnp.ndarray      # min(n, L): valid eigenvalue slots


def masked_pca_eig(x, w, side: str = "auto") -> MaskedPCA:
    """Eigendecomposition of the masked covariance (rows with w == 0 are
    excluded).  Identical spectrum to the SVD of the masked centered data;
    the batched eigh maps better onto the MXU than batched SVD.

    ``side`` picks which Gram matrix is decomposed — the exact dense
    solve exists on BOTH sides of ``xc``:

    - ``'cov'``: eigh of the (L, L) covariance (loadings directly);
    - ``'gram'``: eigh of the (N, N) sample Gram; loadings recovered as
      ``xc^T u_i / sqrt((n-1) lambda_i)`` (unit-norm by construction,
      since ``||xc^T u_i||^2 = (n-1) lambda_i`` exactly).  Identical
      spectrum (plus exact zeros beyond rank), same sklearn sign
      convention, columns truncated to min(N, L).
    - ``'auto'`` (default): whichever side is SMALLER — the dense eigh
      lowers to QDWH while-loop chains cubic in the matrix side (the
      decomposition cliff, docs/BENCHMARKS.md), so long-spectrum fits
      (SWIR L=2000, n~10^3) decompose the (N, N) side ~ (L/N)^3 cheaper
      with bit-comparable results (tests/test_simca.py gram parity).

    Downstream code is column-count-agnostic (the rsvd path already
    returns (L, s) loadings); ``residual_thetas`` masks by ``max_rank``,
    so the missing exact-zero eigenvalues beyond min(N, L) never enter
    any statistic.
    """
    if side not in ("auto", "cov", "gram"):
        raise ValueError(f"unknown side {side!r}; expected"
                         " 'auto', 'cov' or 'gram'")
    w = w.astype(x.dtype)
    n = jnp.sum(w)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    xc = (x - mean[None, :]) * w[:, None]
    max_rank = jnp.minimum(n, x.shape[1]).astype(jnp.int32)
    if side == "auto":
        side = "gram" if x.shape[0] < x.shape[1] else "cov"
    # full f32 matmul precision: the TPU MXU's default bf16-mantissa passes
    # perturb the covariance at ~4e-3 relative, visibly shifting the
    # residual eigenvalue moments and hence the theta-based Q limits
    if side == "cov":
        with jax.default_matmul_precision("highest"):
            c = (xc.T @ xc) / (n - 1.0)
        eigenvalues, eigvec = eigh_desc_signed(c)
        return MaskedPCA(mean, eigvec, eigenvalues, n, max_rank)
    with jax.default_matmul_precision("highest"):
        g = (xc @ xc.T) / (n - 1.0)
        gvals, gvecs = jnp.linalg.eigh(g)
        gvals = jnp.maximum(gvals[::-1], 0.0)
        gvecs = gvecs[:, ::-1]
        # ||xc^T u_i|| = sqrt((n-1) lambda_i) exactly, so the division is
        # self-normalizing for any eigenvalue RESOLVED above roundoff.
        denom = jnp.sqrt(jnp.maximum(gvals * (n - 1.0),
                                     jnp.finfo(x.dtype).tiny))
        v = (xc.T @ gvecs) / denom[None, :]
    # Degenerate directions (centering null space, duplicate rows,
    # constant channels) come back as lambda ~ +-eps*lambda_max, NOT
    # exact zeros: dividing rounding noise by a roundoff denominator
    # yields a junk non-orthonormal column whose score could inject up
    # to lambda_max into Q.  Zero those columns — the cov-side eigh's
    # orthonormal null-space vectors contribute ~0 score there, and
    # zeroing reproduces that bound (tests/test_simca.py degenerate
    # parity).  Eigenvalues are reported unclipped, like the cov side.
    cut = gvals[0] * 16.0 * jnp.finfo(x.dtype).eps
    v = jnp.where(gvals[None, :] > cut, v, 0.0)
    v = sign_columns(v)
    k = min(x.shape[0], x.shape[1])
    return MaskedPCA(mean, v[:, :k], gvals[:k], n, max_rank)


def masked_percentile(v, w, n, cl: float):
    """np.percentile(v[w > 0], cl*100) with linear interpolation, computed
    with static shapes: padded entries sort to +inf beyond the true count."""
    v_sorted = jnp.sort(jnp.where(w > 0, v, jnp.inf))
    idx = cl * (n - 1.0)
    lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, v.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, v.shape[0] - 1)
    frac = idx - jnp.floor(idx)
    v_hi = jnp.where(hi < n, v_sorted[hi], v_sorted[lo])
    return v_sorted[lo] * (1.0 - frac) + v_hi * frac


def masked_moments(v, w, n):
    """(mean, ddof-1 variance) over entries with w > 0."""
    m = jnp.sum(v * w) / n
    var = jnp.sum(w * (v - m) ** 2) / (n - 1.0)
    return m, var


def masked_t2_limit(t2, w, n, k, method: str, cl: float) -> L.LimitResult:
    """T2 limit engine on masked statistics (traced k supported)."""
    if method == "perc":
        return L.LimitResult(masked_percentile(t2, w, n, cl),
                             jnp.ones((), t2.dtype), jnp.ones((), t2.dtype))
    if method == "chi2pom":
        m, var = masked_moments(t2, w, n)
        dof = jnp.maximum(jnp.where(var > 0, jnp.round(2 * m * m / var), 1.0),
                          1.0)
        from ocm_tpu.ops.special import chi2_ppf
        return L.LimitResult(m * chi2_ppf(cl, dof) / dof, dof, m)
    return L.t2_limit(t2, k, method, cl, n_samples=n)


def masked_q_limit(q, w, n, method: str, cl: float, thetas) -> L.LimitResult:
    """Q limit engine on masked statistics."""
    if method == "perc":
        return L.LimitResult(masked_percentile(q, w, n, cl),
                             jnp.ones((), q.dtype), jnp.ones((), q.dtype))
    if method == "chi2pom":
        m, var = masked_moments(q, w, n)
        dof = jnp.maximum(jnp.where(var > 0, jnp.round(2 * m * m / var), 1.0),
                          1.0)
        from ocm_tpu.ops.special import chi2_ppf
        return L.LimitResult(m * chi2_ppf(cl, dof) / dof, dof, m)
    return L.q_limit(q, method, cl, thetas=thetas)


def _finish_masked_fit(x, w, n_components, decision_type, t2_method,
                       q_method, t2_cl, q_cl, d_cl, pca: MaskedPCA,
                       thetas) -> SIMCAModel:
    """Scores + masked limit engines from a (possibly truncated)
    decomposition — shared tail of the eigh and rsvd masked fits."""
    w = w.astype(x.dtype)
    n = pca.n
    xc = (x - pca.mean[None, :]) * w[:, None]
    p = pca.eigvec[:, :n_components].T
    with jax.default_matmul_precision("highest"):
        t = xc @ p.T
    tm = jnp.sum(t * w[:, None], axis=0) / n
    tc = (t - tm[None, :]) * w[:, None]
    invcovT = pinv_psd((tc.T @ tc) / (n - 1.0))
    t2 = jnp.einsum("ij,jk,ik->i", t, invcovT, t)
    q = jnp.maximum(jnp.sum(xc * xc, axis=-1) - jnp.sum(t * t, axis=-1), 0.0)
    t2_res = masked_t2_limit(t2, w, n, n_components, t2_method, t2_cl)
    q_res = masked_q_limit(q, w, n, q_method, q_cl, thetas)
    d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                  n_components=n_components, thetas=thetas,
                                  dcl=d_cl)
    return SIMCAModel(
        mean=pca.mean, components=p, invcovT=invcovT,
        eigenvalues=pca.eigenvalues, t2_res=t2_res, q_res=q_res,
        d_limit=d_limit, t2_train=jnp.where(w > 0, t2, 0.0),
        q_train=jnp.where(w > 0, q, 0.0),
        n_samples=n.astype(jnp.int32),
    )


def fit_simca_masked(x, w, n_components: int, decision_type: str = "alt",
                     t2_method: str = "Fdist", q_method: str = "jm",
                     t2_cl: float = 0.95, q_cl: float = 0.95,
                     d_cl: float = 0.95, max_rank=None,
                     solver: str = "eigh", oversample: int = 10,
                     subspace_iters: int = 4) -> SIMCAModel:
    """Masked/weighted SIMCA fit: rows with w == 0 are excluded.

    Foundation of the batched CV engine: every (fold x class) fit shares one
    padded shape, so vmapping gives a single batched eigh + GEMM program.
    Matches ``fit_simca`` to float tolerance
    (tests/test_simca.py::test_masked_fit_matches_dense).

    ``solver='rsvd'`` replaces the dense eigh of the masked covariance
    with the GEMM-only randomized subspace fit (ops.linalg.pca_topk_cov +
    covariance deflation for the residual moments) — the TPU production
    path; ``fit_classes(..., solver='rsvd')`` reaches it for unequal
    class sizes.
    """
    if not 0 < n_components <= min(x.shape):
        # static shape bound only — the effective masked count is a traced
        # value; per-class count bounds are validated by the callers
        # (fit_classes / the SIMCA wrapper)
        raise ValueError(
            f"n_components={n_components} must be in [1, min(n_samples,"
            f" length)={min(x.shape)}]")
    if solver == "rsvd":
        w_f = w.astype(x.dtype)
        n_eff = jnp.sum(w_f)
        with jax.default_matmul_precision("highest"):
            mean = jnp.sum(x * w_f[:, None], axis=0) / n_eff
            xc_w = (x - mean[None, :]) * w_f[:, None]
            c = (xc_w.T @ xc_w) / (n_eff - 1.0)
            s_sub = min(n_components + oversample, x.shape[1])
            vals, vecs = pca_topk_cov(c, s_sub, iters=subspace_iters)
        mrank = jnp.minimum(n_eff, x.shape[1]).astype(jnp.int32)             if max_rank is None else jnp.asarray(max_rank)
        pca = MaskedPCA(mean, vecs, vals, n_eff, mrank)
        thetas = deflated_thetas(c, vals, vecs, n_components)
        return _finish_masked_fit(x, w, n_components, decision_type,
                                  t2_method, q_method, t2_cl, q_cl, d_cl,
                                  pca, thetas)
    elif solver != "eigh":
        raise ValueError(f"unknown solver {solver!r}; expected 'eigh' or"
                         " 'rsvd'")
    pca = masked_pca_eig(x, w)
    w = w.astype(x.dtype)
    n = pca.n
    mean = pca.mean
    eigvec = pca.eigvec
    eigenvalues = pca.eigenvalues
    xc = (x - mean[None, :]) * w[:, None]

    p = eigvec[:, :n_components].T
    t = xc @ p.T
    # masked covariance of scores (padded rows are zero AND excluded)
    tm = jnp.sum(t * w[:, None], axis=0) / n
    tc = (t - tm[None, :]) * w[:, None]
    invcovT = pinv_psd((tc.T @ tc) / (n - 1.0))
    t2 = jnp.einsum("ij,jk,ik->i", t, invcovT, t)
    q = jnp.maximum(jnp.sum(xc * xc, axis=-1) - jnp.sum(t * t, axis=-1), 0.0)

    if max_rank is None:
        max_rank = jnp.minimum(n, x.shape[1]).astype(jnp.int32)
    thetas = L.residual_thetas(eigenvalues, n_components, max_rank=max_rank)

    # limit engines on masked statistics — single-sourced with the CV engine
    # (masked_t2_limit/masked_q_limit above); order-statistic logic must
    # have exactly one implementation on this correctness-critical path
    t2_res = masked_t2_limit(t2, w, n, n_components, t2_method, t2_cl)
    q_res = masked_q_limit(q, w, n, q_method, q_cl, thetas)

    d_limit = L.critical_distance(decision_type, t2_res, q_res,
                                  n_components=n_components, thetas=thetas,
                                  dcl=d_cl)
    return SIMCAModel(
        mean=mean, components=p, invcovT=invcovT, eigenvalues=eigenvalues,
        t2_res=t2_res, q_res=q_res, d_limit=d_limit,
        t2_train=jnp.where(w > 0, t2, 0.0), q_train=jnp.where(w > 0, q, 0.0),
        n_samples=n.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# sklearn-style wrapper mirroring the reference estimator API.
# ---------------------------------------------------------------------------

class SIMCA:
    """Drop-in style estimator mirroring ``utils/SIMCA.py:12-278``.

    Same constructor signature and semantics: fit per class, predict returns
    an (N, n_classes) 0/1 matrix, metrics stored per class.  Reference
    quirks are reproduced (SURVEY.md Q1/Q7): ``transform`` returns only the
    last class's tuple, and 'dd' decisions use the last-fitted class's
    pooled dofs unless ``compat_dd_shared_state=False``.
    """

    def __init__(self, n_components=2, model_class=None, type: str = "alt",
                 t2lim="Fdist", t2cl=0.95, qlim="jm", qcl=0.95, dcl=0.95,
                 maxPC=20, criteria="compl", verbose=True, dtype=None,
                 compat_dd_shared_state=True, solver="svd"):
        self.solver = solver
        self.n_components = n_components
        self.model_class = model_class
        self.type = type
        self.t2lim = t2lim
        self.t2cl = t2cl
        self.qlim = qlim
        self.qcl = qcl
        self.dcl = dcl
        self.maxPC = maxPC
        self.criteria = criteria
        self.verbose = verbose
        self.dtype = dtype
        self.compat_dd_shared_state = compat_dd_shared_state
        self.metrics = {}

    # sklearn plumbing (clone/set_params support without the dependency)
    def get_params(self, deep=True):
        return {k: getattr(self, k) for k in (
            "n_components", "model_class", "type", "t2lim", "t2cl", "qlim",
            "qcl", "dcl", "maxPC", "criteria", "verbose", "dtype",
            "compat_dd_shared_state", "solver")}

    def set_params(self, **params):
        for k, v in params.items():
            setattr(self, k, v)
        return self

    def fit(self, X, classes):
        if self.model_class is None:
            self.model_class = list(np.unique(classes))
        elif isinstance(self.model_class, (int, np.integer)):
            self.model_class = [self.model_class]

        ncomp = self.n_components
        if not isinstance(ncomp, list):
            ncomp = [ncomp]
        if len(ncomp) == 1:
            ncomp = ncomp * len(self.model_class)
        elif len(ncomp) != len(self.model_class):
            raise ValueError("n_components length must match number of classes")
        self._n_components_per_class = ncomp

        if self.type == "dd" and self.t2lim != "chi2pom":
            print("t2lim set as chi2pom")
            self.t2lim = "chi2pom"
        if self.type == "dd" and self.qlim != "chi2pom":
            print("qlim set as chi2pom")
            self.qlim = "chi2pom"

        X = np.asarray(X)
        classes = np.asarray(classes)
        self._model = {}
        for i, cls in enumerate(self.model_class):
            x_cls = X[classes == cls]
            if x_cls.shape[0] == 0:
                raise ValueError(f"no samples for model class {cls!r}")
            max_k = min(x_cls.shape)
            if not 0 < ncomp[i] <= max_k:
                # sklearn PCA raises the equivalent bound error; the limit
                # math is undefined past the data rank (e.g. Fdist with
                # n - k <= 0)
                raise ValueError(
                    f"n_components={ncomp[i]} for class {cls!r} must be in "
                    f"[1, min(n_samples, n_features)] = [1, {max_k}]")
            self._model[cls] = fit_simca(
                jnp.asarray(x_cls), ncomp[i], self.type, self.t2lim,
                self.qlim, self.t2cl, self.qcl, self.dcl, dtype=self.dtype,
                solver=self.solver)
        self.n_features_in_ = X.shape[1]
        self.is_fitted_ = True
        return self

    def _check_fitted(self):
        if not getattr(self, "is_fitted_", False):
            raise RuntimeError(
                "This SIMCA instance is not fitted yet; call fit(X, classes) "
                "before predict/transform/score.")

    def _dd_limits(self, model: SIMCAModel):
        """Quirk Q7 (utils/SIMCA.py:141-144): 'dd' reduced distances use the
        LAST-fitted class's pooled dofs/scales (instance-level state), while
        the comparison threshold stays each class's OWN D_limit — the mixed
        state the reference exhibits.  compat_dd_shared_state=False uses
        each class's own dofs throughout."""
        if self.type == "dd" and self.compat_dd_shared_state:
            last = self._model[self.model_class[-1]]
            return model._replace(t2_res=last.t2_res, q_res=last.q_res)
        return model

    def transform(self, X):
        """Quirk Q1 (utils/SIMCA.py:101-117): the reference loops all
        classes but returns only the LAST class's (T2, T2red, Q, Qred) —
        semantically equivalent to scoring just the last class, which is
        what happens here (the discarded per-class work is not repeated)."""
        self._check_fitted()
        X = jnp.asarray(X)
        model = self._dd_limits(self._model[self.model_class[-1]])
        t2, q = simca_scores(model, X)
        if self.type == "dd":
            t2red = model.t2_res.dof * t2 / model.t2_res.scale
            qred = model.q_res.dof * q / model.q_res.scale
        else:
            t2red = t2 / model.t2_res.limit
            qred = q / model.q_res.limit
        return (t2, t2red, q, qred)

    def predict(self, X, y_true=None):
        self._check_fitted()
        X = jnp.asarray(X)
        predictions = np.zeros((X.shape[0], len(self.model_class)))

        # uniform component counts: ALL classes score in ONE vmapped
        # dispatch (the reference loops classes on the host,
        # utils/SIMCA.py:124; per-class dispatches cost a full host round
        # trip each on remote accelerators)
        models = [self._dd_limits(self._model[cls])
                  for cls in self.model_class]
        if len(models) > 1 and len(set(self._n_components_per_class)) == 1:
            # strip the per-class-sized training statistics (unused by
            # decide) so the model cores stack into one batched pytree
            zero = jnp.zeros(())
            strip = lambda m: m._replace(t2_train=zero, q_train=zero,
                                         eigenvalues=zero,
                                         n_samples=jnp.asarray(0))
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[strip(m) for m in models])
            accept_all, _, _, _ = predict_classes(stacked, X, self.type)
            predictions[:] = np.asarray(accept_all).T
        else:
            for i, model in enumerate(models):
                accept, _, _, _ = simca_decide(model, X, self.type)
                predictions[:, i] = np.asarray(accept)

        for i, cls in enumerate(self.model_class):
            if y_true is not None:
                m = conformity_metrics(jnp.asarray(y_true),
                                       jnp.asarray(predictions[:, i]), cls)
                self.metrics[cls] = {
                    "sensitivity": float(m.sensitivity),
                    "specificity": float(m.specificity),
                    "accuracy": float(m.accuracy),
                    "efficiency": float(m.efficiency),
                    "TP": int(m.tp), "TN": int(m.tn),
                    "FP": int(m.fp), "FN": int(m.fn),
                }
                if self.verbose:
                    mm = self.metrics[cls]
                    print(f"Sample class {cls} = {int(np.sum(np.asarray(y_true) == cls))}")
                    print(f"Confusion Matrix for class {cls}:\nTP: {mm['TP']}, "
                          f"TN: {mm['TN']}, FP: {mm['FP']}, FN: {mm['FN']}")
                    print(f"Class {cls} - Sensitivity: {mm['sensitivity']}, "
                          f"Specificity: {mm['specificity']:.4f}, "
                          f"Accuracy: {mm['accuracy']:.4f}, "
                          f"Efficiency: {mm['efficiency']:.4f}")
        return predictions

    def score(self, X, y):
        """Quirk Q10: returns specificity only (utils/SIMCA.py:268-278)."""
        y_pred = self.predict(X, y_true=y)
        m = conformity_metrics(jnp.asarray(y), jnp.asarray(np.ravel(y_pred)),
                               self.model_class[0])
        return float(m.specificity)

    def _metrics_simca_conformity(self, y_true, y_pred, class_index):
        """Host-side metric helper kept for CV-engine compatibility."""
        m = conformity_metrics(jnp.asarray(y_true), jnp.asarray(y_pred),
                               class_index)
        return {
            "sensitivity": float(m.sensitivity),
            "specificity": float(m.specificity),
            "accuracy": float(m.accuracy),
            "efficiency": float(m.efficiency),
            "TP": int(m.tp), "TN": int(m.tn), "FP": int(m.fp), "FN": int(m.fn),
        }


def save_simca_model(path: str, model: SIMCAModel) -> str:
    """Persist a (possibly class-stacked) ``SIMCAModel`` to one msgpack
    file, template-free.

    The reference has no SIMCA persistence at all — every driver refits
    from raw data on each run (utils/SIMCA.py holds models only as
    in-memory dicts).  Nested ``LimitResult`` fields are stored as
    sub-dicts so ``load_simca_model`` can rebuild the exact pytree
    without a shape template (unlike bundle.load_bundle, whose flax
    param dict genuinely needs one).
    """
    from flax import serialization

    tree = {}
    for f in model._fields:
        v = getattr(model, f)
        tree[f] = ({k: np.asarray(a) for k, a in v._asdict().items()}
                   if isinstance(v, L.LimitResult) else np.asarray(v))
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(tree))
    return path


def load_simca_model(path: str) -> SIMCAModel:
    """Inverse of ``save_simca_model`` (no template required)."""
    from flax import serialization

    with open(path, "rb") as fh:
        tree = serialization.msgpack_restore(fh.read())
    kwargs = {}
    for f in SIMCAModel._fields:
        v = tree[f]
        kwargs[f] = (L.LimitResult(**{k: jnp.asarray(a)
                                      for k, a in v.items()})
                     if isinstance(v, dict) else jnp.asarray(v))
    return SIMCAModel(**kwargs)
