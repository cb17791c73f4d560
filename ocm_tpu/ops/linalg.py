"""Core linear algebra for class models.

The reference's PCA core (``utils/SIMCA.py:62-75``) runs sklearn's full-SVD
PCA *three times* per class fit (full-rank fit, pinv, n_components refit).
Here one decomposition yields everything:

- ``pca_fit`` — single SVD (or eigh of the Gram/covariance matrix, whichever
  side is smaller) of the centered data.  Scores, loadings, the full
  eigenvalue spectrum, T-squared and Q statistics all derive from it.
- deterministic sign convention identical to sklearn's ``svd_flip`` so score
  matrices match the reference bit-for-bit at float64.

Everything is jittable and vmap-able; fits batch over classes / folds / LV
settings as mapped axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PCAFit(NamedTuple):
    """Full-rank PCA decomposition of one data matrix.

    mean:        (L,)   column means
    components:  (r, L) principal axes (rows), sklearn sign convention
    scores:      (N, r) projections of the (centered) training data
    eigenvalues: (r,)   explained variances  S^2/(N-1)  (sklearn
                 ``explained_variance_``, utils/SIMCA.py:88)
    """

    mean: jnp.ndarray
    components: jnp.ndarray
    scores: jnp.ndarray
    eigenvalues: jnp.ndarray


def svd_flip_signs(u, vt):
    """sklearn's deterministic SVD sign convention.

    ``PCA._fit_full`` flips with ``u_based_decision=False``: for each
    component, the entry of the corresponding **row of Vt** with the largest
    absolute value is made positive.  Guarantees our scores/loadings match
    sklearn's ``PCA(svd_solver='full')`` exactly, not just up to sign.
    """
    max_abs_idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_abs_idx])
    signs = jnp.where(signs == 0, 1.0, signs)
    return u * signs[None, :], vt * signs[:, None]


def pca_fit(x, dtype=None) -> PCAFit:
    """Full-rank PCA via one SVD of the centered data.

    Equivalent to sklearn ``PCA(n_components=None, svd_solver='full')``
    (utils/SIMCA.py:64): components_, explained_variance_ and the score
    matrix agree to float tolerance, including signs.
    """
    if dtype is not None:
        x = x.astype(dtype)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    u, vt = svd_flip_signs(u, vt)
    n = x.shape[0]
    eigenvalues = (s * s) / (n - 1)
    scores = u * s[None, :]
    return PCAFit(mean=mean, components=vt, scores=scores, eigenvalues=eigenvalues)


def sign_columns(v):
    """sklearn's deterministic sign convention: each column's max-abs
    entry made positive (``svd_flip`` on loadings).  THE single source —
    used by the dense eigh, the gram-side recovery, and the randomized
    extraction, which must agree sign-for-sign."""
    max_abs_idx = jnp.argmax(jnp.abs(v), axis=0)
    signs = jnp.sign(v[max_abs_idx, jnp.arange(v.shape[1])])
    return v * jnp.where(signs == 0, 1.0, signs)[None, :]


def eigh_desc_signed(c):
    """Dense eigendecomposition of a symmetric PSD matrix, descending,
    clipped at zero, with sklearn's sign convention (max-abs entry of each
    eigenvector made positive — matches ``svd_flip_signs`` on covariance
    loadings).

    The single source of the dense covariance decomposition used by the
    masked fits and every CV / sharded-CV path (they must agree exactly:
    the same spectrum feeds the residual-moment Q limits everywhere).
    """
    eigval, eigvec = jnp.linalg.eigh(c)
    eigval = jnp.maximum(eigval[::-1], 0.0)
    return eigval, sign_columns(eigvec[:, ::-1])


def pinv_psd(a, rcond: float = 1e-15):
    """Moore-Penrose pseudo-inverse of a symmetric PSD matrix via eigh.

    Matches ``np.linalg.pinv`` on covariance matrices
    (utils/SIMCA.py:69, VAE_SIMCA.py:248) while staying eigh-based (faster
    and more stable on TPU than general SVD for symmetric inputs).
    """
    w, v = jnp.linalg.eigh(a)
    cutoff = rcond * jnp.max(jnp.abs(w))
    w_inv = jnp.where(w > cutoff, 1.0 / w, 0.0)
    return (v * w_inv[None, :]) @ v.T


def cov(x, rowvar: bool = False):
    """np.cov(ddof=1) equivalent (utils/SIMCA.py:69)."""
    if rowvar:
        x = x.T
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    return (xc.T @ xc) / (x.shape[0] - 1)


def sym_orthonormalize(y, eps: float = 1e-7):
    """Loewdin (symmetric) orthonormalization of the columns of ``y``.

    GEMM-only replacement for QR inside the randomized subspace iteration:
    an eigendecomposition of the tiny (s, s) Gram matrix costs microseconds,
    where a Householder QR of the (L, s) panel lowers to a long while-loop
    chain on TPU.  Eigenvalue clamping makes it robust to (near-)rank
    deficiency: directions below ``eps * max`` are damped instead of
    amplified.
    """
    with jax.default_matmul_precision("highest"):
        g = y.T @ y
        w, v = jnp.linalg.eigh(g)
        w = jnp.maximum(w, eps * jnp.max(w))
        return y @ ((v * jax.lax.rsqrt(w)[None, :]) @ v.T)


def pca_topk_cov(c, n_vectors: int, iters: int = 4, seed: int = 7):
    """Top-``n_vectors`` eigenpairs of a symmetric PSD matrix, GEMM-only.

    Randomized subspace iteration with Rayleigh-Ritz extraction: the hot
    ops are (L, L) @ (L, s) matmuls that map straight onto the MXU, plus
    (s, s) eigendecompositions that are O(microseconds).  A dense
    ``jnp.linalg.eigh`` of the full (L, L) covariance lowers to TPU QDWH
    with thousands of while-loop steps — measured ~37 ms for a (3, 500,
    500) batch on one chip, vs < 0.5 ms for this routine (the probe record
    is in docs/BENCHMARKS.md).  This is the TPU-first answer to the
    reference's sklearn full-SVD PCA fits (utils/SIMCA.py:62-75): a SIMCA
    model only ever uses the top-k subspace, and the residual eigenvalue
    moments the limit engines need are recovered exactly by deflation
    (``deflated_thetas``) instead of from the full spectrum.

    Within a degenerate eigenvalue cluster the returned basis is an
    arbitrary rotation of the true eigenvectors — exactly as for any dense
    solver — so downstream rotation-invariant statistics (T2, Q, partial
    traces) agree with the dense fit to float tolerance while individual
    vectors may differ.

    ``iters=4`` default: gapped spectra converge by 2 iterations
    (measured 1e-13 top-k eigenvalue error), and INSIDE a gapless noise
    bulk fewer iterations track the bulk-edge eigenvalues more faithfully
    (less collapse of the random subspace onto the edge), giving
    theta-based limits ~1% from the dense fit vs ~3% at 8 iterations.

    Returns ``(eigenvalues (s,), eigvecs (L, s))`` in descending order with
    the sklearn sign convention applied.
    """
    length = c.shape[0]
    omega = jax.random.normal(jax.random.PRNGKey(seed),
                              (length, n_vectors), c.dtype)
    # full f32 matmul precision throughout: on TPU the default bf16-mantissa
    # MXU passes perturb the leading eigenvalue by ~4e-3 relative, which the
    # deflated residual moments (~1e-2 of the trace) cannot absorb —
    # measured: jm Q limits collapse to 0 on device at default precision.
    # These GEMMs are (L, s)-thin; HIGHEST costs nothing measurable.
    with jax.default_matmul_precision("highest"):
        q = sym_orthonormalize(c @ omega)
        q = jax.lax.fori_loop(
            0, iters, lambda _, qi: sym_orthonormalize(c @ qi), q)
        # double Loewdin at Rayleigh-Ritz only: power iteration is
        # self-correcting mid-loop, but the extraction basis must be
        # orthonormal even when the subspace Gram is ill-conditioned
        # (one pass drifts when the spectral ratio exceeds
        # ~sqrt(1/clamp); the second pass on the conditioned output
        # restores machine precision — CholeskyQR2's argument).  Exactly
        # rank-deficient tails keep near-duplicate directions with
        # near-zero Ritz weight — harmless downstream
        # (tests/test_properties.py).
        q = sym_orthonormalize(q)
        b = q.T @ (c @ q)
        w, v = jnp.linalg.eigh(0.5 * (b + b.T))
        w = jnp.maximum(w[::-1], 0.0)
        vecs = q @ v[:, ::-1]
    # sklearn svd_flip sign convention (column-based here: vecs columns are
    # loadings) so rsvd and svd fits agree on well-separated components
    return w, sign_columns(vecs)


def deflated_thetas(c, eigenvalues, eigvecs, n_components):
    """Residual eigenvalue moments theta_1..3 beyond ``n_components``,
    computed from the deflated covariance ``C - V_k diag(lam_k) V_k^T``.

    Exact trace identities (theta_m = tr(C_res^m) for PSD C with the top-k
    block removed) replace the full-spectrum sums of
    ``stats.limits.residual_thetas`` when only top-k eigenpairs exist.
    Deflating FIRST and then taking traces is the numerically safe order in
    f32: the naive form ``tr(C^m) - sum(lam_k^m)`` cancels catastrophically
    when the leading eigenvalue dominates (measured: theta_2 relative error
    8e+1 naive vs < 1e-3 deflated on nut-scale spectra), while the deflated
    matrix's entries live at the residual scale where f32 rounding is
    harmless.  ``n_components`` may be traced (masked top-k slice).
    """
    s = eigenvalues.shape[0]
    keep = jnp.arange(s) < jnp.asarray(n_components)
    lam = jnp.where(keep, jnp.maximum(eigenvalues, 0.0), 0.0)
    with jax.default_matmul_precision("highest"):
        v = eigvecs * jnp.sqrt(lam)[None, :]
        c_res = c - v @ v.T
        th1 = jnp.maximum(jnp.trace(c_res), 0.0)
        th2 = jnp.maximum(jnp.sum(c_res * c_res), 0.0)
        th3 = jnp.maximum(jnp.sum(c_res * (c_res @ c_res)), 0.0)
    return th1, th2, th3


class ThetaTables(NamedTuple):
    """Per-decomposition tables for O(s) residual moments at ANY cut k.

    Built once per covariance from the FULLY deflated residual
    ``R = C - V diag(lam) V^T`` (all s directions removed):
    ``C_res(k) = R + sum_{j >= k} lam_j v_j v_j^T``, so the trace powers
    expand into R's scalar invariants plus masked sums over per-direction
    tables — no (L, L) matmul per LV.  Numerically safe where the naive
    ``tr(C^m) - partial sums`` form is not: the leading eigenvalue is
    always inside R's elementwise deflation, so no lambda_1-scale
    cancellation ever happens; the added-back terms live at the
    lambda_{k+1} scale, the same order as the moments themselves.
    """

    tr1: jnp.ndarray    # tr(R)
    tr2: jnp.ndarray    # ||R||_F^2 = tr(R^2)
    tr3: jnp.ndarray    # tr(R^3)
    lam: jnp.ndarray    # (s,) clamped eigenvalues
    ryy: jnp.ndarray    # (s,) ||R v_j||^2        = v_j^T R^2 v_j
    vry: jnp.ndarray    # (s,) v_j^T R v_j


def deflated_theta_tables(c, eigenvalues, eigvecs) -> ThetaTables:
    """Precompute ``ThetaTables`` (three (L, L)-scale GEMMs, ONCE per
    decomposition) so an LV sweep gets every k's residual moments from
    masked sums (``thetas_from_tables``).  Replaces a per-(fold, LV)
    ``deflated_thetas`` call whose tr(C_res^3) term costs an (L, L, L)
    matmul per cell — measured 50 -> ~15 ms on the L=2000 5-fold x 14-LV
    sweep (docs/BENCHMARKS.md)."""
    lam = jnp.maximum(eigenvalues, 0.0)
    with jax.default_matmul_precision("highest"):
        v = eigvecs * jnp.sqrt(lam)[None, :]
        r = c - v @ v.T
        y = r @ eigvecs                       # (L, s)
        tr1 = jnp.trace(r)
        tr2 = jnp.sum(r * r)
        tr3 = jnp.sum(r * (r @ r))
        ryy = jnp.sum(y * y, axis=0)
        vry = jnp.sum(eigvecs * y, axis=0)
    return ThetaTables(tr1, tr2, tr3, lam, ryy, vry)


def thetas_from_tables(tab: ThetaTables, n_components):
    """Residual moments theta_1..3 beyond a (possibly traced) cut ``k``
    from precomputed ``ThetaTables``: O(s) masked sums.

    Expansion of tr((R + P)^m) with ``P = sum_{j >= k} lam_j v_j v_j^T``
    and orthonormal V (so P^2 collapses to lam^2-weighted projectors):
    theta_1 = tr(R) + sum lam; theta_2 = tr(R^2) + 2 sum lam*vRv +
    sum lam^2; theta_3 = tr(R^3) + 3 sum lam*||Rv||^2 +
    3 sum lam^2*vRv + sum lam^3.  Agrees with ``deflated_thetas`` to
    float tolerance for every k (tests/test_simca.py).
    """
    s = tab.lam.shape[0]
    add = jnp.arange(s) >= jnp.asarray(n_components)
    lam = jnp.where(add, tab.lam, 0.0)
    th1 = tab.tr1 + jnp.sum(lam)
    th2 = tab.tr2 + 2.0 * jnp.sum(lam * tab.vry) + jnp.sum(lam * lam)
    th3 = (tab.tr3 + 3.0 * jnp.sum(lam * tab.ryy)
           + 3.0 * jnp.sum(lam * lam * tab.vry) + jnp.sum(lam ** 3))
    return (jnp.maximum(th1, 0.0), jnp.maximum(th2, 0.0),
            jnp.maximum(th3, 0.0))


def mahalanobis_sq(x, mean, cov_inv):
    """Row-wise squared Mahalanobis distance (utils/SIMCA.py:70 einsum)."""
    d = x - mean[None, :]
    return jnp.einsum("ij,jk,ik->i", d, cov_inv, d)


def t2_q_scores(x, mean, components, invcovT):
    """Hotelling T^2 and Q residual for rows of ``x`` against a PCA model.

    Algebraic fusion of the reference predict path (utils/SIMCA.py:127-130):
    the reference materializes the (N, L) reconstruction
    ``X_recon = T @ P + mean`` and computes ``Q = sum((X - X_recon)^2)``.
    Because the PCA loadings ``P`` have orthonormal rows,
    ``||Xc - T P||^2 = ||Xc||^2 - ||T||^2``, so scoring needs exactly ONE
    GEMM (N,L)@(L,k) plus row reductions — no (N, L) intermediate, ~2x fewer
    FLOPs and 1/3 the HBM traffic.  Equality is exact in real arithmetic and
    holds to float tolerance (tests/test_simca.py).
    """
    acc = jnp.promote_types(x.dtype, jnp.float32)
    if x.dtype == jnp.bfloat16:
        # serving fast path: keep the streamed operand bf16 through the
        # GEMM (f32 accumulation).  Callers must pre-center (store
        # ``x - mean`` with a mean-zero model view): centering IN bf16
        # would quantize the large common mode — see
        # t2_q_scores_multiclass for the measured failure.
        xc = x - mean.astype(x.dtype)[None, :]
        t = jnp.dot(xc, components.T.astype(x.dtype),
                    preferred_element_type=acc)
        xc32 = xc.astype(acc)
        q = jnp.sum(xc32 * xc32, axis=-1) - jnp.sum(t * t, axis=-1)
    else:
        xc = x - mean[None, :]
        t = xc @ components.T
        q = jnp.sum(xc * xc, axis=-1) - jnp.sum(t * t, axis=-1)
    q = jnp.maximum(q, 0.0)
    t2 = jnp.einsum("ij,jk,ik->i", t, invcovT.astype(acc), t)
    return t2, q, t


def t2_q_scores_multiclass(x, means, components, invcovs, x_offset=None,
                           x_sumsq=None):
    """T^2 and Q of ``x`` (N, L) against C class models in ONE pass over x.

    The per-class formulation (vmap of ``t2_q_scores``) streams the (N, L)
    spectra from HBM once PER CLASS — measured on hardware, that HBM read
    is the scoring bottleneck (docs/BENCHMARKS.md roofline).  Centering
    commutes with the projection, so all classes share a single GEMM::

        t_c         = x @ P_c^T - m_c @ P_c^T          (constant offset)
        ||x - m_c||^2 = ||x||^2 - 2 x.m_c + ||m_c||^2

    Stacking ``[P_1^T .. P_C^T | m_1 .. m_C]`` into one (L, C*k + C)
    operand yields every class's scores and Q from one (N, L) read: HBM
    traffic drops ~C-fold.  The expansion introduces benign cancellation
    (|error| ~ eps * ||x||^2, orders below the Q acceptance limits);
    equality with the per-class path is asserted at tight tolerance in
    tests/test_simca.py.

    means: (C, L); components: (C, k, L); invcovs: (C, k, k).
    Returns t2 (C, N), q (C, N), t (C, N, k).

    Serving in bf16: the path is memory-bound (it streams the spectra at
    ~65% of HBM bandwidth, docs/BENCHMARKS.md roofline), so passing ``x``
    already STORED as bfloat16 halves the streamed bytes; the GEMM runs
    with bf16 operands and f32 accumulation and every statistic stays f32.
    Quantizing RAW spectra is lossy where the common mode dominates: the
    injected ||e||^2 can rival tight Q limits (measured: decision flips
    well inside the boundary).  The principled form is PRE-CENTERED
    serving — store ``x - x_offset`` in bf16 for a fixed f32 reference
    spectrum ``x_offset`` (e.g. the mean of the class means) and pass
    ``x_offset``: quantization error then scales with the small residual,
    and the offset folds into the class means algebraically
    (``t_c = x P_c^T - (m_c - x_offset) P_c^T`` etc.), so decisions match
    the f32 path to ~1e-3 (tests/test_simca.py).  Nothing is cast
    implicitly — callers opt in by storing x in bf16.
    """
    if x_offset is not None:
        means = means - x_offset[None, :]
    n_classes, k, length = components.shape
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    w = jnp.concatenate([components.reshape(n_classes * k, length).T,
                         means.T], axis=1)            # (L, C*k + C)
    g = jnp.dot(x, w.astype(x.dtype),
                preferred_element_type=acc_dtype)     # ONE pass over x
    xp = g[:, :n_classes * k].reshape(-1, n_classes, k)
    xp = jnp.transpose(xp, (1, 0, 2))                 # (C, N, k) = x P_c^T
    xm = g[:, n_classes * k:].T                       # (C, N)    = x . m_c
    if x_sumsq is None:
        x32 = x.astype(acc_dtype)
        x2 = jnp.sum(x32 * x32, axis=-1)              # (N,) f32 accumulate
    else:
        # precomputed ||x||^2 (e.g. once at serving-storage time): the
        # ||x||^2 reduction is the path's SECOND full read of the
        # spectra — shipping it precomputed leaves exactly one HBM pass
        x2 = x_sumsq.astype(acc_dtype)
    mp = jnp.einsum("cl,ckl->ck", means, components)  # (C, k) = m_c P_c^T
    t = xp - mp[:, None, :].astype(acc_dtype)
    m2 = jnp.sum(means * means, axis=-1)              # (C,)
    q = jnp.maximum(x2[None, :] - 2.0 * xm + m2[:, None]
                    - jnp.sum(t * t, axis=-1), 0.0)
    t2 = jnp.einsum("cnj,cjk,cnk->cn", t, invcovs.astype(acc_dtype), t)
    return t2, q, t


def quantize_rows_int8(a):
    """Per-row symmetric int8 quantization: ``a ~= q * scale[:, None]``.

    Returns ``(q int8, scale f32, sumsq f32)`` where ``sumsq`` is the
    EXACT squared norm of the quantized rows (integer sum of squares
    times scale^2) — precomputed once at storage time so int8 scoring
    streams each row exactly once (the f32/bf16 fused path reads x a
    second time for its ||x||^2 reduction).

    Works on NumPy arrays (host-side serving prep: quantize BEFORE the
    host->device transfer) and jnp arrays (device-side, jittable) alike.
    NumPy 2-D inputs route through the threaded C++ kernel when the
    native library is available (bit-identical; utils/native.py) — the
    serving layer's chunk prep is this function, so it sits on the
    host->device pipeline's critical path.
    """
    if isinstance(a, np.ndarray) and a.ndim == 2 and a.dtype == np.float32:
        from ocm_tpu.utils import native

        out = native.quantize_rows_int8(a)
        if out is not None:
            return out
    xp = np if isinstance(a, np.ndarray) else jnp
    amax = xp.max(xp.abs(a), axis=-1)
    # floor well inside the normal f32 range: XLA flushes subnormals to
    # zero, and a zero scale would turn all-zero rows into 0/0 = NaN
    scale = (xp.maximum(amax / 127.0, 1e-30)).astype(np.float32)
    q = xp.clip(xp.round(a / scale[..., None]), -127, 127).astype(np.int8)
    sumsq = (xp.sum(q.astype(np.int32) ** 2, axis=-1).astype(np.float32)
             * scale * scale)
    return q, scale, sumsq


def t2_q_scores_multiclass_int8(xq, x_scale, x_sumsq, means, components,
                                invcovs, x_offset=None):
    """Int8-storage twin of ``t2_q_scores_multiclass``.

    ``xq`` is the (N, L) int8 per-row quantization of PRE-CENTERED
    residuals ``x - x_offset`` (from ``quantize_rows_int8``), with
    ``x_scale``/``x_sumsq`` its row scales and exact squared norms.  The
    (C*k + C, L) projection operand is quantized TWO-LEVEL per row
    (int8 hi + int8 residual, ~15 effective bits — see the inline note),
    and the single pass over the spectra becomes an int8 x int8 -> int32
    GEMM: accumulation is EXACT (|q| <= 127, so L <= 2^15 fits int32
    with headroom) and the MXU runs it on its native integer tier —
    operand quantization is the only error source, and the x side's
    scales with the residual (the common mode lives in ``x_offset``),
    the same argument as the bf16 path.  HBM traffic per chunk: one int8
    read — half the bf16 path's bytes, and no second ||x||^2 pass
    (``x_sumsq`` ships precomputed).

    All statistics (dequantization, T^2, Q, limits) stay f32.  Returns
    t2 (C, N), q (C, N), t (C, N, k) like the f32/bf16 op; decision
    agreement vs the f32 fused path is asserted in tests/test_simca.py.
    """
    if x_offset is not None:
        means = means - x_offset[None, :]
    n_classes, k, length = components.shape
    w = jnp.concatenate([components.reshape(n_classes * k, length),
                         means], axis=0)               # (M, L), M = C*k+C
    # Two-level int8 quantization of the projection operand: hi plus the
    # residual (w - hi) re-quantized — ~15 effective bits.  Single-level
    # int8 w is NOT enough: its fixed per-class error vector dots with
    # the nearly-constant in-class residual into a systematic per-class
    # bias that flips in-class decisions (measured: agreement 0.67 vs
    # 0.997 with exact w).  Both levels ride ONE GEMM as extra output
    # columns, so the spectra are still read exactly once; the operand
    # itself is tiny ((C*k + C, L)).
    w_hi, s_hi, _ = quantize_rows_int8(w)
    w_lo, s_lo, _ = quantize_rows_int8(w - w_hi.astype(jnp.float32)
                                       * s_hi[:, None])
    wq = jnp.concatenate([w_hi, w_lo], axis=0)         # (2M, L)
    m = n_classes * k + n_classes
    g2 = jax.lax.dot_general(xq, wq.T, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    g2 = g2.astype(jnp.float32) * x_scale[:, None].astype(jnp.float32)
    g = g2[:, :m] * s_hi[None, :] + g2[:, m:] * s_lo[None, :]
    xp_ = g[:, :n_classes * k].reshape(-1, n_classes, k)
    xp_ = jnp.transpose(xp_, (1, 0, 2))                # (C, N, k)
    xm = g[:, n_classes * k:].T                        # (C, N)
    mp = jnp.einsum("cl,ckl->ck", means, components)   # f32, unquantized
    t = xp_ - mp[:, None, :]
    m2 = jnp.sum(means * means, axis=-1)
    q = jnp.maximum(x_sumsq[None, :] - 2.0 * xm + m2[:, None]
                    - jnp.sum(t * t, axis=-1), 0.0)
    t2 = jnp.einsum("cnj,cjk,cnk->cn", t, invcovs.astype(jnp.float32), t)
    return t2, q, t
