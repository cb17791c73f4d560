"""Deployment-side scoring: resident compiled models over streaming batches.

The reference has no serving story — scoring happens inline in experiment
scripts.  For production one-class screening (e.g. a SWIR line-scan camera
emitting ~10^5 pixel spectra per frame), this module keeps the model and
the compiled decision function resident and scores fixed-shape chunks:

- ``SIMCAScorer``   — classical SIMCA conformity over spectra chunks;
- ``VAEScorer``     — any of the VAE decision variants over an OCMBundle
  (optionally loaded straight from a reference ``.pth`` via
  models.torch_import);

Both pad the final ragged chunk to the compiled shape (one compilation per
chunk size), optionally shard chunks over a device mesh, and expose
``score_stream`` for iterables of arrays.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ocm_tpu.models.bundle import OCMBundle
from ocm_tpu.models.simca import SIMCAModel, simca_decide
from ocm_tpu.models.vae import ConvVAE1D


def _pad_chunk(chunk: np.ndarray, size: int):
    n = chunk.shape[0]
    if n == size:
        return chunk, n
    out = np.zeros((size, chunk.shape[1]), chunk.dtype)
    out[:n] = chunk
    out[n:] = chunk[-1] if n else 0.0
    return out, n


class _ChunkedScorer:
    """Shared machinery: compile once per chunk shape, pad ragged tails."""

    def __init__(self, decide_fn, chunk_size: int = 8192,
                 mesh=None, axis: str = "data", post_fn=None):
        self.chunk_size = int(chunk_size)
        # host-side per-chunk epilogue, applied to the fetched np pytree
        # BEFORE the pad rows are sliced off (so batch-dependent
        # statistics — quirk Q3 — see the same padded batch the compiled
        # path would)
        self._post = post_fn
        if mesh is not None:
            from ocm_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh, axis)
            self._fn = jax.jit(decide_fn, in_shardings=sharding,
                               out_shardings=sharding)
        else:
            self._fn = jax.jit(decide_fn)

    def _fetch(self, res, n: int) -> dict:
        out = jax.tree.map(np.asarray, res)
        if self._post is not None:
            out = self._post(out)
        return jax.tree.map(lambda a: a[:n], out)

    def _preprocess(self, x: np.ndarray) -> np.ndarray:
        """Whole-batch host prep before chunking (identity here;
        SIMCAScorer centers / casts)."""
        return x

    def _prepare_chunk(self, chunk: np.ndarray) -> tuple:
        """Host-side prep of one padded chunk into the decide fn's args
        (overridden by quantized-storage paths)."""
        return (jnp.asarray(chunk),)

    def prepare(self, x) -> list:
        """Ingest once, score many: run ALL host-side prep (centering,
        quantization, row norms, device placement) and return the
        prepared chunk list.  ``score_prepared`` then skips straight to
        the compiled decide calls — for quantized stores the spectra
        live on device at storage width and repeated screens (e.g. the
        same frame against updated models) re-pay nothing.  NOTE the
        prepared chunks are ALL resident on device at once — for a
        one-shot screen of a batch larger than HBM use ``score``, which
        streams one chunk at a time."""
        x = self._preprocess(np.asarray(x))
        out = []
        for start in range(0, x.shape[0], self.chunk_size):
            chunk, n = _pad_chunk(x[start:start + self.chunk_size],
                                  self.chunk_size)
            out.append((self._prepare_chunk(chunk), n))
        return out

    def score_prepared(self, prepared: list) -> dict:
        outs = [self._fetch(self._fn(*args), n) for args, n in prepared]
        if not outs:
            return {}
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def score(self, x, prefetch: int = 1) -> dict:
        """Score an (N, L) array in fixed-shape chunks; returns a dict of
        np arrays ('accept' plus the per-variant statistics).

        Streaming memory contract: device residency stays
        O((2 + prefetch) * chunk_size) however large the batch — the
        in-flight chunk plus the ``1 + prefetch`` prepared ones — unlike
        ``prepare``, which holds every chunk for repeated screens.

        ``prefetch``: chunks of host prep (centering / quantization /
        H2D placement) run on a worker thread WHILE the device crunches
        the current chunk — the jitted dispatch is async, so the result
        fetch of chunk i overlaps the preparation of chunk i+1 (the host
        work is significant for the quantized-storage paths).  0 forces
        the fully sequential loop.  Single-chunk batches (the common
        score_stream frame) never spawn the worker thread."""
        x = self._preprocess(np.asarray(x))
        starts = list(range(0, x.shape[0], self.chunk_size))

        def prep(start):
            chunk, n = _pad_chunk(x[start:start + self.chunk_size],
                                  self.chunk_size)
            return self._prepare_chunk(chunk), n

        outs: list = []
        if prefetch <= 0 or len(starts) <= 1:
            for start in starts:
                args, n = prep(start)
                outs.append(self._fetch(self._fn(*args), n))
        else:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as ex:
                it = iter(starts)
                # range first: zip(it, range) would consume and DROP one
                # extra start from the iterator when range exhausts
                pending = deque(ex.submit(prep, s) for _, s in
                                zip(range(1 + prefetch), it))
                while pending:
                    args, n = pending.popleft().result()
                    res = self._fn(*args)       # async dispatch
                    nxt = next(it, None)
                    if nxt is not None:         # prep next BEFORE fetching
                        pending.append(ex.submit(prep, nxt))
                    outs.append(self._fetch(res, n))
        if not outs:
            return {}
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def score_stream(self, chunks: Iterable) -> Iterator[dict]:
        """Generator over an iterable of (n_i, L) arrays (e.g. HSI frames):
        yields one result dict per input chunk."""
        for chunk in chunks:
            yield self.score(chunk)


class SIMCAScorer(_ChunkedScorer):
    """Resident classical-SIMCA conformity scorer — single OR multi-class.

    Passing a STACKED model (the (C, ...) pytree from
    ``models.simca.fit_classes``) screens every class from ONE HBM pass
    over each chunk (ops.linalg.t2_q_scores_multiclass): a production
    C-class screen costs one streamed read instead of C — the fused path
    the reference's per-class scoring loop (utils/SIMCA.py:124-145)
    multiplies C-fold.  Outputs then carry a trailing class axis:
    ``accept``/``dred``/``t2``/``q`` are (N, C).

    Multi-class chunks are ALWAYS centered in f32 on the host against the
    shared mean-of-class-means offset before the fused Q expansion — on
    raw spectra with a large common mode the expansion's ~eps*||x||^2
    cancellation error would otherwise flip boundary decisions that the
    per-class (center-then-square) path gets exactly.

    ``store_dtype=jnp.bfloat16`` additionally enables the
    bandwidth-halving serving path: the host-centered residual — against
    the model mean (single class) or the shared offset (multi-class) —
    is shipped/streamed as the bf16 residual
    (quantization error then scales with the small residual, not the
    spectrum's common mode — see ops.linalg.t2_q_scores_multiclass), with
    f32 accumulation and statistics.  Measured 1.9x scoring throughput
    with decisions unchanged on the headline workload
    (docs/BENCHMARKS.md).

    ``store_dtype=jnp.int8`` halves the streamed bytes AGAIN: each
    host-centered residual row is symmetrically quantized to int8 with a
    per-row f32 scale (ops.linalg.quantize_rows_int8), the projection
    GEMM runs int8 x int8 -> int32 with EXACT accumulation on the MXU's
    integer tier, and the ||x||^2 term ships precomputed so the device
    reads each chunk exactly once.  Statistics and limits stay f32.
    Accuracy contract (tests/test_simca.py, tests/test_serving.py):
    flips vs the f32 scorer are CONFINED to a band near the decision
    boundary — >=99.5% agreement with the default 'alt' combine on
    class-separated data, >=96% with 'sim'/'dd' on deliberately
    overlapping classes (those types amplify the Q cancellation), every
    flip within ~15% of the critical distance.  Per-row quantization of
    the RESIDUAL keeps the common mode out of the error budget the same
    way the bf16 path does.

    ``preprocess_fn`` (mutually exclusive with ``store_dtype``) enables
    CAMERA-NATIVE RAW INGEST: chunks ship at their storage dtype (e.g.
    uint16 counts straight off a SWIR line-scan camera — half the f32
    bytes, zero host prep work) and ``preprocess_fn`` (any jittable
    ``(n, L_raw) -> (n, L)`` map, e.g.
    ``lambda x: snv_savgol(x, 5, 2, 1)``) runs FUSED with centering,
    ``||.||^2`` and the decision inside one compiled program per chunk.
    This is the reference's whole ingest loop (nut_data.py pixel prep +
    utils/SIMCA.py scoring) as a single XLA program.  Numerics vs the
    host-prep f32 path: centering is the same arithmetic, but the
    ``||xc||^2`` term reduces on device instead of in numpy, so fused-Q
    statistics agree to ~1e-3 (reduction order) rather than bitwise;
    uint16 input additionally carries the camera's own quantization.
    """

    def __init__(self, model: SIMCAModel, decision_type: str = "alt",
                 chunk_size: int = 8192, mesh=None, store_dtype=None,
                 center=None, preprocess_fn=None):
        from ocm_tpu.models.simca import (predict_classes,
                                          predict_classes_int8)

        if store_dtype is not None and jnp.dtype(store_dtype) not in (
                jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int8)):
            raise ValueError(
                "store_dtype supports jnp.bfloat16 or jnp.int8")
        if preprocess_fn is not None and store_dtype is not None:
            raise ValueError(
                "preprocess_fn (raw device-side ingest) and store_dtype "
                "(host-quantized residual storage) are mutually exclusive: "
                "quantizing the residual requires the preprocessed spectrum "
                "on the host, which is exactly the work preprocess_fn moves "
                "onto the device")
        self._raw_fn = preprocess_fn
        if center is not None:
            center = np.asarray(center, np.float32)
            length = np.shape(model.mean)[-1]
            if center.shape != (length,):
                raise ValueError(
                    f"center must be a ({length},) spectrum (got shape "
                    f"{center.shape}); for re-screening pass the previous "
                    "scorer's .center")
        self._center = center
        self._store_dtype = store_dtype
        self._int8 = (store_dtype is not None
                      and jnp.dtype(store_dtype) == jnp.dtype(jnp.int8))
        self._multiclass = np.ndim(model.mean) == 2
        if self._int8:
            # int8 residual storage: host centers + per-row quantizes each
            # chunk (ops.linalg.quantize_rows_int8); the device streams
            # HALF the bf16 path's bytes through an exact-accumulation
            # int8 GEMM and skips the second ||x||^2 pass (shipped
            # precomputed).  Single-class models score through the same
            # stacked op; the offset folds into the class means either
            # way, so any pinned ``center`` works.
            if self._multiclass:
                if self._center is None:
                    self._center = np.mean(
                        np.asarray(model.mean, np.float32), axis=0)
                squeeze = False
            else:
                if self._center is None:
                    self._center = np.asarray(model.mean, np.float32)
                model = jax.tree.map(lambda a: jnp.asarray(a)[None], model)
                squeeze = True
            x_offset = jnp.asarray(self._center)

            def decide(xq, xs, x2):
                accept, dred, t2, q = predict_classes_int8(
                    model, xq, xs, x2, decision_type, x_offset=x_offset)
                if squeeze:
                    return {"accept": accept[0], "dred": dred[0],
                            "t2": t2[0], "q": q[0]}
                return {"accept": accept.T, "dred": dred.T,
                        "t2": t2.T, "q": q.T}

            super().__init__(decide, chunk_size, mesh)
            return
        if self._multiclass:                     # stacked multi-class model
            # ALWAYS pre-center on the host against the shared
            # mean-of-class-means offset (it folds into the class means
            # algebraically).  The fused Q expansion carries
            # ~eps*||x||^2 cancellation error, so screening RAW f32
            # spectra with a large common mode through it can flip
            # boundary decisions relative to C single-class scorers
            # (which center before squaring); centering the chunk makes
            # the f32 path exact too, and with store_dtype=bf16 the
            # residual additionally ships at half width.
            if self._center is None:
                self._center = np.mean(np.asarray(model.mean, np.float32),
                                       axis=0)
            x_offset = jnp.asarray(self._center)

            if self._raw_fn is not None:
                # camera-native ingest: the chunk arrives at its RAW
                # storage dtype (e.g. uint16 counts off a SWIR line-scan
                # camera) and preprocess -> center -> ||.||^2 -> fused
                # scoring all run as ONE compiled program per chunk.  The
                # host ships 2 bytes/element instead of 4 and does zero
                # prep work; centering on device in f32 is the same
                # arithmetic as the host path, so the multi-class
                # cancellation contract above is unchanged.
                raw_fn = self._raw_fn

                def decide(x_raw):
                    xc = raw_fn(jnp.asarray(x_raw, jnp.float32)) - x_offset
                    x2 = jnp.sum(jnp.square(xc), axis=1)
                    accept, dred, t2, q = predict_classes(
                        model, xc, decision_type, x_offset=x_offset,
                        x_sumsq=x2)
                    return {"accept": accept.T, "dred": dred.T,
                            "t2": t2.T, "q": q.T}

                super().__init__(decide, chunk_size, mesh)
                return

            def decide(xc, x2):
                # x2 = host-precomputed ||xc||^2: the fused op's second
                # full read of the chunk (its ||x||^2 reduction) becomes
                # a shipped (N,) vector — one HBM pass per chunk
                accept, dred, t2, q = predict_classes(
                    model, xc, decision_type, x_offset=x_offset,
                    x_sumsq=x2)
                # batch-leading orientation (N, C): matches SIMCA.predict
                # and keeps the chunk machinery's leading-axis slicing
                return {"accept": accept.T, "dred": dred.T,
                        "t2": t2.T, "q": q.T}
        else:
            scoring_model = model
            if store_dtype is not None and self._center is None:
                self._center = np.asarray(model.mean, np.float32)
            if self._raw_fn is not None:
                # single-class camera-native ingest (see the multi-class
                # branch): raw chunk in, preprocess + decide in one
                # program.  ``center`` has no role here — chunks are raw
                # spectra, never stored residuals — so reject it rather
                # than silently ignore it.
                if self._center is not None:
                    raise ValueError(
                        "center= is for re-screening stored residual "
                        "chunks and cannot be combined with preprocess_fn "
                        "(raw ingest) on a single-class model")
                raw_fn = self._raw_fn

                def decide(x_raw):
                    xp = raw_fn(jnp.asarray(x_raw, jnp.float32))
                    accept, dred, t2, q = simca_decide(scoring_model, xp,
                                                       decision_type)
                    return {"accept": accept, "dred": dred, "t2": t2,
                            "q": q}

                super().__init__(decide, chunk_size, mesh)
                return
            if self._center is not None:
                # chunks arrive as residuals vs center; shift the model
                # mean accordingly (exact when center == mean: zero)
                scoring_model = model._replace(
                    mean=model.mean - jnp.asarray(self._center))

            def decide(xc):
                accept, dred, t2, q = simca_decide(scoring_model, xc,
                                                   decision_type)
                return {"accept": accept, "dred": dred, "t2": t2, "q": q}

        super().__init__(decide, chunk_size, mesh)

    @property
    def center(self):
        """The f32 offset chunks are centered against (None = the raw
        single-class f32 path).  To RE-SCREEN chunks prepared by this
        scorer against updated models, build the new scorer with
        ``center=old.center`` (same store_dtype/chunk_size) — the offset
        folds into the new class means algebraically, so stored residuals
        never need re-centering or re-quantizing."""
        return self._center

    def _prepare_chunk(self, chunk: np.ndarray) -> tuple:
        if self._raw_fn is not None:
            # raw ingest: ship the chunk at its storage dtype untouched —
            # preprocessing/centering/||.||^2 are inside the compiled
            # decide program
            return (jnp.asarray(chunk),)
        if self._int8:
            # centering is FUSED into the quantize pass (chunks arrive
            # raw f32 from _preprocess): the threaded C++ kernel does
            # center+quantize+rownorm in two streaming passes per row
            # instead of NumPy's ~seven materializing ones — this prep
            # is the host side of the H2D pipeline (score(prefetch=))
            from ocm_tpu.utils import native

            chunk = np.asarray(chunk, np.float32)
            out = native.quantize_rows_int8(chunk, center=self._center)
            if out is None:      # toolchain-free fallback, bit-identical
                from ocm_tpu.ops.linalg import quantize_rows_int8

                out = quantize_rows_int8(chunk - self._center[None, :])
            xq, xs, x2 = out
            return jnp.asarray(xq), jnp.asarray(xs), jnp.asarray(x2)
        if self._multiclass:
            # ship ||xc||^2 precomputed (f32, from the same stored values
            # the device would read) so the fused path reads each chunk
            # exactly once
            x2 = np.sum(np.square(np.asarray(chunk, np.float32)), axis=1)
            return jnp.asarray(chunk), jnp.asarray(x2)
        return super()._prepare_chunk(chunk)

    def _preprocess(self, x: np.ndarray) -> np.ndarray:
        if self._raw_fn is not None:
            return np.asarray(x)        # raw dtype preserved end to end
        if self._center is not None:
            if self._int8:
                # centering happens inside the fused chunk quantize
                # (_prepare_chunk); hand chunks over as raw f32
                return np.asarray(x, np.float32)
            # center in f32 on the host; with store_dtype=bf16 the
            # residual ships at half width (shrinking the host->device
            # transfer AND the device-side streaming read)
            x = np.asarray(x, np.float32) - self._center[None, :]
            if self._store_dtype is not None:
                import ml_dtypes

                x = x.astype(ml_dtypes.bfloat16)
        return x


class VAEScorer(_ChunkedScorer):
    """Resident VAE one-class scorer over an OCMBundle — single OR
    multi-class.

    ``variant``: 'd2' | 'd2_q' | 'f' | 'full' (SURVEY.md §2.3 variants 2-4)
    or 'vaesimca' (variant 5; pass the fitted ``vaesimca_model`` from
    ocm_tpu.models.vaesimca.fit_vaesimca).

    Passing a STACKED bundle (``models.bundle.stack_bundles`` over
    independently fitted same-architecture classes) screens every class
    from ONE compiled program per chunk: the per-class network passes
    run as a lax.map class axis (sequential dense convs in one program —
    a vmapped class axis lowers to grouped convolutions the MXU tiles
    1.7x slower, docs/BENCHMARKS.md), so a C-class screen — the
    reference's sequential per-nut-type driver loop
    (vae_bce_nut.py:113-121) — pays one dispatch and one H2D transfer of
    the chunk instead of C of each.  Outputs then carry a trailing class
    axis ((N, C)); with ``variant='vaesimca'`` the ``vaesimca_model`` must
    be stacked over the same classes (``stack_bundles`` works on it too).
    Per-class numerics are the single-scorer ones — variant 'f' keeps
    quirk-Q3 batch statistics per class, identical to C single scorers
    (parity asserted in tests/test_serving.py).
    """

    def __init__(self, model: ConvVAE1D, bundle: OCMBundle,
                 variant: str = "d2", loss_type: str = "cosine",
                 chunk_size: int = 8192, mesh=None, vaesimca_model=None,
                 decision_type: str = "alt", compute_dtype=None,
                 pin_f_stats: bool = False):
        from ocm_tpu.models import vae_decision as D

        if pin_f_stats and variant != "f":
            raise ValueError(
                "pin_f_stats applies only to variant='f' (the quirk-Q3 "
                f"batch statistics); got variant={variant!r}")
        if compute_dtype is not None:
            # reduced-precision serving twin: same params/bundle, network
            # compute in ``compute_dtype`` (e.g. jnp.bfloat16 — conv GEMMs
            # on the MXU's native tier); all decision statistics stay f32
            # (models.vaesimca/vae_decision upcast latents before T2/Q)
            model = model.clone(dtype=compute_dtype)
        # a stacked bundle carries a leading class axis on EVERY leaf; key
        # the detection on latent_mean's rank ((k,) vs (C, k)) rather than
        # the threshold, so a single-class checkpoint whose threshold
        # buffer happens to be shape-(1,) (e.g. torch.tensor([thr]) in a
        # hand-built .pth) still takes the single-class path (its
        # comparisons broadcast) instead of mis-vmapping the whole bundle
        self._multiclass = np.ndim(bundle.latent_mean) == 2
        if self._multiclass and (
                np.ndim(bundle.threshold) != 1
                or np.shape(bundle.threshold)[0]
                != np.shape(bundle.latent_mean)[0]):
            raise ValueError(
                "stacked bundle is inconsistent: latent_mean has a class "
                f"axis of {np.shape(bundle.latent_mean)[0]} but threshold "
                f"has shape {np.shape(bundle.threshold)} — build stacked "
                "bundles with models.bundle.stack_bundles")

        if variant == "vaesimca":
            if vaesimca_model is None:
                raise ValueError(
                    "variant='vaesimca' needs vaesimca_model from "
                    "ocm_tpu.models.vaesimca.fit_vaesimca")
            from ocm_tpu.models.vaesimca import predict_vaesimca

            if self._multiclass:
                n_cls = np.shape(bundle.threshold)[0]
                if (np.ndim(vaesimca_model.d_limit) != 1
                        or np.shape(vaesimca_model.d_limit)[0] != n_cls):
                    raise ValueError(
                        "stacked bundle needs a vaesimca_model stacked over "
                        f"the same {n_cls} classes (stack_bundles)")

            def decide_one(b, vm, xc):
                accept, t2, q = predict_vaesimca(model, b, vm, xc,
                                                 decision_type)
                return {"accept": accept, "t2": t2, "q": q}

            if self._multiclass:
                # lax.map, NOT vmap: a vmapped class axis turns the
                # per-class convs into grouped convolutions, which the
                # MXU tiles poorly — measured 1.7x slower than the same
                # C dense network passes run sequentially inside one jit
                # (scripts/probe_multiclass_lowering.py, v5e 2026-08-18:
                # vmap 23.9 ms vs lax.map 14.1 ms per 8192-chunk).  The
                # serving win (1 dispatch + 1 H2D per chunk instead of
                # C) is dispatch amortization, which lax.map keeps.
                mapped = lambda xc: jax.lax.map(
                    lambda bv: decide_one(bv[0], bv[1], xc),
                    (bundle, vaesimca_model))
                decide = lambda xc: jax.tree.map(jnp.transpose, mapped(xc))
            else:
                decide = lambda xc: decide_one(bundle, vaesimca_model, xc)
            super().__init__(decide, chunk_size, mesh)
            return
        if variant == "d2":
            decide_one = lambda b, xc: D.decide_d2(model, b, xc)._asdict()
        elif variant == "d2_q":
            decide_one = lambda b, xc: D.decide_d2_q(
                model, b, xc, loss_type)._asdict()
        elif variant == "f" and pin_f_stats:
            # DEPLOYMENT-PINNED variant 'f': the compiled program runs
            # only the network (encode/decode/standardize) and ships the
            # ingredients; the quirk-Q3 batch statistics (moments +
            # leverage eigh) run on the HOST in float64
            # (stats.qhf.qhf_batch_host), so decisions are a pure
            # (bit-stable) function of the network outputs.  Compilation-
            # context changes (stacked vs single scorer, fusion) then
            # only move results by the network forward's own f32 rounding
            # (~1e-5 relative, measured) instead of the in-program
            # statistics' ~1% decision flips on TPU (docs/PARITY.md Q3).
            # Output keys match unpinned 'f'.
            from ocm_tpu.stats.qhf import qhf_batch_host

            def ingredients(b, xc):
                mu, _ = D.encode(model, b, xc)
                x_rec = D.decode(model, b, mu)
                return {"x_std": D.standardize(b, xc),
                        "r_std": D.standardize(b, x_rec), "mu": mu}

            if self._multiclass:
                # batch-leading orientation so the chunk machinery's
                # [:n] slice cuts samples, not classes
                decide = lambda xc: jax.tree.map(
                    lambda a: jnp.moveaxis(a, 0, 1),
                    jax.lax.map(lambda b: ingredients(b, xc), bundle))
                thr = np.asarray(bundle.threshold_f, np.float64)

                def post(d):
                    cols = [qhf_batch_host(d["x_std"][:, c], d["r_std"][:, c],
                                           d["mu"][:, c])
                            for c in range(thr.shape[0])]
                    return {"accept": np.stack(
                                [f <= thr[c] for c, (_, _, f)
                                 in enumerate(cols)], axis=1),
                            "d2": np.stack([h for _, h, _ in cols], axis=1),
                            "q": np.stack([q for q, _, _ in cols], axis=1)}
            else:
                decide = lambda xc: ingredients(bundle, xc)
                thr_s = float(bundle.threshold_f)

                def post(d):
                    q, h, f = qhf_batch_host(d["x_std"], d["r_std"],
                                             d["mu"])
                    return {"accept": f <= thr_s, "d2": h, "q": q}

            super().__init__(decide, chunk_size, mesh, post_fn=post)
            return
        elif variant == "f":
            decide_one = lambda b, xc: D.decide_f(model, b, xc)._asdict()
        elif variant == "full":
            decide_one = lambda b, xc: D.decide_full_distance(
                model, b, xc)._asdict()
        else:
            raise ValueError(f"unknown variant {variant!r}; expected "
                             "d2|d2_q|f|full|vaesimca")
        if self._multiclass:
            # lax.map for the class axis (grouped-conv vmap penalty —
            # see the vaesimca branch note above); batch-leading (N, C)
            # orientation, matching SIMCAScorer
            mapped = lambda xc: jax.lax.map(lambda b: decide_one(b, xc),
                                            bundle)
            decide = lambda xc: jax.tree.map(jnp.transpose, mapped(xc))
        else:
            decide = lambda xc: decide_one(bundle, xc)
        super().__init__(decide, chunk_size, mesh)

    @classmethod
    def from_torch_checkpoint(cls, path: str, model: ConvVAE1D,
                              **kwargs) -> "VAEScorer":
        """Serve a reference-trained ``.pth`` directly."""
        from ocm_tpu.models.torch_import import load_torch_checkpoint

        return cls(model, load_torch_checkpoint(path, model), **kwargs)
