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
                 mesh=None, axis: str = "data"):
        self.chunk_size = int(chunk_size)
        if mesh is not None:
            from ocm_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh, axis)
            self._fn = jax.jit(decide_fn, in_shardings=sharding,
                               out_shardings=sharding)
        else:
            self._fn = jax.jit(decide_fn)

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
        outs = [jax.tree.map(lambda a: np.asarray(a)[:n], self._fn(*args))
                for args, n in prepared]
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
                res = self._fn(*args)
                outs.append(jax.tree.map(lambda a: np.asarray(a)[:n], res))
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
                    outs.append(jax.tree.map(lambda a: np.asarray(a)[:n],
                                             res))
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
    """

    def __init__(self, model: SIMCAModel, decision_type: str = "alt",
                 chunk_size: int = 8192, mesh=None, store_dtype=None,
                 center=None):
        from ocm_tpu.models.simca import (predict_classes,
                                          predict_classes_int8)

        if store_dtype is not None and jnp.dtype(store_dtype) not in (
                jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int8)):
            raise ValueError(
                "store_dtype supports jnp.bfloat16 or jnp.int8")
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
                 decision_type: str = "alt", compute_dtype=None):
        from ocm_tpu.models import vae_decision as D

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
