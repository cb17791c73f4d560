"""Full benchmark suite: the five BASELINE.json configs.

Prints one JSON line per benchmark (the driver-facing headline metric stays
in bench.py).  CPU reference timings run the reference's own algorithms
(sklearn PCA fits / torch training loops) at identical workloads.

  1. simca_fit_score   — classical SIMCA on nut-scale spectra (bench.py)
  2. cvsimca           — cross-validated component selection, batched
                         (fold x LV) device solve vs the reference's
                         sklearn host loop
  3. vae_train         — BCE VAE training steps/sec, on-device lax.scan
                         loop vs an equivalent torch CPU loop
  4. vae_simca         — VAE-SIMCA joint fit-thresholds + decision
                         throughput (no reference timing exists; absolute)
  5. batched_sweep     — vmapped multi-config VAE training vs sequential
                         single-config estimate

Usage: python bench_all.py [--quick]

--quick shrinks workloads and inner-iteration counts for a fast smoke of
every bench path; its absolute numbers (especially the roofline rows) sit
partly on the ~30 ms dispatch floor and are NOT the publication numbers —
docs/BENCHMARKS.md always quotes full-mode runs.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _emit(metric, value, unit, vs_baseline=None):
    payload = {"metric": metric, "value": round(float(value), 2),
               "unit": unit}
    if vs_baseline is not None:
        payload["vs_baseline"] = round(float(vs_baseline), 2)
    print(json.dumps(payload), flush=True)
    return payload


def _force(out):
    """Fetch all output leaves to the host.  Warmups MUST fetch on the
    hosted TPU (axon): execution — including compilation — is lazy until a
    value materializes, and block_until_ready on a never-materialized array
    returns immediately (measured).  After one fetch, per-call
    block_until_ready waits correctly and timings scale with the workload."""
    import jax

    return jax.tree.map(np.asarray, out)


def bench_simca(quick=False):
    import bench as headline

    cals, xs = headline.make_data(n_score=32768 if quick else 98304)
    n_work = xs.shape[0] * len(cals)
    tpu_t = headline.bench_tpu(cals, xs, repeats=3 if quick else 5)
    cpu_t = headline.bench_cpu_reference(cals, xs)
    return _emit("simca_fit_score_throughput", n_work / tpu_t,
                 "class-scores/s", (n_work / tpu_t) / (n_work / cpu_t))


def bench_cvsimca(quick=False):
    import jax

    from ocm_tpu.models.cv import cv_simca_sweep

    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 500)
    n0, n1 = (300, 150) if quick else (600, 300)
    x0 = rng.normal(1, .08, (n0, 1)) * np.sin(2 * np.pi * 3 * t) + \
        rng.normal(0, .02, (n0, 500))
    x1 = rng.normal(1, .08, (n1, 1)) * np.sin(2 * np.pi * 4 * t) + \
        rng.normal(0, .02, (n1, 500))
    x = np.concatenate([x0, x1]).astype(np.float32)
    y = np.concatenate([np.zeros(n0), np.ones(n1)])
    lvs = list(range(2, 7 if quick else 13))
    n_splits = 5
    n_fits = len(lvs) * n_splits

    import jax
    import jax.numpy as jnp

    xd = jax.device_put(jnp.asarray(x))
    jax.block_until_ready(xd)

    def timed_sweep(solver, reps):
        """Amortized wall per sweep: ``reps`` async dispatches of the same
        compiled program overlap the tunnel RTT; reps must be high enough
        that device work dominates it.  Best of 3 batches: at
        millisecond-scale sweeps the wall clock is sensitive to host
        dispatch-rate jitter, so a single batch varies ~2x run to run
        (docs/BENCHMARKS.md methodology)."""
        def run():
            return cv_simca_sweep(xd, y, 0, lvs, n_splits=n_splits,
                                  convert=False, solver=solver)
        _force(run())  # compile + materialize (see _force)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = run()
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # production path: GEMM-only randomized subspace fits
    tpu_t = timed_sweep("rsvd", reps=8 if quick else 40)
    # dense masked eigh (strict parity path) for comparison
    eigh_t = timed_sweep("eigh", reps=5)
    _emit("cvsimca_fits_per_s_eigh", n_fits / eigh_t, "fold-LV fits/s")

    # reference algorithm: sklearn PCA refit per (fold, LV)
    from sklearn.decomposition import PCA

    cls_idx = np.flatnonzero(y == 0)
    folds = np.array_split(np.arange(len(cls_idx)), n_splits)
    t0 = time.perf_counter()
    for lv in lvs:
        for f in folds:
            tr = np.delete(cls_idx, f)
            x_tr = x[tr].astype(np.float64)
            pca_full = PCA(svd_solver="full").fit(x_tr)
            pca_k = PCA(n_components=lv, svd_solver="full").fit(x_tr)
            t_new = pca_k.transform(x)
            x_rec = pca_k.inverse_transform(t_new)
            q = np.sum((x - x_rec) ** 2, axis=1)
            del pca_full, q
    cpu_t = time.perf_counter() - t0
    return _emit("cvsimca_fits_per_s", n_fits / tpu_t, "fold-LV fits/s",
                 (n_fits / tpu_t) / (n_fits / cpu_t))


def _torch_vae_steps_per_s(length, batch, steps):
    """Reference-equivalent torch CPU training throughput (the reference's
    substrate; architecture built from the same hyperparameters)."""
    import torch

    k, pad = 9, 4
    enc = torch.nn.Sequential(
        torch.nn.Conv1d(1, 32, k, 1, pad), torch.nn.BatchNorm1d(32),
        torch.nn.ELU(),
        torch.nn.Conv1d(32, 64, k, 2, pad), torch.nn.BatchNorm1d(64),
        torch.nn.ELU(),
        torch.nn.Conv1d(64, 128, k, 2, pad), torch.nn.BatchNorm1d(128),
        torch.nn.ELU())
    out_len = length
    for s in (1, 2, 2):
        out_len = (out_len + 2 * pad - (k - 1) - 1) // s + 1
    fc_in = 128 * out_len
    fc = torch.nn.Linear(fc_in, 256)
    fc_mu = torch.nn.Linear(256, 16)
    fc_lv = torch.nn.Linear(256, 16)
    fc_dec = torch.nn.Sequential(torch.nn.Linear(16, 256), torch.nn.ELU(),
                                 torch.nn.Linear(256, fc_in), torch.nn.ELU())
    dec = torch.nn.Sequential(
        torch.nn.ConvTranspose1d(128, 64, k, 2, pad, 1),
        torch.nn.BatchNorm1d(64), torch.nn.ELU(),
        torch.nn.ConvTranspose1d(64, 32, k, 2, pad, 1),
        torch.nn.BatchNorm1d(32), torch.nn.ELU(),
        torch.nn.ConvTranspose1d(32, 32, k, 1, pad, 0),
        torch.nn.BatchNorm1d(32), torch.nn.ELU(),
        torch.nn.Conv1d(32, 1, 1))
    params = []
    for m in (enc, fc, fc_mu, fc_lv, fc_dec, dec):
        params += list(m.parameters())
    opt = torch.optim.Adam(params, lr=1e-3)
    x = torch.randn(batch, length)

    def step():
        opt.zero_grad()
        h = enc(x.unsqueeze(1)).flatten(1)
        h = torch.nn.functional.elu(fc(h))
        mu, lv = fc_mu(h), fc_lv(h)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
        h = fc_dec(z).view(batch, 128, out_len)
        xr = dec(h).squeeze(1)[..., :length]
        x_min = x.min(dim=1, keepdim=True)[0]
        x_max = x.max(dim=1, keepdim=True)[0]
        tgt = ((x - x_min) / (x_max - x_min + 1e-8)).clamp(0, 1)
        recon = torch.nn.functional.binary_cross_entropy_with_logits(xr, tgt)
        kl = -0.5 * torch.mean(
            torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=1))
        (recon + kl).backward()
        opt.step()

    step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return steps / (time.perf_counter() - t0)


def bench_vae_train(quick=False):
    import jax

    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D

    rng = np.random.default_rng(2)
    length, batch = 501, 64
    n = 640
    t = np.linspace(0, 1, length)
    x = (rng.normal(1, .08, (n, 1)) * np.sin(2 * np.pi * 3 * t)
         + rng.normal(0, .02, (n, length))).astype(np.float32)
    model = ConvVAE1D(input_length=length, latent_dim=16, conv_blocks=3,
                      n_filters=32, hidden_fc=256)
    epochs = 5 if quick else 20
    steps_per_epoch = n // batch
    cfg = TrainConfig(epochs=epochs, batch_size=batch, lr=1e-3,
                      loss_type="bce")
    _force(train_vae(model, x, x[:64], cfg,
                     jax.random.key(0)).train_losses)   # compile+materialize
    t0 = time.perf_counter()
    r = train_vae(model, x, x[:64], cfg, jax.random.key(0))
    jax.block_until_ready(r.final_params)
    tpu_steps = epochs * steps_per_epoch / (time.perf_counter() - t0)

    torch_steps = _torch_vae_steps_per_s(length, batch,
                                         20 if quick else 50)
    return _emit("vae_train_steps_per_s", tpu_steps, "steps/s",
                 tpu_steps / torch_steps)


def bench_vae_simca(quick=False):
    import jax
    import jax.numpy as jnp

    from ocm_tpu.models.trainer import TrainConfig, train_vae
    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.models.vaesimca import fit_vaesimca, predict_vaesimca

    rng = np.random.default_rng(3)
    length = 501
    t = np.linspace(0, 1, length)
    x_cal = (rng.normal(1, .08, (512, 1)) * np.sin(2 * np.pi * 3 * t)
             + rng.normal(0, .02, (512, length))).astype(np.float32)
    n_test = 16384 if quick else 65536
    x_test = (rng.normal(1, .2, (n_test, 1)) * np.sin(2 * np.pi * 3 * t)
              + rng.normal(0, .05, (n_test, length))).astype(np.float32)

    model = ConvVAE1D(input_length=length, latent_dim=16, conv_blocks=3,
                      n_filters=32, hidden_fc=256)
    r = train_vae(model, x_cal, x_cal[:64],
                  TrainConfig(epochs=3, batch_size=64, loss_type="cosine"),
                  jax.random.key(0))
    vs = fit_vaesimca(model, r.bundle, x_cal)

    # chunked: the decode path materializes (B, 504, 64) activations, so
    # the full 65,536-spectra workload runs as sequential 16,384 chunks
    # (lax.map) — also what a production scorer does (serving chunking)
    chunk = 16384
    x_test_j = jnp.asarray(x_test.reshape(n_test // chunk, chunk, length))

    inner = 8

    @jax.jit
    def fn(xt):
        def body(i, acc):
            def one(xc):
                accept, t2, q = predict_vaesimca(model, r.bundle, vs,
                                                 xc + 1e-6 * i)
                # consume EVERY output: summing only t2 lets XLA dead-code
                # the decode + re-encode (the whole Q path) — the round-2
                # number was measured that way and was really encode-only
                # (3.2x optimistic; see docs/BENCHMARKS.md round-3 note)
                return jnp.sum(t2) + jnp.sum(q) + jnp.sum(accept)

            return acc + jnp.sum(jax.lax.map(one, xt))

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    _force(fn(x_test_j))   # compile + materialize
    t0 = time.perf_counter()
    jax.block_until_ready(fn(x_test_j))
    dt = (time.perf_counter() - t0) / inner
    return _emit("vaesimca_predict_throughput", n_test / dt, "spectra/s")


def bench_batched_sweep(quick=False):
    import jax

    from ocm_tpu.models.vae import ConvVAE1D
    from ocm_tpu.utils.sweep import train_vae_vmapped

    rng = np.random.default_rng(4)
    length, n_cfg = 501, 8
    t = np.linspace(0, 1, length)
    x = (rng.normal(1, .08, (320, 1)) * np.sin(2 * np.pi * 3 * t)
         + rng.normal(0, .02, (320, length))).astype(np.float32)
    model = ConvVAE1D(input_length=length, latent_dim=16, conv_blocks=3,
                      n_filters=32, hidden_fc=256)
    epochs = 3 if quick else 10
    lrs = np.logspace(-4, -2, n_cfg)

    def run(k):
        return train_vae_vmapped(model, x[:256], x[256:],
                                 lrs=lrs[:k], weight_decays=[0.0] * k,
                                 betas=[1.0] * k, epochs=epochs,
                                 batch_size=64, loss_type="cosine",
                                 rng=jax.random.key(0))

    _force(run(n_cfg).train_losses)  # compile + materialize
    t0 = time.perf_counter()
    jax.block_until_ready(run(n_cfg).train_losses)
    t_batch = time.perf_counter() - t0

    _force(run(1).train_losses)      # compile 1-config + materialize
    t0 = time.perf_counter()
    jax.block_until_ready(run(1).train_losses)
    t_one = time.perf_counter() - t0
    # vs_baseline: speedup of the vmapped batch over sequential execution
    return _emit("batched_sweep_configs_per_s", n_cfg / t_batch,
                 "configs/s", (n_cfg / t_batch) / (1.0 / t_one))


def bench_roofline(quick=False):
    """Empirical device roofline + utilization of the scoring hot path.

    Measures achievable matmul peak (f32 and bf16) and effective HBM
    bandwidth on THIS chip, then reports the headline scoring workload's
    MFU and bandwidth utilization against them — the basis for the
    memory-bound analysis in docs/BENCHMARKS.md.
    """
    import jax
    import jax.numpy as jnp

    # inner-iteration counts sized so device work dominates the ~30 ms
    # tunnel dispatch round trip; at inner=8 every micro-probe here floors
    # at an identical RTT/8 ~ 3.5 ms/iter (measured, round-2 correction in
    # docs/BENCHMARKS.md)
    def bench_body(run, arg, inner):
        float(jnp.sum(run(arg)))              # compile + materialize
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(arg))
            best = min(best, time.perf_counter() - t0)
        return best / inner

    # ---- matmul peak: loop-carried product chain --------------------------
    # carry = dot(carry, a) * scale keeps magnitudes stable and forces every
    # iteration to execute without materializing a perturbed operand (the
    # old a + eps*i form added 3 full HBM passes per iteration and turned
    # the probe bandwidth-bound: f32 and bf16 both read "33 TFLOP/s").
    m = 2048 if quick else 4096
    inner_mm = 16 if quick else 64
    flops = 2.0 * m * m * m
    peaks = {}
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = (jnp.ones((m, m), jnp.float32) * 1e-3).astype(dt)
        scale = jnp.asarray(1.0 / (m * 1e-3), jnp.float32)

        @jax.jit
        def run(a, scale=scale):
            def body(i, carry):
                p = jnp.dot(carry, a, preferred_element_type=jnp.float32)
                return (p * scale).astype(a.dtype)
            return jax.lax.fori_loop(0, inner_mm, body, a)

        peaks[tag] = flops / bench_body(run, a, inner_mm)
    peak_f32, peak_bf16 = peaks["f32"], peaks["bf16"]
    _emit("matmul_peak_f32", peak_f32 / 1e12, "TFLOP/s")
    _emit("matmul_peak_bf16", peak_bf16 / 1e12, "TFLOP/s")

    # int8 chain: s8 x s8 -> s32 on the MXU's integer tier; the all-ones
    # operand makes each product element exactly m, so carry = p // m
    # returns to exact ones — magnitude-stable without fp rescaling
    a8 = jnp.ones((m, m), jnp.int8)

    @jax.jit
    def run8(a):
        def body(i, carry):
            p = jnp.dot(carry, a, preferred_element_type=jnp.int32)
            return (p // m).astype(jnp.int8)
        return jax.lax.fori_loop(0, inner_mm, body, a)

    peak_s8 = flops / bench_body(run8, a8, inner_mm)
    _emit("matmul_peak_int8", peak_s8 / 1e12, "TOP/s")

    # ---- effective HBM bandwidth (streaming reduction) --------------------
    nbytes = (1 << 27) if quick else (1 << 28)          # 128 / 256 MB
    inner_bw = 16 if quick else 64
    v = jnp.ones((nbytes // 4,), jnp.float32)

    @jax.jit
    def run_bw(a):
        def body(i, acc):
            return acc + jnp.sum(a * (1.0 + 1e-9 * i))
        return jax.lax.fori_loop(0, inner_bw, body, jnp.float32(0.0))

    hbm_bw = nbytes / bench_body(run_bw, v, inner_bw)
    _emit("hbm_read_bandwidth", hbm_bw / 1e9, "GB/s")

    # ---- scoring-workload utilization -------------------------------------
    import bench as headline

    cals, xs = headline.make_data(n_score=32768 if quick else 98304)
    n, length = xs.shape
    c, k = len(cals), 10
    t_score = headline.bench_tpu(cals, xs, k=k,
                                 repeats=3 if quick else 5)
    # fused multi-class scorer: one (N,L)@(L,C*k+C) GEMM + reductions.
    # The 3 rsvd per-class fits share the measured time (~1/3 of it,
    # docs/BENCHMARKS.md) but are excluded from the FLOP count, so the
    # reported utilizations are conservative for the scoring GEMM itself.
    score_flops = 2.0 * n * length * (c * k + c) + 2.0 * n * c * k * k \
        + 4.0 * n * length
    score_bytes = 4.0 * n * length                      # one pass over x
    mfu = score_flops / t_score / peak_f32 * 100.0
    bwu = score_bytes / t_score / hbm_bw * 100.0
    _emit("scoring_mfu", mfu, "% of measured f32 peak")
    _emit("scoring_bw_utilization", bwu, "% of measured HBM read bandwidth")
    return {"peak_f32": peak_f32, "peak_bf16": peak_bf16, "hbm": hbm_bw,
            "mfu": mfu, "bwu": bwu}


def bench_streaming(quick=False):
    """Streaming production round: screen one batch + masked ingest of
    accepts + moments-only model refresh, as ONE compiled program
    (models/streaming; the reference's only equivalent is a full refit
    from the whole calibration matrix).  Metric: sustained spectra/s
    through the complete screen->ingest->refresh loop."""
    import jax
    import jax.numpy as jnp

    from ocm_tpu.models.simca import simca_decide
    from ocm_tpu.models.streaming import (fit_simca_moments, moments_init,
                                          moments_update)
    from ocm_tpu.utils.profiling import timeit

    length, batch_n, k = (128, 1024, 5) if quick else (500, 4096, 10)
    inner = 16 if quick else 64
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * 3 * t)
    xb = jnp.asarray((rng.normal(1.0, 0.1, (batch_n, 1)) * base[None, :]
                      + rng.normal(0, 0.02, (batch_n, length))
                      ).astype(np.float32))
    mom0 = moments_update(moments_init(length, jnp.float32), xb)

    @jax.jit
    def round_loop(mom, x0):
        model0 = fit_simca_moments(mom, k, solver="rsvd")

        def body(i, carry):
            mom_c, model, x_c = carry
            row = x_c[:1] + (1e-3 * i).astype(x_c.dtype)
            x_c = jax.lax.dynamic_update_slice(x_c, row,
                                               (i % x_c.shape[0], 0))
            accept, *_ = simca_decide(model, x_c, "alt")
            mom_c = moments_update(mom_c, x_c, w=accept.astype(x_c.dtype))
            return (mom_c,
                    fit_simca_moments(mom_c, k, solver="rsvd"), x_c)

        mom_f, model_f, _ = jax.lax.fori_loop(0, inner, body,
                                              (mom, model0, x0))
        return (model_f.q_res.limit + jnp.sum(model_f.invcovT) + mom_f.n)

    dt = timeit(round_loop, mom0, xb, repeats=3 if quick else 5
                )["best"] / inner
    return _emit("streaming_round_throughput", batch_n / dt,
                 "spectra/s (screen+ingest+refresh)")


def bench_hsi_cube(quick=False):
    """HSI cube-scale raw-ingest pipeline: uint16 camera counts ->
    SNV+SavGol -> center -> fused 3-class scoring, ALL inside one
    compiled program per chunk (serving.SIMCAScorer(preprocess_fn=...)).
    Metric: device pixel-spectra/s of the fused ingest+screen program
    (the e2e number through the tunnel is H2D-bound — measured and
    decomposed in examples/hsi_pipeline.py --cube-scale and
    docs/BENCHMARKS.md cube-scale section)."""
    import jax
    import jax.numpy as jnp

    from ocm_tpu.models.simca import fit_classes, predict_classes
    from ocm_tpu.ops.preprocess import snv_savgol
    from ocm_tpu.utils.profiling import timeit

    # inner=2048: at ~0.27 ms of device work per iteration the dispatch
    # RTT must be amortized to <~5% or the reading dilutes — the round-5
    # first record (67.8 M px/s at inner=32) was exactly that artifact;
    # slope-verified rate is ~239 M px/s (scripts/probe_hsi_ceiling.py,
    # docs/BENCHMARKS.md cube-scale section)
    length, chunk, inner = (128, 8192, 256) if quick else (288, 65536,
                                                           2048)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, length)
    cal, y = [], []
    for c in range(3):
        base = np.sin(2 * np.pi * (2 + 0.5 * c) * t) + 1.5 + 0.3 * c
        amp = rng.normal(1.0, 0.05, (2000, 1))
        cal.append(np.clip(np.round((amp * base[None, :] + rng.normal(
            0, 0.02, (2000, length))) * 1e4), 0, 65535).astype(np.float32))
        y.append(np.full(2000, c))
    prep = lambda a: snv_savgol(a, 5, 2, 1)  # noqa: E731
    x_cal = prep(jnp.asarray(np.concatenate(cal)))
    models = fit_classes(np.asarray(x_cal), np.concatenate(y), [0, 1, 2], 10)
    x_raw = jnp.asarray(rng.integers(0, 40000, (chunk, length)), jnp.uint16)
    x_off = jnp.mean(models.mean, axis=0)

    @jax.jit
    def run(x0):
        def body(i, acc):
            # index-perturb the RAW counts so nothing constant-folds
            xc = prep((x0 + (i % 7).astype(jnp.uint16)
                       ).astype(jnp.float32)) - x_off
            accept, dred, t2, q = predict_classes(
                models, xc, x_offset=x_off,
                x_sumsq=jnp.sum(jnp.square(xc), axis=1))
            return acc + jnp.sum(dred) + jnp.sum(accept)

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    dt = timeit(run, x_raw, repeats=3 if quick else 5)["best"] / inner
    return _emit("hsi_raw_ingest_throughput", chunk / dt,
                 "pixel-spectra/s (device, fused uint16 ingest+3-class)")


BENCHES = {
    "simca": bench_simca,
    "cvsimca": bench_cvsimca,
    "vae_train": bench_vae_train,
    "vae_simca": bench_vae_simca,
    "batched_sweep": bench_batched_sweep,
    "streaming": bench_streaming,
    "hsi_cube": bench_hsi_cube,
    "roofline": bench_roofline,
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--only", default=None, choices=list(BENCHES))
    args = p.parse_args()
    names = [args.only] if args.only else list(BENCHES)
    for name in names:
        BENCHES[name](quick=args.quick)


if __name__ == "__main__":
    main()
