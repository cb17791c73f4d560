"""Train-step roofline: FLOPs-verified %-of-peak for the VAE optimizer
step (round-5 verdict item 3).

The VAESIMCA predict path got the honest-ceiling treatment in round 3
(83% of MXU peak, FLOPs cross-checked against XLA cost_analysis,
docs/BENCHMARKS.md).  This probe does the same for the TRAINING step —
the reference's hot loop (vae_model.py train(), BASELINE.json config 3):

1. measured matmul peak (f32 + bf16) on THIS chip — the same
   loop-carried product-chain probe as bench_all.bench_roofline;
2. the full optimizer step (make_train_step: fwd + bwd + Adam + BN
   stats) at B in {64, 256, 1024}, f32 and bf16, timed as a lax.scan of
   steps inside ONE compiled program, with FLOPs taken from the compiled
   program's own cost_analysis — nothing hand-counted;
3. a decomposition ladder at each B: forward only, forward+backward,
   Adam update alone, and the BN-free architecture twin — where the
   non-MXU time goes.

Measurement discipline (this beat the first draft of this probe): the
hosted-TPU tunnel adds a ~31 ms constant dispatch cost per fetch, so a
single timed dispatch floors at RTT/inner — the quick-mode first run
read "294% of peak" at B=1024 because the PEAK probe itself was
dispatch-bound.  Every timing below is therefore a SLOPE: the same
program compiled at `inner` and `2*inner` sequential iterations, per-
iteration time = (t(2*inner) - t(inner)) / inner, which cancels the
constant exactly (the same two-point discipline as the CLAUDE.md
"never trust a probe under the dispatch RTT" rule).  Warmups fetch a
value (lazy-dispatch rule); repeats are best-of-N.

Run on the real TPU:  python scripts/probe_train_roofline.py [--quick]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

# inner-iteration counts per batch size, sized so the SMALLER variant
# already carries >~100 ms of device work at the round-4 measured step
# times (B=64: 0.55 ms -> 256 iters = 140 ms; B=1024: 5.9 ms -> 32 iters
# = 190 ms); the slope then differences out the dispatch constant.
INNER = {64: 256, 256: 96, 1024: 32}


def bench_fetch(run, args, repeats=5):
    """Best-of-N wall seconds of run(*args), fetch-forced (the hosted
    tunnel executes lazily until a value is materialized)."""
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0])          # force materialization
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(make_run, args, inner, repeats=5):
    """RTT-free per-iteration seconds via the two-point slope."""
    t1 = bench_fetch(make_run(inner), args, repeats)
    t2 = bench_fetch(make_run(2 * inner), args, repeats)
    return max((t2 - t1) / inner, 1e-12)


def matmul_peaks(quick=False):
    """Measured f32/bf16 matmul peak via a loop-carried product chain
    (operand-perturbation probes go bandwidth-bound; see bench_all)."""
    m = 2048 if quick else 4096
    inner = 32 if quick else 64
    flops = 2.0 * m * m * m
    peaks = {}
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = (jnp.ones((m, m), jnp.float32) * 1e-3).astype(dt)
        scale = jnp.asarray(1.0 / (m * 1e-3), jnp.float32)

        def make_run(n, a=a, scale=scale):
            @jax.jit
            def run(a):
                def body(i, carry):
                    p = jnp.dot(carry, a,
                                preferred_element_type=jnp.float32)
                    return (p * scale).astype(a.dtype)

                return jax.lax.fori_loop(0, n, body, a)

            return run

        peaks[tag] = flops / per_iter(make_run, (a,), inner)
    return peaks


def build(length=501, dtype=None):
    from ocm_tpu.models.trainer import (TrainConfig, make_train_step,
                                        torch_adam)
    from ocm_tpu.models.vae import ConvVAE1D, init_vae

    model = ConvVAE1D(input_length=length, latent_dim=16, conv_blocks=3,
                      n_filters=32, hidden_fc=256,
                      **({"dtype": dtype} if dtype is not None else {}))
    cfg = TrainConfig(epochs=1, batch_size=64, lr=1e-3, loss_type="bce")
    tx = torch_adam(cfg.lr)
    params, batch_stats = init_vae(model, jax.random.key(0))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    return model, cfg, tx, params, batch_stats, opt_state, step


def make_scan_steps(step):
    """inner sequential optimizer steps as ONE compiled program (the
    shape the trainer's epoch_scan actually runs)."""

    def make_run(inner):
        @jax.jit
        def run(params, batch_stats, opt_state, xb, rng):
            def body(carry, i):
                p, bs, o, r = carry
                r, rs = jax.random.split(r)
                xb_i = xb + (1e-6 * i)    # perturb so no step folds away
                p, bs, o, total = step(p, bs, o, xb_i, rs)
                return (p, bs, o, r), total

            carry, totals = jax.lax.scan(
                body, (params, batch_stats, opt_state, rng),
                jnp.arange(inner, dtype=jnp.float32))
            return totals[-1]

        return run

    return make_run


def compiled_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--length", type=int, default=501)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    peaks = matmul_peaks(args.quick)
    print(json.dumps({"peak_f32_tflops": peaks["f32"] / 1e12,
                      "peak_bf16_tflops": peaks["bf16"] / 1e12}),
          flush=True)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, args.length)
    batches = (64, 1024) if args.quick else (64, 256, 1024)

    def spectra(b):
        return jnp.asarray(
            (rng.normal(1, .08, (b, 1)) * np.sin(2 * np.pi * 3 * t)
             + rng.normal(0, .02, (b, args.length))).astype(np.float32))

    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        (model, cfg, tx, params, batch_stats, opt_state,
         step) = build(args.length, dtype)
        peak = peaks["bf16" if tag == "bf16" else "f32"]
        for b in batches:
            xb = spectra(b)
            key = jax.random.key(1)
            # FLOPs of ONE step from the compiled program itself
            fl_step = compiled_flops(step, params, batch_stats, opt_state,
                                     xb, key)
            dt = per_iter(make_scan_steps(step),
                          (params, batch_stats, opt_state, xb, key),
                          INNER[b])
            print(json.dumps({"dtype": tag, "batch": b,
                              "ms_per_step": dt * 1e3,
                              "flops_per_step": fl_step,
                              "achieved_tflops": fl_step / dt / 1e12,
                              "pct_of_peak": 100.0 * fl_step / dt / peak}),
                  flush=True)

    # ---- decomposition ladder (f32): where the step time goes ----------
    print("\n# decomposition (f32)", flush=True)
    (model, cfg, tx, params, batch_stats, opt_state,
     step) = build(args.length, None)
    from ocm_tpu.models.trainer import make_train_step
    from ocm_tpu.models.vae import ConvVAE1D, beta_vae_loss, init_vae

    for b in batches:
        xb = spectra(b)
        key = jax.random.key(1)
        inner = INNER[b]

        # (a) forward only (train-mode apply, reparam RNG included)
        def fwd(params, batch_stats, xb, r):
            out, _ = model.apply({"params": params,
                                  "batch_stats": batch_stats}, xb,
                                 train=True, rngs={"reparam": r},
                                 mutable=["batch_stats"])
            x_rec, mu, logvar = out
            return (jnp.sum(x_rec.astype(jnp.float32))
                    + jnp.sum(mu) + jnp.sum(logvar))

        def make_fwd(n):
            @jax.jit
            def run(params, batch_stats, xb, r):
                def body(i, acc):
                    return acc + fwd(params, batch_stats, xb + 1e-6 * i, r)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            return run

        t_fwd = per_iter(make_fwd, (params, batch_stats, xb, key), inner)
        fl_fwd = compiled_flops(fwd, params, batch_stats, xb, key)

        # (b) forward+backward (grads, no optimizer)
        def fwdbwd(params, batch_stats, xb, r):
            def loss_fn(p):
                out, _ = model.apply({"params": p,
                                      "batch_stats": batch_stats}, xb,
                                     train=True, rngs={"reparam": r},
                                     mutable=["batch_stats"])
                x_rec, mu, logvar = out
                total, _, _ = beta_vae_loss(
                    xb, x_rec.astype(jnp.float32), mu.astype(jnp.float32),
                    logvar.astype(jnp.float32), beta=1.0, loss_type="bce")
                return total

            g = jax.grad(loss_fn)(params)
            return sum(jnp.sum(x) for x in jax.tree.leaves(g))

        def make_fb(n):
            @jax.jit
            def run(params, batch_stats, xb, r):
                def body(i, acc):
                    return acc + fwdbwd(params, batch_stats,
                                        xb + 1e-6 * i, r)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            return run

        t_fb = per_iter(make_fb, (params, batch_stats, xb, key), inner)
        fl_fb = compiled_flops(fwdbwd, params, batch_stats, xb, key)

        # (c) Adam update alone (param-bytes bandwidth, zero MXU);
        #     microseconds-scale, so its own (larger) inner count
        grads = jax.tree.map(jnp.ones_like, params)

        def make_adam(n):
            @jax.jit
            def run(opt_state, params):
                def body(i, carry):
                    o, p = carry
                    u, o = tx.update(jax.tree.map(
                        lambda g: g * (1.0 + 1e-6 * i), grads), o, p)
                    return o, optax.apply_updates(p, u)

                o, p = jax.lax.fori_loop(0, n, body, (opt_state, params))
                return jax.tree.leaves(p)[0]

            return run

        t_adam = per_iter(make_adam, (opt_state, params), 2048)

        # (d) full step and the BN-free twin
        t_full = per_iter(make_scan_steps(step),
                          (params, batch_stats, opt_state, xb, key), inner)
        model_nb = ConvVAE1D(input_length=args.length, latent_dim=16,
                             conv_blocks=3, n_filters=32, hidden_fc=256,
                             use_batchnorm=False)
        p_nb, bs_nb = init_vae(model_nb, jax.random.key(0))
        step_nb = make_train_step(model_nb, tx, cfg)
        t_nb = per_iter(make_scan_steps(step_nb),
                        (p_nb, bs_nb, tx.init(p_nb), xb, key), inner)
        print(json.dumps({
            "batch": b,
            "fwd_ms": t_fwd * 1e3, "fwd_flops": fl_fwd,
            "fwdbwd_ms": t_fb * 1e3, "fwdbwd_flops": fl_fb,
            "adam_ms": t_adam * 1e3,
            "full_ms": t_full * 1e3,
            "full_no_bn_ms": t_nb * 1e3,
            "residual_ms": (t_full - t_fb - t_adam) * 1e3,
        }), flush=True)


if __name__ == "__main__":
    main()
