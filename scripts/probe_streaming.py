"""Device-time probe of the streaming SIMCA path on the hosted TPU.

Measures, at production shapes:
  1. ingest throughput — spectra/s folded into the O(L^2) sufficient
     statistic (moments_update; one (L, B) @ (B, L) GEMM per batch)
  2. refresh latency — fit_simca_moments from the statistic alone,
     eigh (dense (L, L) decomposition) vs rsvd (GEMM-only)
  3. the full production round — screen one batch + masked ingest of
     accepts + refresh, as ONE jitted program
     (examples/streaming_refresh.py's screen_and_refresh)

Measurement discipline (docs/BENCHMARKS.md): a data-dependent
perturbation inside a compiled fori_loop defeats constant folding and
loop hoisting; warmups fetch a value (hosted dispatch is lazy); inner
iteration counts sit well above the ~31 ms tunnel RTT.

Usage: python scripts/probe_streaming.py [--small] [--inner N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes on CPU (script self-check)")
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), flush=True)

    from ocm_tpu.models.simca import simca_decide
    from ocm_tpu.models.streaming import (fit_simca_moments, moments_init,
                                          moments_update)
    from ocm_tpu.utils.profiling import timeit

    shapes = ([(64, 128, 3)] if args.small
              else [(500, 4096, 10), (2000, 4096, 10)])
    inner = args.inner

    for length, batch_n, k in shapes:
        rng = np.random.default_rng(0)
        t = np.linspace(0, 1, length)
        base = np.sin(2 * np.pi * 3 * t)
        xb = (rng.normal(1.0, 0.1, (batch_n, 1)) * base[None, :]
              + rng.normal(0, 0.02, (batch_n, length))).astype(np.float32)
        xb_d = jnp.asarray(xb)
        mom0 = moments_update(moments_init(length, jnp.float32), xb_d)

        # ---- 1. ingest: fold `inner` perturbed batches into the stat ----
        @jax.jit
        def ingest_loop(mom, x0):
            def body(i, carry):
                mom_c, x_c = carry
                row = x_c[:1] + (1e-3 * i).astype(x_c.dtype)
                x_c = jax.lax.dynamic_update_slice(
                    x_c, row, (i % x_c.shape[0], 0))
                return moments_update(mom_c, x_c), x_c
            mom_f, _ = jax.lax.fori_loop(0, inner, body, (mom, x0))
            return mom_f.scatter[0, 0] + mom_f.n

        dt = timeit(ingest_loop, mom0, xb_d,
                    repeats=args.repeats)["best"] / inner
        print(f"L={length}: ingest {batch_n / dt / 1e6:8.2f} M spectra/s "
              f"({dt * 1e3:.3f} ms / {batch_n}-batch)", flush=True)

        # ---- 2. refresh: moments -> model ------------------------------
        for solver in ("eigh", "rsvd"):
            @jax.jit
            def refresh_loop(mom):
                def body(i, acc):
                    m = mom._replace(
                        scatter=mom.scatter + (1e-6 * i) * jnp.eye(
                            length, dtype=mom.scatter.dtype))
                    model = fit_simca_moments(m, k, solver=solver)
                    # consume EVERY expensive output: invcovT (the second
                    # eigh + two GEMMs) and t2_res would otherwise be
                    # DCE'd, and the default 'alt' d_limit is a constant
                    # (the round-1 folding trap — docs/BENCHMARKS.md)
                    return (acc + model.q_res.limit + model.t2_res.limit
                            + jnp.sum(model.invcovT)
                            + jnp.sum(model.components[:, 0]))
                return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

            dt = timeit(refresh_loop, mom0,
                        repeats=args.repeats)["best"] / inner
            print(f"L={length}: refresh[{solver}] {dt * 1e3:8.3f} ms",
                  flush=True)

        # ---- 3. full round: screen + masked ingest + refresh ------------
        @jax.jit
        def round_loop(mom, x0):
            model0 = fit_simca_moments(mom, k, solver="rsvd")

            def body(i, carry):
                mom_c, model, x_c = carry
                row = x_c[:1] + (1e-3 * i).astype(x_c.dtype)
                x_c = jax.lax.dynamic_update_slice(
                    x_c, row, (i % x_c.shape[0], 0))
                accept, *_ = simca_decide(model, x_c, "alt")
                mom_c = moments_update(mom_c, x_c,
                                       w=accept.astype(x_c.dtype))
                return mom_c, fit_simca_moments(mom_c, k,
                                                solver="rsvd"), x_c
            mom_f, model_f, _ = jax.lax.fori_loop(
                0, inner, body, (mom, model0, x0))
            return model_f.q_res.limit + mom_f.n

        dt = timeit(round_loop, mom0, xb_d,
                    repeats=args.repeats)["best"] / inner
        print(f"L={length}: screen+ingest+refresh round "
              f"{dt * 1e3:8.3f} ms ({batch_n / dt / 1e6:.2f} M spectra/s "
              f"sustained)", flush=True)


if __name__ == "__main__":
    main()
