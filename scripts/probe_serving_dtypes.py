"""Device-time ladder for the fused multi-class scoring path:
f32 / f32+sumsq / bf16 / bf16+sumsq / int8 on the headline shapes
(3 classes x 98,304 spectra x L=500, k=10).

Measurement discipline (docs/BENCHMARKS.md): the workload repeats inside
one compiled fori_loop; the spectra buffer is LOOP-CARRIED with one row
rewritten per iteration so the GEMM cannot be hoisted out of the loop
(an additive full-tensor perturbation would add a full HBM write per
iteration — on a bandwidth-bound path that is itself ~a third of the
work being measured); warmups force a value fetch (hosted-TPU dispatch
is lazy until one).

Usage: python scripts/probe_serving_dtypes.py [--small] [--inner N]
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
    ap.add_argument("--inner", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), flush=True)

    from bench import make_data                 # the headline workload
    from ocm_tpu.models.simca import (fit_classes, predict_classes,
                                      predict_classes_int8)
    from ocm_tpu.ops.linalg import quantize_rows_int8
    from ocm_tpu.utils.profiling import timeit

    n_cal, length, n_score = ((60, 40, 512) if args.small
                              else (700, 500, 98304))
    k = 4 if args.small else 10
    cals, xs_np = make_data(n_cal=n_cal, length=length, n_score=n_score)
    x = np.concatenate(cals).astype(np.float32)
    y = np.repeat(np.arange(3), n_cal)
    models = fit_classes(jnp.asarray(x), y, [0, 1, 2], k)
    xs_np = xs_np.astype(np.float32)

    mu0 = np.asarray(jnp.mean(models.mean, axis=0), np.float32)
    xc_np = xs_np - mu0[None, :]
    mu0_d = jnp.asarray(mu0)
    inner, n_work = args.inner, 3 * n_score

    def timed(run_jit):
        # utils.profiling.timeit owns the measurement discipline
        # (fetch-forcing warmup for the lazy hosted-TPU dispatch,
        # block_until_ready, best-of-N)
        return timeit(run_jit, repeats=args.repeats)["best"] / inner

    def float_body(x0, x_offset, with_sumsq):
        x2 = jnp.sum(x0.astype(jnp.float32) ** 2, axis=-1)
        pert_row = x0[:1]

        def run():
            def body(i, carry):
                acc, xb = carry
                row = (pert_row + (1e-3 * i).astype(x0.dtype)
                       ).astype(x0.dtype)
                xb = jax.lax.dynamic_update_slice(xb, row,
                                                  (i % xb.shape[0], 0))
                _, dred, _, _ = predict_classes(
                    models, xb, x_offset=x_offset,
                    x_sumsq=(x2 if with_sumsq else None))
                return acc + jnp.sum(dred), xb

            return jax.lax.fori_loop(0, inner, body,
                                     (jnp.float32(0.0), x0))

        return jax.jit(run)

    results = {}
    x_f32 = jnp.asarray(xc_np)
    results["f32"] = timed(float_body(x_f32, mu0_d, False))
    results["f32+sumsq"] = timed(float_body(x_f32, mu0_d, True))
    x_bf16 = jnp.asarray(xc_np).astype(jnp.bfloat16)
    results["bf16"] = timed(float_body(x_bf16, mu0_d, False))
    results["bf16+sumsq"] = timed(float_body(x_bf16, mu0_d, True))

    xq_np, xs_sc, xs_ss = quantize_rows_int8(xc_np)
    xq = jnp.asarray(xq_np)
    xsc, xss = jnp.asarray(xs_sc), jnp.asarray(xs_ss)
    pert_row8 = xq[:1]

    def run_int8():
        def body(i, carry):
            acc, xb = carry
            row = jnp.bitwise_xor(pert_row8, (i % 3).astype(jnp.int8))
            xb = jax.lax.dynamic_update_slice(xb, row,
                                              (i % xb.shape[0], 0))
            _, dred, _, _ = predict_classes_int8(models, xb, xsc, xss,
                                                 x_offset=mu0_d)
            return acc + jnp.sum(dred), xb

        return jax.lax.fori_loop(0, inner, body, (jnp.float32(0.0), xq))

    results["int8"] = timed(jax.jit(run_int8))

    # decision agreement on the UNPERTURBED workload
    a32 = predict_classes(models, x_f32, x_offset=mu0_d)[0]
    a16 = predict_classes(models, x_bf16, x_offset=mu0_d)[0]
    a8 = predict_classes_int8(models, xq, xsc, xss, x_offset=mu0_d)[0]
    agree16 = float(jnp.mean(a16 == a32))
    agree8 = float(jnp.mean(a8 == a32))

    print(f"{'path':<12} {'ms/pass':>9} {'M class-scores/s':>18}")
    for name, tt in results.items():
        print(f"{name:<12} {tt * 1e3:9.3f} {n_work / tt / 1e6:18.1f}")
    print(f"agreement vs f32: bf16 {agree16:.4f}  int8 {agree8:.4f}")


if __name__ == "__main__":
    main()
