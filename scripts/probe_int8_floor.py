"""Where does the int8 serving pass's 0.32 ms go?

The 2026-08-18 ladder (scripts/probe_serving_dtypes.py) shows the int8
path at ~154 GB/s effective vs ~347 GB/s on the f32+sumsq path — it has
left the bandwidth regime.  This probe decomposes the pass on the
headline shapes (N=98304 x L=500 int8, M=33 operand columns, C=3, k=10):

  read      — pure int8 HBM read (row-sum reduce to int32)
  gemm_s8   — s8 x s8 -> s32 dot_general only
  gemm_bf16 — convert-to-bf16 GEMM (fused convert; NOT exact)
  gemm_f32  — convert-to-f32 GEMM (exact here: |dot| < 2^24)
  full      — t2_q_scores_multiclass_int8 (GEMM + dequant/score tail)
  tail      — full minus gemm_s8 (implied)

Usage: python scripts/probe_int8_floor.py [--small] [--inner N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--inner", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), flush=True)

    from bench import make_data
    from ocm_tpu.models.simca import fit_classes
    from ocm_tpu.ops.linalg import (quantize_rows_int8,
                                    t2_q_scores_multiclass_int8)
    from ocm_tpu.utils.profiling import timeit

    n_cal, length, n_score = ((60, 40, 512) if args.small
                              else (700, 500, 98304))
    k = 4 if args.small else 10
    cals, xs_np = make_data(n_cal=n_cal, length=length, n_score=n_score)
    x = np.concatenate(cals).astype(np.float32)
    y = np.repeat(np.arange(3), n_cal)
    models = fit_classes(jnp.asarray(x), y, [0, 1, 2], k)
    mu0 = np.asarray(jnp.mean(models.mean, axis=0), np.float32)
    xc = xs_np.astype(np.float32) - mu0[None, :]
    xq_np, sc_np, ss_np = quantize_rows_int8(xc)
    xq = jnp.asarray(xq_np)
    sc = jnp.asarray(sc_np)
    ss = jnp.asarray(ss_np)
    mu0_d = jnp.asarray(mu0)

    n_classes = 3
    w = jnp.concatenate([
        models.components.reshape(n_classes * k, length),
        models.mean - mu0_d[None, :]], axis=0)
    w_hi, s_hi, _ = quantize_rows_int8(w)
    w_lo, s_lo, _ = quantize_rows_int8(w - w_hi.astype(jnp.float32)
                                       * s_hi[:, None])
    wq = jnp.concatenate([w_hi, w_lo], axis=0)          # (2M, L)
    wqT = wq.T                                          # (L, 2M)
    w_bf = wqT.astype(jnp.bfloat16)
    w_f32 = wqT.astype(jnp.float32)
    inner = args.inner
    gb = xq.size / 1e9

    pert_row = xq[:1]

    def timed(name, body, extra_bytes=0.0):
        # the buffer is the loop CARRY (probe_serving_dtypes idiom): the
        # row rewrite donates in place, so each iteration pays one row
        # write + the measured read — NOT a full-buffer copy (an
        # .at[].set on a loop-INVARIANT operand copies the whole tensor
        # every iteration and poisons the bandwidth number)
        @jax.jit
        def fn(xq_in):
            def it(i, carry):
                acc, xb = carry
                row = jnp.bitwise_xor(pert_row, (i % 3).astype(jnp.int8))
                xb = jax.lax.dynamic_update_slice(
                    xb, row, (i % xb.shape[0], 0))
                return acc + body(xb), xb
            return jax.lax.fori_loop(0, inner, it,
                                     (jnp.int32(0), xq_in))[0]

        st = timeit(fn, xq, warmup=2, repeats=args.repeats)
        ms = st["best"] / inner * 1e3
        eff = (gb + extra_bytes) / (st["best"] / inner)
        print(f"{name:12s} {ms:8.3f} ms   {eff:7.1f} GB/s effective",
              flush=True)
        return ms

    timed("read", lambda xi: jnp.sum(xi.astype(jnp.int32)) % 1000)
    timed("gemm_s8", lambda xi: jnp.sum(jax.lax.dot_general(
        xi, wqT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)) % 1000)
    timed("gemm_bf16", lambda xi: (jnp.sum(jax.lax.dot_general(
        xi.astype(jnp.bfloat16), w_bf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)) % 1000).astype(jnp.int32))
    timed("gemm_f32", lambda xi: (jnp.sum(jax.lax.dot_general(
        xi.astype(jnp.float32), w_f32, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)) % 1000).astype(jnp.int32))

    def full(xi):
        t2, q, t = t2_q_scores_multiclass_int8(
            xi, sc, ss, models.mean, models.components,
            models.invcovT, x_offset=mu0_d)
        return (jnp.sum(t2) % 1000 + jnp.sum(q) % 1000
                + jnp.sum(t) % 1000).astype(jnp.int32)

    timed("full", full)


if __name__ == "__main__":
    main()
