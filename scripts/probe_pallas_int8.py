"""Can Pallas stream int8 from HBM faster than XLA's ~158 GB/s?

probe_int8_floor.py (v5e, 2026-08-18) shows the int8 serving path is
floored by the int8 HBM read itself under XLA (read 0.312 ms = 158 GB/s
for 49 MB; the s8 GEMM and the f32 tail are nearly free on top), while
the f32 path streams at ~350 GB/s byte rate.  If a Pallas kernel's
HBM->VMEM DMA moves int8 at full byte rate and feeds the MXU's native
s8 tier, the fused int8 scoring op has ~2-3x headroom.

Kernels measured (headline shapes, N=98304 x Lp=512 int8):
  read  — per-tile sum-reduce (DMA + one VPU reduce)
  gemm  — per-tile (TILE, 512) s8 x (512, 128) s8 -> s32 MXU dot,
          reduced in-kernel (no big writes)

Usage: python scripts/probe_pallas_int8.py [--small] [--tile N]
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    interpret = args.small
    print("backend:", jax.default_backend(), flush=True)

    from ocm_tpu.utils.profiling import timeit

    if args.small:
        n, lp = 1024, 128
        tiles = [256]
    else:
        n, lp = 98304, 512
        tiles = [512, 1024, 2048]
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (n, lp), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (lp, 128), dtype=np.int8))
    pert = xq[:1]
    inner = args.inner
    gb = xq.size / 1e9

    def read_kernel(x_ref, o_ref):
        s = jnp.sum(x_ref[:].astype(jnp.int32))
        o_ref[:] = jnp.full((8, 128), s, jnp.int32)

    def gemm_kernel(x_ref, w_ref, o_ref):
        g = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:] = jnp.sum(g, axis=0, keepdims=True) + jnp.zeros(
            (8, 128), jnp.int32)

    def make_read(tile):
        grid = (n // tile,)
        call = pl.pallas_call(
            read_kernel, grid=grid,
            in_specs=[pl.BlockSpec((tile, lp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0] * 8, 128), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=n * lp, bytes_accessed=n * lp, transcendentals=0),
            interpret=interpret)
        return lambda xb: jnp.sum(call(xb))

    def make_gemm(tile):
        grid = (n // tile,)
        call = pl.pallas_call(
            gemm_kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((tile, lp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lp, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0] * 8, 128), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * lp * 128, bytes_accessed=n * lp,
                transcendentals=0),
            interpret=interpret)
        return lambda xb: jnp.sum(call(xb, wq))

    def timed(name, body):
        @jax.jit
        def fn(x0):
            def it(i, carry):
                acc, xb = carry
                row = jnp.bitwise_xor(pert, (i % 3).astype(jnp.int8))
                xb = jax.lax.dynamic_update_slice(
                    xb, row, (i % xb.shape[0], 0))
                return acc + body(xb), xb
            return jax.lax.fori_loop(0, inner, it, (jnp.int32(0), x0))[0]

        st = timeit(fn, xq, warmup=2, repeats=args.repeats)
        ms = st["best"] / inner * 1e3
        print(f"{name:16s} {ms:8.3f} ms   {gb/(st['best']/inner):7.1f} "
              "GB/s effective", flush=True)

    # XLA baselines at identical shapes
    timed("xla read", lambda xb: jnp.sum(xb.astype(jnp.int32)) % 997)
    timed("xla gemm", lambda xb: jnp.sum(jax.lax.dot_general(
        xb, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)) % 997)
    for tile in tiles:
        timed(f"pl read t={tile}", make_read(tile))
    for tile in tiles:
        timed(f"pl gemm t={tile}", make_gemm(tile))


if __name__ == "__main__":
    main()
