"""Mesh-sharded SIMCA at hyperspectral-image scale: the sample axis shards
across every available chip; the class covariance reduces with psum; scoring
runs with zero collectives.

On a single-chip or CPU host, force a virtual mesh first:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed_scoring.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback
import jax
import numpy as np


def main(n_spectra=200_000, length=288, n_components=10):
    import jax.numpy as jnp

    from ocm_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from ocm_tpu.parallel.simca_dist import fit_simca_sharded, predict_sharded

    n_dev = jax.device_count()
    mesh = make_mesh((n_dev,), ("data",))
    print(f"mesh: {n_dev} x {jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, length)
    base = np.sin(2 * np.pi * 3 * t)
    x_cal = (rng.normal(1, 0.08, (4096, 1)) * base
             + rng.normal(0, 0.02, (4096, length))).astype(np.float32)
    x_cal, n_true = pad_to_multiple(x_cal, n_dev)
    w = (np.arange(x_cal.shape[0]) < n_true).astype(np.float32)

    model = fit_simca_sharded(x_cal, w, n_components, mesh,
                              solver="rsvd")
    print(f"fitted (rsvd): T2lim={float(model.t2_res.limit):.3f} "
          f"Qlim={float(model.q_res.limit):.5f}")

    x_big = (rng.normal(1, 0.3, (n_spectra, 1)) * base
             + rng.normal(0, 0.05, (n_spectra, length))).astype(np.float32)
    x_big, _ = pad_to_multiple(x_big, n_dev)

    accept, _, _, _ = predict_sharded(model, x_big, mesh)
    jax.block_until_ready(accept)
    t0 = time.perf_counter()
    accept, _, _, _ = predict_sharded(model, x_big, mesh)
    jax.block_until_ready(accept)
    dt = time.perf_counter() - t0
    print(f"scored {x_big.shape[0]:,} spectra in {dt * 1e3:.1f} ms "
          f"({x_big.shape[0] / dt / 1e6:.2f} M spectra/s), "
          f"accept rate {float(jnp.mean(accept)):.3f}")

    # serving fast path: host-centered bf16 residual streaming
    # (ocm_tpu/serving.py; decisions match f32 — docs/BENCHMARKS.md)
    from ocm_tpu.serving import SIMCAScorer

    scorer = SIMCAScorer(model, chunk_size=x_big.shape[0] // n_dev,
                         store_dtype=jnp.bfloat16)
    out = scorer.score(x_big)          # warm + check
    agree = float(np.mean(out["accept"] == np.asarray(accept)))
    t0 = time.perf_counter()
    out = scorer.score(x_big)
    dt16 = time.perf_counter() - t0
    print(f"bf16 serving scorer: {x_big.shape[0] / dt16 / 1e6:.2f} M "
          f"spectra/s end-to-end (host center+ship included), "
          f"decision agreement vs f32 {agree:.4f}")

    # multi-class screen: C classes from ONE bf16 HBM pass per chunk
    # (stacked-model SIMCAScorer -> predict_classes fused path)
    from ocm_tpu.models.simca import fit_classes

    n_classes = 3
    x_mc = np.concatenate([
        (rng.normal(1 + 0.25 * c, 0.08, (1024, 1)) * base
         + rng.normal(0, 0.02, (1024, length))).astype(np.float32)
        for c in range(n_classes)])
    y_mc = np.repeat(np.arange(n_classes), 1024)
    stacked = fit_classes(x_mc, y_mc, list(range(n_classes)), n_components,
                          solver="rsvd")
    for tag, dt_store in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        mscorer = SIMCAScorer(stacked, chunk_size=x_big.shape[0],
                              store_dtype=dt_store)
        mout = mscorer.score(x_big)        # warm
        t0 = time.perf_counter()
        mout = mscorer.score(x_big)
        dtm = time.perf_counter() - t0
        cs = x_big.shape[0] * n_classes / dtm
        print(f"fused {n_classes}-class {tag} scorer: {cs / 1e6:.1f} M "
              f"class-scores/s (accept shape {mout['accept'].shape})")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-spectra", type=int, default=200_000)
    p.add_argument("--length", type=int, default=288)
    p.add_argument("--n-components", type=int, default=10)
    main(**vars(p.parse_args()))
