"""Decompose the headline bench iteration (bench.py workload) on device.

Measures, each as its own jitted fori_loop with index-perturbed inputs and
consumed outputs (the CLAUDE.md measurement rules):
  - full      : fit 3 classes (rsvd) + fused multiclass score   (= bench.py)
  - fit_only  : the 3-class rsvd fit, consuming every model field
  - score_only: fused multiclass scoring with fixed models
  - cov_only  : just the 3 covariance GEMMs
  - subspace  : covariance + pca_topk_cov (no limits/scores epilogue)

Run on the TPU:  nohup python scripts/probe_headline_decomp.py > /tmp/probe_hd.log 2>&1 &
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_data
from ocm_tpu.models.simca import fit_simca, predict_classes
from ocm_tpu.ops.linalg import pca_topk_cov

K = 10
INNER = 64


def timeit(fn, repeats=5):
    out = fn()
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])  # force materialization (lazy dispatch)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return min(times) / INNER


def consume(tree):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree))


def main():
    cals, xs = make_data()
    stacked = jnp.asarray(np.stack(cals), jnp.float32)
    xs_d = jnp.asarray(xs, jnp.float32)
    fit_fn = jax.vmap(lambda xc: fit_simca(xc, K, solver="rsvd"))
    models0 = jax.jit(fit_fn)(stacked)
    models0 = jax.block_until_ready(models0)

    @jax.jit
    def full():
        def body(i, acc):
            models = fit_fn(stacked + 1e-6 * i)
            _, dred, _, _ = predict_classes(models, xs_d)
            return acc + jnp.sum(dred)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    @jax.jit
    def fit_only():
        def body(i, acc):
            models = fit_fn(stacked + 1e-6 * i)
            return acc + consume(models)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    @jax.jit
    def score_only():
        def body(i, acc):
            _, dred, _, _ = predict_classes(models0, xs_d + 1e-6 * i)
            return acc + jnp.sum(dred)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    def cov3(x3):
        def one(xc):
            m = jnp.mean(xc, axis=0)
            z = xc - m[None, :]
            with jax.default_matmul_precision("highest"):
                return (z.T @ z) / (xc.shape[0] - 1.0)
        return jax.vmap(one)(x3)

    @jax.jit
    def cov_only():
        def body(i, acc):
            c = cov3(stacked + 1e-6 * i)
            return acc + jnp.sum(c)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    @jax.jit
    def subspace():
        def body(i, acc):
            c = cov3(stacked + 1e-6 * i)
            w, v = jax.vmap(lambda ci: pca_topk_cov(ci, K + 10))(c)
            return acc + jnp.sum(w) + jnp.sum(v)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    for name, fn in [("full", full), ("fit_only", fit_only),
                     ("score_only", score_only), ("cov_only", cov_only),
                     ("subspace", subspace)]:
        t = timeit(fn)
        print(f"{name:12s} {t * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
