"""Device timing of the strict-parity dense CV sweep at SWIR scale
(L = 2000, N = 1200, 5 folds x 14 LVs): Gram-side (auto) vs forced
covariance-side decomposition.

The dense eigh lowers to QDWH chains cubic in the matrix side, so the
(N, N) Gram side should cut the decomposition cost ~(L/N)^3 ~ 4.6x at
these shapes (docs/BENCHMARKS.md, "the decomposition cliff").

Usage: python scripts/probe_dense_gram.py [--small]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_sweep(cv_mod, x, y, lvs, side):
    out = cv_mod.cv_simca_sweep(x, y, 0, lv_values=lvs, n_splits=5,
                                side=side)
    return float(np.sum(out["eff"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), flush=True)

    import ocm_tpu.models.cv as cv_mod

    n, L = (120, 200) if args.small else (1200, 2000)
    lvs = range(1, 5) if args.small else range(1, 15)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, L)
    x = np.concatenate([
        (rng.normal(1, .08, (n * 2 // 3, 1)) * np.sin(2 * np.pi * 3 * t)
         + rng.normal(0, .02, (n * 2 // 3, L))),
        (rng.normal(1, .08, (n // 3, 1)) * np.sin(2 * np.pi * 4 * t) + 0.3
         + rng.normal(0, .02, (n // 3, L))),
    ]).astype(np.float32)
    y = np.repeat([0, 1], [n * 2 // 3, n - n * 2 // 3])

    results = {}
    for tag, side in (("gram (auto)", "auto"), ("cov (forced)", "cov")):
        val = run_sweep(cv_mod, x, y, lvs, side)    # compile + fetch
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            v = run_sweep(cv_mod, x, y, lvs, side)
            times.append(time.perf_counter() - t0)
        results[tag] = (min(times), v)
        print(f"{tag:14s}: {min(times)*1e3:8.1f} ms/sweep "
              f"(sum eff {v:.6f})", flush=True)
    g, c = results["gram (auto)"], results["cov (forced)"]
    print(f"speedup {c[0]/g[0]:.2f}x; aggregate agreement "
          f"{abs(g[1]-c[1])/max(abs(c[1]), 1e-9):.2e} rel")


if __name__ == "__main__":
    main()
