"""End-to-end production pipeline at hyperspectral-image scale:

  cube -> native C++ segmentation -> object-aware splits -> SNV+SavGol ->
  SIMCA fit -> resident streaming scorer over every pixel spectrum

with wall-clock timings per stage.  This is the deployment shape of the
reference's nuts workflow (nut_data.py -> utils/data_utils.py ->
simca_nuts.py) as one program.

Interpretation notes: most pixels are background, so the accept rate on
target cubes approximates the object-pixel fraction (background and
anomalies rejected); first-run wall clock is dominated by one-time costs
(g++ build of the native core, jit compiles — on the hosted-TPU tunnel
compiles take minutes) that all cache for subsequent runs.

    python examples/hsi_pipeline.py [--size 256 --n-cubes 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__))
                if "__file__" in globals() else os.getcwd())
import _bootstrap  # noqa: E402,F401  repo root on sys.path + TPU-outage CPU fallback

import numpy as np


def main(size=256, n_cubes=4, length=288, n_components=10,
         chunk_size=65536):
    import jax
    import jax.numpy as jnp

    import _synthetic
    from ocm_tpu.models.simca import fit_simca
    from ocm_tpu.ops.preprocess import snv_savgol
    from ocm_tpu.serving import SIMCAScorer
    from ocm_tpu.utils import native
    from ocm_tpu.utils.splits import object_aware_splits

    timings = {}

    # --- 1. cubes (target class = nut 0, anomaly cubes = nut 1) ----------
    t0 = time.perf_counter()
    cubes = [_synthetic.nut_cube(seed=i, nut_idx=0, height=size, width=size,
                                 length=length, n_objects=12)
             for i in range(n_cubes)]
    anomaly_cube = _synthetic.nut_cube(seed=99, nut_idx=2, height=size,
                                       width=size, length=length,
                                       n_objects=12)
    timings["generate"] = time.perf_counter() - t0
    n_px = n_cubes * size * size

    # --- 2. segmentation: native C++ vs scipy ----------------------------
    t0 = time.perf_counter()
    objects = []
    for cube in cubes:
        objects += native.extract_objects_native(cube, 0.5)
    timings["segment_native"] = time.perf_counter() - t0
    if native.available():
        from ocm_tpu.utils.io import extract_objects
        t0 = time.perf_counter()
        for cube in cubes:
            extract_objects(cube, 0.5)
        timings["segment_scipy"] = time.perf_counter() - t0

    anomaly_objects = native.extract_objects_native(anomaly_cube, 0.5)
    print(f"segmented {len(objects)} target + {len(anomaly_objects)} "
          f"anomaly objects from {n_px / 1e6:.1f} MPx "
          f"(native {timings['segment_native']:.2f}s"
          + (f", scipy {timings['segment_scipy']:.2f}s" if
             "segment_scipy" in timings else "") + ")")

    # --- 3. object-aware splits ------------------------------------------
    t0 = time.perf_counter()
    data = {"target": [o["spectral_data"] for o in objects],
            "other": [o["spectral_data"] for o in anomaly_objects]}
    res = object_aware_splits(data, ["target", "other"], "target", length,
                              verbose=False)
    timings["splits"] = time.perf_counter() - t0
    print(f"splits: cal={res.x_cal.shape} test={res.x_test.shape} "
          f"({timings['splits']:.2f}s incl. on-device outlier removal)")

    # --- 4. preprocessing + SIMCA fit ------------------------------------
    t0 = time.perf_counter()
    x_cal = snv_savgol(jnp.asarray(res.x_cal), 5, 2, 1)
    model = fit_simca(x_cal, n_components)
    jax.block_until_ready(model.mean)
    timings["fit"] = time.perf_counter() - t0
    print(f"SIMCA fit on {x_cal.shape[0]} spectra: {timings['fit']:.2f}s")

    # --- 5. resident scorer streams every pixel of every cube ------------
    prep = lambda a: snv_savgol(jnp.asarray(a, jnp.float32), 5, 2, 1)
    scorer = SIMCAScorer(model, chunk_size=chunk_size)

    def frames():
        for cube in cubes + [anomaly_cube]:
            yield np.asarray(prep(cube.reshape(-1, length)))

    # warmup compile on one chunk shape
    scorer.score(np.asarray(prep(cubes[0].reshape(-1, length)))[:chunk_size])
    t0 = time.perf_counter()
    accepts = [r["accept"] for r in scorer.score_stream(frames())]
    timings["score"] = time.perf_counter() - t0
    total_scored = sum(a.shape[0] for a in accepts)
    rate = total_scored / timings["score"]
    print(f"scored {total_scored / 1e6:.2f}M pixel spectra in "
          f"{timings['score']:.2f}s -> {rate / 1e6:.2f} M spectra/s")
    tgt_rate = float(np.mean(np.concatenate(accepts[:-1])))
    anom_rate = float(np.mean(accepts[-1]))
    print(f"pixel accept rate: target cubes {tgt_rate:.3f}, anomaly cube "
          f"{anom_rate:.3f}")

    # --- 6. quantized-storage twin: int8 residuals, quarter the bytes ----
    scorer8 = SIMCAScorer(model, chunk_size=chunk_size,
                          store_dtype=jnp.int8)
    scorer8.score(np.asarray(prep(cubes[0].reshape(-1, length)))
                  [:chunk_size])
    t0 = time.perf_counter()
    accepts8 = [r["accept"] for r in scorer8.score_stream(frames())]
    timings["score_int8"] = time.perf_counter() - t0
    agree = float(np.mean(np.concatenate(accepts8)
                          == np.concatenate(accepts)))
    print(f"int8 twin: {total_scored / timings['score_int8'] / 1e6:.2f} M "
          f"spectra/s, decision agreement {agree:.4f}")
    print("timings:", {k: round(v, 2) for k, v in timings.items()})
    return timings


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n-cubes", type=int, default=4)
    p.add_argument("--length", type=int, default=288)
    p.add_argument("--n-components", type=int, default=10)
    p.add_argument("--chunk-size", type=int, default=65536)
    main(**vars(p.parse_args()))
