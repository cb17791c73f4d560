"""End-to-end MULTI-CLASS production pipeline at hyperspectral-cube scale:

  uint16 camera cubes -> native C++ segmentation -> HDF5 object store ->
  object-level splits -> one stacked multi-class SIMCA fit -> every pixel
  of every cube screened against ALL classes through four serving modes

with wall-clock timings, shipped-byte accounting, and an H2D-vs-compute
pipeline split.  This is the deployment shape of the reference's nuts
workflow (nut_data.py:131-197 ingest, utils/SIMCA.py scoring loop,
simca_nuts.py driver) as one program, scaled to the 10^4-10^6 pixel
spectra per image the reference's SWIR cubes actually carry (SURVEY
section 5.7).

Serving modes compared at full scale (same decisions, different bytes):
  raw-u16  camera counts ship at 2 B/element; SNV+SavGol + centering +
           fused multi-class scoring run as ONE compiled program per
           chunk (SIMCAScorer(preprocess_fn=...)) — zero host prep
  f32      host SNV+SavGol, centered residual ships at 4 B/element
  bf16     host prep, residual ships at 2 B/element
  int8     host prep, per-row-quantized residual ships at 1 B/element

Run (synthetic cubes; CPU or TPU):
    python examples/hsi_pipeline.py [--size 96 --n-cubes 2]
    python examples/hsi_pipeline.py --cube-scale     # >=10^6 px, TPU demo
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

COUNTS_SCALE = 1e4  # reflectance -> camera counts (SNV makes scoring scale-free)


def main(size=96, n_cubes=2, n_classes=3, length=288, n_components=10,
         chunk_size=65536, cal_max=20000, split_probe=True, seed=0):
    import jax
    import jax.numpy as jnp

    from ocm_tpu.models.simca import fit_classes
    from ocm_tpu.ops.preprocess import snv_savgol
    from ocm_tpu.serving import SIMCAScorer
    from ocm_tpu.utils import native
    from ocm_tpu.utils.io import read_object_store, write_object_store
    from ocm_tpu.utils.synthetic import nut_cube

    prep = lambda a: snv_savgol(a, 5, 2, 1)  # noqa: E731
    cpu = jax.devices("cpu")[0]

    def host_prep(a):
        """The non-raw modes' host stage: SNV+SavGol pinned to the host
        CPU device (the raw-u16 mode does this INSIDE the device program
        instead)."""
        with jax.default_device(cpu):
            return np.asarray(prep(jnp.asarray(a, jnp.float32)))

    timings, rng = {}, np.random.default_rng(seed)
    radius = (max(3, size // 16), max(6, size // 7))
    labels = list(range(n_classes))

    # --- 1. uint16 camera cubes (n_cubes per class + 1 unknown class) -----
    t0 = time.perf_counter()

    def counts_cube(seed_, nut_idx):
        cube = nut_cube(seed=seed_, nut_idx=nut_idx, height=size, width=size,
                        length=length, n_objects=12, radius_range=radius)
        return np.clip(np.round(cube * COUNTS_SCALE), 0,
                       65535).astype(np.uint16)

    cubes = [(c, counts_cube(97 * c + i, c))
             for c in labels for i in range(n_cubes)]
    cubes.append((n_classes, counts_cube(9999, n_classes)))  # unknown class
    timings["generate"] = time.perf_counter() - t0
    n_px = sum(c.shape[0] * c.shape[1] for _, c in cubes)
    print(f"{len(cubes)} cubes ({size}x{size}x{length}, uint16) = "
          f"{n_px / 1e6:.2f} M pixel spectra "
          f"({timings['generate']:.1f}s to generate)")

    # --- 2. native C++ segmentation -> HDF5 object store ------------------
    t0 = time.perf_counter()
    store = {}                      # class -> list of images' object lists
    for cls, cube in cubes[:-1]:
        objs = native.extract_objects_native(cube, 0.5 * COUNTS_SCALE,
                                             min_pixels=8)
        store.setdefault(str(cls), []).append(objs)
    timings["segment"] = time.perf_counter() - t0
    n_obj = sum(len(o) for imgs in store.values() for o in imgs)
    obj_px = sum(o["n_pixels"] for imgs in store.values()
                 for img in imgs for o in img)
    print(f"segmented {n_obj} objects / {obj_px / 1e3:.0f}k object pixels "
          f"({timings['segment']:.1f}s native C++)")

    t0 = time.perf_counter()
    store_path = os.path.join("out", "hsi_store.h5")
    os.makedirs("out", exist_ok=True)
    write_object_store(store_path, store)
    data = read_object_store(store_path)
    timings["store"] = time.perf_counter() - t0
    print(f"object store round trip {store_path} "
          f"({os.path.getsize(store_path) / 1e6:.0f} MB, "
          f"{timings['store']:.1f}s)")

    # --- 3. object-level split + stacked multi-class fit ------------------
    t0 = time.perf_counter()
    xs, ys = [], []
    for cls in labels:
        objs = data[str(cls)]
        n_cal = max(1, int(0.7 * len(objs)))        # object-level split:
        order = rng.permutation(len(objs))[:n_cal]  # no pixel leakage
        px = np.concatenate([objs[i]["spectral_data"] for i in order])
        if px.shape[0] > cal_max:
            px = px[rng.choice(px.shape[0], cal_max, replace=False)]
        xs.append(px)
        ys.append(np.full(px.shape[0], cls))
    x_cal = np.asarray(prep(jnp.asarray(np.concatenate(xs), jnp.float32)))
    models = fit_classes(x_cal, np.concatenate(ys), labels, n_components)
    jax.block_until_ready(models.mean)
    timings["fit"] = time.perf_counter() - t0
    print(f"stacked {n_classes}-class SIMCA fit on {x_cal.shape[0]} "
          f"calibration spectra: {timings['fit']:.1f}s")

    # --- 4. screen EVERY pixel of EVERY cube, four serving modes ----------
    bytes_per_px = {"raw-u16": 2 * length, "f32": 4 * length + 4,
                    "bf16": 2 * length + 4, "int8": length + 8}
    scorers = {
        "raw-u16": SIMCAScorer(models, chunk_size=chunk_size,
                               preprocess_fn=prep),
        "f32": SIMCAScorer(models, chunk_size=chunk_size),
        "bf16": SIMCAScorer(models, chunk_size=chunk_size,
                            store_dtype=jnp.bfloat16),
        "int8": SIMCAScorer(models, chunk_size=chunk_size,
                            store_dtype=jnp.int8),
    }

    # host-preprocessed copies for the non-raw modes (prep timed once —
    # it is identical work for all three)
    t0 = time.perf_counter()
    prepped = [host_prep(cube.reshape(-1, length)) for _, cube in cubes]
    timings["host_prep"] = time.perf_counter() - t0
    raw_frames = [cube.reshape(-1, length) for _, cube in cubes]

    accepts, rates = {}, {}
    for mode, scorer in scorers.items():
        frames = raw_frames if mode == "raw-u16" else prepped
        scorer.score(frames[0][:chunk_size])      # compile warmup
        t0 = time.perf_counter()
        accepts[mode] = [scorer.score(f)["accept"] for f in frames]
        dt = time.perf_counter() - t0
        rates[mode] = n_px / dt
        shipped = n_px * bytes_per_px[mode] / 1e6
        extra = ("" if mode == "raw-u16"
                 else f" (+{timings['host_prep']:.1f}s host SNV+SavGol)")
        print(f"  {mode:7s} {dt:7.1f}s  {rates[mode] / 1e6:6.2f} M px/s  "
              f"{shipped:7.0f} MB shipped{extra}")
    for mode in ("raw-u16", "bf16", "int8"):
        agree = float(np.mean(np.concatenate(accepts[mode])
                              == np.concatenate(accepts["f32"])))
        print(f"  {mode:7s} decision agreement vs f32: {agree:.4f}")

    # --- 5. quality: per-class accept rates on foreground pixels ----------
    print("accept rate of OWN class on its cubes' foreground "
          "(background + unknown should reject):")
    for cls in labels + [n_classes]:
        own = [i for i, (c, _) in enumerate(cubes) if c == cls]
        fg = np.concatenate([raw_frames[i].mean(axis=1) >=
                             0.5 * COUNTS_SCALE for i in own])
        acc = np.concatenate([accepts["f32"][i] for i in own])  # (n, C)
        any_acc = float(np.mean(acc[fg].any(axis=1)))
        if cls < n_classes:
            own_acc = float(np.mean(acc[fg][:, cls]))
            bg_acc = float(np.mean(acc[~fg].any(axis=1)))
            print(f"  class {cls}: own-class {own_acc:.3f}, any {any_acc:.3f},"
                  f" background-any {bg_acc:.3f}")
        else:
            print(f"  unknown class: accepted-by-any {any_acc:.3f} "
                  f"(false accepts)")

    # --- 6. H2D-vs-compute split on one resident chunk --------------------
    if split_probe:
        print("pipeline split per chunk "
              f"({min(chunk_size, n_px)} px, device fetch-forced):")
        n = min(chunk_size, raw_frames[0].shape[0])
        for mode, scorer in scorers.items():
            frame = (raw_frames if mode == "raw-u16" else prepped)[0][:n]
            t0 = time.perf_counter()
            prepared = scorer.prepare(frame)
            jax.block_until_ready(prepared[0][0])
            t_prep = time.perf_counter() - t0     # host prep + H2D
            scorer.score_prepared(prepared)       # warm
            reps, t0 = 5, time.perf_counter()
            for _ in range(reps):
                scorer.score_prepared(prepared)
            t_dev = (time.perf_counter() - t0) / reps
            print(f"  {mode:7s} host-prep+H2D {t_prep * 1e3:8.1f} ms   "
                  f"device compute+fetch {t_dev * 1e3:7.1f} ms")

    timings["total"] = sum(timings.values())
    print("timings:", {k: round(v, 2) for k, v in timings.items()})
    return timings, rates


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description=__doc__, allow_abbrev=False,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--n-cubes", type=int, default=2,
                   help="cubes PER CLASS")
    p.add_argument("--n-classes", type=int, default=3)
    p.add_argument("--length", type=int, default=288)
    p.add_argument("--n-components", type=int, default=10)
    p.add_argument("--chunk-size", type=int, default=65536)
    p.add_argument("--no-split-probe", dest="split_probe",
                   action="store_false")
    p.add_argument("--cube-scale", action="store_true",
                   help="preset: 512x512 cubes, 2/class + unknown = "
                        ">=1.8M pixel spectra (the SURVEY 5.7 scale axis)")
    a = p.parse_args()
    kw = dict(size=a.size, n_cubes=a.n_cubes, n_classes=a.n_classes,
              length=a.length, n_components=a.n_components,
              chunk_size=a.chunk_size, split_probe=a.split_probe)
    if a.cube_scale:
        kw.update(size=512, n_cubes=2, n_classes=3)
    main(**kw)
