"""HSI fused-pipeline ceiling probe: is 67.8 M pixel-spectra/s the
chip's limit for uint16 ingest -> SNV+SavGol -> center -> 3-class
scoring, and what sets it?

Three measurements (slope-timed, see probe_train_roofline's
measurement-discipline note — the bench_all hsi_cube record used
inner=32 where device work ~= the ~31 ms dispatch RTT, so its single
reading may be RTT-diluted):

1. the fused per-chunk program at inner and 2*inner fori iterations ->
   RTT-free px/s;
2. the compiled single-iteration program's own cost_analysis
   (bytes accessed + flops) -> implied HBM traffic at the measured
   rate, nothing hand-counted;
3. a measured large-copy bandwidth ceiling (read+write of a 256 MB
   f32 array, slope-timed) for the % -of-ceiling verdict.

Run on the real TPU:  python scripts/probe_hsi_ceiling.py
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

from probe_train_roofline import per_iter


def main():
    print("backend:", jax.default_backend(), flush=True)

    from ocm_tpu.models.simca import fit_classes, predict_classes
    from ocm_tpu.ops.preprocess import snv_savgol

    # ---- the exact bench_all.bench_hsi_cube workload -------------------
    length, chunk = 288, 65536
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, length)
    cal, y = [], []
    for c in range(3):
        base = np.sin(2 * np.pi * (2 + 0.5 * c) * t) + 1.5 + 0.3 * c
        amp = rng.normal(1.0, 0.05, (2000, 1))
        cal.append(np.clip(np.round((amp * base[None, :] + rng.normal(
            0, 0.02, (2000, length))) * 1e4), 0, 65535).astype(np.float32))
        y.append(np.full(2000, c))
    prep = lambda a: snv_savgol(a, 5, 2, 1)  # noqa: E731
    x_cal = prep(jnp.asarray(np.concatenate(cal)))
    models = fit_classes(np.asarray(x_cal), np.concatenate(y), [0, 1, 2],
                         10)
    x_raw = jnp.asarray(rng.integers(0, 40000, (chunk, length)),
                        jnp.uint16)
    x_off = jnp.mean(models.mean, axis=0)

    def body_once(x0, i):
        xc = prep((x0 + (i % 7).astype(jnp.uint16)
                   ).astype(jnp.float32)) - x_off
        accept, dred, t2, q = predict_classes(
            models, xc, x_offset=x_off,
            x_sumsq=jnp.sum(jnp.square(xc), axis=1))
        return jnp.sum(dred) + jnp.sum(accept)

    # cost_analysis of ONE fused iteration
    c = jax.jit(body_once).lower(x_raw, jnp.uint16(1)).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    nbytes = float(ca.get("bytes accessed", float("nan")))
    print(json.dumps({"flops_per_chunk": flops,
                      "bytes_per_chunk": nbytes,
                      "bytes_per_px": nbytes / chunk,
                      "flops_per_px": flops / chunk}), flush=True)

    # slope-timed fused rate
    def make_run(n):
        @jax.jit
        def run(x0):
            def body(i, acc):
                return acc + body_once(x0, (i % 7).astype(jnp.uint16))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    dt = per_iter(make_run, (x_raw,), 64)
    px_s = chunk / dt
    print(json.dumps({"ms_per_chunk": dt * 1e3, "px_per_s": px_s,
                      "implied_GBps": nbytes / dt / 1e9,
                      "achieved_tflops": flops / dt / 1e12}), flush=True)

    # ---- copy-bandwidth ceiling ---------------------------------------
    big = jnp.asarray(rng.standard_normal((64, 1024, 1024)), jnp.float32)

    def make_copy(n):
        @jax.jit
        def run(a):
            def body(i, carry):
                return carry * 1.0000001 + 1e-12

            return jax.lax.fori_loop(0, n, body, a)

        return run

    dt_c = per_iter(make_copy, (big,), 64)
    bw = 2.0 * big.size * 4 / dt_c        # read + write
    print(json.dumps({"copy_GBps": bw / 1e9,
                      "pipeline_pct_of_copy_bw":
                          100.0 * (nbytes / dt) / bw}), flush=True)


if __name__ == "__main__":
    main()
