"""Headline benchmark: batched SIMCA fit + score throughput vs the CPU
reference implementation (BASELINE.json config 1/5 — the north-star metric).

Workload: fit 3 one-class SIMCA models (cheese-scale calibration sets,
700 x 500 each, k = 10) and score 98,304 spectra against all 3 classes.

- TPU path: ocm_tpu batched fit (vmapped masked eigh) + fused scoring
  (one GEMM per class, no (N, L) reconstruction materialized).
- CPU reference path: the reference's own algorithm — sklearn full-SVD PCA
  fit per class (utils/SIMCA.py:62-75) and transform / inverse_transform /
  residual scoring (utils/SIMCA.py:127-130) in float64 NumPy.

Prints ONE JSON line: spectra/sec scored end-to-end (fit + score), with
vs_baseline = throughput ratio over the CPU reference.
"""

import json
import subprocess
import sys
import time

import numpy as np


def wait_for_device(max_tries=6, wait_s=30, probe_timeout=300):
    """Block until the hosted TPU backend initializes, probing in a
    SUBPROCESS (a failed plugin init is cached for the life of a process,
    so an in-process retry would keep raising).  The axon tunnel has
    transient outages; the driver runs this script unattended at round
    end, so a crash here would record no benchmark at all.  Returns False
    if the device never comes up — the caller then forces the CPU backend
    so ONE honest JSON line is still emitted.
    """
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i < max_tries - 1:
            time.sleep(wait_s)
    return False


def make_data(seed=0, n_cal=700, length=500, n_classes=3, n_score=98304):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, length)
    cals = []
    for c in range(n_classes):
        base = np.sin(2 * np.pi * (3 + c) * t) + 0.3 * c
        amp = rng.normal(1.0, 0.08, size=(n_cal, 1))
        cals.append((amp * base[None, :]
                     + rng.normal(0, 0.02, size=(n_cal, length))))
    xs = rng.normal(0, 1, size=(n_score, length)) + np.sin(
        2 * np.pi * 3 * t)[None, :]
    return cals, xs


def bench_tpu(cals, xs, k=10, repeats=5, inner_iters=64):
    """Steady-state device time per fit+score workload.

    The workload repeats ``inner_iters`` times INSIDE one compiled program
    (each iteration on index-perturbed data so nothing folds away) —
    host<->device round-trip latency is paid once and amortized, so the
    measurement reflects device throughput, not interconnect RTT.
    ``inner_iters`` must keep total device work well above the ~30 ms
    dispatch round trip of the hosted-TPU tunnel, or the measurement floors
    at RTT/inner_iters (measured; see docs/BENCHMARKS.md methodology).

    The fit uses ``solver='rsvd'`` — the GEMM-only randomized subspace
    fit (ocm_tpu.ops.linalg.pca_topk_cov), the TPU production path: a
    dense decomposition lowers to a QDWH while-loop chain (~37 ms for
    this 3-class batch on one chip) where the rsvd fit is ~0.5 ms of MXU
    work with identical decisions (tests/test_simca.py).
    """
    import jax
    import jax.numpy as jnp

    from ocm_tpu.models.simca import fit_simca, predict_classes

    stacked = jnp.asarray(np.stack(cals), jnp.float32)   # (C, n, L)
    xs_d = jnp.asarray(xs, jnp.float32)
    fit_fn = jax.vmap(lambda xc: fit_simca(xc, k, solver="rsvd"))

    def run():
        def body(i, acc):
            models = fit_fn(stacked + 1e-6 * i)
            # fused multi-class scoring: ONE GEMM / one HBM pass over the
            # spectra for all C classes (ops.linalg.t2_q_scores_multiclass)
            _, dred, _, _ = predict_classes(models, xs_d)
            return acc + jnp.sum(dred)

        return jax.lax.fori_loop(0, inner_iters, body, jnp.float32(0.0))

    run_jit = jax.jit(run)
    # Warmup must FETCH the value: on the hosted TPU (axon) execution —
    # including compilation — is lazy until a value materializes, and
    # block_until_ready on a never-materialized array returns immediately.
    # After this fetch, per-call block_until_ready waits correctly
    # (verified: times scale linearly with inner_iters).
    float(run_jit())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run_jit())
        times.append(time.perf_counter() - t0)
    return min(times) / inner_iters


def bench_cpu_reference(cals, xs, k=10, repeats=2):
    """The reference's own fit/score algorithm (utils/SIMCA.py:62-75,
    127-130): 3 sklearn PCA solves per class + reconstruction-based Q.
    Best-of-N so transient host contention doesn't inflate the baseline."""
    from sklearn.decomposition import PCA

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for x_cls in cals:
            pca_full = PCA(n_components=None, svd_solver="full")
            t_full = pca_full.fit_transform(x_cls)
            t = t_full[:, :k]
            invcov = np.linalg.pinv(np.cov(t, rowvar=False))
            pca_k = PCA(n_components=k, svd_solver="full").fit(x_cls)
            t_new = pca_k.transform(xs)
            x_rec = pca_k.inverse_transform(t_new)
            q = np.sum((xs - x_rec) ** 2, axis=1)
            t2 = np.einsum("ij,jk,ik->i", t_new, invcov, t_new)
            del q, t2
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import os

    cals, xs = make_data()
    n_work = xs.shape[0] * len(cals)          # class-scores produced
    force_cpu = os.environ.get("OCM_BENCH_FORCE_CPU") == "1"
    if not force_cpu and not wait_for_device():
        force_cpu = True
    if force_cpu:
        # Last resort: the tunnel never came up.  Emit a real (CPU-backend)
        # measurement rather than crashing with no artifact; the JSON's
        # "backend" field marks the downgrade.
        import jax
        jax.config.update("jax_platforms", "cpu")
    try:
        tpu_t = bench_tpu(cals, xs)
    except RuntimeError:
        if force_cpu:
            raise
        # The tunnel flapped between the probe and the run.  A failed
        # backend init is cached for the life of the process, so fall
        # back by RE-EXECING into a fresh CPU-forced process.  Print the
        # original error first: if this was a REAL device-side failure
        # (not an outage) the trace must not vanish into the fallback.
        import traceback

        traceback.print_exc(file=sys.stderr)
        print("bench.py: TPU run failed; re-execing with the CPU backend",
              file=sys.stderr)
        os.environ["OCM_BENCH_FORCE_CPU"] = "1"
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
    import jax
    backend = jax.default_backend()
    cpu_t = bench_cpu_reference(cals, xs)
    value = n_work / tpu_t
    baseline = n_work / cpu_t
    print(json.dumps({
        "metric": "simca_fit_score_throughput",
        "value": round(value, 1),
        "unit": "class-scores/s",
        "vs_baseline": round(value / baseline, 2),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
