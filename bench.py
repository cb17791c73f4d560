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

Outage hardening (the round-3 postmortem: the tunnel flapped at driver
capture time and the round record became the CPU fallback):

- The PARENT process never imports jax.  Every device measurement runs in
  a fresh SUBPROCESS, because a failed TPU-plugin init is cached for the
  life of a process — in-process retries can never recover.
- The TPU probe horizon is minutes with staggered backoff
  (``OCM_BENCH_PROBE_S``, default 600 s), not 6 quick tries.
- If the TPU measurement still fails, the CPU-backend fallback runs — and
  then the TPU is re-probed ONCE more before printing; a late successful
  TPU measurement wins.  The ``backend`` field tags the line either way.

Env knobs: ``OCM_BENCH_FORCE_CPU=1`` skips all TPU probing;
``OCM_BENCH_SHAPES="n_cal,length,n_classes,n_score"`` shrinks the workload
(used by the contract test — it must reach the measurement subprocesses,
so it travels by env, not monkeypatch); ``OCM_BENCH_PROBE_S``,
``OCM_BENCH_LATE_PROBE_S``, ``OCM_BENCH_CHILD_TIMEOUT_S`` tune horizons.
"""

import json
import os
import subprocess
import sys
import time

try:
    import numpy as np
except ModuleNotFoundError:  # pragma: no cover - interpreter mismatch
    # Observed 2026-08-20: a shell that never sourced the login profile
    # resolves `python` to the bare interpreter (no numpy/jax).  When run
    # as a script, re-exec into the project venv instead of losing the
    # round record; when imported, surface the real error.
    # NOTE: compare sys.executable by PATH, not realpath — the venv
    # launcher is a symlink to the base binary (realpath equal), and the
    # venv works via argv0/pyvenv.cfg resolution.  _OCM_REEXEC guards
    # against a loop if the venv itself is broken.
    _venv_py = "/opt/venv/bin/python"
    if (__name__ == "__main__" and os.path.exists(_venv_py)
            and sys.executable != _venv_py
            and "_OCM_BENCH_REEXEC" not in os.environ):
        os.environ["_OCM_BENCH_REEXEC"] = "1"
        os.execv(_venv_py, [_venv_py, os.path.abspath(__file__)]
                 + sys.argv[1:])
    raise


def wait_for_device(horizon_s=None, probe_timeout=300, first_wait_s=15.0):
    """Probe until the hosted TPU backend initializes or ``horizon_s``
    elapses, probing in a SUBPROCESS (a failed plugin init is cached for
    the life of a process, so an in-process retry would keep raising).
    The axon tunnel has transient outages; the driver runs this script
    unattended at round end, so a crash here would record no benchmark at
    all.  Waits between probes back off 1.5x up to 90 s.  ``horizon_s=0``
    means exactly one probe.  Returns False if the device never comes up —
    the caller then measures on the CPU backend so ONE honest JSON line is
    still emitted.
    """
    if horizon_s is None:
        horizon_s = float(os.environ.get("OCM_BENCH_PROBE_S", "600"))
    deadline = time.monotonic() + horizon_s
    wait = first_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        time.sleep(min(wait, remaining))
        wait = min(wait * 1.5, 90.0)


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


def _shape_kwargs():
    """Workload shape overrides from OCM_BENCH_SHAPES — env, not argv or
    monkeypatch, because the measurement runs in a subprocess that must
    rebuild the identical (seeded) data."""
    s = os.environ.get("OCM_BENCH_SHAPES")
    if not s:
        return {}
    n_cal, length, n_classes, n_score = (int(v) for v in s.split(","))
    return dict(n_cal=n_cal, length=length, n_classes=n_classes,
                n_score=n_score)


def bench_tpu(cals, xs, k=10, repeats=5, inner_iters=64):
    """Steady-state device time per fit+score workload, SLOPE-timed.

    The workload repeats ``inner_iters`` times INSIDE one compiled
    program (each iteration on index-perturbed data so nothing folds
    away), and the per-iteration time is the two-point slope
    ``(t(2n) - t(n)) / n`` between the n- and 2n-iteration variants of
    the SAME program: the hosted tunnel adds a ~30 ms dispatch constant
    per call, and a single-dispatch reading of a ~1.2 ms/iter workload
    at n=64 still carries RTT/64 = ~0.5 ms/iter of dilution (that is
    how rounds 2-4 measured — their records understate the device by
    ~30%; docs/BENCHMARKS.md methodology, round-5 correction).  The
    slope cancels the constant exactly; each point is best-of-N
    fetch-forced.

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

    def make_run(n):
        def run():
            def body(i, acc):
                models = fit_fn(stacked + 1e-6 * i)
                # fused multi-class scoring: ONE GEMM / one HBM pass
                # over the spectra for all C classes
                # (ops.linalg.t2_q_scores_multiclass)
                _, dred, _, _ = predict_classes(models, xs_d)
                return acc + jnp.sum(dred)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return jax.jit(run)

    def best_wall(run_jit):
        # Warmup must FETCH the value: on the hosted TPU (axon)
        # execution — including compilation — is lazy until a value
        # materializes, and block_until_ready on a never-materialized
        # array returns immediately.  After this fetch, per-call
        # block_until_ready waits correctly (verified: times scale
        # linearly with inner_iters).
        float(run_jit())
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run_jit())
            times.append(time.perf_counter() - t0)
        return min(times)

    t1 = best_wall(make_run(inner_iters))
    t2 = best_wall(make_run(2 * inner_iters))
    return max((t2 - t1) / inner_iters, 1e-12)


def _wait_for_quiet_host(max_load=None, horizon_s=None, poll_s=10.0):
    """Denominator stabilization: the CPU baseline runs on this contended
    1-CORE host, and recorded round ratios historically swung 1652x-12057x
    at a near-constant TPU numerator purely from baseline noise
    (docs/BENCHMARKS.md round-4 note).  Wait for the 1-minute loadavg to
    settle below ``max_load`` (up to ``horizon_s``) before measuring;
    returns the load observed when measurement starts so the record is
    diagnosable either way."""
    if max_load is None:
        max_load = float(os.environ.get("OCM_BENCH_MAX_LOAD", "1.5"))
    if horizon_s is None:
        horizon_s = float(os.environ.get("OCM_BENCH_LOAD_WAIT_S", "180"))
    deadline = time.monotonic() + horizon_s
    load = os.getloadavg()[0]
    while load > max_load and time.monotonic() < deadline:
        time.sleep(poll_s)
        load = os.getloadavg()[0]
    return load


def bench_cpu_reference(cals, xs, k=10, repeats=4):
    """The reference's own fit/score algorithm (utils/SIMCA.py:62-75,
    127-130): 3 sklearn PCA solves per class + reconstruction-based Q.
    Best-of-N so transient host contention doesn't inflate the baseline;
    expected band for the default shapes on a quiet core is documented in
    docs/BENCHMARKS.md (headline methodology)."""
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


def _child_main(backend):
    """Measurement subprocess: rebuild the seeded data, run the device
    measurement on the requested backend, print ONE JSON line with the
    per-iteration time.  Runs in a FRESH process so a previously cached
    plugin-init failure in the parent cannot poison it."""
    import jax

    if backend == "cpu":
        # Env var alone is ignored under the axon site hook; the config
        # update after import is the working override (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    cals, xs = make_data(**_shape_kwargs())
    t = bench_tpu(cals, xs)
    print(json.dumps({"t_per_iter": t, "backend": jax.default_backend()}))


def _measure(backend, timeout_s):
    """Run the measurement child for ``backend``; return its parsed JSON
    record, or None on any failure (nonzero exit, timeout, no JSON)."""
    env = dict(os.environ, OCM_BENCH_CHILD=backend)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        print("bench.py: %s measurement timed out after %ss"
              % (backend, timeout_s), file=sys.stderr)
        return None
    if r.returncode != 0:
        # Surface the child's failure — if this was a REAL device-side
        # error (not an outage) the trace must not vanish silently.
        sys.stderr.write(r.stderr[-4000:])
        print("bench.py: %s measurement failed (exit %d)"
              % (backend, r.returncode), file=sys.stderr)
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    print("bench.py: %s child printed no JSON" % backend, file=sys.stderr)
    return None


def main():
    child = os.environ.get("OCM_BENCH_CHILD")
    if child:
        _child_main(child)
        return

    force_cpu = os.environ.get("OCM_BENCH_FORCE_CPU") == "1"
    child_timeout = float(os.environ.get("OCM_BENCH_CHILD_TIMEOUT_S", "2400"))
    rec = None
    if not force_cpu and wait_for_device():
        rec = _measure("tpu", child_timeout)
    if rec is None:
        # Fallback: a real (CPU-backend) measurement rather than no
        # artifact.  The "backend" field marks the downgrade.
        rec = _measure("cpu", child_timeout)
        if not force_cpu:
            # The fallback took minutes; the tunnel may be back.  Round 3
            # lost its record to exactly this window — one late re-probe
            # and a successful TPU line wins over the fallback.
            late_s = float(os.environ.get("OCM_BENCH_LATE_PROBE_S", "120"))
            if wait_for_device(horizon_s=late_s):
                late = _measure("tpu", child_timeout)
                if late is not None:
                    rec = late
    if rec is None:
        raise SystemExit(
            "bench.py: both TPU and CPU-backend measurements failed")

    cals, xs = make_data(**_shape_kwargs())
    n_work = xs.shape[0] * len(cals)          # class-scores produced
    load = _wait_for_quiet_host()
    cpu_t = bench_cpu_reference(cals, xs)
    value = n_work / rec["t_per_iter"]
    baseline = n_work / cpu_t
    # baseline_s + host_load make ratio drift diagnosable across rounds:
    # the ratio's denominator is a 1-core host measurement, so a ratio
    # swing with a steady "value" is baseline noise, not a TPU change
    print(json.dumps({
        "metric": "simca_fit_score_throughput",
        "value": round(value, 1),
        "unit": "class-scores/s",
        "vs_baseline": round(value / baseline, 2),
        "backend": rec["backend"],
        "baseline_s": round(cpu_t, 3),
        "host_load": round(load, 2),
    }))


if __name__ == "__main__":
    main()
