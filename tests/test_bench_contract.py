"""Driver-contract regression: bench.py must emit ONE parseable JSON line
with the agreed keys even when the TPU tunnel is unavailable (the
CPU-forced fallback path), the probe must fail cleanly, and the round-3
postmortem behavior — a CPU fallback at capture time even though the TPU
came back minutes later — must be impossible: a late successful TPU
measurement wins over the fallback."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def test_bench_emits_one_json_line_cpu_fallback():
    # Shapes travel by env (OCM_BENCH_SHAPES) because the measurement runs
    # in a subprocess of the bench parent — a monkeypatch cannot reach it.
    env = dict(os.environ, OCM_BENCH_FORCE_CPU="1",
               OCM_BENCH_SHAPES="60,48,3,1024",
               # the quiet-host guard would stall for minutes under a
               # loaded suite host; the guard's own logic is unit-tested
               OCM_BENCH_LOAD_WAIT_S="0")
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=480, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == "simca_fit_score_throughput"
    assert rec["unit"] == "class-scores/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["backend"] == "cpu"
    # denominator diagnosability (round-4 verdict: the ratio must be
    # explainable when it drifts)
    assert rec["baseline_s"] > 0
    assert rec["host_load"] >= 0


def test_wait_for_device_times_out_cleanly(monkeypatch):
    import bench

    # a probe that cannot succeed within the horizon must return False,
    # not raise (the driver depends on the JSON line being emitted);
    # force the timeout deterministically regardless of tunnel state
    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe",
                                        timeout=kw.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.wait_for_device(horizon_s=0, probe_timeout=1) is False

    # and a succeeding probe returns True
    class OK:
        returncode = 0

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **kw: OK())
    assert bench.wait_for_device(horizon_s=0, probe_timeout=1) is True


def test_probe_backoff_respects_horizon(monkeypatch):
    """The staggered backoff never sleeps past the horizon and keeps
    probing until the deadline (not a fixed small try count)."""
    import bench

    class Fail:
        returncode = 1
        stdout = b""
        stderr = b""

    probes = []
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **kw: probes.append(1) or Fail())
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    clock = iter(range(0, 10_000, 10))       # 10 "seconds" per monotonic()
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(clock))
    assert bench.wait_for_device(horizon_s=100, first_wait_s=15.0) is False
    assert len(probes) >= 3                  # kept trying over the horizon
    assert all(s <= 90 for s in sleeps)      # capped at the 90 s ceiling
    assert sleeps[0] < sleeps[1] < sleeps[2]  # backoff grows while room left


def _run_main(monkeypatch, capsys, *, probe_results, measure_results,
              force_cpu=False):
    """Drive bench.main() with scripted probe/measure outcomes; return the
    printed record and the measurement-call log."""
    import bench

    monkeypatch.setenv("OCM_BENCH_SHAPES", "60,48,3,1024")
    if force_cpu:
        monkeypatch.setenv("OCM_BENCH_FORCE_CPU", "1")
    else:
        monkeypatch.delenv("OCM_BENCH_FORCE_CPU", raising=False)
    monkeypatch.delenv("OCM_BENCH_CHILD", raising=False)

    probes = iter(probe_results)
    monkeypatch.setattr(bench, "wait_for_device",
                        lambda *a, **kw: next(probes))
    calls = []

    def fake_measure(backend, timeout_s):
        calls.append(backend)
        return measure_results.pop(0)

    monkeypatch.setattr(bench, "_measure", fake_measure)
    monkeypatch.setattr(bench, "bench_cpu_reference", lambda *a, **kw: 1.0)
    monkeypatch.setattr(bench, "_wait_for_quiet_host", lambda: 0.0)
    bench.main()
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(out) == 1, out
    return json.loads(out[0]), calls


def test_late_tpu_reprobe_wins_over_cpu_fallback(monkeypatch, capsys):
    """Round-3 failure mode: TPU down at first probe, CPU fallback runs,
    tunnel recovers — the printed line must be the TPU measurement."""
    rec, calls = _run_main(
        monkeypatch, capsys,
        probe_results=[False, True],     # down at first, back at re-probe
        measure_results=[{"t_per_iter": 10.0, "backend": "cpu"},
                         {"t_per_iter": 0.001, "backend": "tpu"}])
    assert calls == ["cpu", "tpu"]
    assert rec["backend"] == "tpu"


def test_cpu_fallback_kept_when_tpu_stays_down(monkeypatch, capsys):
    rec, calls = _run_main(
        monkeypatch, capsys,
        probe_results=[False, False],
        measure_results=[{"t_per_iter": 10.0, "backend": "cpu"}])
    assert calls == ["cpu"]
    assert rec["backend"] == "cpu"


def test_tpu_child_failure_falls_back_then_reprobes(monkeypatch, capsys):
    """Probe OK but the measurement child dies (tunnel flap mid-run):
    fall back to CPU, then prefer the late TPU retry."""
    rec, calls = _run_main(
        monkeypatch, capsys,
        probe_results=[True, True],
        measure_results=[None,                                  # tpu dies
                         {"t_per_iter": 10.0, "backend": "cpu"},
                         {"t_per_iter": 0.001, "backend": "tpu"}])
    assert calls == ["tpu", "cpu", "tpu"]
    assert rec["backend"] == "tpu"


def test_force_cpu_never_probes(monkeypatch, capsys):
    """OCM_BENCH_FORCE_CPU=1 must not touch the tunnel at all (probes
    would hang a deliberately offline run).  probe_results is empty, so
    any probe call raises StopIteration and fails the test."""
    rec, calls = _run_main(
        monkeypatch, capsys,
        probe_results=[],
        measure_results=[{"t_per_iter": 10.0, "backend": "cpu"}],
        force_cpu=True)
    assert calls == ["cpu"]
    assert rec["backend"] == "cpu"


def test_wait_for_quiet_host(monkeypatch):
    """The denominator load guard waits for the 1-min loadavg to settle
    (the baseline runs on a contended 1-core host) and returns the load
    it measured under, even when the horizon expires first."""
    import bench

    loads = iter([5.0, 3.0, 0.5])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(loads), 0, 0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_quiet_host(max_load=1.5, horizon_s=60) == 0.5
    # horizon expiry: return the (still-high) observed load, don't spin
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.0, 0, 0))
    assert bench._wait_for_quiet_host(max_load=1.5, horizon_s=0) == 9.0
