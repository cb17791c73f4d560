"""Driver-contract regression: bench.py must emit ONE parseable JSON line
with the agreed keys even when the TPU tunnel is unavailable (the
CPU-forced fallback path), and wait_for_device must fail cleanly."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line_cpu_fallback():
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import bench\n"
        "_orig = bench.make_data\n"
        "bench.make_data = lambda: _orig(n_cal=60, length=48, n_score=1024)\n"
        "bench.main()\n" % ROOT)
    env = dict(os.environ, OCM_BENCH_FORCE_CPU="1")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=480, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == "simca_fit_score_throughput"
    assert rec["unit"] == "class-scores/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["backend"] == "cpu"


def test_wait_for_device_times_out_cleanly(monkeypatch):
    sys.path.insert(0, ROOT)
    import bench

    # a probe that cannot succeed within the timeout must return False,
    # not raise (the driver depends on the JSON line being emitted);
    # force the timeout deterministically regardless of tunnel state
    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe",
                                        timeout=kw.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.wait_for_device(max_tries=2, wait_s=0,
                                 probe_timeout=1) is False

    # and a succeeding probe returns True
    class OK:
        returncode = 0

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **kw: OK())
    assert bench.wait_for_device(max_tries=1, wait_s=0,
                                 probe_timeout=1) is True
