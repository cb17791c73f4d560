#!/bin/bash
# One-shot: land every device measurement pending TPU-tunnel recovery
# (CLAUDE.md rough edges).  Run when the tunnel is UP; each probe writes
# a log under out/probes/ for transcription into docs/BENCHMARKS.md.
set -u
mkdir -p out/probes
for probe in probe_serving_dtypes probe_streaming; do
  echo "=== $probe ==="
  timeout 3600 python "scripts/${probe}.py" 2>&1 | tee "out/probes/${probe}.log"
done
echo "=== bench.py (headline) ==="
timeout 3600 python bench.py 2>&1 | tee out/probes/bench_headline.log
echo "=== bench_all --quick ==="
timeout 5400 python bench_all.py --quick 2>&1 | tee out/probes/bench_all_quick.log
