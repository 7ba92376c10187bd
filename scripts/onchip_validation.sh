#!/bin/bash
# Round-4 silicon re-validation program (VERDICT r3 items 2, 3, 5).
# Run when the axon relay is healthy. One TPU process at a time (the
# relay serializes and garbles concurrent timings). Each stage logs to
# /tmp/onchip/ and the script keeps going on failure so one flaky stage
# doesn't mask the rest.
set -u
cd "$(dirname "$0")/.."
# scripts/ and examples/ are invoked as `python path/to/file.py`, which
# puts their own directory (not the repo root) at sys.path[0]; export the
# root so `import innr_tpu` resolves without an editable install.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/onchip

stage() {
  local name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  timeout 2400 "$@" > "/tmp/onchip/${name}.log" 2>&1
  echo "rc=$? ($(date -u +%H:%M:%S))"
}

# 1. every example asserts its own invariants on the real chip
stage examples python -u examples/run_all.py

# 2. full bench suite; stderr carries the per-config lines --check reads
timeout 2400 python -u bench.py --full \
  > /tmp/onchip/bench_full.json 2> /tmp/onchip/bench_full.stderr
echo "bench --full rc=$?"

# 3. regression check against the pinned medians
stage check python scripts/plot_benchmarks.py --check /tmp/onchip/bench_full.stderr

# 4. pruned-scan envelope (coherence/order/placement sweep, amortized +
#    single-launch, cluster_reorder build cost included)
stage envelope python -u scripts/bench_prune_envelope.py --n 10000000

# 4b. mechanized DMA-elision assertion: rc=0 holds, rc=2 elision
#     regressed, rc=3 relay too noisy to adjudicate (round-5 item 6)
stage elision python -u scripts/validate_elision.py --n 10000000

# 5. serving QPS vs batch size (launch-floor economics)
stage serving python -u examples/serving_demo.py

echo "=== all stages done; logs in /tmp/onchip/ ==="
