#!/bin/bash
# One-command on-chip perf session (run the moment the TPU relay is alive;
# it dies unpredictably — capture in priority order, tee everything).
# Usage: bash tools/onchip_session.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-onchip_logs}
mkdir -p "$LOG"
ts() { date -u +%H:%M:%S; }

echo "[$(ts)] probe"
timeout 120 python -c "
from bench import ensure_backend_alive
import sys
ok = ensure_backend_alive(timeout_s=90)
print('alive:', ok)
sys.exit(0 if ok else 1)" || { echo "relay down; aborting"; exit 1; }

echo "[$(ts)] 1/6 headline bench (bf16 + host plans, the serving default)"
timeout 1800 python -u bench.py 2>&1 | tee "$LOG/bench.log"

echo "[$(ts)] 2/6 plan-trunk itemization (round-5 path)"
timeout 2400 python -u tools/prof_plans.py --iters 20 2>&1 | tee "$LOG/prof_plans.log"

echo "[$(ts)] 3/6 whole-backbone chain (glue check)"
timeout 2400 python -u tools/prof_full.py --bf16 --iters 15 2>&1 | tee "$LOG/prof_full.log"

echo "[$(ts)] 4/6 release-scale 7-class fused program"
timeout 2400 python -u tools/measure_multiclass.py 2>&1 | tee "$LOG/multiclass.log"

echo "[$(ts)] 5/6 ablations (f32 / no-plans / xla)"
timeout 1800 python -u bench.py --f32 2>&1 | tee "$LOG/bench_f32.log"
timeout 1800 python -u bench.py --no-plans 2>&1 | tee "$LOG/bench_noplans.log"
timeout 1800 python -u bench.py --no-pallas 2>&1 | tee "$LOG/bench_xla.log"

echo "[$(ts)] 6/6 legacy matrix (lanes/chunk sweeps)"
timeout 7200 python -u tools/bench_matrix.py 2>&1 | tee "$LOG/matrix_full.log"

echo "[$(ts)] done — paste numbers into PERF_NOTES.md, set bench.py defaults to the matrix winner"
