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

echo "[$(ts)] 1/5 bench matrix (quick first: headline configs)"
timeout 3600 python -u tools/bench_matrix.py --quick 2>&1 | tee "$LOG/matrix_quick.log"

echo "[$(ts)] 2/5 step breakdown"
timeout 2400 python -u tools/prof_step.py 2>&1 | tee "$LOG/prof_step.log"

echo "[$(ts)] 3/5 stage micro-bench (pallas)"
timeout 2400 python -u tools/profile_stages.py --pallas 2>&1 | tee "$LOG/stages.log"

echo "[$(ts)] 4/5 full bench matrix (bf16 + xla baselines)"
timeout 7200 python -u tools/bench_matrix.py 2>&1 | tee "$LOG/matrix_full.log"

echo "[$(ts)] 5/5 release-scale 7-class fused program"
timeout 2400 python -u tools/measure_multiclass.py 2>&1 | tee "$LOG/multiclass.log"

echo "[$(ts)] done — paste numbers into PERF_NOTES.md, set bench.py defaults to the matrix winner"
