"""Run bench.py across the serving config matrix and record results.

One command for an on-chip session (the relay dies unpredictably, so
capture everything while it's alive):

    python tools/bench_matrix.py [--quick]

Writes one JSON line per config to stdout and appends to
PERF_MATRIX.jsonl at the repo root. --quick runs only the two headline
configs (B=1 pallas, 4-lane pallas).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("b1_pallas", []),
    ("b1_pallas_chunk8", ["--chunk", "8"]),
    ("lanes4_pallas", ["--lanes", "4"]),
    ("lanes4_chunk4_pallas", ["--lanes", "4", "--chunk", "4"]),
    ("b1_pallas_bf16", ["--bf16"]),
    ("lanes4_pallas_bf16", ["--lanes", "4", "--bf16"]),
    ("b1_xla", ["--no-pallas"]),
    ("lanes4_xla", ["--lanes", "4", "--no-pallas"]),
]
QUICK = {"b1_pallas", "b1_pallas_chunk8", "lanes4_pallas"}


def main():
    quick = "--quick" in sys.argv
    out_path = os.path.join(ROOT, "PERF_MATRIX.jsonl")
    results = []
    for name, flags in CONFIGS:
        if quick and name not in QUICK:
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py"), *flags],
                capture_output=True, text=True, timeout=2400, cwd=ROOT,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            rec = json.loads(line[-1]) if line else {"error": p.stderr[-500:]}
        except Exception as e:  # noqa: BLE001
            rec = {"error": f"{type(e).__name__}: {e}"}
        rec["config"] = name
        rec["wall_s"] = round(time.time() - t0, 1)
        rec["ts"] = time.time()
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    best = max((r for r in results if "value" in r),
               key=lambda r: r["value"], default=None)
    if best:
        print(f"# best: {best['config']} at {best['value']} {best.get('unit', '')}",
              flush=True)


if __name__ == "__main__":
    main()
