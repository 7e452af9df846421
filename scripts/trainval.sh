#!/bin/bash
# Train all 7 per-class models (reference trainval.sh equivalent; the DP
# mesh replaces torch.distributed.launch --nproc_per_node=8).
set -e
for c in car ped truck trailer bus motorcycle bicycle; do
  python tools/train.py --config configs/nusc/$c.py --work_dir work_dirs/$c "$@"
done
