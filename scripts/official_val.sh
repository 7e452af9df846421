#!/bin/bash
# 7x per-class eval -> merge -> final 7-class tracking + official scoring
# (reference official_val.sh equivalent).
set -e
EPOCH=${EPOCH:-3}
for c in car ped truck trailer bus motorcycle bicycle; do
  python tools/eval.py --config configs/nusc/$c.py \
      --checkpoint work_dirs/$c/epoch_$EPOCH \
      --work_dir work_dirs/${c}_eval --split val
done
python tools/merge_results.py --inputs work_dirs/*_eval/cp_val.json \
    --output work_dirs/merged/cp_val.json
python tools/pub_test.py --predictions work_dirs/merged/cp_val.json \
    --frame_info data/nusc_preprocessed/val_frame_info.json \
    --work_dir work_dirs/pub_test "$@"

# Fast alternative: single-pass shared-trunk 7-class serving on device
# (one trunk pass/frame instead of 14 backbone runs/pair):
#   python tools/track_multiclass.py --checkpoints work_dirs/{cls}/epoch_$EPOCH \
#       --out work_dirs/multiclass/tracking_result.json
