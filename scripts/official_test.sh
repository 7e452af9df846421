#!/bin/bash
# 7x per-class eval on the TEST split -> merge -> final 7-class tracking
# submission (reference official_test.sh equivalent: identical to
# official_val.sh with --split test / v1.0-test).
set -e
EPOCH=${EPOCH:-3}
for c in car ped truck trailer bus motorcycle bicycle; do
  python tools/eval.py --config configs/nusc/$c.py \
      --checkpoint work_dirs/$c/epoch_$EPOCH \
      --work_dir work_dirs/${c}_test --split test
done
python tools/merge_results.py --inputs work_dirs/*_test/cp_test.json \
    --output work_dirs/merged/cp_test.json
python tools/pub_test.py --predictions work_dirs/merged/cp_test.json \
    --frame_info data/nusc_preprocessed/test_frame_info.json \
    --work_dir work_dirs/pub_test_submission "$@"
