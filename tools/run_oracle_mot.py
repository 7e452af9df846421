#!/usr/bin/env python
"""Classical / oracle MOT ablations over the preprocessed artifact tree.

Behavioral reference: the mot_3d oracle configs in BASELINE.json (the
reference library has no CLI driver for these; SURVEY §3.5). Runs
MOTModel (kf/velo/ma motion models, greedy/bipartite association,
iou/giou/m_dis/euler metrics) or the oracle variants over per-scene det
npz files and reports MOTA/MOTP via the built-in accumulator.

Usage:
  python tools/run_oracle_mot.py --data data/nusc_preprocessed/val_2hz \
      --det_name cp [--oracle dets|kf] [--asso giou] [--motion kf] \
      [--covariance nuscenes_cp_2hz]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shasta_tpu.core.boxes import quaternion_yaw  # noqa: E402
from shasta_tpu.mot import MOTModel, FrameData  # noqa: E402
from shasta_tpu.mot.metrics import MOTAccumulator  # noqa: E402
from shasta_tpu.mot.mot_model import DEFAULT_CONFIG  # noqa: E402


def _mot_rows(arrs):
    out = np.zeros((len(arrs), 8))
    for i, b in enumerate(arrs):
        b = np.asarray(b, np.float64)
        out[i, :3] = b[:3]
        out[i, 3] = quaternion_yaw(b[6:10])
        out[i, 4] = b[4]
        out[i, 5] = b[3]
        out[i, 6] = b[5]
        if len(b) >= 11:
            out[i, 7] = b[10]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="{split}_2hz artifact dir")
    ap.add_argument("--det_name", default="cp")
    ap.add_argument("--oracle", default=None, choices=[None, "dets", "kf"])
    ap.add_argument("--asso", default="giou", choices=["iou", "giou", "m_dis", "euler"])
    ap.add_argument("--motion", default="kf", choices=["kf", "velo", "ma"])
    ap.add_argument("--match", default="bipartite", choices=["bipartite", "greedy"])
    ap.add_argument("--covariance", default="default")
    ap.add_argument("--max_scenes", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = copy.deepcopy(DEFAULT_CONFIG)
    cfg["running"].update(
        asso=args.asso, motion_model=args.motion, match_type=args.match,
        covariance=args.covariance,
    )

    det_dir = os.path.join(args.data, "detections", args.det_name, "dets")
    gt_dir = os.path.join(args.data, "gt_info")
    acc = MOTAccumulator()
    scenes = sorted(f[:-4] for f in os.listdir(det_dir) if f.endswith(".npz"))
    if args.max_scenes:
        scenes = scenes[: args.max_scenes]

    for scene in scenes:
        dets = np.load(os.path.join(det_dir, scene + ".npz"), allow_pickle=True)
        gts = np.load(os.path.join(gt_dir, scene + ".npz"), allow_pickle=True)
        model = MOTModel(cfg, oracle=args.oracle)
        for fi in range(len(dets["bboxes"])):
            d = _mot_rows(dets["bboxes"][fi])
            g = _mot_rows(gts["bboxes"][fi])
            out = model.frame_mot(FrameData(
                dets=d, det_types=list(dets["types"][fi]),
                gt_dets=g, gt_types=list(gts["types"][fi]),
                gt_ids=list(gts["ids"][fi]),
                time_stamp=0.5 * fi,
            ))
            hyp_ids = [tid for _, tid, state, _ in out]
            hyp_centers = [st[:2] for st, _, _, _ in out]
            acc.update(list(gts["ids"][fi]), g[:, :2] if len(g) else np.zeros((0, 2)),
                       hyp_ids, hyp_centers)
        print(f"{scene}: running MOTA={acc.mota:.3f}")

    summary = acc.summary()
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
