#!/usr/bin/env python
"""Estimate per-class Kalman P/Q/R covariances from GT trajectories.

Behavioral reference: preprocessing/nusc_dataset_stats.py:22-97 and
waymo_dataset_stats.py (whose `stat_estimation` import is missing from the
reference repo — this is the working implementation). Reads the
preprocessed artifact tree, writes {P,Q,R}_{name}.json usable by
shasta_tpu.mot.covariance.NuCovariance.

Usage:
  python tools/estimate_stats.py --data data/nusc_preprocessed/train_2hz \
      --det_name cp --out shasta_tpu/mot/stats --name cp_2hz_mine
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shasta_tpu.preprocessing.det_tools import _nu_to_mot  # noqa: E402
from shasta_tpu.preprocessing.stats import estimate_covariances, write_stats  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--det_name", default="cp")
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="cp_2hz")
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--max_scenes", type=int, default=None)
    args = ap.parse_args()

    det_dir = os.path.join(args.data, "detections", args.det_name, "dets")
    gt_dir = os.path.join(args.data, "gt_info")
    scenes = []
    names = sorted(f[:-4] for f in os.listdir(det_dir) if f.endswith(".npz"))
    if args.max_scenes:
        names = names[: args.max_scenes]
    for scene in names:
        dets = np.load(os.path.join(det_dir, scene + ".npz"), allow_pickle=True)
        gts = np.load(os.path.join(gt_dir, scene + ".npz"), allow_pickle=True)
        frames = []
        for fi in range(len(dets["bboxes"])):
            frames.append(dict(
                dets=_nu_to_mot(dets["bboxes"][fi]),
                det_types=list(dets["types"][fi]),
                gts=_nu_to_mot(gts["bboxes"][fi]),
                gt_types=[t.split(".")[-1] for t in gts["types"][fi]],
                gt_ids=list(gts["ids"][fi]),
            ))
        scenes.append({"frames": frames, "dt": args.dt})

    P, Q, R = estimate_covariances(scenes)
    write_stats(P, Q, R, args.out, args.name)
    print(f"wrote P/Q/R_{args.name}.json for classes {sorted(P)} -> {args.out}")


if __name__ == "__main__":
    main()
