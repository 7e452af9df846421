#!/usr/bin/env python
"""Run the full offline preprocessing chain (preprocessing.sh equivalent).

Usage:
  python tools/preprocess_nuscenes.py --dataroot data/nuScenes \
      --version v1.0-trainval --results detections/cp/val.json \
      --out data/nusc_preprocessed --split val \
      [--scenes scene-0001 scene-0002 | --scenes_file val_scenes.txt] [--no_gt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shasta_tpu.preprocessing.nuscenes_chain import run_chain  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--results", required=True, help="raw detector results json")
    ap.add_argument("--out", default="data/nusc_preprocessed")
    ap.add_argument("--split", default="train")
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--scenes_file", default=None)
    ap.add_argument("--det_name", default="cp")
    ap.add_argument("--no_gt", action="store_true", help="test split: skip GT stages")
    ap.add_argument("--mode", default="2hz", choices=["2hz", "20hz"],
                    help="20hz: full sweep chain w/ 10 Hz selection + interpolated GT")
    args = ap.parse_args()

    scene_names = args.scenes
    if args.scenes_file:
        with open(args.scenes_file) as f:
            scene_names = [line.strip() for line in f if line.strip()]

    run_chain(
        dataroot=args.dataroot,
        version=args.version,
        results_json=args.results,
        out_dir=args.out,
        split=args.split,
        scene_names=scene_names,
        det_name=args.det_name,
        with_gt=not args.no_gt,
        mode=args.mode,
    )
    print(f"preprocessing chain complete -> {args.out}/{args.split}_{args.mode}")


if __name__ == "__main__":
    main()
