#!/usr/bin/env python
"""Build the 10-sweep infos pkls (tools/create_data.py equivalent).

Usage:
  python tools/create_data.py --dataroot data/nuScenes --version v1.0-trainval \
      --out data/nusc_preprocessed/infos_train_10sweeps_withvelo_filter_True.pkl \
      [--scenes_file train_scenes.txt] [--nsweeps 10] [--no_gt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shasta_tpu.preprocessing.infos import create_nuscenes_infos  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out", required=True)
    ap.add_argument("--nsweeps", type=int, default=10)
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--scenes_file", default=None)
    ap.add_argument("--no_gt", action="store_true")
    args = ap.parse_args()

    scene_names = args.scenes
    if args.scenes_file:
        with open(args.scenes_file) as f:
            scene_names = [line.strip() for line in f if line.strip()]

    infos = create_nuscenes_infos(
        args.dataroot, args.version, args.nsweeps, scene_names,
        with_gt=not args.no_gt, out_path=args.out,
    )
    print(f"wrote {len(infos)} infos -> {args.out}")


if __name__ == "__main__":
    main()
