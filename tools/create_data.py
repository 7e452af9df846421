#!/usr/bin/env python
"""Build the multi-sweep infos pkls (tools/create_data.py equivalent).

Usage (nuScenes):
  python tools/create_data.py --dataroot data/nuScenes --version v1.0-trainval \
      --out data/nusc_preprocessed/infos_train_10sweeps_withvelo_filter_True.pkl \
      [--scenes_file train_scenes.txt] [--nsweeps 10] [--no_gt]
Usage (Waymo pkl tree, waymo_common.py:307-320 equivalent):
  python tools/create_data.py --waymo --dataroot data/Waymo --split train \
      [--nsweeps 1]
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
    ap.add_argument("--waymo", action="store_true",
                    help="build Waymo infos over a {split}/{lidar,annos} pkl tree")
    ap.add_argument("--split", default="train", help="Waymo split (--waymo)")
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out", default=None)
    ap.add_argument("--nsweeps", type=int, default=10)
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--scenes_file", default=None)
    ap.add_argument("--no_gt", action="store_true")
    args = ap.parse_args()

    if args.waymo:
        from shasta_tpu.data.waymo_decode import create_waymo_infos

        out = create_waymo_infos(args.dataroot, args.split, args.nsweeps)
        print(f"wrote waymo infos -> {out}")
        return
    if not args.out:
        ap.error("--out is required for nuScenes infos")

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
