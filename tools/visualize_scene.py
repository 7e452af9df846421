#!/usr/bin/env python
"""Render a tracked scene: LiDAR-on-map BEV + camera-projected boxes.

Devkit-free equivalent of the reference's nusc_visualize/visualize.py
(which forks the whole nuscenes devkit into temp_nusc.py to inject tracks).
Reads the raw v1.0-* tables + blobs directly.

Usage:
  python tools/visualize_scene.py --dataroot data/nuScenes \
      --version v1.0-trainval --scene_name scene-0270 \
      --track_result_path results/val_tracking_result.json \
      --save_path work_dir/visualize --render_class car
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--scene_name", default="scene-0270")
    ap.add_argument("--render_class", default="car",
                    help="tracking class to render ('' = all classes)")
    ap.add_argument("--track_result_path", required=True)
    ap.add_argument("--save_path", default="work_dir/visualize")
    ap.add_argument("--channels", default="LIDAR_TOP,CAM_FRONT",
                    help="comma-separated sensor channels")
    ap.add_argument("--nsweeps", type=int, default=10)
    ap.add_argument("--no_map", action="store_true", help="skip map underlay")
    args = ap.parse_args()

    from shasta_tpu.preprocessing.nusc_db import NuscDB
    from shasta_tpu.viz.scene_renderer import render_scene

    db = NuscDB(args.dataroot, args.version)
    written = render_scene(
        db,
        scene_name=args.scene_name,
        tracking_result_path=args.track_result_path,
        save_path=args.save_path,
        render_class=args.render_class or None,
        channels=tuple(args.channels.split(",")),
        nsweeps=args.nsweeps,
        underlay_map=not args.no_map,
    )
    print(f"wrote {len(written)} frames under {args.save_path}")


if __name__ == "__main__":
    main()
