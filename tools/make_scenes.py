#!/usr/bin/env python
"""Scene-indexed frame metadata json (tools/nusc_shasta/make_scenes.py:35-81
equivalent, devkit-free): per scene, the ordered tokens with timestamps and
first-frame flags — the input for scene-parallel batched inference.

Usage:
  python tools/make_scenes.py --dataroot data/nuScenes --version v1.0-trainval \
      --out scenes_meta.json [--scenes_file val_scenes.txt]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shasta_tpu.preprocessing.nusc_db import NuscDB  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--scenes_file", default=None)
    args = ap.parse_args()

    scene_names = args.scenes
    if args.scenes_file:
        with open(args.scenes_file) as f:
            scene_names = [line.strip() for line in f if line.strip()]

    db = NuscDB(args.dataroot, args.version)
    scenes = {}
    for scene in db.scene:
        if scene_names is not None and scene["name"] not in scene_names:
            continue
        frames = [
            {
                "token": s["token"],
                "timestamp": s["timestamp"] * 1e-6,
                "first": s["prev"] == "",
            }
            for s in db.scene_samples(scene)
        ]
        scenes[scene["name"]] = frames
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"scenes": scenes}, f)
    print(f"wrote {len(scenes)} scenes -> {args.out}")


if __name__ == "__main__":
    main()
