#!/usr/bin/env python
"""Waymo raw-data extraction: TFRecords + Objects bins -> MOT npz tree.

Equivalent of the reference's preprocessing/waymo_data drivers
(testset/{time_stamp,ego_info}.py, gt_bin_decode.py, detection.py): per
segment it writes ts_info/, ego_info/, gt_info/ and detections/{name}/dets/.
Both the TFRecord framing and the Frame/Objects protos are read
dependency-free (shasta_tpu.data.{tfrecord,waymo_protos}); the optional
waymo-open-dataset package is used when installed.

Usage:
  python tools/extract_waymo.py --data_folder waymo/validation \
      --output_folder waymo/mot [--gt_bin gt.bin] \
      [--det_bin dets.bin --det_name cp] \
      [--raw_pc] [--ground_removal]   # testset chain (raw_pc.py + GPF)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_folder", required=True, help="dir of .tfrecord files")
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--gt_bin", default=None, help="GT Objects .bin (gt_bin_decode)")
    ap.add_argument("--det_bin", default=None, help="detection Objects .bin")
    ap.add_argument("--det_name", default="cp")
    ap.add_argument("--no_frame_gt", action="store_true",
                    help="skip in-record laser_labels GT (use --gt_bin instead)")
    ap.add_argument("--raw_pc", action="store_true",
                    help="decode range images -> pc/raw_pc/{seg}.npz "
                         "(testset/raw_pc.py chain)")
    ap.add_argument("--ground_removal", action="store_true",
                    help="GPF split of pc/raw_pc -> pc/{clean_pc,ground_pc}")
    args = ap.parse_args()

    from shasta_tpu.data.waymo import decode_objects_bin, extract_waymo_segment

    records = sorted(
        f for f in os.listdir(args.data_folder) if "tfrecord" in f
    )
    for i, rec in enumerate(records):
        seg = extract_waymo_segment(
            os.path.join(args.data_folder, rec), args.output_folder,
            with_gt=not (args.no_frame_gt or args.gt_bin),
        )
        print(f"[{i + 1}/{len(records)}] extracted {seg}")

    if args.gt_bin:
        segs = decode_objects_bin(args.gt_bin, args.output_folder, "gt_info")
        print(f"decoded GT bin -> gt_info/ ({len(segs)} segments)")
    if args.det_bin:
        segs = decode_objects_bin(
            args.det_bin, args.output_folder,
            os.path.join("detections", args.det_name, "dets"),
            with_velocity=True,
        )
        print(f"decoded detection bin -> detections/{args.det_name}/dets/ "
              f"({len(segs)} segments)")

    if args.raw_pc:
        from shasta_tpu.data.waymo_decode import extract_raw_pc

        raw_dir = os.path.join(args.output_folder, "pc", "raw_pc")
        for i, rec in enumerate(records):
            seg = extract_raw_pc(os.path.join(args.data_folder, rec), raw_dir)
            print(f"[{i + 1}/{len(records)}] raw pc {seg}")
    if args.ground_removal:
        from shasta_tpu.preprocessing.waymo_ground import remove_ground_tree

        pc = os.path.join(args.output_folder, "pc")
        done = remove_ground_tree(
            os.path.join(pc, "raw_pc"), os.path.join(pc, "clean_pc"),
            os.path.join(pc, "ground_pc"),
        )
        print(f"ground removal over {len(done)} segments")


if __name__ == "__main__":
    main()
