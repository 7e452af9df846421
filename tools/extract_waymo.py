#!/usr/bin/env python
"""Waymo raw-data extraction: TFRecords + Objects bins -> MOT npz tree.

Equivalent of the reference's preprocessing/waymo_data drivers
(testset/{time_stamp,ego_info}.py, gt_bin_decode.py, detection.py): per
segment it writes ts_info/, ego_info/, gt_info/ and detections/{name}/dets/.
TFRecord framing is read dependency-free; parsing the Frame/Objects protos
needs the optional waymo-open-dataset package.

Usage:
  python tools/extract_waymo.py --data_folder waymo/validation \
      --output_folder waymo/mot [--gt_bin gt.bin] \
      [--det_bin dets.bin --det_name cp]
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


if __name__ == "__main__":
    main()
