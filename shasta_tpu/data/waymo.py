"""Waymo tracking support (artifact-level).

Behavioral reference: det3d/datasets/waymo/waymo.py:19 (WaymoDataset) and
preprocessing/waymo_data/*.py (per-scene npz extraction: dets, ego, gt,
point clouds, timestamps). The reference's tracking pipeline is only
partially wired for Waymo (SURVEY §2.2); here the classical-MOT and
gt-association paths are fully supported on the extracted npz tree, and
the raw TFRecord extraction is gated behind the optional
waymo-open-dataset dependency (not available in this image).

Artifact contract per scene (matching the reference's extraction):
  detections/{name}/dets/{segment}.npz      bboxes/types[/velos] per frame
  ego_info/{segment}.npz                    4x4 ego poses per frame
  gt_info/{segment}.npz                     bboxes/ids/types per frame
  ts_info/{segment}.json                    frame timestamps
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

WAYMO_CLASSES = ("vehicle", "pedestrian", "cyclist")


@dataclass
class WaymoScene:
    segment: str
    dets: list[np.ndarray]  # per frame (N, 8) mot arrays
    det_types: list[list[str]]
    gts: list[np.ndarray]
    gt_types: list[list[str]]
    gt_ids: list[list]
    ego: list[np.ndarray]  # per frame 4x4
    timestamps: list[float]


def load_waymo_scene(data_dir: str, segment: str, det_name: str = "cp") -> WaymoScene:
    det = np.load(
        os.path.join(data_dir, "detections", det_name, "dets", segment + ".npz"),
        allow_pickle=True,
    )
    gt = np.load(os.path.join(data_dir, "gt_info", segment + ".npz"), allow_pickle=True)
    ego = np.load(os.path.join(data_dir, "ego_info", segment + ".npz"), allow_pickle=True)
    with open(os.path.join(data_dir, "ts_info", segment + ".json")) as f:
        timestamps = json.load(f)

    def rows(arr):
        return [np.asarray(a, np.float64).reshape(-1, 8) if len(a) else np.zeros((0, 8))
                for a in arr]

    n = len(det["bboxes"])
    return WaymoScene(
        segment=segment,
        dets=rows(det["bboxes"]),
        det_types=[list(t) for t in det["types"]],
        gts=rows(gt["bboxes"]),
        gt_types=[list(t) for t in gt["types"]],
        gt_ids=[list(i) for i in gt["ids"]],
        ego=[np.asarray(ego[str(i)]).reshape(4, 4) for i in range(n)],
        timestamps=list(timestamps)[:n],
    )


def waymo_scene_to_mot_frames(scene: WaymoScene):
    """FrameData stream for shasta_tpu.mot.MOTModel over one segment."""
    from ..mot.mot_model import FrameData

    for i in range(len(scene.dets)):
        yield FrameData(
            dets=scene.dets[i],
            det_types=scene.det_types[i],
            gt_dets=scene.gts[i],
            gt_types=scene.gt_types[i],
            gt_ids=scene.gt_ids[i],
            ego=scene.ego[i],
            time_stamp=scene.timestamps[i],
        )


def extract_waymo_segment(tfrecord_path: str, out_dir: str):  # pragma: no cover
    """TFRecord -> npz extraction (preprocessing/waymo_data equivalents).

    Requires waymo-open-dataset + tensorflow, which are not in this image;
    the artifact formats above are produced by either this function (when
    the deps exist) or any external extractor following the contract.
    """
    try:
        import tensorflow  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "waymo-open-dataset/tensorflow are required for raw TFRecord "
            "extraction; provide pre-extracted npz artifacts instead "
            "(see module docstring for the contract)"
        ) from e
    raise NotImplementedError(
        "raw Waymo extraction pending a waymo-open-dataset-enabled image"
    )
