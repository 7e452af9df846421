"""Waymo raw extraction: TFRecord framing + Frame/Objects decoding.

The whole chain runs on REAL protobuf wire bytes via the in-repo codec
(shasta_tpu.data.waymo_protos, protoc-cross-validated in
test_waymo_protos.py) — no waymo-open-dataset install and no fakes.
"""
import json
import os

import numpy as np
import pytest

from shasta_tpu.data.tfrecord import crc32c, read_tfrecord, write_tfrecord
from shasta_tpu.data import waymo_protos as wp


def test_crc32c_known_vector():
    # RFC 3720 test vector: crc32c("123456789") == 0xE3069283
    assert crc32c(b"123456789") == 0xE3069283


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    payloads = [b"hello", b"", os.urandom(1000)]
    write_tfrecord(path, payloads)
    got = list(read_tfrecord(path, verify_crc=True))
    assert got == payloads


def test_tfrecord_detects_corruption(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord(path, [b"abcdef"])
    raw = bytearray(open(path, "rb").read())
    raw[13] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(read_tfrecord(path, verify_crc=True))
    # without verification the (corrupt) payload is still framed correctly
    assert len(list(read_tfrecord(path))) == 1


def _frame_payload(ts, ego16, labels, name="segment-123"):
    return wp.encode_frame({
        "context": {"name": name,
                    "stats": {"location": "location_sf", "time_of_day": "Day"}},
        "timestamp_micros": ts,
        "pose": {"transform": [float(x) for x in ego16]},
        "laser_labels": labels,
    })


def _label(x, y, lid, typ=1, num_points=10):
    return {
        "box": {"center_x": float(x), "center_y": float(y), "center_z": 0.5,
                "heading": 0.1, "length": 4.5, "width": 2.0, "height": 1.6},
        "type": typ,
        "id": lid,
        "num_lidar_points_in_box": num_points,
        "metadata": {"speed_x": 1.0, "speed_y": 0.0},
    }


def test_extract_waymo_segment(tmp_path):
    from shasta_tpu.data.waymo import extract_waymo_segment

    seg_path = str(tmp_path / "segment-123_with_camera_labels.tfrecord")
    ego = list(np.eye(4).reshape(-1))
    frames = [
        _frame_payload(1000000, ego, [_label(10, 0, "a"), _label(20, 5, "b", 2)]),
        _frame_payload(1100000, ego, [_label(10.4, 0, "a")]),
    ]
    write_tfrecord(seg_path, frames)

    out = str(tmp_path / "mot")
    seg = extract_waymo_segment(seg_path, out)
    assert seg == "segment-123_with_camera_labels"

    ts = json.load(open(os.path.join(out, "ts_info", seg + ".json")))
    assert ts == [1000000, 1100000]
    ego_npz = np.load(os.path.join(out, "ego_info", seg + ".npz"))
    np.testing.assert_allclose(ego_npz["0"], np.eye(4))
    gt = np.load(os.path.join(out, "gt_info", seg + ".npz"), allow_pickle=True)
    assert len(gt["bboxes"]) == 2
    f0 = np.asarray(gt["bboxes"][0], float)
    assert f0.shape == (2, 8)
    # mot layout [x, y, z, heading, l, w, h, s]
    np.testing.assert_allclose(f0[0], [10, 0, 0.5, 0.1, 4.5, 2.0, 1.6, 1.0])
    assert list(gt["ids"][0]) == ["a", "b"]
    assert list(gt["types"][0]) == [1, 2]


def test_decode_objects_bin_dets_and_gt(tmp_path):
    from shasta_tpu.data.waymo import decode_objects_bin, extract_waymo_segment

    seg_path = str(tmp_path / "segment-123.tfrecord")
    ego = list(np.eye(4).reshape(-1))
    write_tfrecord(seg_path, [
        _frame_payload(1000000, ego, []),
        _frame_payload(1100000, ego, []),
    ])
    out = str(tmp_path / "mot")
    seg = extract_waymo_segment(seg_path, out, with_gt=False)

    objs = [
        {
            "context_name": "segment-123",
            "frame_timestamp_micros": 1000000,
            "score": 0.9,
            "object": {
                "box": {"center_x": 1, "center_y": 2, "center_z": 0.4,
                        "heading": 0.2, "length": 4, "width": 2, "height": 1.5},
                "type": 1, "id": "d0",
                "metadata": {"speed_x": 3.0, "speed_y": -1.0},
            },
        },
        {
            "context_name": "segment-123",
            "frame_timestamp_micros": 1100000,
            "score": 0.7,
            "object": {
                "box": {"center_x": 1.5, "center_y": 2, "center_z": 0.4,
                        "heading": 0.2, "length": 4, "width": 2, "height": 1.5},
                "type": 1, "id": "d1",
                "metadata": {"speed_x": 3.0, "speed_y": -1.0},
            },
        },
    ]
    bin_path = str(tmp_path / "dets.bin")
    open(bin_path, "wb").write(wp.encode_objects(objs))

    segs = decode_objects_bin(bin_path, out, os.path.join("detections", "cp", "dets"),
                              with_velocity=True)
    assert segs == [seg]
    d = np.load(os.path.join(out, "detections", "cp", "dets", seg + ".npz"),
                allow_pickle=True)
    assert len(d["bboxes"]) == 2
    np.testing.assert_allclose(
        np.asarray(d["bboxes"][0], float)[0],
        [1, 2, 0.4, 0.2, 4, 2, 1.5, 0.9],
    )
    np.testing.assert_allclose(np.asarray(d["velos"][0], float)[0], [3.0, -1.0])

    # the extracted tree now feeds the existing MOT bridge end-to-end
    # (needs gt_info too)
    decode_objects_bin(bin_path, out, "gt_info")
    from shasta_tpu.data.waymo import load_waymo_scene, waymo_scene_to_mot_frames

    scene = load_waymo_scene(out, seg)
    frames = list(waymo_scene_to_mot_frames(scene))
    assert len(frames) == 2 and frames[0].dets.shape[1] == 8


def test_write_objects_bin_roundtrip(tmp_path):
    """Official-eval bin writer (waymo_common.py:52-116 contract): what we
    write, decode_objects_bin reads back identically."""
    from shasta_tpu.data.waymo import decode_objects_bin, write_objects_bin
    from shasta_tpu.data.waymo import extract_waymo_segment

    # an extracted tree provides the ts_info the decoder aligns against
    seg_path = str(tmp_path / "segment-9.tfrecord")
    ego = list(np.eye(4).reshape(-1))
    write_tfrecord(seg_path, [_frame_payload(5000, ego, [], name="segment-9"),
                              _frame_payload(5500, ego, [], name="segment-9")])
    out = str(tmp_path / "mot")
    seg = extract_waymo_segment(seg_path, out, with_gt=False)

    segments = {
        seg: {
            "timestamps": [5000, 5500],
            "frames": [
                [{"bbox": [1, 2, 0.4, 0.2, 4, 2, 1.5, 0.9], "type": 1, "id": "t7"}],
                [{"bbox": [1.5, 2, 0.4, 0.2, 4, 2, 1.5, 0.8], "type": 1, "id": "t7"}],
            ],
        }
    }
    bin_path = str(tmp_path / "tracking_pred.bin")
    n = write_objects_bin(segments, bin_path)
    assert n == 2

    decode_objects_bin(bin_path, out, "pred_back")
    d = np.load(os.path.join(out, "pred_back", seg + ".npz"), allow_pickle=True)
    np.testing.assert_allclose(
        np.asarray(d["bboxes"][0], float)[0], [1, 2, 0.4, 0.2, 4, 2, 1.5, 0.9]
    )
    assert list(d["ids"][0]) == ["t7"] and list(d["ids"][1]) == ["t7"]


def test_eval_waymo_tracking_local(tmp_path):
    """Devkit-free CLEAR-MOT over the extracted tree: perfect hypotheses
    score MOTA 1.0; a broken-identity run shows id switches."""
    from shasta_tpu.data.waymo import eval_waymo_tracking, extract_waymo_segment

    seg_path = str(tmp_path / "segment-5.tfrecord")
    ego = list(np.eye(4).reshape(-1))
    write_tfrecord(seg_path, [
        _frame_payload(1000, ego, [_label(10, 0, "a")], name="segment-5"),
        _frame_payload(1500, ego, [_label(10.4, 0, "a")], name="segment-5"),
        _frame_payload(2000, ego, [_label(10.8, 0, "a")], name="segment-5"),
    ])
    out = str(tmp_path / "mot")
    seg = extract_waymo_segment(seg_path, out)

    perfect = {seg: [
        [{"id": "h1", "bbox": [10, 0, 0.5, 0.1, 4.5, 2, 1.6, 0.9], "type": 1}],
        [{"id": "h1", "bbox": [10.4, 0, 0.5, 0.1, 4.5, 2, 1.6, 0.9], "type": 1}],
        [{"id": "h1", "bbox": [10.8, 0, 0.5, 0.1, 4.5, 2, 1.6, 0.9], "type": 1}],
    ]}
    m = eval_waymo_tracking(out, perfect, types=(1,))
    assert m["vehicle"]["mota"] == 1.0

    switching = {seg: [
        [{"id": "h1", "bbox": [10, 0, 0.5, 0.1, 4.5, 2, 1.6, 0.9], "type": 1}],
        [{"id": "h2", "bbox": [10.4, 0, 0.5, 0.1, 4.5, 2, 1.6, 0.9], "type": 1}],
        [{"id": "h3", "bbox": [10.8, 0, 0.5, 0.1, 4.5, 2, 1.6, 0.9], "type": 1}],
    ]}
    m2 = eval_waymo_tracking(out, switching, types=(1,))
    assert m2["vehicle"]["mota"] < 1.0 and m2["vehicle"]["idsw"] == 2
