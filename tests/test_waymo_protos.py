"""Wire-format tests for the dependency-free Waymo proto codec."""
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from shasta_tpu.data import waymo_protos as wp


def test_roundtrip_objects():
    objs = [
        {
            "object": {
                "box": {"center_x": 1.5, "center_y": -2.25, "center_z": 0.5,
                        "length": 4.2, "width": 1.8, "height": 1.6,
                        "heading": -0.3},
                "type": wp.TYPE_VEHICLE,
                "id": "trk-7",
                "num_lidar_points_in_box": 42,
                "metadata": {"speed_x": 1.0, "speed_y": -0.5},
            },
            "score": 0.875,
            "frame_timestamp_micros": 1550083467346370,
            "context_name": "segment-123",
        },
        {
            "object": {"box": {"center_x": 0.0}, "type": wp.TYPE_CYCLIST},
            "score": 0.25,
            "frame_timestamp_micros": 1550083467446370,
            "context_name": "segment-123",
        },
    ]
    dec = wp.parse_objects(wp.encode_objects(objs))
    assert len(dec.objects) == 2
    o = dec.objects[0]
    assert o.context_name == "segment-123"
    assert o.frame_timestamp_micros == 1550083467346370
    assert abs(o.score - 0.875) < 1e-7
    assert o.object.box.length == 4.2 and o.object.box.width == 1.8
    assert o.object.type == 1 and o.object.id == "trk-7"
    assert o.object.metadata.speed_y == -0.5
    # proto defaults for absent fields
    assert dec.objects[1].object.num_lidar_points_in_box == 0
    assert dec.objects[1].object.id == ""
    assert dec.objects[1].object.metadata.speed_x == 0.0


def test_roundtrip_frame():
    tf = list(np.arange(16, dtype=float))
    fr = {
        "context": {"name": "ctx-1",
                    "stats": {"location": "location_sf", "time_of_day": "Day"}},
        "timestamp_micros": 1550083467346370,
        "pose": {"transform": tf},
        "laser_labels": [
            {"box": {"center_x": 1.0, "length": 4.0, "width": 2.0,
                     "height": 1.5, "heading": 0.1},
             "type": wp.TYPE_PEDESTRIAN, "id": "gt-1",
             "num_lidar_points_in_box": 7,
             "detection_difficulty_level": 2},
        ],
    }
    dec = wp.parse_frame(wp.encode_frame(fr))
    assert dec.context.name == "ctx-1"
    assert dec.context.stats.location == "location_sf"
    assert dec.pose.transform == tf
    lab = dec.laser_labels[0]
    assert lab.type == 2 and lab.detection_difficulty_level == 2
    assert lab.num_lidar_points_in_box == 7


def test_negative_varint_roundtrip():
    objs = [{"frame_timestamp_micros": -5, "score": 0.0, "context_name": "s"}]
    dec = wp.parse_objects(wp.encode_objects(objs))
    assert dec.objects[0].frame_timestamp_micros == -5


PROTO_SRC = """
syntax = "proto2";
package shastatest;
message Box {
  optional double center_x = 1;
  optional double center_y = 2;
  optional double center_z = 3;
  optional double width = 4;
  optional double length = 5;
  optional double height = 6;
  optional double heading = 7;
}
message Metadata {
  optional double speed_x = 1;
  optional double speed_y = 2;
  optional double accel_x = 3;
  optional double accel_y = 4;
}
message Label {
  optional Box box = 1;
  optional Metadata metadata = 2;
  optional int32 type = 3;
  optional string id = 4;
  optional int32 detection_difficulty_level = 5;
  optional int32 tracking_difficulty_level = 6;
  optional int32 num_lidar_points_in_box = 7;
}
message Object {
  optional Label object = 1;
  optional float score = 2;
  optional bool overlap_with_nlz = 3;
  optional int64 frame_timestamp_micros = 4;
  optional string context_name = 5;
}
message Objects {
  repeated Object objects = 1;
}
"""


def test_wire_format_matches_real_protobuf(tmp_path):
    """Cross-validate the hand-rolled codec against protoc + the real
    protobuf runtime: bytes we encode must parse identically there, and
    bytes protobuf encodes must parse identically here."""
    proto = tmp_path / "shastatest.proto"
    proto.write_text(PROTO_SRC)
    r = subprocess.run(
        ["protoc", f"--python_out={tmp_path}", f"--proto_path={tmp_path}",
         str(proto)],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"protoc failed: {r.stderr[:200]}")
    sys.path.insert(0, str(tmp_path))
    try:
        try:
            import shastatest_pb2  # noqa: F401
        except Exception as e:  # gencode/runtime version mismatch
            pytest.skip(f"generated proto unusable: {e}")
        pb = shastatest_pb2

        objs = [{
            "object": {
                "box": {"center_x": 1.5, "center_y": -2.0, "length": 4.2,
                        "width": 1.8, "height": 1.6, "heading": 0.25},
                "type": 1, "id": "t1", "num_lidar_points_in_box": 9,
                "metadata": {"speed_x": 0.5, "speed_y": -1.5},
            },
            "score": 0.5,
            "frame_timestamp_micros": 1550083467346370,
            "context_name": "seg",
        }]
        mine = wp.encode_objects(objs)
        theirs = pb.Objects()
        theirs.ParseFromString(mine)
        o = theirs.objects[0]
        assert o.context_name == "seg"
        assert o.frame_timestamp_micros == 1550083467346370
        assert o.object.box.length == 4.2 and o.object.box.width == 1.8
        assert o.object.box.heading == 0.25
        assert o.object.type == 1 and o.object.id == "t1"
        assert o.object.metadata.speed_y == -1.5
        assert o.object.num_lidar_points_in_box == 9

        back = wp.parse_objects(theirs.SerializeToString())
        b = back.objects[0]
        assert b.object.box.center_y == -2.0
        assert abs(b.score - 0.5) < 1e-7
    finally:
        sys.path.remove(str(tmp_path))
