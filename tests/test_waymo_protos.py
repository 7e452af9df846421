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


# Transcription of the OFFICIAL waymo-open-dataset schemas (label.proto,
# metrics.proto, dataset.proto @ the frozen v1.x numbering), restricted to
# the messages this framework touches but including the neighbouring fields
# the codec intentionally skips (camera_calibrations, images, the deprecated
# uncompressed range_image, camera_projection_compressed) so a transcription
# error in shasta_tpu's SCHEMAS shows up as a wire mismatch here rather than
# round-tripping silently. NOT generated from SCHEMAS — edit only against
# the official proto files.
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
  optional string context_name = 4;
  optional int64 frame_timestamp_micros = 5;
}
message Objects {
  repeated Object objects = 1;
}
message Transform {
  repeated double transform = 1;
}
message MatrixShape {
  repeated int32 dims = 1;
}
message MatrixFloat {
  repeated float data = 1 [packed = true];
  optional MatrixShape shape = 2;
}
message CameraCalibration {
  optional int32 name = 1;
  repeated double intrinsic = 2;
  optional Transform extrinsic = 3;
  optional int32 width = 4;
  optional int32 height = 5;
}
message LaserCalibration {
  optional int32 name = 1;
  repeated double beam_inclinations = 2;
  optional double beam_inclination_min = 3;
  optional double beam_inclination_max = 4;
  optional Transform extrinsic = 5;
}
message Stats {
  optional string time_of_day = 2;
  optional string location = 3;
  optional string weather = 4;
}
message Context {
  optional string name = 1;
  repeated CameraCalibration camera_calibrations = 2;
  repeated LaserCalibration laser_calibrations = 3;
  optional Stats stats = 4;
}
message RangeImage {
  optional MatrixFloat range_image = 1 [deprecated = true];
  optional bytes range_image_compressed = 2;
  optional bytes camera_projection_compressed = 3;
  optional bytes range_image_pose_compressed = 4;
}
message Laser {
  optional int32 name = 1;
  optional RangeImage ri_return1 = 2;
  optional RangeImage ri_return2 = 3;
}
message CameraImage {
  optional int32 name = 1;
  optional bytes image = 2;
}
message Frame {
  optional Context context = 1;
  optional int64 timestamp_micros = 2;
  optional Transform pose = 3;
  repeated CameraImage images = 4;
  repeated Laser lasers = 5;
  repeated Label laser_labels = 6;
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


def test_frame_wire_format_matches_real_protobuf(tmp_path):
    """Frame/Context/Laser/RangeImage cross-check against protoc, with the
    officially-numbered fields the codec skips (camera_calibrations, images,
    deprecated range_image, camera_projection_compressed) POPULATED — this
    is the test that catches the round-3 field-number transcription bugs
    (laser_calibrations read from field 2, range_image_compressed from
    field 1), which pure codec round-trips cannot see."""
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

        fr = pb.Frame()
        fr.context.name = "segment-77"
        cam = fr.context.camera_calibrations.add()
        cam.name = 1
        cam.intrinsic.extend([2000.0, 2000.0, 960.0, 640.0])
        cam.width = 1920
        las = fr.context.laser_calibrations.add()
        las.name = 1
        las.beam_inclinations.extend([-0.3, -0.1, 0.05])
        las.beam_inclination_min = -0.3
        las.beam_inclination_max = 0.05
        las.extrinsic.transform.extend(list(range(16)))
        fr.context.stats.location = "location_phx"
        fr.context.stats.time_of_day = "Night"
        fr.timestamp_micros = 1550083467346370
        fr.pose.transform.extend([float(i) for i in range(16)])
        img = fr.images.add()
        img.name = 1
        img.image = b"\xff\xd8jpegjunk"
        laser = fr.lasers.add()
        laser.name = 1
        laser.ri_return1.range_image.data.extend([1.5, 2.5])  # deprecated f1
        laser.ri_return1.range_image_compressed = b"ZLIB-RI"
        laser.ri_return1.camera_projection_compressed = b"ZLIB-CP"
        laser.ri_return1.range_image_pose_compressed = b"ZLIB-POSE"
        lab = fr.laser_labels.add()
        lab.box.center_x = 3.25
        lab.box.length = 4.5
        lab.type = 1
        lab.id = "gt-9"

        dec = wp.parse_frame(fr.SerializeToString())
        assert dec.context.name == "segment-77"
        cal = dec.context.laser_calibrations[0]
        assert cal.name == 1
        assert cal.beam_inclinations == [-0.3, -0.1, 0.05]
        assert cal.beam_inclination_min == -0.3
        assert cal.extrinsic.transform == [float(i) for i in range(16)]
        assert dec.context.stats.location == "location_phx"
        assert dec.context.stats.time_of_day == "Night"
        assert dec.timestamp_micros == 1550083467346370
        ri = dec.lasers[0].ri_return1
        assert ri.range_image_compressed == b"ZLIB-RI"
        assert ri.range_image_pose_compressed == b"ZLIB-POSE"
        assert dec.laser_labels[0].box.center_x == 3.25
        assert dec.laser_labels[0].id == "gt-9"

        # and protobuf must parse what the codec encodes for Frame
        mine = wp.encode_frame({
            "context": {"name": "c2",
                        "laser_calibrations": [
                            {"name": 1, "beam_inclination_min": -0.2}]},
            "timestamp_micros": 7,
            "lasers": [{"name": 1,
                        "ri_return1": {"range_image_compressed": b"RI2"}}],
        })
        theirs = pb.Frame()
        theirs.ParseFromString(mine)
        assert theirs.context.name == "c2"
        assert theirs.context.laser_calibrations[0].beam_inclination_min == -0.2
        assert theirs.lasers[0].ri_return1.range_image_compressed == b"RI2"
    finally:
        sys.path.remove(str(tmp_path))
