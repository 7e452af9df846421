"""Waymo full-frame decode, infos sweep chains, official pd/gt bins.

Oracle strategy: geometric invariants for the range-image math (a decoded
point must sit at its range along its beam), scalar transliteration of
waymo_decoder.py:164-207 for object extraction, and synthetic pkl/TFRecord
trees for the infos + pd-creation chains.
"""
import os
import pickle
import zlib

import numpy as np
import pytest

from shasta_tpu.data import waymo_protos as wp
from shasta_tpu.data.waymo_decode import (
    compute_inclination,
    create_gt_detection,
    create_pd_detection,
    decode_annos,
    extract_objects,
    extract_raw_pc,
    fill_infos,
    frame_name,
    global_vel_to_ref,
    load_waymo_points,
    range_image_to_points,
    reorganize_info,
    sort_frame,
    veh_pos_to_transform,
)


def _rt(yaw, t):
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = t
    return m


def test_range_image_to_points_distance_invariant(rng):
    H, W = 8, 64
    ri = np.zeros((H, W, 4))
    ri[..., 0] = rng.uniform(1.0, 50.0, size=(H, W))
    ri[0, 0, 0] = -1.0  # empty pixel
    incl = np.linspace(0.3, -0.3, H)
    ext = _rt(0.7, [1.2, -0.5, 2.0])

    pts, mask = range_image_to_points(ri, ext, incl)
    assert mask.sum() == H * W - 1
    assert pts.shape == (H * W - 1, 6)
    # every point's distance from the SENSOR origin equals its range
    origin = ext[:3, 3]
    d = np.linalg.norm(pts[:, :3] - origin, axis=1)
    np.testing.assert_allclose(d, ri[..., 0][mask], rtol=1e-9)
    # elevation within the sensor frame equals the row inclination
    local = (np.linalg.inv(ext) @ np.concatenate(
        [pts[:, :3], np.ones((len(pts), 1))], 1).T).T[:, :3]
    elev = np.arcsin(local[:, 2] / np.linalg.norm(local, axis=1))
    expect = np.broadcast_to(incl[:, None], (H, W))[mask]
    np.testing.assert_allclose(elev, expect, atol=1e-9)


def test_range_image_pixel_pose_translation(rng):
    """A pure-translation pixel pose (== frame pose) must reproduce the
    no-pose decode exactly; a differing pixel pose shifts points by the
    relative translation."""
    H, W = 4, 16
    ri = np.zeros((H, W, 4))
    ri[..., 0] = rng.uniform(5.0, 20.0, size=(H, W))
    incl = np.linspace(0.2, -0.2, H)
    ext = np.eye(4)

    base, _ = range_image_to_points(ri, ext, incl)

    fp = _rt(0.0, [100.0, 50.0, 0.0])
    pp = np.broadcast_to(fp, (H, W, 4, 4)).copy()
    same, _ = range_image_to_points(ri, ext, incl, pixel_pose=pp, frame_pose=fp)
    np.testing.assert_allclose(same[:, :3], base[:, :3], atol=1e-9)

    pp2 = pp.copy()
    pp2[..., :3, 3] += [1.0, 2.0, 3.0]  # rolling-shutter drift
    moved, _ = range_image_to_points(ri, ext, incl, pixel_pose=pp2, frame_pose=fp)
    np.testing.assert_allclose(moved[:, :3] - base[:, :3],
                               np.tile([1.0, 2.0, 3.0], (len(base), 1)),
                               atol=1e-9)


def test_compute_inclination():
    incl = compute_inclination((-0.5, 0.5), 4)
    np.testing.assert_allclose(incl, [-0.375, -0.125, 0.125, 0.375])


def test_global_vel_to_ref_rotation():
    yaw = 0.6
    R = _rt(yaw, [0, 0, 0])[:3, :3]
    v_global = [2.0, 1.0]
    ref = global_vel_to_ref(v_global, R)
    # R^T v
    expect = R.T @ np.array([2.0, 1.0, 0.0])
    np.testing.assert_allclose(ref, expect, atol=1e-12)
    assert ref[2] == 0.0


def _mk_label(num_points, det_level, typ=1, lid="obj-1",
              speed=(1.0, 2.0), box=(1, 2, 0.5, 4, 2, 1.5, 0.3)):
    return wp.decode("Label", wp.encode("Label", {
        "box": {"center_x": box[0], "center_y": box[1], "center_z": box[2],
                "length": box[3], "width": box[4], "height": box[5],
                "heading": box[6]},
        "metadata": {"speed_x": speed[0], "speed_y": speed[1],
                     "accel_x": 0.1, "accel_y": -0.1},
        "type": typ, "id": lid,
        "num_lidar_points_in_box": num_points,
        "detection_difficulty_level": det_level,
    }))


def test_extract_objects_fields_and_difficulty():
    R = np.eye(3)
    objs = extract_objects(
        [_mk_label(10, 0), _mk_label(3, 0), _mk_label(0, 0), _mk_label(7, 2)],
        R,
    )
    # waymo_decoder.py:176-185 semantics (999 assignment is dead code)
    assert [o["combined_difficulty_level"] for o in objs] == [1, 2, 2, 2]
    o = objs[0]
    assert o["name"] == "obj-1" and o["label"] == 1 and o["num_points"] == 10
    np.testing.assert_allclose(o["box"][:6], [1, 2, 0.5, 4, 2, 1.5])
    np.testing.assert_allclose(o["box"][6:8], [1.0, 2.0])  # ref vel (R=I)
    assert o["box"][8] == np.float32(0.3)
    np.testing.assert_allclose(o["global_speed"], [1.0, 2.0])
    np.testing.assert_allclose(o["global_accel"], [0.1, -0.1])


def test_decode_annos_and_frame_name():
    pose = _rt(0.4, [10, 20, 0])
    frame = wp.parse_frame(wp.encode_frame({
        "context": {"name": "seg-A",
                    "stats": {"location": "location_phx", "time_of_day": "Night"}},
        "timestamp_micros": 777000,
        "pose": {"transform": list(pose.reshape(-1))},
        "laser_labels": [{"box": {"center_x": 1.0}, "type": 2, "id": "g",
                          "metadata": {"speed_x": 1.0, "speed_y": 0.0},
                          "num_lidar_points_in_box": 9}],
    }))
    assert frame_name(frame) == "seg-A_location_phx_Night_777000"
    annos = decode_annos(frame, 3)
    assert annos["frame_id"] == 3 and annos["scene_name"] == "seg-A"
    np.testing.assert_allclose(
        np.reshape(annos["veh_to_global"], (4, 4)), pose)
    # velocity rotated into the ref frame by the pose rotation
    np.testing.assert_allclose(
        annos["objects"][0]["box"][6:8],
        (pose[:3, :3].T @ [1.0, 0.0, 0.0])[:2], atol=1e-6)


def test_veh_pos_to_transform_inverse():
    pose = _rt(1.1, [5, -3, 2])
    g_from_c, c_from_g = veh_pos_to_transform(pose)
    np.testing.assert_allclose(g_from_c @ c_from_g, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(g_from_c, pose)


def _write_anno_pkl(root, split, seq, frame, pose, objects, ts_micros):
    name = f"seq_{seq}_frame_{frame}.pkl"
    os.makedirs(os.path.join(root, split, "annos"), exist_ok=True)
    os.makedirs(os.path.join(root, split, "lidar"), exist_ok=True)
    with open(os.path.join(root, split, "annos", name), "wb") as f:
        pickle.dump({
            "scene_name": f"scene-{seq}",
            "frame_name": f"scene-{seq}_loc_Day_{ts_micros}",
            "frame_id": frame,
            "veh_to_global": np.asarray(pose, np.float64).reshape(-1),
            "objects": objects,
        }, f)
    with open(os.path.join(root, split, "lidar", name), "wb") as f:
        pickle.dump({"lidars": {"points_xyz": np.zeros((1, 3))}}, f)
    return name


def _obj(box9, label=1, num_points=5, name="gt-0"):
    return {"id": 0, "name": name, "label": label,
            "box": np.asarray(box9, np.float32), "num_points": num_points,
            "detection_difficulty_level": 0, "combined_difficulty_level": 1,
            "global_speed": np.zeros(2, np.float32),
            "global_accel": np.zeros(2, np.float32)}


def test_fill_infos_sweep_chain(tmp_path):
    """Sweep k's transform_matrix must map sweep-frame points into the
    reference frame: ref_from_global @ global_from_car (waymo_common.py
    :241-244)."""
    root = str(tmp_path)
    p0 = _rt(0.0, [0, 0, 0])
    p1 = _rt(0.3, [10, 5, 0])
    p2 = _rt(0.6, [20, 12, 0])
    _write_anno_pkl(root, "train", 0, 0, p0, [_obj([0] * 9)], 1000000)
    _write_anno_pkl(root, "train", 0, 1, p1, [_obj([0] * 9)], 1100000)
    _write_anno_pkl(root, "train", 0, 2, p2,
                    [_obj([1, 2, 0.5, 4, 2, 1.5, 0, 0, 0.3]),
                     _obj([9, 9, 9, 1, 1, 1, 0, 0, 0], num_points=0)],
                    1200000)

    frames = sort_frame(os.listdir(os.path.join(root, "train", "lidar")))
    infos = fill_infos(root, frames, "train", nsweeps=3)
    assert len(infos) == 3

    info2 = infos[2]  # seq_0_frame_2: sweeps are frames 1 and 0
    assert len(info2["sweeps"]) == 2
    tm1 = info2["sweeps"][0]["transform_matrix"]
    # a point fixed in the GLOBAL frame appears consistent: x_ref = tm @ x_sweep
    x_global = np.array([15.0, 8.0, 1.0, 1.0])
    x_sweep = np.linalg.inv(p1) @ x_global
    x_ref = np.linalg.inv(p2) @ x_global
    np.testing.assert_allclose(tm1 @ x_sweep, x_ref, atol=1e-9)
    assert abs(info2["sweeps"][0]["time_lag"] - 0.1) < 1e-9
    # first frame pads with a self-sweep (transform None)
    assert infos[0]["sweeps"][0]["transform_matrix"] is None
    assert infos[0]["sweeps"][1] is infos[0]["sweeps"][0]

    # KITTI conversion + zero-point filtering of gt
    gtb = info2["gt_boxes"]
    assert gtb.shape == (1, 9)
    assert abs(gtb[0, -1] - (-np.pi / 2 - 0.3)) < 1e-6
    np.testing.assert_allclose(gtb[0, [3, 4]], [2, 4])  # l/w swapped


def test_create_pd_detection_tracking_bin(tmp_path):
    root = str(tmp_path)
    pose = _rt(0.0, [0, 0, 0])
    token = _write_anno_pkl(root, "val", 1, 0, pose, [_obj([0] * 9)], 5550000)
    infos = reorganize_info(fill_infos(
        root, [token], "val", nsweeps=1))

    dets = {token: {
        "box3d_lidar": np.array([[1.0, 2.0, 0.5, 2.0, 4.0, 1.5, 0.25]]),
        "scores": np.array([0.9]),
        "label_preds": np.array([0]),   # -> TYPE_VEHICLE
        "tracking_ids": np.array([17]),
    }}
    path = create_pd_detection(dets, infos, root, tracking=True)
    objs = wp.parse_objects(open(path, "rb").read()).objects
    assert len(objs) == 1
    o = objs[0]
    assert o.context_name == "scene-1"
    assert o.frame_timestamp_micros == 5550000
    assert o.object.type == 1
    # KITTI -> Waymo: w/l swap and heading -r - pi/2 (waymo_common.py:67-72)
    assert abs(o.object.box.length - 4.0) < 1e-9
    assert abs(o.object.box.width - 2.0) < 1e-9
    assert abs(o.object.box.heading - (-0.25 - np.pi / 2)) < 1e-9
    assert len(o.object.id) == 32  # uuid hex, stable per tracking id

    # same tracking id -> same uuid across frames
    path2 = create_pd_detection(dets, infos, root, tracking=True)
    o2 = wp.parse_objects(open(path2, "rb").read()).objects[0]
    assert isinstance(o2.object.id, str)


def test_create_gt_detection_bin(tmp_path):
    root = str(tmp_path)
    pose = _rt(0.0, [0, 0, 0])
    token = _write_anno_pkl(
        root, "val", 2, 0, pose,
        [_obj([1, 2, 0.5, 4, 2, 1.5, 0, 0, 0.3], num_points=12),
         _obj([0] * 9, num_points=0),        # filtered: no points
         _obj([0] * 9, label=0, num_points=5)],  # filtered: UNKNOWN
        123000,
    )
    infos = fill_infos(root, [token], "val", nsweeps=1)
    path = create_gt_detection(infos, root)
    objs = wp.parse_objects(open(path, "rb").read()).objects
    assert len(objs) == 1
    o = objs[0]
    assert o.object.num_lidar_points_in_box == 12
    assert o.object.type == 1 and o.score == 1.0
    assert abs(o.object.box.heading - 0.3) < 1e-6  # waymo-frame heading kept


def _mk_matrix_float(arr):
    return {"data": [float(x) for x in np.asarray(arr).reshape(-1)],
            "shape": {"dims": list(arr.shape)}}


def test_extract_raw_pc_and_ground_removal(tmp_path):
    """Synthetic round trip: Frame protos with zlib range images ->
    raw_pc npz -> GPF ground removal (testset chain)."""
    from shasta_tpu.data.tfrecord import write_tfrecord
    from shasta_tpu.preprocessing.waymo_ground import get_ground, remove_ground_tree

    rng = np.random.default_rng(1)
    H, W = 4, 32
    ri = np.zeros((H, W, 4))
    ri[..., 0] = rng.uniform(2.0, 10.0, size=(H, W))
    incl = np.linspace(0.1, -0.1, H)[::-1]  # stored bottom-up, decoder reverses

    frame = {
        "context": {
            "name": "segment-77",
            "stats": {"location": "loc", "time_of_day": "Day"},
            "laser_calibrations": [{
                "name": 2,  # FRONT: no pixel pose needed
                "beam_inclinations": [float(x) for x in incl],
                "extrinsic": {"transform": list(np.eye(4).reshape(-1))},
            }],
        },
        "timestamp_micros": 1000,
        "pose": {"transform": list(np.eye(4).reshape(-1))},
        "lasers": [{
            "name": 2,
            "ri_return1": {"range_image_compressed": zlib.compress(
                wp.encode("MatrixFloat", _mk_matrix_float(ri)))},
            "ri_return2": {},
        }],
    }
    rec = str(tmp_path / "segment-77.tfrecord")
    write_tfrecord(rec, [wp.encode_frame(frame)])

    raw_dir = str(tmp_path / "pc" / "raw_pc")
    seg = extract_raw_pc(rec, raw_dir)
    assert seg == "segment-77"
    pc = np.load(os.path.join(raw_dir, seg + ".npz"))["0"]
    assert pc.shape == (H * W, 3)
    # range invariant survives the whole proto+zlib round trip
    np.testing.assert_allclose(
        np.linalg.norm(pc, axis=1), ri[..., 0].reshape(-1), rtol=1e-6)

    # ground removal over a synthetic scene: flat floor + a box above it
    floor = np.concatenate([
        rng.uniform(-20, 20, size=(500, 2)),
        rng.normal(0, 0.02, size=(500, 1)),
    ], axis=1)
    box = np.concatenate([
        rng.uniform(-2, 2, size=(100, 2)),
        rng.uniform(1.0, 2.0, size=(100, 1)),
    ], axis=1)
    ground, clean = get_ground(np.concatenate([floor, box]))
    assert len(ground) >= 490  # floor recovered
    assert len(clean) >= 95    # box preserved
    assert clean[:, 2].min() > 0.3

    np.savez_compressed(os.path.join(raw_dir, "seg2.npz"),
                        **{"0": np.concatenate([floor, box])})
    out = remove_ground_tree(raw_dir, str(tmp_path / "pc" / "clean_pc"),
                             str(tmp_path / "pc" / "ground_pc"))
    assert "seg2.npz" in out
    c = np.load(str(tmp_path / "pc" / "clean_pc" / "seg2.npz"))["0"]
    assert c[:, 2].min() > 0.3


def test_load_waymo_points_sweep_alignment(tmp_path):
    """Multi-sweep loading (loading.py:150-175): sweep points land in the
    reference frame via the info's transform chain, intensity is tanh'd,
    the time channel appends."""
    root = str(tmp_path)
    p_ref = _rt(0.5, [10, 0, 0])
    p_swp = _rt(0.0, [0, 0, 0])

    def _lidar(root, split, seq, frame, xyz, feat):
        name = f"seq_{seq}_frame_{frame}.pkl"
        with open(os.path.join(root, split, "lidar", name), "wb") as f:
            pickle.dump({"lidars": {
                "points_xyz": np.asarray(xyz, np.float64),
                "points_feature": np.asarray(feat, np.float64)}}, f)

    _write_anno_pkl(root, "train", 0, 0, p_swp, [_obj([0] * 9)], 1000000)
    _write_anno_pkl(root, "train", 0, 1, p_ref, [_obj([0] * 9)], 1100000)
    _lidar(root, "train", 0, 0, [[1.0, 2.0, 0.0]], [[2.0, 0.5]])
    _lidar(root, "train", 0, 1, [[5.0, 5.0, 1.0]], [[0.0, 0.1]])

    frames = sort_frame(os.listdir(os.path.join(root, "train", "lidar")))
    infos = fill_infos(root, frames, "train", nsweeps=2)
    pts = load_waymo_points(infos[1], nsweeps=2)
    assert pts.shape == (2, 6)
    # ref-frame point first, untouched; intensity tanh'd
    np.testing.assert_allclose(pts[0, :3], [5.0, 5.0, 1.0])
    np.testing.assert_allclose(pts[0, 3], np.tanh(0.0))
    assert pts[0, 5] == 0.0  # zero time lag on the ref frame
    # sweep point mapped through ref_from_global @ global_from_sweep
    x_global = p_swp @ np.array([1.0, 2.0, 0.0, 1.0])
    x_ref = np.linalg.inv(p_ref) @ x_global
    np.testing.assert_allclose(pts[1, :3], x_ref[:3], atol=1e-9)
    np.testing.assert_allclose(pts[1, 3], np.tanh(2.0))
    assert abs(pts[1, 5] - 0.1) < 1e-9  # time lag channel
