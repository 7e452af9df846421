import numpy as np

from shasta_tpu.mot import MOTModel, FrameData, KalmanFilterMotionModel
from shasta_tpu.mot.mot_model import DEFAULT_CONFIG
from shasta_tpu.mot.hit_manager import HitManager
from shasta_tpu.mot.association import associate_dets_to_tracks, greedy_matcher


def _mot_box(x, y, o=0.0, l=4.0, w=2.0, h=1.5, s=0.9, z=0.0):
    return np.array([x, y, z, o, l, w, h, s])


def test_kalman_convergence():
    # constant-velocity target: KF should track position after a few updates
    ts = 0.0
    kf = KalmanFilterMotionModel(_mot_box(0, 0), "car", ts)
    for i in range(1, 8):
        ts = i * 0.5
        kf.get_prediction(ts)
        kf.update(_mot_box(i * 1.0, 0))
    pred = kf.get_prediction(4.0)
    # next prediction continues the motion: x ~ 7 + v*0.5 with v ~ 2 m/s
    assert 7.2 < pred[0] < 8.5, pred[0]
    assert abs(pred[1]) < 0.2


def test_kalman_yaw_flip_correction():
    kf = KalmanFilterMotionModel(_mot_box(0, 0, o=0.0), "car", 0.0)
    kf.get_prediction(0.5)
    # detection with yaw flipped by ~pi: filter should flip its state rather
    # than average the angles
    kf.update(_mot_box(0.5, 0, o=np.pi - 0.05))
    yaw = kf.x[3]
    # state yaw should be near +-pi (flipped), not near pi/2
    assert abs(abs(yaw) - np.pi) < 0.3, yaw


def test_hit_manager_birth_death():
    cfg = {"running": {"max_age_since_update": 2, "min_hits_to_birth": 0}}
    hm = HitManager(cfg, frame_index=5)
    assert hm.state == "alive"
    hm.predict()
    hm.update(0, 6)
    hm.predict()
    hm.update(0, 7)
    assert hm.state == "dead"


def test_association_greedy_global_order():
    # greedy picks globally smallest distance first
    dist = np.array([[0.5, 0.1], [0.2, 0.6]])
    pairs = greedy_matcher(dist)
    assert pairs.tolist() == [[0, 1], [1, 0]]


def test_association_threshold_rejection():
    dets = np.array([_mot_box(0, 0), _mot_box(100, 100)])
    trks = np.array([_mot_box(0.2, 0), _mot_box(50, 50)])
    matches, ud, ut = associate_dets_to_tracks(dets, trks, "bipartite", "euler", 4.0)
    assert matches == [(0, 0)]
    assert 1 in ud and 1 in ut


def test_mot_model_track_lifecycle():
    m = MOTModel()
    d0 = np.array([_mot_box(0, 0), _mot_box(20, 0)])
    out = m.frame_mot(FrameData(dets=d0, time_stamp=0.0, det_types=["car", "car"]))
    assert len(out) == 2
    ids0 = sorted(t[1] for t in out)
    # move both targets; same ids persist
    d1 = np.array([_mot_box(0.5, 0), _mot_box(20.5, 0)])
    out = m.frame_mot(FrameData(dets=d1, time_stamp=0.5, det_types=["car", "car"]))
    assert sorted(t[1] for t in out) == ids0
    # drop one target for > max_age frames; its track dies
    for i in range(2, 6):
        d = np.array([_mot_box(0.5 * i, 0)])
        out = m.frame_mot(FrameData(dets=d, time_stamp=0.5 * i, det_types=["car"]))
    assert len(m.trackers) == 1


def test_mot_oracle_dets_filters_fps():
    m = MOTModel(oracle="dets")
    dets = np.array([_mot_box(0, 0, s=0.9), _mot_box(50, 50, s=0.8)])
    gt = np.array([_mot_box(0.2, 0)])
    fd = FrameData(
        dets=dets, time_stamp=0.0, det_types=["car", "car"],
        gt_dets=gt, gt_types=["vehicle.car"], gt_ids=["a"],
    )
    out = m.frame_mot(fd)
    assert len(out) == 1  # the far FP was filtered out
