import json

import numpy as np

from fixtures_nusc import build_micro_nusc
from shasta_tpu.data.submission import sensor_dets_to_global_annos
from shasta_tpu.mot.validity import Validity
from shasta_tpu.preprocessing.nusc_db import NuscDB


def test_sensor_to_global_roundtrip(tmp_path):
    fx = build_micro_nusc(tmp_path)
    db = NuscDB(str(fx["root"]), "v1.0-mini")
    tok = fx["tokens"][0]
    # ego at origin, sensor at (0.9, 0, 1.8): sensor det at x=9.2 -> global 10.1
    boxes = np.array([[9.2, -0.05, 0.5 - 1.8, 2.0, 4.5, 1.6, 0.0, 4.0, 0.0]])
    annos = sensor_dets_to_global_annos(db, tok, boxes, [0.9], ["car"])
    np.testing.assert_allclose(annos[0]["translation"][:2], [10.1, -0.05], atol=1e-6)
    assert annos[0]["attribute_name"] == "vehicle.moving"  # |v| > 0.2
    # stationary pedestrian
    boxes2 = np.array([[1.0, 0.0, 0.0, 0.6, 0.6, 1.7, 0.0, 0.0, 0.0]])
    a2 = sensor_dets_to_global_annos(db, tok, boxes2, [0.8], ["pedestrian"])
    assert a2[0]["attribute_name"] == "pedestrian.standing"


def test_validity_strings():
    assert Validity.valid("birth_2")
    assert Validity.valid("alive_1_0")
    assert not Validity.valid("alive_0_2")
    assert Validity.notoutput("alive_0_2")
    assert not Validity.notoutput("alive_1_0")
    assert Validity.agein2hz("alive_1_3") == 3


def test_fbkf_motion_model():
    from shasta_tpu.mot.kalman import FrameBasedKalmanFilterMotionModel

    kf = FrameBasedKalmanFilterMotionModel(
        np.array([0.0, 0, 0, 0, 4, 2, 1.5, 0.9]), "car", 0.0
    )
    for i in range(1, 6):
        kf.get_prediction(float(i))  # timestamps ignored by fbkf
        kf.update(np.array([i * 1.0, 0, 0, 0, 4, 2, 1.5, 0.9]))
    pred = kf.get_prediction(99.0)  # still one frame step
    assert 5.3 < pred[0] < 7.0, pred[0]
