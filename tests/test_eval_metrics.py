import numpy as np

from shasta_tpu.mot.amota import evaluate_amota
from shasta_tpu.data.det_eval import evaluate_detection


def _scene(n_frames=20, n_obj=4, noise=0.1, score=0.9, drop_prob=0.0,
           fp_per_frame=0, seed=0):
    rng = np.random.default_rng(seed)
    gt_frames, hyp_frames = [], []
    vels = rng.uniform(-1, 1, (n_obj, 2))
    pos = rng.uniform(-20, 20, (n_obj, 2))
    for f in range(n_frames):
        pos = pos + vels * 0.5
        gt = [{"id": f"g{k}", "center": pos[k].copy()} for k in range(n_obj)]
        hyp = []
        for k in range(n_obj):
            if rng.random() < drop_prob:
                continue
            hyp.append({
                "id": k + 1,
                "center": pos[k] + rng.normal(0, noise, 2),
                "score": score + rng.normal(0, 0.02),
            })
        for _ in range(fp_per_frame):
            hyp.append({
                "id": int(rng.integers(1000, 2000)),
                "center": rng.uniform(-50, 50, 2),
                "score": 0.2,
            })
        gt_frames.append(gt)
        hyp_frames.append(hyp)
    return gt_frames, hyp_frames


def test_amota_perfect_tracker():
    gt, hyp = _scene()
    m = evaluate_amota(gt, hyp)
    assert m["amota"] > 0.95, m
    assert m["recall"] == 1.0
    assert m["amotp"] < 0.3


def test_amota_degrades_with_fp_and_misses():
    gt_a, hyp_a = _scene()
    gt_b, hyp_b = _scene(drop_prob=0.3, fp_per_frame=2, seed=1)
    good = evaluate_amota(gt_a, hyp_a)["amota"]
    bad = evaluate_amota(gt_b, hyp_b)["amota"]
    assert bad < good - 0.1, (good, bad)


def test_detection_map_perfect_and_noisy():
    gt, results = {}, {}
    rng = np.random.default_rng(0)
    for f in range(10):
        tok = f"t{f}"
        centers = rng.uniform(-30, 30, (5, 2))
        gt[tok] = [
            {"translation": [c[0], c[1], 0], "detection_name": "car"}
            for c in centers
        ]
        results[tok] = [
            {"translation": [c[0] + 0.1, c[1], 0], "detection_name": "car",
             "detection_score": 0.9}
            for c in centers
        ]
    m = evaluate_detection(gt, results, ["car"])
    assert m["mean_ap"] > 0.9, m
    # half the detections missing -> AP drops roughly in half
    results2 = {tok: annos[:2] for tok, annos in results.items()}
    m2 = evaluate_detection(gt, results2, ["car"])
    assert 0.2 < m2["mean_ap"] < 0.6, m2
