"""Release-scale frozen goldens (VERDICT r4 #6).

The micro goldens (test_golden_regression.py) cannot catch regressions
that only appear at the real serving shapes — the round-4 coverage-miss
incident hit at V=120k while every micro test stayed green. This gate
pins, at the full car-scale bench shape (V=120k, max_obj=90, the same
synthetic frame bench.py serves):

  - the HOST PLANNER's packed plans (exact checksums: PosWords, window
    bases, strided output keys — shasta_tpu/plans.py is pure numpy so
    the check is platform-independent and fast), and
  - the XLA trunk + affinity outputs (fingerprint: mean/std + sampled
    values, atol-gated — catches numeric drift in the backbone math
    itself, independent of the Pallas kernels).

The Pallas kernels themselves are pinned against this same XLA path by
the block-conv/window-conv parity tests; with the planner and XLA path
pinned HERE at release scale, a knob or kernel change that shifts
release-scale numerics fails before it reaches a bench.

Regenerate intentionally with:
  GOLDEN_REGEN=1 pytest tests/test_golden_release_scale.py
"""
import json
import os
import zlib

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "release_scale.json")
V = 120000


def _crc(a: np.ndarray) -> int:
    return zlib.crc32(np.ascontiguousarray(a).tobytes())


def test_release_scale_planner_and_trunk_goldens():
    import jax.numpy as jnp

    from shasta_tpu import plans as hp
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig, ShastaModel

    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       assume_sorted_voxels=True)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60,
                       seed=0)

    # ---- host planner checksums (exact) -------------------------------
    fp = hp.frame_plans(batch["coordinates"][0], batch["voxels_valid"][0],
                        cfg)
    assert fp.ok
    got = {"planner": {k: _crc(v) for k, v in sorted(fp.arrays.items())}}

    # ---- XLA trunk + affinity fingerprint ------------------------------
    model = ShastaModel(cfg)
    rng = np.random.default_rng(0)
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(0, 0.05, s.shape).astype(np.float32)
            if s.dtype == jnp.float32 else np.ones(s.shape, s.dtype)),
        var_shapes)
    frame = {k: jnp.asarray(batch[k]) for k in
             ("voxels", "num_points", "coordinates", "voxels_valid",
              "det_boxes")}
    feat = model.apply(variables, frame, train=False,
                       method=ShastaModel.frame_features)
    m1, m2 = model.apply(variables, frame["det_boxes"], frame["det_boxes"],
                         feat, feat, method=ShastaModel.affinity_step)
    sample_idx = [0, 17, 41, 88]
    got["trunk"] = {
        "feat_mean": float(np.asarray(feat).mean()),
        "feat_std": float(np.asarray(feat).std()),
        "feat_rows": np.asarray(feat)[0, sample_idx, :4].reshape(-1).tolist(),
        "m1_mean": float(np.asarray(m1).mean()),
        "m2_mean": float(np.asarray(m2).mean()),
        "m1_row0": np.asarray(m1)[0, 0, :6].tolist(),
    }

    if os.environ.get("GOLDEN_REGEN") or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        if not os.environ.get("GOLDEN_REGEN"):
            pytest.skip("release-scale golden frozen (first run)")
        return

    with open(GOLDEN) as f:
        want = json.load(f)
    assert got["planner"] == want["planner"], (
        "HOST PLANNER output changed at release scale — if intentional, "
        "regenerate with GOLDEN_REGEN=1")
    for k, v in want["trunk"].items():
        np.testing.assert_allclose(
            np.asarray(got["trunk"][k], np.float64),
            np.asarray(v, np.float64), atol=2e-3, rtol=1e-3,
            err_msg=f"trunk fingerprint '{k}' drifted at release scale")
