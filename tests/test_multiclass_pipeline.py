"""Shared-trunk multi-class inference: one trunk pass, per-class heads,
one merged on-device tracker table."""
import numpy as np
import jax
import jax.numpy as jnp

from shasta_tpu.data.synthetic import make_batch
from shasta_tpu.infer import MultiClassScenePipeline, default_tracker_params
from shasta_tpu.models import ShastaModel, ShastaConfig


def _mini_cfg(max_obj):
    return ShastaConfig(
        max_obj=max_obj, grid_shape=(41, 48, 48), pc_start=(-3.0, -3.0),
        cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128,
    )


def test_multiclass_shared_trunk(rng):
    car_cfg, bus_cfg = _mini_cfg(6), _mini_cfg(5)
    car, bus = ShastaModel(car_cfg), ShastaModel(bus_cfg)
    b = make_batch(car_cfg, 1, 512, n_dets=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    vc = car.init(jax.random.PRNGKey(0), batch, train=False)

    b4 = make_batch(bus_cfg, 1, 512, n_dets=3)
    batch4 = {k: jnp.asarray(v) for k, v in b4.items()}
    vb = bus.init(jax.random.PRNGKey(1), batch4, train=False)
    # share the frozen trunk (identical across the 7 released models)
    vb = jax.tree_util.tree_map(lambda x: x, vb)
    vb["params"] = dict(vb["params"])
    for part in ("backbone", "neck", "shared_conv"):
        vb["params"][part] = vc["params"][part]
        vb["batch_stats"][part] = vc["batch_stats"][part]

    pipe = MultiClassScenePipeline(
        class_heads={"car": (car, vc), "bus": (bus, vb)},
        trunk_key="car",
        params=default_tracker_params(max_age=4),
    )

    frame = {k: b[k] for k in ("voxels", "num_points", "coordinates", "voxels_valid")}
    car_boxes = b["det_boxes"]
    bus_boxes = b4["det_boxes"]

    out1 = pipe.step_frame(frame, {"car": (car_boxes, 4), "bus": (bus_boxes, 3)}, 0.5)
    assert set(out1) == {"car", "bus"}
    # second frame with same boxes: matched tracks keep their ids
    out2 = pipe.step_frame(frame, {"car": (car_boxes, 4), "bus": (bus_boxes, 3)}, 0.5)
    for name in ("car", "bus"):
        t1, u1 = out1[name].tid, out1[name].used
        t2, u2 = out2[name].tid, out2[name].used
        for i in range(len(t1)):
            if u1[i] and u2[i]:
                assert t1[i] == t2[i], (name, i)
    # ids are globally unique across classes
    car_ids = out1["car"].tid[out1["car"].used]
    bus_ids = out1["bus"].tid[out1["bus"].used]
    ids1 = set(car_ids) | set(bus_ids)
    assert len(ids1) == len(list(car_ids) + list(bus_ids))


def test_fused_program_cached_and_subset_via_skip():
    """The vmapped multi-class step is ONE program regardless of the
    active-class subset (absent classes ride a skip lane-freeze, so no
    per-subset recompile happens — the round-4 design compiled one
    program per subset); fast/safe are the only cached variants."""
    from shasta_tpu.infer import MultiClassScenePipeline, default_tracker_params

    cfg90 = _mini_cfg(6)
    cfg50 = _mini_cfg(5)
    car, ped, bus = ShastaModel(cfg90), ShastaModel(cfg90), ShastaModel(cfg50)
    b = make_batch(cfg90, 1, 512, n_dets=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    v = car.init(jax.random.PRNGKey(0), batch, train=False)
    b5 = make_batch(cfg50, 1, 512, n_dets=3)
    v5 = bus.init(jax.random.PRNGKey(1),
                  {k: jnp.asarray(x) for k, x in b5.items()}, train=False)
    pipe = MultiClassScenePipeline(
        class_heads={"car": (car, v), "pedestrian": (ped, v),
                     "bus": (bus, v5)},
        trunk_key="car", params=default_tracker_params(max_age=4),
    )
    f1 = pipe._get_fused(fast=False)
    f2 = pipe._get_fused(fast=False)
    f3 = pipe._get_fused(fast=True)
    assert f1 is f2
    assert f1 is not f3


def test_multiclass_fast_equals_safe(rng):
    """The fused fast program (coverage flags, no in-graph conds) must
    produce the same ids/flags as the safe program (in-graph XLA
    fallbacks) when no flag trips — and both expose coverage_ok."""
    cfg = _mini_cfg(5)
    car, bus = ShastaModel(cfg), ShastaModel(cfg)
    b = make_batch(cfg, 1, 512, n_dets=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    v = car.init(jax.random.PRNGKey(0), batch, train=False)

    frame = {k: b[k] for k in ("voxels", "num_points", "coordinates", "voxels_valid")}
    boxes = {"car": (b["det_boxes"], 4), "bus": (b["det_boxes"], 3)}

    def run(safe):
        pipe = MultiClassScenePipeline(
            class_heads={"car": (car, v), "bus": (bus, v)}, trunk_key="car",
            params=default_tracker_params(max_age=4),
        )
        outs = []
        for _ in range(3):
            outs.append(pipe.step_frame(frame, boxes, 0.5, safe=safe))
        return outs

    fast, safe = run(False), run(True)
    for of, os_ in zip(fast, safe):
        for name in ("car", "bus"):
            assert bool(np.all(of[name].coverage_ok)), "flag tripped: case invalid"
            np.testing.assert_array_equal(of[name].tid, os_[name].tid)
            np.testing.assert_array_equal(of[name].used, os_[name].used)
            np.testing.assert_array_equal(of[name].keep, os_[name].keep)
            np.testing.assert_array_equal(of[name].fn, os_[name].fn)
            np.testing.assert_allclose(of[name].ref, os_[name].ref, atol=1e-5)
