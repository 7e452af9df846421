"""Parity against the reference's LITERAL forward pass.

Unlike test_affinity_parity.py (whose torch oracle is a re-derivation of
the reference math and could share a misreading with the flax port), this
test executes the UN-EDITED reference sources from /root/reference —
det3d/models/tracker/shasta.py, second_stage/bird_eye_view.py,
core/utils/center_utils.py (bilinear), core/bbox/box_torch_ops.py — via
import shims, drives Shasta.forward end-to-end from the shared-conv input
BEV map (extract_feat stubbed: the spconv trunk needs CUDA spconv and is
covered separately by tests/test_sparse.py golden tests), converts its
state_dict with shasta_tpu.train.convert, and asserts matched1/matched2
parity of the full shared_conv -> 5-point BEV sampling -> affinity chain.

BN running stats are randomized so the shared-conv BatchNorm eps
(torch default 1e-5, NOT the det3d norm_cfg 1e-3) is actually exercised.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
import torch.nn as nn  # noqa: E402

from shasta_tpu.core.boxes import box_points_5  # noqa: E402
from shasta_tpu.core.bilinear import sample_bev_features  # noqa: E402
from shasta_tpu.models.affinity import AffinityNet  # noqa: E402
from shasta_tpu.models.rpn import SharedConv  # noqa: E402
from shasta_tpu.train.convert import _bn, _conv2d, convert_affinity  # noqa: E402

REF = "/root/reference"


def _stub_module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    # attach to parent package so `from X import Y` getattr resolution works
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)
    return mod


def _exec_reference(name: str, path: str):
    """Exec an UN-EDITED reference source file as module `name`."""
    mod = types.ModuleType(name)
    mod.__file__ = path
    mod.__package__ = name.rsplit(".", 1)[0] if "." in name else ""
    sys.modules[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        setattr(sys.modules[parent], leaf, mod)
    with open(path) as f:
        src = f.read()
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


@pytest.fixture(scope="module")
def reference_shasta():
    """Load the reference Shasta class from the un-edited sources."""
    class _Identity:
        def register_module(self, cls):
            return cls

    # --- shim tree (only glue the reference files import, no math) ---
    _stub_module("pycocotools")
    _stub_module("pycocotools.mask")
    det3d = _stub_module("det3d")
    _stub_module("det3d.torchie")
    _stub_module("det3d.torchie.trainer", load_state_dict=lambda *a, **k: None)
    det3d.torchie = sys.modules["det3d.torchie"]
    _stub_module("det3d.core")
    _stub_module("det3d.core.bbox")
    _stub_module("det3d.core.utils")
    _stub_module("det3d.core.utils.circle_nms_jit", circle_nms=lambda *a, **k: None)
    _stub_module("det3d.models")
    _stub_module("det3d.models.registry", TRACK=_Identity(), SECOND_STAGE=_Identity())
    _stub_module(
        "det3d.models.builder",
        build_reader=lambda x: x,
        build_backbone=lambda x: x,
        build_neck=lambda x: x,
        build_second_stage_module=lambda x: x,
    )
    _stub_module("det3d.models.tracker")
    _stub_module("det3d.models.second_stage")

    # --- the un-edited reference sources under test ---
    btops = _exec_reference(
        "det3d.core.bbox.box_torch_ops", f"{REF}/det3d/core/bbox/box_torch_ops.py"
    )
    sys.modules["det3d.core"].box_torch_ops = btops
    _exec_reference(
        "det3d.core.utils.center_utils", f"{REF}/det3d/core/utils/center_utils.py"
    )
    _exec_reference(
        "det3d.models.tracker.base", f"{REF}/det3d/models/tracker/base.py"
    )
    bev_mod = _exec_reference(
        "det3d.models.second_stage.bird_eye_view",
        f"{REF}/det3d/models/second_stage/bird_eye_view.py",
    )
    shasta_mod = _exec_reference(
        "det3d.models.tracker.shasta", f"{REF}/det3d/models/tracker/shasta.py"
    )
    return shasta_mod.Shasta, bev_mod.BEVFeatureExtractor


MAX_OBJ = 6
C_IN = 16  # shared-conv input channels (512 at release scale)
H = W = 40
PC_START = (-5.0, -5.0)
VOXEL_SIZE = (0.25, 0.25)
OUT_STRIDE = 1


def _boxes11(rng, B, N):
    b = rng.normal(size=(B, N, 11)).astype(np.float64)
    b[:, :, :2] = rng.uniform(-3.5, 3.5, size=(B, N, 2))  # in-map centers
    b[:, :, 2] = rng.uniform(-1, 1, size=(B, N))
    b[:, :, 3:6] = rng.uniform(0.5, 2.0, size=(B, N, 3))  # positive dims
    b[:, :, 6] = rng.uniform(-np.pi, np.pi, size=(B, N))
    b[:, :, 7:9] = rng.normal(size=(B, N, 2)) * 0.5  # velocity
    b[:, :, 9] = 0.5  # dt
    b[:, :, 10] = rng.uniform(0.1, 1.0, size=(B, N))  # score
    return b


def test_full_forward_matches_reference_source(reference_shasta, rng):
    Shasta, BEVFeatureExtractor = reference_shasta
    torch.manual_seed(7)
    B, N = 2, MAX_OBJ

    bev_ext = BEVFeatureExtractor(
        pc_start=PC_START, voxel_size=VOXEL_SIZE, out_stride=OUT_STRIDE
    )
    model = Shasta(
        reader=nn.Identity(),
        backbone=nn.Identity(),
        neck=nn.Identity(),
        bev_extractor=bev_ext,
        pretrained=None,
        max_obj=N,
        num_feats=3,
        in_channels=C_IN,
        share_conv_channel=64,
        num_point=5,
    ).float()  # f32: the reference's own torch_to_np_dtype map lacks float64
    # randomize the shared-conv BN running stats so eval-mode normalization
    # (and its eps) is a real part of the comparison, not a no-op at var=1
    with torch.no_grad():
        model.shared_conv[1].running_mean.copy_(torch.randn(64) * 0.2)
        model.shared_conv[1].running_var.copy_(torch.rand(64) * 2 + 0.25)
    model.eval()

    curr11 = _boxes11(rng, B, N)
    prev11 = _boxes11(rng, B, N)
    bev = rng.normal(size=(B, C_IN, H, W))
    prev_bev = rng.normal(size=(B, C_IN, H, W))

    bev_t = torch.tensor(bev, dtype=torch.float32)
    prev_bev_t = torch.tensor(prev_bev, dtype=torch.float32)
    model.extract_feat = lambda example: (bev_t, None, prev_bev_t, None)

    example = {
        # forward mutates det_boxes in place (shasta.py:270 writes through
        # the [:, :, :7] view) -> hand torch its own copies
        "det_boxes": torch.tensor(curr11, dtype=torch.float32),
        "prev_det_boxes": torch.tensor(prev11, dtype=torch.float32),
    }
    with torch.no_grad():
        m1_t, m2_t, _ = model(example, train_mode=False)

    # --- convert the literal state_dict into the flax trees ---
    sd = {k: v.float() for k, v in model.state_dict().items()}
    sc_bn_params, sc_bn_stats = _bn(sd, "shared_conv.1")
    sc_vars = {
        "params": {"conv": _conv2d(sd, "shared_conv.0", has_bias=True), "bn": sc_bn_params},
        "batch_stats": {"bn": sc_bn_stats},
    }
    aff_params = convert_affinity(sd)

    # --- the TPU-native chain: shared conv -> 5-pt sampling -> affinity ---
    shared = SharedConv(64)
    bev_j = shared.apply(sc_vars, jnp.asarray(bev.transpose(0, 2, 3, 1), jnp.float32))
    prev_bev_j = shared.apply(
        sc_vars, jnp.asarray(prev_bev.transpose(0, 2, 3, 1), jnp.float32)
    )
    curr7 = jnp.asarray(curr11[:, :, :7], jnp.float32)
    prev7 = jnp.asarray(prev11[:, :, :7], jnp.float32)
    curr_feat = sample_bev_features(
        bev_j, box_points_5(curr7), PC_START, VOXEL_SIZE, OUT_STRIDE
    )
    prev_feat = sample_bev_features(
        prev_bev_j, box_points_5(prev7), PC_START, VOXEL_SIZE, OUT_STRIDE
    )
    net = AffinityNet(max_obj=N, num_feats=3)
    m1_j, m2_j = net.apply(
        {"params": aff_params},
        prev7,
        curr7,
        jnp.asarray(curr11[:, :, 7:9], jnp.float32),
        jnp.asarray(curr11[:, :, 9:10], jnp.float32),
        prev_feat,
        curr_feat,
    )

    np.testing.assert_allclose(np.asarray(m1_j), m1_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m2_j), m2_t.numpy(), atol=1e-4)


def test_bev_sampling_matches_reference_source(reference_shasta, rng):
    """5-point center extraction + bilinear sampling vs the literal
    get_box_center (shasta.py:121-161) + BEVFeatureExtractor chain."""
    Shasta, BEVFeatureExtractor = reference_shasta
    torch.manual_seed(3)
    B, N = 2, 5

    bev_ext = BEVFeatureExtractor(
        pc_start=PC_START, voxel_size=VOXEL_SIZE, out_stride=OUT_STRIDE
    )
    model = Shasta(
        reader=nn.Identity(), backbone=nn.Identity(), neck=nn.Identity(),
        bev_extractor=bev_ext, pretrained=None, max_obj=N, num_feats=3,
        in_channels=C_IN, share_conv_channel=64, num_point=5,
    ).float()
    model.eval()

    boxes = _boxes11(rng, B, N)[:, :, :7]
    feat = rng.normal(size=(B, H, W, 64))  # already-shared-conv'd map, HWC

    centers = model.get_box_center(torch.tensor(boxes, dtype=torch.float32))
    ref_maps = bev_ext({"bev_feature": torch.tensor(feat, dtype=torch.float32)}, centers, 5)
    ref = torch.stack(ref_maps).numpy()  # (B, N, 320)

    mine = sample_bev_features(
        jnp.asarray(feat, jnp.float32),
        box_points_5(jnp.asarray(boxes, jnp.float32)),
        PC_START, VOXEL_SIZE, OUT_STRIDE,
    )
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-4)
