"""Full-scale checkpoint-conversion dry run.

No released checkpoints exist in this image, so this synthesizes a
state_dict with the reference's EXACT key names and tensor shapes at
release scale — max_obj=90, 512-channel neck output, spconv 2.x native
weight layout, DDP "module." prefixes, num_batches_tracked noise keys —
per det3d/models/tracker/shasta.py:28-109, backbones/scn.py:113-161,
necks/rpn.py:67-116. convert_shasta_checkpoint must produce a tree whose
structure and shapes EXACTLY match ShastaModel(car config).init, so a real
models/car.pth drops in without surprises. (Toy-scale numeric parity lives
in test_convert_parity / test_affinity_parity.)
"""
import numpy as np
import jax
import pytest

from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.train.convert import (
    convert_bev_map_checkpoint,
    convert_shasta_checkpoint,
)

MAX_OBJ = 90


def _t(*shape):
    # values are irrelevant for the structural dry-run; zeros keep it cheap
    return np.zeros(shape, np.float32)


def _bn_keys(sd, prefix, c):
    sd[f"{prefix}.weight"] = _t(c)
    sd[f"{prefix}.bias"] = _t(c)
    sd[f"{prefix}.running_mean"] = _t(c)
    sd[f"{prefix}.running_var"] = _t(c)
    # present in every real torch checkpoint; converter must ignore it
    sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _sparse_native(sd, key, cin, cout, ks=(3, 3, 3)):
    # spconv 2.x native layout (out, kz, ky, kx, in)
    sd[key] = _t(cout, *ks, cin)


def _block_keys(sd, prefix, planes):
    _sparse_native(sd, f"{prefix}.conv1.weight", planes, planes)
    sd[f"{prefix}.conv1.bias"] = _t(planes)
    _bn_keys(sd, f"{prefix}.bn1", planes)
    _sparse_native(sd, f"{prefix}.conv2.weight", planes, planes)
    sd[f"{prefix}.conv2.bias"] = _t(planes)
    _bn_keys(sd, f"{prefix}.bn2", planes)


def _backbone_keys(sd, p="backbone"):
    _sparse_native(sd, f"{p}.conv_input.0.weight", 5, 16)
    _bn_keys(sd, f"{p}.conv_input.1", 16)
    _block_keys(sd, f"{p}.conv1.0", 16)
    _block_keys(sd, f"{p}.conv1.1", 16)
    for tname, cin, cout in (("conv2", 16, 32), ("conv3", 32, 64), ("conv4", 64, 128)):
        _sparse_native(sd, f"{p}.{tname}.0.weight", cin, cout)
        _bn_keys(sd, f"{p}.{tname}.1", cout)
        _block_keys(sd, f"{p}.{tname}.3", cout)
        _block_keys(sd, f"{p}.{tname}.4", cout)
    _sparse_native(sd, f"{p}.extra_conv.0.weight", 128, 128, ks=(3, 1, 1))
    _bn_keys(sd, f"{p}.extra_conv.1", 128)


def _neck_keys(sd, p="neck"):
    # torchie RPN: layer_nums (5,5), ds (128,256) from 256 input,
    # us (256,256) with strides (1,2) (configs/nusc/car.py RPN section)
    specs = [(256, 128), (128, 256)]
    for i, (cin, cf) in enumerate(specs):
        sd[f"{p}.blocks.{i}.1.weight"] = _t(cf, cin, 3, 3)  # after ZeroPad2d
        _bn_keys(sd, f"{p}.blocks.{i}.2", cf)
        for j in range(5):
            idx = 4 + 3 * j
            sd[f"{p}.blocks.{i}.{idx}.weight"] = _t(cf, cf, 3, 3)
            _bn_keys(sd, f"{p}.blocks.{i}.{idx + 1}", cf)
    # deblock 0: stride-1 Conv2d(128->256, k1); deblock 1: Deconv(256->256, k2 s2)
    sd[f"{p}.deblocks.0.0.weight"] = _t(256, 128, 1, 1)
    _bn_keys(sd, f"{p}.deblocks.0.1", 256)
    sd[f"{p}.deblocks.1.0.weight"] = _t(256, 256, 2, 2)  # (in, out, kh, kw)
    _bn_keys(sd, f"{p}.deblocks.1.1", 256)


def _affinity_keys(sd):
    n = MAX_OBJ
    for i in range(4):
        # aug_shape: Linear(n*320 -> n*320//64), Linear(-> 320) (shasta.py:49-57)
        sd[f"aug_shape.{i}.0.weight"] = _t(n * 320 // 64, n * 320)
        sd[f"aug_shape.{i}.0.bias"] = _t(n * 320 // 64)
        sd[f"aug_shape.{i}.2.weight"] = _t(320, n * 320 // 64)
        sd[f"aug_shape.{i}.2.bias"] = _t(320)
        # aug_dets: Linear(n*7 -> n*7//32), Linear(-> 7) (shasta.py:69-76)
        sd[f"aug_dets.{i}.0.weight"] = _t(n * 7 // 32, n * 7)
        sd[f"aug_dets.{i}.0.bias"] = _t(n * 7 // 32)
        sd[f"aug_dets.{i}.2.weight"] = _t(7, n * 7 // 32)
        sd[f"aug_dets.{i}.2.bias"] = _t(7)
    for pre, dims in (
        ("fuse_shape", (640, 40, 20, 10, 1)),       # shasta.py:59-67
        ("fuse_det", (6, 32, 8, 1)),                # 2*num_feats=6, shasta.py:78-84
        ("res_coeff", (646, 72, 18, 3)),            # 2*(320+3), shasta.py:86-92
        ("aff", (92, 128, 64, 32, 64, 128, 92)),    # max_obj+2, shasta.py:94-109
    ):
        for li in range(len(dims) - 1):
            sd[f"{pre}.{2 * li}.weight"] = _t(dims[li + 1], dims[li])
            sd[f"{pre}.{2 * li}.bias"] = _t(dims[li + 1])


def _full_state_dict(ddp_prefix=True):
    sd: dict = {}
    _backbone_keys(sd)
    _neck_keys(sd)
    sd["shared_conv.0.weight"] = _t(64, 512, 3, 3)
    sd["shared_conv.0.bias"] = _t(64)
    _bn_keys(sd, "shared_conv.1", 64)
    _affinity_keys(sd)
    if ddp_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def _shape_tree(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


@pytest.fixture(scope="module")
def init_shapes():
    """Abstract init of the FULL car-scale model (no compute: eval_shape)."""
    cfg = ShastaConfig()  # defaults = car release scale
    model = ShastaModel(cfg)
    V = 1000  # voxel count doesn't affect parameter shapes
    batch = {
        "voxels": jax.ShapeDtypeStruct((1, V, 10, 5), np.float32),
        "num_points": jax.ShapeDtypeStruct((1, V), np.int32),
        "coordinates": jax.ShapeDtypeStruct((1, V, 3), np.int32),
        "voxels_valid": jax.ShapeDtypeStruct((1, V), np.bool_),
        "prev_voxels": jax.ShapeDtypeStruct((1, V, 10, 5), np.float32),
        "prev_num_points": jax.ShapeDtypeStruct((1, V), np.int32),
        "prev_coordinates": jax.ShapeDtypeStruct((1, V, 3), np.int32),
        "prev_voxels_valid": jax.ShapeDtypeStruct((1, V), np.bool_),
        "det_boxes": jax.ShapeDtypeStruct((1, MAX_OBJ, 11), np.float32),
        "prev_det_boxes": jax.ShapeDtypeStruct((1, MAX_OBJ, 11), np.float32),
    }
    variables = jax.eval_shape(
        lambda b: ShastaModel(cfg).init(jax.random.PRNGKey(0), b, train=False),
        batch,
    )
    return _shape_tree(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )


def test_fullscale_conversion_matches_init_tree(init_shapes):
    converted = convert_shasta_checkpoint(_full_state_dict())
    got = _shape_tree(converted)
    # identical tree structure AND identical leaf shapes
    gs, gt = jax.tree_util.tree_flatten(got)
    ws, wt = jax.tree_util.tree_flatten(init_shapes)
    assert gt == wt, "converted tree structure differs from model init"
    for (path, g), w in zip(
        jax.tree_util.tree_leaves_with_path(got), ws
    ):
        assert g == w, f"{jax.tree_util.keystr(path)}: {g} != {w}"


def test_fullscale_bev_map_conversion_is_sub_tree(init_shapes):
    """bev_map.pth (trunk only) converts to the backbone+neck sub-tree."""
    sd: dict = {}
    _backbone_keys(sd)
    _neck_keys(sd)
    converted = convert_bev_map_checkpoint({f"module.{k}": v for k, v in sd.items()})
    got = _shape_tree(converted)
    for part in ("backbone", "neck"):
        assert got["params"][part] == init_shapes["params"][part], part
        assert got["batch_stats"][part] == init_shapes["batch_stats"][part], part


def test_fullscale_spconv1x_dense_layout(init_shapes):
    """The converter also accepts spconv 1.x dense (kz,ky,kx,in,out) weights
    (torchie checkpoint.py:84-108 laxity)."""
    sd = _full_state_dict(ddp_prefix=False)
    for k in list(sd):
        v = sd[k]
        if k.endswith(".weight") and v.ndim == 5:
            # native (out, kz, ky, kx, in) -> dense (kz, ky, kx, in, out)
            sd[k] = np.ascontiguousarray(v.transpose(1, 2, 3, 4, 0))
    converted = convert_shasta_checkpoint(sd)
    got = _shape_tree(converted)
    assert got["params"]["backbone"] == init_shapes["params"]["backbone"]
