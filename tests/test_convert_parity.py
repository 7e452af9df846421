"""Checkpoint-converter parity: torch oracles for RPN / shared conv /
sparse backbone with reference module naming -> converted flax tree ->
matching outputs. This validates convert_neck / convert_backbone /
convert_shasta_checkpoint end-to-end (the affinity part is covered in
test_affinity_parity)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import pytest

from shasta_tpu.models.rpn import RPN, SharedConv
from shasta_tpu.models.backbone import SparseBackbone
from shasta_tpu.ops import sparse as sp
from shasta_tpu.train.convert import convert_neck, _bn, _conv2d, _deconv2d, convert_backbone


def _torch_rpn(layer_nums=(5, 5), ds_strides=(1, 2), ds_filters=(128, 256),
               us_strides=(1, 2), us_filters=(256, 256), in_f=256):
    """Reference-math RPN oracle with torchie Sequential index naming."""
    blocks, deblocks = nn.ModuleList(), nn.ModuleList()
    in_filters = [in_f, ds_filters[0]]
    for i, n in enumerate(layer_nums):
        seq = [nn.ZeroPad2d(1),
               nn.Conv2d(in_filters[i], ds_filters[i], 3, stride=ds_strides[i], bias=False),
               nn.BatchNorm2d(ds_filters[i], eps=1e-3, momentum=0.01), nn.ReLU()]
        for _ in range(n):
            seq += [nn.Conv2d(ds_filters[i], ds_filters[i], 3, padding=1, bias=False),
                    nn.BatchNorm2d(ds_filters[i], eps=1e-3, momentum=0.01), nn.ReLU()]
        blocks.append(nn.Sequential(*seq))
        if us_strides[i] > 1:
            de = nn.Sequential(
                nn.ConvTranspose2d(ds_filters[i], us_filters[i], us_strides[i],
                                   stride=us_strides[i], bias=False),
                nn.BatchNorm2d(us_filters[i], eps=1e-3, momentum=0.01), nn.ReLU())
        else:
            de = nn.Sequential(
                nn.Conv2d(ds_filters[i], us_filters[i], 1, stride=1, bias=False),
                nn.BatchNorm2d(us_filters[i], eps=1e-3, momentum=0.01), nn.ReLU())
        deblocks.append(de)
    m = nn.Module()
    m.blocks, m.deblocks = blocks, deblocks
    return m


def _randomize_bn(mod, rng):
    for sub in mod.modules():
        if isinstance(sub, (nn.BatchNorm2d, nn.BatchNorm1d)):
            sub.running_mean.copy_(torch.tensor(rng.normal(0, 0.5, sub.num_features), dtype=torch.float32))
            sub.running_var.copy_(torch.tensor(rng.uniform(0.5, 2, sub.num_features), dtype=torch.float32))
            sub.weight.data.copy_(torch.tensor(rng.normal(1, 0.2, sub.num_features), dtype=torch.float32))
            sub.bias.data.copy_(torch.tensor(rng.normal(0, 0.2, sub.num_features), dtype=torch.float32))


def test_rpn_conversion_matches_torch(rng):
    torch.manual_seed(0)
    oracle = _torch_rpn(layer_nums=(2, 2), ds_filters=(8, 16), us_filters=(16, 16), in_f=4)
    with torch.no_grad():
        _randomize_bn(oracle, rng)
    oracle.eval()

    x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ups = []
        h = torch.tensor(x)
        for i in range(2):
            h = oracle.blocks[i](h)
            ups.append(oracle.deblocks[i](h))
        ref = torch.cat(ups, dim=1).numpy()  # NCHW

    sd = {f"neck.{k}": v for k, v in oracle.state_dict().items()}
    params, stats = convert_neck(sd, layer_nums=(2, 2), us_strides=(1, 2))

    model = RPN(layer_nums=(2, 2), ds_num_filters=(8, 16), us_num_filters=(16, 16),
                num_input_features=4)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_shared_conv_conversion(rng):
    torch.manual_seed(1)
    oracle = nn.Sequential(
        nn.Conv2d(6, 4, 3, padding=1, bias=True),
        # plain BatchNorm2d defaults (eps=1e-5): shasta.py:45 does NOT use
        # the det3d norm_cfg here, unlike the neck/backbone
        nn.BatchNorm2d(4),
        nn.ReLU(),
    )
    with torch.no_grad():
        _randomize_bn(oracle, rng)
    oracle.eval()
    x = rng.normal(size=(2, 6, 10, 10)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(x)).numpy()

    sd = {f"shared_conv.{k}": v for k, v in oracle.state_dict().items()}
    params = {"conv": _conv2d(sd, "shared_conv.0", has_bias=True)}
    bnp, bns = _bn(sd, "shared_conv.1")
    params["bn"] = bnp
    m = SharedConv(features=4)
    out = m.apply({"params": params, "batch_stats": {"bn": bns}},
                  jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4)


def test_backbone_conversion_matches_dense_torch(rng):
    """Build a torch oracle of the sparse ResNet using DENSE conv3d (valid
    because inactive voxels are zero and subm outputs are only read at
    active sites for the first stage; we only check stage conv_input +
    res0a where output positions == input positions)."""
    torch.manual_seed(2)

    # torch modules named like the reference backbone
    class SpconvLike(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_input = nn.Sequential(
                nn.Conv3d(5, 16, 3, padding=1, bias=False),
                nn.BatchNorm1d(16, eps=1e-3, momentum=0.01), nn.ReLU())
            self.conv1 = nn.ModuleList([_Block(), _Block()])

    class _Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv3d(16, 16, 3, padding=1, bias=True)
            self.bn1 = nn.BatchNorm1d(16, eps=1e-3, momentum=0.01)
            self.conv2 = nn.Conv3d(16, 16, 3, padding=1, bias=True)
            self.bn2 = nn.BatchNorm1d(16, eps=1e-3, momentum=0.01)

    oracle = SpconvLike()
    with torch.no_grad():
        _randomize_bn(oracle, rng)
    oracle.eval()

    # sparse input
    Z, Y, X = 6, 8, 8
    n = 30
    coords = set()
    rr = np.random.default_rng(3)
    while len(coords) < n:
        coords.add((0, int(rr.integers(Z)), int(rr.integers(Y)), int(rr.integers(X))))
    coords = np.array(sorted(coords), np.int32)
    feats = rr.normal(size=(n, 5)).astype(np.float32)

    dense = np.zeros((1, 5, Z, Y, X), np.float32)
    for (b, z, y, x), f in zip(coords, feats):
        dense[0, :, z, y, x] = f
    active = np.zeros((1, 1, Z, Y, X), np.float32)
    for (b, z, y, x) in coords:
        active[0, 0, z, y, x] = 1.0

    def bn_dense(bn, h):
        # BN1d over channel dim of dense (N, C, Z, Y, X)
        m = bn.running_mean.view(1, -1, 1, 1, 1)
        v = bn.running_var.view(1, -1, 1, 1, 1)
        w = bn.weight.view(1, -1, 1, 1, 1)
        b = bn.bias.view(1, -1, 1, 1, 1)
        return (h - m) / torch.sqrt(v + 1e-3) * w + b

    with torch.no_grad():
        act = torch.tensor(active)
        h = oracle.conv_input[0](torch.tensor(dense))
        h = torch.relu(bn_dense(oracle.conv_input[1], h)) * act
        for blk in oracle.conv1:
            idn = h
            o = blk.conv1(h)
            # subm semantics: bias + BN evaluated at active sites only
            o = torch.relu(bn_dense(blk.bn1, o)) * act
            o = blk.conv2(o)
            o = bn_dense(blk.bn2, o) * act
            h = torch.relu(o + idn) * act
        ref = h.numpy()

    # convert (only the stage-0 part of the tree)
    sd = {f"backbone.{k}": v for k, v in oracle.state_dict().items()}
    # rename conv3d weights to spconv dense layout (kz,ky,kx,in,out)
    for k in list(sd.keys()):
        if k.endswith(".weight") and sd[k].dim() == 5:
            sd[k] = sd[k].permute(2, 3, 4, 1, 0).contiguous()

    from shasta_tpu.train.convert import _basic_block, _bn as bn_conv, _sparse_conv

    params = {"conv_input_kernel": _sparse_conv(sd, "backbone.conv_input.0.weight", 5, 16)}
    p, s = bn_conv(sd, "backbone.conv_input.1")
    stats = {"conv_input_bn": s}
    params["conv_input_bn"] = p
    for name, tname in (("res0a", "conv1.0"), ("res0b", "conv1.1")):
        p, s = _basic_block(sd, f"backbone.{tname}", 16)
        params[name], stats[name] = p, s

    cap = 40
    st = sp.SparseTensor(
        feats=jnp.zeros((cap, 5)).at[:n].set(jnp.asarray(feats)),
        coords=jnp.zeros((cap, 4), jnp.int32).at[:n].set(jnp.asarray(coords)),
        valid=jnp.arange(cap) < n,
        shape=(Z, Y, X),
        batch_size=1,
    )
    idx = sp.build_subm_index(st)
    # manual forward through the converted stage-0 params
    x1 = sp.subm_conv_apply(st, idx, jnp.asarray(params["conv_input_kernel"]))
    f = sp.masked_batch_norm(
        x1.feats, x1.valid,
        jnp.asarray(params["conv_input_bn"]["scale"]),
        jnp.asarray(params["conv_input_bn"]["bias"]),
        jnp.asarray(stats["conv_input_bn"]["mean"]),
        jnp.asarray(stats["conv_input_bn"]["var"]),
    )
    x1 = x1._replace(feats=jnp.maximum(f, 0))
    for name in ("res0a", "res0b"):
        pp, ss = params[name], stats[name]
        identity = x1.feats
        o = sp.subm_conv_apply(x1, idx, jnp.asarray(pp["conv1"]["kernel"]), jnp.asarray(pp["conv1"]["bias"]))
        f = sp.masked_batch_norm(o.feats, o.valid, jnp.asarray(pp["bn1"]["scale"]),
                                 jnp.asarray(pp["bn1"]["bias"]), jnp.asarray(ss["bn1"]["mean"]),
                                 jnp.asarray(ss["bn1"]["var"]))
        o = o._replace(feats=jnp.maximum(f, 0))
        o = sp.subm_conv_apply(o, idx, jnp.asarray(pp["conv2"]["kernel"]), jnp.asarray(pp["conv2"]["bias"]))
        f = sp.masked_batch_norm(o.feats, o.valid, jnp.asarray(pp["bn2"]["scale"]),
                                 jnp.asarray(pp["bn2"]["bias"]), jnp.asarray(ss["bn2"]["mean"]),
                                 jnp.asarray(ss["bn2"]["var"]))
        x1 = o._replace(feats=jnp.where(o.valid[:, None], jnp.maximum(f + identity, 0), 0))

    got = np.asarray(x1.feats)
    for i, (b, z, y, x) in enumerate(coords):
        np.testing.assert_allclose(got[i], ref[0, :, z, y, x], atol=3e-4,
                                   err_msg=f"voxel {i}")
