"""Torch checkpoint -> flax pytree conversion for reference ShaSTA weights.

Mirrors what det3d/torchie/trainer/checkpoint.py:49-139 does for the
reference (including spconv dense<->sparse weight-layout transposition), but
targets the shasta_tpu parameter tree. Accepts a state_dict of numpy arrays
or torch tensors (torch is optional, CPU-only here).

Reference module names handled (det3d/models/tracker/shasta.py:28-109,
backbones/scn.py:113-161, necks/rpn.py:67-116):
  reader.*                 (no params)
  backbone.conv_input.{0,1}  backbone.conv{1..4}.*  backbone.extra_conv.{0,1}
  neck.blocks.{i}.{j}      neck.deblocks.{i}.{j}
  shared_conv.{0,1}
  aug_shape.{i}.{0,2}  fuse_shape.{0,2,4,6}  aug_dets.{i}.{0,2}
  fuse_det.{0,2,4}  res_coeff.{0,2,4}  aff.{0,2,4,6,8,10}
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _mlp(sd, prefix, torch_idx):
    """Torch Sequential (Linear at given indices) -> MLP layers_{i}."""
    return {f"layers_{i}": _linear(sd, f"{prefix}.{t}") for i, t in enumerate(torch_idx)}


def _pairwise_mlp(sd, prefix, torch_idx):
    """Torch Sequential -> PairwiseMLP (first layer stored flat)."""
    out: dict[str, Any] = {
        "layers_0_kernel": _np(sd[f"{prefix}.{torch_idx[0]}.weight"]).T,
        "layers_0_bias": _np(sd[f"{prefix}.{torch_idx[0]}.bias"]),
    }
    for i, t in enumerate(torch_idx[1:], start=1):
        out[f"layers_{i}"] = _linear(sd, f"{prefix}.{t}")
    return out


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv2d(sd, prefix, has_bias=False):
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if has_bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _deconv2d(sd, prefix):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    # (kh, kw, in, out) with SPATIALLY FLIPPED taps: torch's transposed conv
    # correlates with the flipped kernel relative to lax.conv_transpose.
    w = _np(sd[f"{prefix}.weight"])[:, :, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}


def _sparse_conv(sd, key, c_in, c_out, ks=(3, 3, 3)):
    """spconv weight -> (K, C_in, C_out) with (dz, dy, dx) raster tap order.

    Handles both spconv layouts the reference tolerates
    (torchie/trainer/checkpoint.py:84-108):
      spconv 1.x "dense":  (kz, ky, kx, in, out)
      spconv 2.x "native": (out, kz, ky, kx, in)
    """
    w = _np(sd[key])
    K = int(np.prod(ks))
    if w.shape == (*ks, c_in, c_out):
        return w.reshape(K, c_in, c_out)
    if w.shape == (c_out, *ks, c_in):
        return w.transpose(1, 2, 3, 4, 0).reshape(K, c_in, c_out)
    raise ValueError(f"unrecognized sparse conv weight shape {w.shape} for {key}")


def _basic_block(sd, prefix, planes):
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for conv, bnname in (("conv1", "bn1"), ("conv2", "bn2")):
        params[conv] = {
            "kernel": _sparse_conv(sd, f"{prefix}.{conv}.weight", planes, planes),
            "bias": _np(sd[f"{prefix}.{conv}.bias"]),
        }
        p, s = _bn(sd, f"{prefix}.{bnname}")
        params[bnname] = p
        stats[bnname] = s
    return params, stats


def convert_backbone(sd: Mapping[str, Any], prefix: str = "backbone"):
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["conv_input_kernel"] = _sparse_conv(sd, f"{prefix}.conv_input.0.weight", 5, 16)
    p, s = _bn(sd, f"{prefix}.conv_input.1")
    params["conv_input_bn"], stats["conv_input_bn"] = p, s

    for name, torch_name, planes in (("res0a", "conv1.0", 16), ("res0b", "conv1.1", 16)):
        p, s = _basic_block(sd, f"{prefix}.{torch_name}", planes)
        params[name], stats[name] = p, s

    stage = [("down1", "conv2", 16, 32, ("res1a", "res1b")),
             ("down2", "conv3", 32, 64, ("res2a", "res2b")),
             ("down3", "conv4", 64, 128, ("res3a", "res3b"))]
    for down, tname, cin, cout, blocks in stage:
        params[down] = {"kernel": _sparse_conv(sd, f"{prefix}.{tname}.0.weight", cin, cout)}
        p, s = _bn(sd, f"{prefix}.{tname}.1")
        params[down]["bn"], stats[down] = p, {"bn": s}
        for bi, bname in enumerate(blocks):
            p, s = _basic_block(sd, f"{prefix}.{tname}.{3 + bi}", cout)
            params[bname], stats[bname] = p, s

    params["extra"] = {
        "kernel": _sparse_conv(sd, f"{prefix}.extra_conv.0.weight", 128, 128, ks=(3, 1, 1))
    }
    p, s = _bn(sd, f"{prefix}.extra_conv.1")
    params["extra"]["bn"], stats["extra"] = p, {"bn": s}
    return params, stats


def convert_neck(sd: Mapping[str, Any], prefix: str = "neck", layer_nums=(5, 5),
                 us_strides=(1, 2)):
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i, n in enumerate(layer_nums):
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        # torchie Sequential: 0 ZeroPad, 1 Conv, 2 BN, 3 ReLU, then 3 per block
        bp["down"] = {"conv": _conv2d(sd, f"{prefix}.blocks.{i}.1")}
        p, s = _bn(sd, f"{prefix}.blocks.{i}.2")
        bp["down"]["bn"], bs["down"] = p, {"bn": s}
        for j in range(n):
            idx = 4 + 3 * j
            bp[f"conv_{j}"] = {"conv": _conv2d(sd, f"{prefix}.blocks.{i}.{idx}")}
            p, s = _bn(sd, f"{prefix}.blocks.{i}.{idx + 1}")
            bp[f"conv_{j}"]["bn"], bs[f"conv_{j}"] = p, {"bn": s}
        params[f"block_{i}"], stats[f"block_{i}"] = bp, bs

        dp: dict[str, Any] = {}
        if us_strides[i] > 1:
            dp["deconv"] = _deconv2d(sd, f"{prefix}.deblocks.{i}.0")
        else:
            dp["conv"] = _conv2d(sd, f"{prefix}.deblocks.{i}.0")
        p, s = _bn(sd, f"{prefix}.deblocks.{i}.1")
        dp["bn"] = p
        params[f"deblock_{i}"], stats[f"deblock_{i}"] = dp, {"bn": s}
    return params, stats


def convert_affinity(sd: Mapping[str, Any]):
    params: dict[str, Any] = {}
    for i in range(4):
        params[f"aug_shape_{i}"] = _mlp(sd, f"aug_shape.{i}", (0, 2))
        params[f"aug_dets_{i}"] = _mlp(sd, f"aug_dets.{i}", (0, 2))
    params["fuse_shape"] = _pairwise_mlp(sd, "fuse_shape", (0, 2, 4, 6))
    params["fuse_det"] = _pairwise_mlp(sd, "fuse_det", (0, 2, 4))
    params["res_coeff"] = _pairwise_mlp(sd, "res_coeff", (0, 2, 4))
    params["aff"] = _mlp(sd, "aff", (0, 2, 4, 6, 8, 10))
    return params


def convert_shasta_checkpoint(sd: Mapping[str, Any]):
    """Full reference Shasta state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["backbone"], stats["backbone"] = convert_backbone(sd)
    params["neck"], stats["neck"] = convert_neck(sd)
    params["shared_conv"] = {"conv": _conv2d(sd, "shared_conv.0", has_bias=True)}
    p, s = _bn(sd, "shared_conv.1")
    params["shared_conv"]["bn"] = p
    stats["shared_conv"] = {"bn": s}
    params["affinity"] = convert_affinity(sd)
    return {"params": params, "batch_stats": stats}


def convert_bev_map_checkpoint(sd: Mapping[str, Any]):
    """bev_map.pth (BEVMap: reader/backbone/neck only) -> partial tree.

    The reference loads this non-strictly into Shasta (shasta.py:111-119);
    here it fills backbone + neck, leaving shared_conv/affinity untouched.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["backbone"], stats["backbone"] = convert_backbone(sd)
    params["neck"], stats["neck"] = convert_neck(sd)
    return {"params": params, "batch_stats": stats}
