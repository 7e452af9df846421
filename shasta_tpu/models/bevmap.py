"""Standalone BEV feature model (reader + backbone + neck).

Behavioral reference: det3d/models/bev/bevmap.py:8-57 (BEVMap),
single_stage.py:11-58 (SingleStageBEV.freeze / FrozenBatchNorm2d). Its
pretrained checkpoint (bev_map.pth, the frozen CenterPoint trunk) is what
Shasta loads non-strictly (configs/nusc/car.py:22, shasta.py:111-119);
train/convert.convert_bev_map_checkpoint maps it into this module's tree
(which is a sub-tree of ShastaModel's, so weights transfer 1:1).

Freezing on TPU: parameters are immutable pytrees, so "freeze" is an
optimizer partition (train/loop._param_labels) and BN-freeze is simply
train=False — no FrozenBatchNorm2d module surgery needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse as sp
from .backbone import SparseBackbone
from .rpn import RPN
from .shasta import ShastaConfig
from .vfe import voxel_mean_vfe


class BEVMap(nn.Module):
    """VFE + sparse backbone + RPN -> (B, H, W, 512) BEV feature map."""

    cfg: ShastaConfig = ShastaConfig()

    def setup(self):
        c = self.cfg
        self.backbone = SparseBackbone(
            num_input_features=c.num_input_features,
            cap_conv2=c.cap_conv2,
            cap_conv3=c.cap_conv3,
            cap_conv4=c.cap_conv4,
            cap_extra=c.cap_extra,
            bn_axis_name=c.bn_axis_name,
            name="backbone",
        )
        self.neck = RPN(dtype=c.dtype, name="neck")

    def __call__(self, frame: dict, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        B, V = frame["voxels"].shape[:2]
        feats = voxel_mean_vfe(
            frame["voxels"].reshape(B * V, *frame["voxels"].shape[2:]),
            frame["num_points"].reshape(B * V),
            c.num_input_features,
        )
        bidx = jax.lax.broadcasted_iota(jnp.int32, (B, V), 0)
        coords = jnp.concatenate(
            [bidx.reshape(B * V, 1), frame["coordinates"].reshape(B * V, 3)], axis=1
        )
        st = sp.SparseTensor(
            feats=feats,
            coords=coords,
            valid=frame["voxels_valid"].reshape(B * V),
            shape=c.grid_shape,
            batch_size=B,
        )
        x = self.backbone(st, train)
        return self.neck(x, train)
