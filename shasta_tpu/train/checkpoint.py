"""Checkpoint save/load: orbax for native pytrees, torch .pth conversion in.

Behavioral reference: det3d/torchie/trainer/checkpoint.py:166-290
(load_checkpoint/save_checkpoint) and shasta.py:111-119 (non-strict
pretrained loading). Native checkpoints are orbax directories; reference
torch checkpoints (.pth) are converted on load via shasta_tpu.train.convert.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, variables: dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, variables), force=True)


def load_checkpoint(path: str) -> dict[str, Any]:
    """Load an orbax dir or a torch .pth (converted to the flax tree)."""
    if path.endswith((".pth", ".pt")):
        import torch

        from .convert import convert_bev_map_checkpoint, convert_shasta_checkpoint

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        keys = {k.removeprefix("module.").split(".")[0] for k in sd}
        if "shared_conv" in keys or any(k.startswith("aug_shape") for k in keys):
            return convert_shasta_checkpoint(sd)
        return convert_bev_map_checkpoint(sd)
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def merge_pretrained(variables: dict[str, Any], pretrained: dict[str, Any]) -> dict[str, Any]:
    """Non-strict merge: copy matching-shape leaves from `pretrained` into
    `variables` (checkpoint.py:49-83 laxity + shasta.py:116 strict=False)."""

    def merge(dst, src):
        if isinstance(dst, dict) and isinstance(src, dict):
            out = dict(dst)
            for k in src:
                if k in dst:
                    out[k] = merge(dst[k], src[k])
            return out
        d = np.asarray(dst)
        s = np.asarray(src)
        return src if d.shape == s.shape else dst

    return merge(variables, pretrained)
