"""Uniform-width affinity heads for the fused 7-class program.

The reference evaluates 7 per-class models independently
(official_val.sh -> 7x eval.py), each with its own max_obj (car 90,
bicycle 50, bus 20, ... — configs/nusc/*.py). Running them as one
vmapped head needs identical parameter shapes, but several affinity
parameters depend on max_obj (det3d/models/tracker/shasta.py:49-106:
the aug_* anchor MLPs flatten max_obj entities; the aff MLP's in/out
width is max_obj + 2).

`pad_affinity_params` transforms a max_obj=N_old head into an EXACTLY
equivalent max_obj=N_new >= N_old head:

- anchor-MLP input rows and hidden units are zero-scattered (padded
  entity slots hold zero features, so zero kernel rows/columns add
  exact zeros; padded hidden units get zero bias and zero outgoing
  rows);
- the aff MLP's entity input-rows/output-cols move to [0, N_old) and
  its two ANCHOR slots move from [N_old, N_old+2) to [N_new, N_new+2)
  (the position the padded head's concatenation produces);
- pairwise MLPs are shape-independent and copy through.

Combined with AffinityNet(n_real=N_old) — which excludes padded slots
from the column-normalized residual and forces their logits to -1e9
(zero softmax mass) — the padded head's matched1/matched2 equal the
original head's on every real row/col and both anchors, to float
tolerance (pinned by tests/test_multiclass_vmap.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _scatter(new_shape, src, rows=None, cols=None):
    out = np.zeros(new_shape, np.float32)
    r = rows if rows is not None else np.arange(src.shape[0])
    if src.ndim == 1:
        out[r] = np.asarray(src)
        return jnp.asarray(out)
    c = cols if cols is not None else np.arange(src.shape[1])
    out[np.ix_(r, c)] = np.asarray(src)
    return jnp.asarray(out)


def pad_affinity_params(p: dict, n_old: int, n_new: int, F: int = 320,
                        num_feats: int = 3) -> dict:
    """p: the 'affinity' params subtree of a max_obj=n_old model.
    Returns the equivalent max_obj=n_new subtree (see module doc)."""
    if n_old == n_new:
        return p
    assert n_old < n_new
    out: dict = {}
    # anchor slots move from [n_old, n_old+2) to [n_new, n_new+2)
    ent = np.arange(n_old)
    row_map = np.concatenate([ent, [n_new, n_new + 1]])

    for i in range(4):
        src = p[f"aug_shape_{i}"]
        h_old, h_new = n_old * F // 64, n_new * F // 64
        out[f"aug_shape_{i}"] = {
            "layers_0": {
                "kernel": _scatter((n_new * F, h_new),
                                   src["layers_0"]["kernel"]),
                "bias": _scatter((h_new,), src["layers_0"]["bias"]),
            },
            "layers_1": {
                "kernel": _scatter((h_new, F), src["layers_1"]["kernel"]),
                "bias": jnp.asarray(src["layers_1"]["bias"]),
            },
        }
        src = p[f"aug_dets_{i}"]
        h_old, h_new = n_old * 7 // 32, n_new * 7 // 32
        out[f"aug_dets_{i}"] = {
            "layers_0": {
                "kernel": _scatter((n_new * 7, h_new),
                                   src["layers_0"]["kernel"]),
                "bias": _scatter((h_new,), src["layers_0"]["bias"]),
            },
            "layers_1": {
                "kernel": _scatter((h_new, 7), src["layers_1"]["kernel"]),
                "bias": jnp.asarray(src["layers_1"]["bias"]),
            },
        }
    for name in ("fuse_shape", "fuse_det", "res_coeff"):
        out[name] = jax.tree.map(jnp.asarray, p[name])
    aff = p["aff"]
    out["aff"] = {
        "layers_0": {
            "kernel": _scatter((n_new + 2, 128), aff["layers_0"]["kernel"],
                               rows=row_map),
            "bias": jnp.asarray(aff["layers_0"]["bias"]),
        },
        **{f"layers_{i}": jax.tree.map(jnp.asarray, aff[f"layers_{i}"])
           for i in range(1, 5)},
        "layers_5": {
            "kernel": _scatter((128, n_new + 2), aff["layers_5"]["kernel"],
                               cols=row_map),
            "bias": _scatter((n_new + 2,), aff["layers_5"]["bias"],
                             rows=row_map),
        },
    }
    return out


def stack_class_heads(class_heads: dict, names: tuple, n_max: int):
    """class_heads: {name: (model, variables)}. Returns
    (stacked_affinity_params with a leading (C,) axis, n_real (C,) int32,
    cls_pad) for the vmapped head."""
    padded = []
    n_real = []
    for n in names:
        model, variables = class_heads[n]
        p = variables["params"]
        p = p.get("affinity", p)  # full ShastaModel vars or a bare head
        padded.append(pad_affinity_params(
            p, model.cfg.max_obj, n_max,
            F=model.cfg.num_point * model.cfg.share_conv_channel,
            num_feats=model.cfg.num_feats))
        n_real.append(model.cfg.max_obj)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
    return stacked, jnp.asarray(n_real, jnp.int32)


def pad_rows(a: jnp.ndarray, n_new: int, axis: int = 1) -> jnp.ndarray:
    """Pad an entity axis (boxes/features) from N_old to n_new with
    zeros — the padded slots the equivalence transform expects."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n_new - a.shape[axis])
    return jnp.pad(a, pad)
