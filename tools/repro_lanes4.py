"""Reproduce the lanes-4 Pallas batched-program exception seen in the
round-3 bench matrix (lanes4_pallas fell back to B=1).

Runs ONE warmup step_frames at lanes=4 with the bench's exact config and
prints the full traceback instead of swallowing it.

    python tools/repro_lanes4.py [--lanes N]
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    lanes = 4
    if "--lanes" in sys.argv:
        lanes = int(sys.argv[sys.argv.index("--lanes") + 1])

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from bench import N_DETS, _frames, _make_cfg, _random_variables
    from shasta_tpu.infer import BatchedScenePipeline, default_tracker_params
    from shasta_tpu.models import ShastaModel

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = _make_cfg(lanes)
    model = ShastaModel(cfg)
    batch, frame = _frames(cfg, lanes)
    variables = _random_variables(model, batch)
    pipe = BatchedScenePipeline(
        model=model, variables=variables, cls_id=2,
        params=default_tracker_params(max_age=4), batch=lanes,
    )
    try:
        out = pipe.step_frames(
            frame, [N_DETS] * lanes, [True] * lanes, [0.5] * lanes
        )
        _ = out.tid
        print("OK: warmup step completed", flush=True)
    except Exception:
        traceback.print_exc()
        print("FAILED (traceback above)", flush=True)


if __name__ == "__main__":
    main()
