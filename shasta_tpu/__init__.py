"""shasta_tpu — a TPU-native (JAX/XLA/Pallas) 3D multi-object-tracking framework.

Re-implements the capabilities of ShaSTA ("Modeling Shape and Spatio-Temporal
Affinities for 3D Multi-Object Tracking", RA-L 2023) with a TPU-first design:

- fixed-shape, fully batched affinity forward (one XLA computation per frame pair)
- sparse 3D conv backbone built from gather -> matmul -> scatter with
  precomputed index pairs (no external spconv dependency)
- whole-scene tracking as a ``jax.lax.scan`` over a fixed-capacity track table
  (no per-frame host round-trips)
- data parallelism via ``jax.sharding.Mesh`` + collectives (no NCCL/DDP)

Reference behavior is documented per-module with ``file:line`` citations into
the upstream repository.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (keeps `import shasta_tpu` light)
    if name in ("ShastaModel", "ShastaConfig"):
        from . import models

        return getattr(models, name)
    if name in ("ScenePipeline", "BatchedScenePipeline", "MultiClassScenePipeline"):
        from . import infer

        return getattr(infer, name)
    if name == "register_all":
        from .registry_setup import register_all

        return register_all
    raise AttributeError(name)
