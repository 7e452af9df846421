from . import sparse, voxelize  # noqa: F401
