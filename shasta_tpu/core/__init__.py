from . import boxes, bilinear, geometry, transforms  # noqa: F401
