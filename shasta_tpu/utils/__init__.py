from .config import Config  # noqa: F401
from .registry import Registry, build_from_cfg  # noqa: F401
