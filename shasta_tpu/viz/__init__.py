from .visualizer2d import Visualizer2D  # noqa: F401
