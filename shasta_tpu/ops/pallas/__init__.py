from .window_conv import windowed_gather_matmul, windowed_lookup  # noqa: F401
