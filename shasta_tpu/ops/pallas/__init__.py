from .sparse_gather import subm_conv_pallas  # noqa: F401
