from .gaussians import GaussianParams, GaussianState  # noqa: F401
