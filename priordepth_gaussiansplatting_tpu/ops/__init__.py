from .projection import ProjectedGaussians, project_gaussians  # noqa: F401
