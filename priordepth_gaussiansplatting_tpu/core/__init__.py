from . import sh, transforms, cameras, schedules  # noqa: F401
