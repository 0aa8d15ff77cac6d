from . import distance_join  # noqa: F401
