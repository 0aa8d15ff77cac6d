from . import distance_join, skew  # noqa: F401
