from . import dist, sharding  # noqa: F401
