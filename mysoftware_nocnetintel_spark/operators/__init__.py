from . import dedup, similarity, timeseries  # noqa: F401
