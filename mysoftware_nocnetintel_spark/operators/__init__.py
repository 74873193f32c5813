from . import dedup, multimodal, similarity, skew, timeseries  # noqa: F401
