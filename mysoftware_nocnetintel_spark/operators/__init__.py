from . import dedup, graph, multimodal, similarity, skew, timeseries  # noqa: F401
