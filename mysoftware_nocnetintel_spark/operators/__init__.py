from . import bpe, dedup, graph, multimodal, similarity, skew, timeseries  # noqa: F401
