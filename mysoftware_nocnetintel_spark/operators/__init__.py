from . import timeseries  # noqa: F401
