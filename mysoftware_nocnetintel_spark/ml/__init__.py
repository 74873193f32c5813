from . import dispatch, forecast  # noqa: F401
