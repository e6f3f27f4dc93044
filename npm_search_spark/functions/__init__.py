from . import spans, urls  # noqa: F401
