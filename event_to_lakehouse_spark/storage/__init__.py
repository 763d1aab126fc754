from . import bucketing  # noqa: F401
