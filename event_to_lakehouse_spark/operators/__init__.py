from . import advanced, events, profiling, relational, skew  # noqa: F401
