from . import advanced, events, relational, skew  # noqa: F401
