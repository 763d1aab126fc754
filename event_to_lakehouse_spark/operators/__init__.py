from . import advanced, events, relational  # noqa: F401
