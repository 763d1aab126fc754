from . import events, relational  # noqa: F401
