from . import ann  # noqa: F401
