from . import contracts, normalize  # noqa: F401
