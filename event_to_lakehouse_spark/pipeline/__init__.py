from . import contracts, gold, normalize, upsert  # noqa: F401
