from . import schema_registry  # noqa: F401
