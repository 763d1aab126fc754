from . import evolution, schema_registry  # noqa: F401
