from . import keys, text, vectors  # noqa: F401
