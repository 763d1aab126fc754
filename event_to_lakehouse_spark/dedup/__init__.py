from . import exact, minhash, simhash  # noqa: F401
