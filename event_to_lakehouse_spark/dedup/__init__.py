from . import exact, jaccard, minhash, simhash  # noqa: F401
