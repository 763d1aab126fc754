from . import cluster, exact, jaccard, minhash, simhash  # noqa: F401
