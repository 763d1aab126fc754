from . import cluster, exact, jaccard, minhash, portable, simhash  # noqa: F401
