from . import ann, ivf_index, ivfpq, mmr, pq  # noqa: F401
