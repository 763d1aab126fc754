from . import ann, ivf_index, ivfpq, pq  # noqa: F401
