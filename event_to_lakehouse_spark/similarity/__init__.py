from . import ann, ivf_index, pq  # noqa: F401
