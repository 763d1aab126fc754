from . import ann, ivf_index, ivfpq, ivfpq_residual, mmr, pq  # noqa: F401
