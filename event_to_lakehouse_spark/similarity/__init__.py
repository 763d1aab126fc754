from . import ann, ivf_index, ivfpq, ivfpq_residual, mmr, pca, pq  # noqa: F401
