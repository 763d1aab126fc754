from . import ann, ivf_index  # noqa: F401
