from . import advanced, events, profiling, relational, skew, tpch_full  # noqa: F401
