from . import advanced, events, profiling, relational, sketches, skew, tpch_full  # noqa: F401
