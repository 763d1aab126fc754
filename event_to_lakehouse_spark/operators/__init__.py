from . import advanced, events, graph, profiling, relational, sketches, skew, stats, tpch_full  # noqa: F401
