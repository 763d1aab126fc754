from . import advanced, events, graph, insights, profiling, relational, sketches, skew, stats, tpch_full  # noqa: F401
