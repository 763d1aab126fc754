from . import advanced, audit, events, features, graph, insights, layout, profiling, relational, sketches, skew, stats, tpch_full  # noqa: F401
