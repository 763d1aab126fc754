"""event_to_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the capabilities of the
reference pipeline ``secdev-arjun/event-to-lakehouse`` (a Kafka → bronze
JSON → silver Iceberg lakehouse, itself built on PySpark), extended with
the full relational operator surface (joins, aggregations, windows, set
ops, sorts — absent from the reference, see SURVEY.md §2.3-2.7) and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Design stance (SURVEY.md §7.0):
- DataFrame/SQL only; no RDDs. Catalyst plans everything.
- Built-in functions first; pandas UDFs only where built-ins genuinely
  cannot express the semantics (multimodal decode).
- No driver-side collect of data in any operator path.
- AQE on; broadcast for dimensions; explicit partitioning hints where
  a 1000-executor cluster would need them.
"""

__version__ = "0.1.0"

# Public API surface. Heavy submodules (operators, dedup, similarity,
# textops, multimodal) register their query catalogs on import — pull
# them explicitly or via __spark_entry__; these are the building blocks
# a pipeline author composes directly.
from .session import configure_runtime, get_spark  # noqa: E402,F401
from .tables import load_tables, table  # noqa: E402,F401

__all__ = [
    "__version__",
    "configure_runtime",
    "get_spark",
    "load_tables",
    "table",
]
