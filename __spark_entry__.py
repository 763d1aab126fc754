"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions), one callable per name.
``oracle_sql()`` — matching DuckDB ANSI-SQL oracles; omitted only for
genuinely non-SQL-expressible ops (driver then records rows-only).

The registries are populated by decorator at import of the operator
modules in ``event_to_lakehouse_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# catalog imports every operator module (master registry) and curates
# the ≤50-entry driver-facing surface (see its module docstring).
from event_to_lakehouse_spark.catalog import driver_oracles, driver_queries
from event_to_lakehouse_spark.functions.keys import surrogate_uid
from event_to_lakehouse_spark.operators.events import parse_props
from event_to_lakehouse_spark.tables import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.1): one
    vertical slice through the engine — JSON-payload parsing (the
    reference's core competence), surrogate-key derivation
    (bronze_assets_to_silver_assets.py:139-149), filter, broadcast
    dimension join, and aggregation."""
    sf_dir = "/root/testdata/sf0.001"
    t = load_tables(spark, sf_dir)
    events, customer = t["events"], t["customer"]

    normalized = (
        events.filter(F.col("event_type").isin("purchase", "signup", "error"))
        .select(
            surrogate_uid("user_id", "event_type", "event_id").alias("event_uid"),
            "event_id",
            "user_id",
            "event_type",
            "value",
            parse_props("props").getField("k").alias("prop_k"),
        )
    )
    return (
        normalized.join(
            F.broadcast(customer), normalized.user_id == customer.c_custkey, "left"
        )
        .groupBy("event_type", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.sum("prop_k").alias("sum_k"),
            F.countDistinct("event_uid").alias("n_unique"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    return driver_oracles()
