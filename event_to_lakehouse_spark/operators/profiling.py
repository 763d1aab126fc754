"""Table profiling: per-column data-quality stats in ONE scan.

A training-data pipeline gates ingestion on profile deltas (null
spikes, cardinality collapse, range drift). This operator computes
row count, null count, distinct count, and min/max for every requested
column in a single aggregate pass — the profile of a 100 TB table costs
one scan + one 1-row shuffle, then the per-column melt happens on that
single row (no data movement).

Exact countDistinct is used so the DuckDB oracle can match bit-for-bit;
at extreme cardinalities swap in approx_count_distinct (see
``agg_approx_distinct_users`` for the sketch pattern and its rows-only
verification contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) per
    requested column, computed in one aggregation."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_str"),
                F.col(f"_max_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def _col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS column, count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str
    FROM documents
    """


@query(
    "profile_documents",
    " UNION ALL ".join(_col_sql(c) for c in _PROFILE_COLS),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of the documents table."""
    t = load_tables(spark, sf_dir)
    return profile(t["documents"], _PROFILE_COLS)


def _events_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS column, count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str
    FROM events
    """


# event_id/user_id (bigint), event_type (varchar), value (double with
# real NULLs — exercises the null-spike detection path). ts is excluded:
# timestamp→string rendering differs between engines.
_EVENTS_PROFILE_COLS = ["event_id", "user_id", "event_type", "value"]


@query(
    "profile_events",
    " UNION ALL ".join(_events_col_sql(c) for c in _EVENTS_PROFILE_COLS),
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of the events fact table (registry entry —
    proves ``profile`` generalizes beyond documents, including a
    nullable double column for null-spike gating)."""
    t = load_tables(spark, sf_dir)
    return profile(t["events"], _EVENTS_PROFILE_COLS)
