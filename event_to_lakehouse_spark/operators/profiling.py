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


# --- declarative data-quality constraint suite (Deequ-style) ---------------
#
# A 100 TB ingestion gate wants named pass/fail constraints, not raw
# profiles: completeness, key uniqueness, value-range compliance,
# pattern conformance, and referential integrity, all computed in ONE
# pass over the fact (the dimension side of the RI check rides a
# broadcast join, so the fact is still scanned exactly once).
_QC = [
    # (constraint_name, metric_col, threshold)
    ("completeness:o_custkey", "m_completeness", 1.0),
    ("compliance:o_totalprice_range", "m_compliance", 0.99),
    ("pattern:o_orderpriority", "m_pattern", 1.0),
    ("referential:o_custkey->customer", "m_ri", 1.0),
    ("uniqueness:o_orderkey", "m_uniqueness", 1.0),
]

_QC_ORACLE = """
WITH j AS (
  SELECT o.*, c.c_custkey AS ref_custkey
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), m AS (
  SELECT avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
           AS m_completeness,
         CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*)
           AS m_uniqueness,
         avg(CASE WHEN o_totalprice > 0 AND o_totalprice <= 600000
                  THEN 1.0 ELSE 0.0 END) AS m_compliance,
         avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                  THEN 1.0 ELSE 0.0 END) AS m_pattern,
         avg(CASE WHEN ref_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
           AS m_ri
  FROM j
)
SELECT * FROM (
{unions}
) ORDER BY constraint_name
""".format(
    unions="  UNION ALL ".join(
        f"SELECT '{name}' AS constraint_name, round({m}, 6) AS metric, "
        f"CAST({thr} AS DOUBLE) AS threshold, {m} >= {thr} AS passed FROM m\n"
        for name, m, thr in _QC
    )
)


@query("quality_constraints", _QC_ORACLE)
def quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint verification suite over the orders fact: every
    metric is an aggregate of the SAME single scan (customer rides in
    as a broadcast for the referential check), so the whole report
    costs one fact pass + a 1-row shuffle regardless of table size.
    ``passed`` is computed on the unrounded metric; the displayed
    metric rounds to 6 places for cross-engine hash stability."""
    t = load_tables(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    joined = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders["o_custkey"] == customer["c_custkey"],
        "left",
    )
    one = joined.agg(
        F.avg(F.col("o_custkey").isNotNull().cast("double")).alias("m_completeness"),
        (
            F.countDistinct("o_orderkey").cast("double") / F.count(F.lit(1))
        ).alias("m_uniqueness"),
        F.avg(
            (
                (F.col("o_totalprice") > 0) & (F.col("o_totalprice") <= 600000)
            ).cast("double")
        ).alias("m_compliance"),
        F.avg(F.col("o_orderpriority").rlike("^[1-5]-").cast("double")).alias(
            "m_pattern"
        ),
        F.avg(F.col("c_custkey").isNotNull().cast("double")).alias("m_ri"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint_name"),
                F.round(F.col(m), 6).alias("metric"),
                F.lit(float(thr)).alias("threshold"),
                (F.col(m) >= F.lit(float(thr))).alias("passed"),
            )
            for name, m, thr in _QC
        ]
    )
    return (
        one.select(F.explode(rows).alias("c"))
        .select("c.*")
        .orderBy("constraint_name")
    )
