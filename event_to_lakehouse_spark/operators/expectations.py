"""Declarative data-quality expectations — the Great-Expectations /
dbt-test shape a training-data pipeline runs as an ingestion gate,
evaluated engine-side in ONE pass per table.

The reference validates rows only by Spark's PERMISSIVE corrupt-record
capture (``bronze_assets_to_silver_assets.py:61-64`` — schema-level
rejection); it has no semantic expectation layer at all. This module
fills that ABSENT tier: a static expectation spec (not-null, value
set, range, cross-column ordering, key uniqueness, referential
integrity) compiles to conditional aggregates so every row-level
expectation over a table is ONE map-side-combined scan — at 100 TB the
report costs the same as a count(*), plus one key-join for the RI
check. The report (violation counts, basis points, pass flag) is what
a write-audit-publish gate (``storage.snapshots.stage``/``publish``)
consumes before promoting a staged commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query

__all__ = ["quality_expectations_report", "ROW_EXPECTATIONS"]

# (expectation name, table, VIOLATION predicate — engine-neutral SQL).
# Row-level only; uniqueness and referential integrity are structural
# and handled separately below.
ROW_EXPECTATIONS: list[tuple[str, str, str]] = [
    (
        "orders.o_custkey.not_null",
        "orders",
        "o_custkey IS NULL",
    ),
    (
        "orders.o_orderstatus.in_set",
        "orders",
        "o_orderstatus NOT IN ('O', 'F', 'P')",
    ),
    (
        "orders.o_totalprice.positive",
        "orders",
        "o_totalprice <= 0",
    ),
    (
        "lineitem.l_quantity.range_1_50",
        "lineitem",
        "l_quantity < 1 OR l_quantity > 50",
    ),
    (
        "lineitem.l_discount.range_0_1",
        "lineitem",
        "l_discount < 0 OR l_discount > 1",
    ),
    (
        "lineitem.l_extendedprice.consistent",
        "lineitem",
        # cross-column sanity: extended price can never undercut one
        # unit at the row's own quantity (price = qty * unit price)
        "l_extendedprice <= 0 OR l_extendedprice < l_quantity",
    ),
]


def _bps() -> str:
    return "(10000 * n_violations) {div} n_rows"


def _expectations_sql() -> str:
    per_table: dict[str, list[tuple[str, str]]] = {}
    for name, tbl, pred in ROW_EXPECTATIONS:
        per_table.setdefault(tbl, []).append((name, pred))
    selects = []
    for tbl, exps in per_table.items():
        cols = ", ".join(
            f"sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS v{i}"
            for i, (_, pred) in enumerate(exps)
        )
        stats = f"(SELECT count(*) AS n, {cols} FROM {tbl})"
        for i, (name, _) in enumerate(exps):
            selects.append(
                f"SELECT '{name}' AS expectation, n AS n_rows,"
                f" v{i} AS n_violations FROM {stats}"
            )
    selects.append(
        "SELECT 'orders.o_orderkey.unique', count(*),"
        " count(*) - count(DISTINCT o_orderkey) FROM orders"
    )
    selects.append(
        "SELECT 'lineitem.l_orderkey.ref_orders', count(*),"
        " sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)"
        " FROM lineitem l LEFT JOIN orders o"
        " ON l.l_orderkey = o.o_orderkey"
    )
    body = " UNION ALL ".join(selects)
    bps = _bps().format(div="//")
    return f"""
    SELECT expectation, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST({bps} AS BIGINT) AS violation_bps,
           n_violations = 0 AS passed
    FROM ({body})
    ORDER BY expectation
    """


@query("quality_expectations_report", _expectations_sql())
def quality_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the full expectation suite and report one row per
    expectation: (expectation, n_rows, n_violations, violation_bps,
    passed). All row-level expectations over a table fold into ONE
    conditional-sum aggregate (one scan, map-side partials); key
    uniqueness is count − count(distinct) in the same idiom; the RI
    check is a single key-projected join (the one necessarily
    multi-table probe). Both engines evaluate the SAME generated
    predicates — one Python spec emits the Spark ``div`` and DuckDB
    ``//`` forms, the ops-advisor discipline — so the report is
    hash-exact."""
    t = load_tables(spark, sf_dir)
    per_table: dict[str, list[tuple[str, str]]] = {}
    for name, tbl, pred in ROW_EXPECTATIONS:
        per_table.setdefault(tbl, []).append((name, pred))
    out = None
    for tbl, exps in per_table.items():
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(
                F.when(F.expr(pred), 1).otherwise(0)
            ).alias(f"v{i}")
            for i, (_, pred) in enumerate(exps)
        ]
        stats = t[tbl].agg(*aggs)
        melted = stats.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("expectation"),
                            F.col("n").alias("n_rows"),
                            F.col(f"v{i}").alias("n_violations"),
                        )
                        for i, (name, _) in enumerate(exps)
                    ]
                )
            ).alias("r")
        ).select("r.*")
        out = melted if out is None else out.unionByName(melted)
    uniq = t["orders"].agg(
        F.lit("orders.o_orderkey.unique").alias("expectation"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "n_violations"
        ),
    )
    ri = (
        t["lineitem"]
        .select("l_orderkey")
        .join(
            t["orders"].select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.lit("lineitem.l_orderkey.ref_orders").alias("expectation"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_violations"),
        )
    )
    out = out.unionByName(uniq).unionByName(ri)
    return out.select(
        "expectation",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.expr(_bps().format(div="div")).cast("long").alias("violation_bps"),
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("expectation")
