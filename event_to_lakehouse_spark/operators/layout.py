"""Z-order layout pruning gauge — the registry face of ``storage.layout``.

``storage.layout`` supplies the write-side capability (Morton-key
clustering + SnapshotTable zone maps; pytest-pinned in
``test_layout.py``), but until round 9 nothing about the layout tier
was value-checked by an independent engine. This entry certifies the
Morton math itself: it scales the two classic clustering dimensions
(customer key × order day) through the SAME ``zorder_key`` expression
the writer uses, assigns every order to its would-be FILE under two
layouts —

- ``zorder``:   bucket = top 6 bits of the 32-bit Morton key, i.e. the
  8×8 grid cell a range-partitioned writer would put the row in —
  contiguous curve segments, no global sort, pure projection;
- ``datesort``: bucket = top 6 bits of the scaled day — the reference's
  arrival-order layout (``bronze_assets_to_silver_assets.py`` appends
  in ingest order, which correlates with time and nothing else);

— and emits each bucket's zone map (min/max of both scaled dimensions
+ row count). The pruning story is readable straight off the result:
under ``datesort`` every bucket spans the full customer range (a
customer-key predicate reads ALL files), while under ``zorder`` both
extents are bounded by the grid cell — a box predicate on EITHER
column prunes ~7/8 of the files per halving. The DuckDB oracle
recomputes the affine scaling, the 16-level bit interleave, the bucket
ids, and the zone maps bit-for-bit.

Scale shape: two metadata-sized min/max lookups (at 100 TB: folded
from manifest stats, see ``column_ranges``), then one projection +
one ~128-group aggregation. No window, no global sort, no join — the
gauge is cheaper than the table scan that feeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage.layout import ZBITS, column_ranges, zorder_key
from ..tables import load_tables
from .relational import query

# 2 cols x 16 bits -> 32-bit Morton key; top 6 bits = 64 grid cells.
_ZSHIFT = 2 * ZBITS - 6
_DSHIFT = ZBITS - 6
_TOP = (1 << ZBITS) - 1


def _scale_duck(col: str, mn: str, mx: str) -> str:
    """DuckDB twin of zorder_key's per-column affine scale: subtract
    min, multiply by the SAME double factor Spark embeds, clamp, floor
    (Spark's long cast truncates; inputs are clamped non-negative, so
    floor is identical)."""
    return (
        f"CAST(floor(least({_TOP}.0, greatest(0.0, "
        f"(CAST({col} AS DOUBLE) - {mn}) * ({_TOP}.0 / CAST({mx} - {mn} AS DOUBLE))"
        f"))) AS BIGINT)"
    )


def _interleave_duck(c0: str, c1: str) -> str:
    """Bit i of column j lands at position i*2 + j — the exact layout
    ``storage.layout.zorder_key`` builds."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({c0} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({c1} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _gauge_oracle() -> str:
    return f"""
    WITH src AS (
      SELECT o_orderkey, o_custkey,
             datediff('day', DATE '1970-01-01', o_orderdate) AS o_day
      FROM orders
    ),
    p AS (
      SELECT min(o_custkey) AS mnc, max(o_custkey) AS mxc,
             min(o_day) AS mnd, max(o_day) AS mxd
      FROM src
    ),
    sc AS (
      SELECT {_scale_duck('o_custkey', 'mnc', 'mxc')} AS sc_cust,
             {_scale_duck('o_day', 'mnd', 'mxd')}     AS sc_day
      FROM src, p
    ),
    layouts AS (
      SELECT 'zorder' AS layout,
             ({_interleave_duck('sc_cust', 'sc_day')}) >> {_ZSHIFT} AS bucket,
             sc_cust, sc_day
      FROM sc
      UNION ALL
      SELECT 'datesort' AS layout, sc_day >> {_DSHIFT} AS bucket,
             sc_cust, sc_day
      FROM sc
    )
    SELECT layout, bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(sc_cust) AS cust_lo, max(sc_cust) AS cust_hi,
           min(sc_day)  AS day_lo,  max(sc_day)  AS day_hi
    FROM layouts
    GROUP BY layout, bucket
    ORDER BY layout, bucket
    """


@query("ops_zorder_pruning_gauge", _gauge_oracle())
def ops_zorder_pruning_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone maps of the 64 would-be files under Z-order vs date-sorted
    layout, both scaled through ``storage.layout.zorder_key`` — the
    multi-column-skipping claim as an oracle-checked result set."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE'1970-01-01')")
        .cast("long")
        .alias("o_day"),
    )
    ranges = column_ranges(o, ["o_custkey", "o_day"])
    base = o.select(
        zorder_key(["o_custkey"], {"o_custkey": ranges["o_custkey"]}).alias(
            "sc_cust"
        ),
        zorder_key(["o_day"], {"o_day": ranges["o_day"]}).alias("sc_day"),
        F.shiftright(zorder_key(["o_custkey", "o_day"], ranges), _ZSHIFT).alias(
            "zbucket"
        ),
    )
    both = base.select(
        F.lit("zorder").alias("layout"),
        F.col("zbucket").alias("bucket"),
        "sc_cust",
        "sc_day",
    ).unionAll(
        base.select(
            F.lit("datesort").alias("layout"),
            F.shiftright(F.col("sc_day"), _DSHIFT).alias("bucket"),
            "sc_cust",
            "sc_day",
        )
    )
    return (
        both.groupBy("layout", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("sc_cust").alias("cust_lo"),
            F.max("sc_cust").alias("cust_hi"),
            F.min("sc_day").alias("day_lo"),
            F.max("sc_day").alias("day_hi"),
        )
        .orderBy("layout", "bucket")
    )
