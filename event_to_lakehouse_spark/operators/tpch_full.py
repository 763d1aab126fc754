"""Remaining TPC-H query shapes (Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q17/Q20/Q21/
Q22), adapted to the driver's slimmer schemas (no partsupp, no
l_shipmode/l_commitdate/l_receiptdate, no c_phone — TESTDATA.md).

Each query preserves the *operator shape* that makes its TPC-H original
interesting, which is what SURVEY.md §2.3/§2.4's ABSENT-fill demands:

- Q2  — correlated scalar-subquery on an aggregate (min per group),
        decorrelated into agg + equi-join (Catalyst's own strategy).
- Q8  — conditional-share aggregation (ratio of CASE-gated sums).
- Q9  — star multi-join with an arithmetic profit measure.
- Q11 — HAVING against an uncorrelated scalar subquery (global total),
        implemented as a broadcast cross-join of a 1-row aggregate.
- Q12 — join + CASE-bucketed counts.
- Q13 — left outer join + count-of-counts distribution.
- Q15 — equality against a scalar MAX over an aggregated subquery.
- Q17 — correlated per-group average threshold.
- Q20 — window-total share filter feeding a semi-join.
- Q21 — EXISTS + NOT EXISTS self-joins (semi + anti on the fact).
- Q22 — scalar-average threshold + anti-join.

"Late" stands in for the missing commit/receipt dates as
``l_shipdate > o_orderdate + 60 days``.

Scale notes (100 TB posture): part (×p) and supplier (×s) are dimension
tables — always broadcast; lineitem⋈orders shuffles on orderkey only;
every scalar subquery is a 1-row broadcast, never a driver collect;
self-joins (Q21) are equi-keyed on l_orderkey so they co-partition with
AQE handling residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import _r4, query

_LATE = "l_shipdate > o_orderdate + INTERVAL 60 DAY"


def _late(l, o) -> F.Column:
    return l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")


@query(
    "q2_min_cost_per_part",
    """
    SELECT p_partkey, p_name, s_name, round(l_extendedprice, 4) AS min_price
    FROM part, lineitem, supplier
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size BETWEEN 10 AND 20 AND p_type = 'PROMO'
      AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q2_min_cost_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (cheapest supplier per
    part). Decorrelated the way Catalyst itself would: aggregate the
    inner side per key, broadcast it, equi-join on (key, min). MIN of
    stored doubles is order-independent, so the float equality is exact
    on both engines."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "PROMO"))
    l, s = t["lineitem"], t["supplier"]
    min_price = l.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("mp_price")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(min_price),
            (l.l_partkey == F.col("mp_partkey")) & (l.l_extendedprice == F.col("mp_price")),
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", _r4(F.col("l_extendedprice")).alias("min_price"))
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN n_name = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n_name
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    a ratio of conditionally-gated sums over a 6-table star join. Only
    lineitem⋈orders shuffles; every dimension broadcasts."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    r = t["region"].filter(F.col("r_name") == "AMERICA")
    p = t["part"].filter(F.col("p_type") == "ECONOMY")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _r4(
                F.sum(F.when(F.col("n_name") == "NATION_1", volume).otherwise(F.lit(0.0)))
                / F.sum(volume)
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT n_name AS nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) - 0.5 * l_quantity AS amount
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier-nation and year (supplycost
    surrogate: 0.5·quantity, since the test schema has no partsupp)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_r4(F.sum(amount)).alias("sum_profit"))
    )


@query(
    "q11_balance_concentration",
    """
    SELECT n_name, round(sum(s_acctbal), 4) AS nation_balance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) FROM supplier) * 0.04
    """,
)
def q11_balance_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose total exceeds a fraction of the
    global total — HAVING against an uncorrelated scalar subquery. The
    1-row global aggregate is broadcast-cross-joined (never collected
    to the driver), so the shape survives any scale."""
    t = load_tables(spark, sf_dir)
    s = t["supplier"]
    per_nation = (
        s.join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("_bal"))
    )
    total = s.agg(F.sum("s_acctbal").alias("_total"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("_bal") > F.col("_total") * 0.04)
        .select("n_name", _r4(F.col("_bal")).alias("nation_balance"))
    )


@query(
    "q12_late_priority_lines",
    f"""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE {_LATE}
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-bucketed counts ("late" lines per
    return flag, split by order priority; shipmode surrogate since the
    test schema has none)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    o = t["orders"]
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(_late(l, o))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    with a NOT IN exclusion subquery (complaints surrogate: suppliers
    in deficit; partsupp surrogate: lineitem part-supplier pairs).
    NOT IN becomes a broadcast left_anti join — the exclusion list is a
    dimension subset, never collected. The count(DISTINCT) expands to
    a two-phase partial-dedup aggregate under Catalyst."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#11")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with a residual predicate, then
    a count-of-counts distribution (two cascaded aggregations; the
    second one is tiny — at most |distinct counts| groups)."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: equality against a scalar MAX over an aggregated
    subquery. Revenue is rounded to cents *before* the max-compare so
    the float equality is stable across engines; the max is a 1-row
    broadcast."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average threshold —
    decorrelated into a per-partkey aggregate broadcast back onto the
    fact. The threshold (0.5·avg) never lands exactly on a stored
    quantity, so the float inequality is engine-stable."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    p = t["part"].filter(F.col("p_brand") == "Brand#11")
    avg_qty = l.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("aq_threshold")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("aq_threshold"))
        .agg(
            _r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q20_dominant_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM (
            SELECT l_suppkey,
                   sum(l_quantity) AS supplier_qty,
                   sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
        ) WHERE supplier_qty > 0.3 * part_qty
    )
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: share-of-total threshold feeding a semi-join —
    suppliers providing >30% of any small-part's 1997 volume (availqty
    surrogate: the part's total shipped quantity). The window total
    reuses the groupBy shuffle partitioning (partkey ⊂ grouping keys)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("small%"))
    pairs = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supplier_qty"))
        .withColumn("part_qty", F.sum("supplier_qty").over(Window.partitionBy("l_partkey")))
        .filter(F.col("supplier_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(pairs, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_suppliers",
    f"""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.{_LATE}
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier
    finished orders — EXISTS (left_semi) + NOT EXISTS (left_anti)
    self-joins on the fact table, all equi-keyed on l_orderkey so the
    three lineitem sides co-partition on one shuffle key."""
    t = load_tables(spark, sf_dir)
    l, s = t["lineitem"], t["supplier"]
    o = t["orders"].filter(F.col("o_orderstatus") == "F")

    l1 = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(_late(l, o))
    # EXISTS: another supplier has any line in the same order.
    l2 = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l1 = l1.join(
        l2,
        (l1["l_orderkey"] == l2["ok2"]) & (l1["l_suppkey"] != l2["sk2"]),
        "left_semi",
    )
    # NOT EXISTS: no *other* supplier was late on that same order.
    late_lines = (
        l.join(o.select("o_orderkey", "o_orderdate"), l["l_orderkey"] == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    l1 = l1.join(
        late_lines,
        (l1["l_orderkey"] == late_lines["ok3"]) & (l1["l_suppkey"] != late_lines["sk3"]),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(s), l1["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_untapped_segments",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q22_untapped_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balances, lapsed since 1999 (the
    "no orders" original is vacuous on this data — every rich customer
    has some order), grouped by segment (phone-prefix surrogate) —
    scalar-average threshold (1-row broadcast) + anti-join."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    o = t["orders"].filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01 00:00:00"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
