"""Relational operator catalog — the full query surface the reference
lacks (SURVEY.md §2.3 joins, §2.4 aggregations, §2.5 windows, §2.6
sorts/limits, §2.7 set ops, §2.8 scalar functions), expressed as
idiomatic Catalyst-planned DataFrame pipelines.

Every query here is registered with a DuckDB oracle (ANSI SQL) for the
driver's correctness gate. Conventions for oracle parity:

- every computed column is aliased identically on both sides;
- double aggregates are ``round(x, 4)`` on both sides (absorbs
  partial-aggregation ordering differences in float math; SURVEY §7.4);
- DuckDB ``sum(INTEGER)`` returns INT128 and ``year()`` returns BIGINT,
  so oracles carry explicit CASTs to match Spark's output types;
- every ORDER BY ... LIMIT carries a unique tiebreak column.

Scale notes (100 TB posture): all pipelines are scan→filter→project→
shuffle-agg/join shapes with no driver-side data movement. Dimension
joins (region/nation/customer vs lineitem) are marked ``broadcast`` so
the big fact side never shuffles for them; AQE handles skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.keys import surrogate_uid
from ..tables import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _r4(c) -> F.Column:
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4 fill)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)        AS sum_qty,
           round(sum(l_extendedprice), 4)   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4)        AS avg_qty,
           round(avg(l_extendedprice), 4)   AS avg_price,
           round(avg(l_discount), 4)        AS avg_disc,
           count(*)                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash-agg. Catalyst plans a partial
    (map-side) + final agg, so the shuffle carries only group keys ×
    partials — the canonical 100 TB-safe aggregation."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r4(F.sum(disc_price)).alias("sum_disc_price"),
            _r4(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q6_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter-agg; all four predicates push to the
    parquet scan (verify with .explain → PushedFilters)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    return (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
            & F.col("l_discount").between(0.03, 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS distinct_suppliers,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(*)                  AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (Catalyst expands to a two-stage
    expand+agg plan; at scale prefer approx_count_distinct — offered in
    the engine API but not oracle-checkable bit-exactly)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_rollup_region_nation",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.4 'cube/rollup/grouping sets').
    Dimensions are broadcast so the customer scan never shuffles for the
    join — only for the final rollup agg."""
    t = load_tables(spark, sf_dir)
    c, n, r = t["customer"], t["nation"], t["region"]
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _r4(F.sum("c_acctbal")).alias("sum_acctbal"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3 fill)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension (filtered customer) broadcast
    into orders, then a key-partitioned join to lineitem; ends in
    TakeOrderedAndProject (no full sort at scale)."""
    t = load_tables(spark, sf_dir)
    cut = F.to_timestamp(F.lit("1998-03-15 00:00:00"))
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < cut)
    l = t["lineitem"].filter(F.col("l_shipdate") > cut)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. supplier/nation/region broadcast;
    the only big shuffles are orders⋈lineitem on orderkey and the final
    group-by — the plan a 1000-executor cluster wants."""
    t = load_tables(spark, sf_dir)
    c, o, l, s, n, r = (
        t["customer"],
        t["orders"],
        t["lineitem"],
        t["supplier"],
        t["nation"],
        t["region"],
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01 00:00:00")))
    )
    r = r.filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "join_semi_customers_with_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", _r4(F.col("c_acctbal")).alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# Projections / filters / scalar functions (SURVEY §2.2, §2.8)
# ---------------------------------------------------------------------------


@query(
    "filter_predicates_part",
    """
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_type IN ('PROMO', 'SMALL', 'STANDARD')
      AND p_name LIKE '%a%'
      AND p_retailprice > 500.0
    """,
)
def filter_predicates_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Column predicate algebra (between/isin/like/comparison) —
    all pushed to the parquet scan by Catalyst."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(
            F.col("p_size").between(10, 30)
            & F.col("p_type").isin("PROMO", "SMALL", "STANDARD")
            & F.col("p_name").like("%a%")
            & (F.col("p_retailprice") > 500.0)
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


@query(
    "project_cast_conditional",
    """
    SELECT event_id,
           CAST(user_id AS VARCHAR)            AS user_id_str,
           CAST(floor(value) AS BIGINT)        AS value_floor,
           upper(event_type)                   AS event_type_uc,
           coalesce(value, 0.0)                AS value_filled,
           CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END AS value_bucket,
           substring(event_type, 1, 3)         AS type_prefix
    FROM events
    """,
)
def project_cast_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts, conditionals, string functions — the reference's P2/P4/P5
    normalization idioms (bronze_assets_to_silver_assets.py:91-149)
    generalized."""
    t = load_tables(spark, sf_dir)
    return t["events"].select(
        "event_id",
        F.col("user_id").cast("string").alias("user_id_str"),
        F.floor("value").alias("value_floor"),
        F.upper("event_type").alias("event_type_uc"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.when(F.col("value") > 100, "hi").otherwise("lo").alias("value_bucket"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
    )


@query(
    "scalar_surrogate_uid",
    """
    SELECT c_custkey,
           sha256(concat_ws('|',
                  lower(trim(c_name)),
                  lower(trim(c_mktsegment)),
                  lower(trim(CAST(c_custkey AS VARCHAR))))) AS asset_uid
    FROM customer
    """,
)
def scalar_surrogate_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's deterministic surrogate-key idiom
    (bronze_assets_to_silver_assets.py:139-149) as an engine function."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select(
        "c_custkey",
        surrogate_uid("c_name", "c_mktsegment", "c_custkey").alias("asset_uid"),
    )


@query(
    "scalar_datetime",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           date_trunc('month', o_orderdate)    AS month_start,
           count(*)                            AS n_orders,
           round(sum(o_totalprice), 4)         AS sum_total
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time arithmetic (SURVEY §2.8 ABSENT category)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    return (
        o.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r4(F.sum("o_totalprice")).alias("sum_total"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5 fill)
# ---------------------------------------------------------------------------


@query(
    "window_rank_topk",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the relational form of the
    reference's driver-side 'newest N files' sort+slice
    (schema_inferer.py:212-216; SURVEY §2.5)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            _r4(F.col("o_totalprice")).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 4) AS totalprice,
           round(lag(o_totalprice)  OVER w, 4) AS prev_price,
           round(lead(o_totalprice) OVER w, 4) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        _r4(F.col("o_totalprice")).alias("totalprice"),
        _r4(F.lag("o_totalprice").over(w)).alias("prev_price"),
        _r4(F.lead("o_totalprice").over(w)).alias("next_price"),
    )


@query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        _r4(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits (SURVEY §2.6), set ops (§2.7)
# ---------------------------------------------------------------------------


@query(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS totalprice,
           o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst plans TakeOrderedAndProject (per-partition
    heap + driver merge of k rows, never a full sort) — the 100 TB-safe
    form of ORDER BY ... LIMIT."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            _r4(F.col("o_totalprice")).alias("totalprice"),
            "o_orderpriority",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "setop_union_nations_in_use",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "setop_intersect_active_custkeys",
    """
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_custkey").alias("custkey"))
        .intersect(t["orders"].select(F.col("o_custkey").alias("custkey")))
    )


@query(
    "setop_except_inactive_custkeys",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_custkey").alias("custkey"))
        .exceptAll(t["orders"].select(F.col("o_custkey").alias("custkey")))
        .distinct()
    )


@query(
    "agg_collect_sets",
    """
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS event_types,
           CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types,
           array_to_string(list_sort(list(DISTINCT event_type))[1:2], ',')
               AS first_two
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_set + sort_array + slice), rendered
    to a joined string so the value check is engine-portable. At scale
    collect_set is bounded by per-group distinct cardinality — safe for
    enum-like columns, never for unbounded ones."""
    t = load_tables(spark, sf_dir)
    e, c = t["events"], t["customer"]
    types = F.sort_array(F.collect_set("event_type"))
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(types, ",").alias("event_types"),
            F.size(types).alias("n_types"),
            F.array_join(F.slice(types, 1, 2), ",").alias("first_two"),
        )
    )


@query(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)                AS abs_dev,
           round(pow(l_quantity, 2), 4)                    AS qty_sq,
           round(ln(l_extendedprice + 1), 4)               AS log_price,
           round(sqrt(l_quantity), 4)                      AS sqrt_qty,
           round(greatest(l_discount, l_tax), 4)           AS max_rate,
           round(least(l_discount, l_tax), 4)              AS min_rate,
           CAST(floor(l_extendedprice / 1000) AS BIGINT)   AS price_k,
           round(l_extendedprice % 100, 4)                 AS price_mod
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 math-function surface (abs/pow/ln/sqrt/greatest/least/
    floor/mod) in one projection — all codegen expressions; the small
    key filter keeps the oracle comparison cheap without changing the
    plan shape (scan→filter→project)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        _r4(F.abs(F.col("l_discount") - 0.05)).alias("abs_dev"),
        _r4(F.pow("l_quantity", F.lit(2))).alias("qty_sq"),
        _r4(F.log(F.col("l_extendedprice") + 1)).alias("log_price"),
        _r4(F.sqrt("l_quantity")).alias("sqrt_qty"),
        _r4(F.greatest("l_discount", "l_tax")).alias("max_rate"),
        _r4(F.least("l_discount", "l_tax")).alias("min_rate"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        _r4(F.col("l_extendedprice") % 100).alias("price_mod"),
    )


@query("agg_hll_sketch_merge")  # rows-only: HLL sketch bytes are engine-specific
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-AGGREGATABLE distinct counts: build an HLL sketch per
    (event_type, day) partial, then MERGE the partials per event_type
    and estimate — the incremental pattern that lets a 100 TB pipeline
    maintain daily sketch tables and answer any-date-range distinct
    queries by union instead of rescanning raw events.
    (approx_count_distinct gives one estimate; sketch_agg + union_agg
    gives composable state.) Estimate pinned against exact distinct in
    tests/test_oracle_parity.py."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_users"),
            F.count(F.lit(1)).alias("n_daily_partials"),
        )
    )


# ---------------------------------------------------------------------------
# Window combo (§2.5): lag/lead, running sum, first/last/nth, ntile /
# percent_rank / cume_dist, and a 90-day RANGE frame in ONE projection.
# ---------------------------------------------------------------------------


@query(
    "window_analytics",
    """
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice)  OVER w, 4) AS prev_price,
           round(lead(o_totalprice) OVER w, 4) AS next_price,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_spend,
           round(first_value(o_totalprice) OVER wall, 4) AS first_price,
           round(last_value(o_totalprice)  OVER wall, 4) AS last_price,
           round(nth_value(o_totalprice, 2) OVER wall, 4) AS second_price,
           CAST(ntile(4) OVER w AS INT)       AS tile,
           round(percent_rank() OVER w, 4)    AS pct_rank,
           round(cume_dist()    OVER w, 4)    AS cum_dist,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 4)
               AS rolling_90d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wall AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.5 analytic-function set in one per-customer pass. One
    partitionBy(o_custkey) sort serves every function (Catalyst reuses
    the sort across same-spec windows) — at 100 TB this is one shuffle
    on the partition key, then partition-local sorts."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wrange = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        _r4(F.lag("o_totalprice").over(w)).alias("prev_price"),
        _r4(F.lead("o_totalprice").over(w)).alias("next_price"),
        _r4(F.sum("o_totalprice").over(wrun)).alias("running_spend"),
        _r4(F.first("o_totalprice").over(wall)).alias("first_price"),
        _r4(F.last("o_totalprice").over(wall)).alias("last_price"),
        _r4(F.nth_value("o_totalprice", 2).over(wall)).alias("second_price"),
        F.ntile(4).over(w).alias("tile"),
        _r4(F.percent_rank().over(w)).alias("pct_rank"),
        _r4(F.cume_dist().over(w)).alias("cum_dist"),
        _r4(F.sum("o_totalprice").over(wrange)).alias("rolling_90d"),
    )


# ---------------------------------------------------------------------------
# Set-op combo (§2.7): all five flavors, tagged union, full value check.
# ---------------------------------------------------------------------------


@query(
    "setop_flavors",
    """
    SELECT 'union_distinct' AS flavor, CAST(nationkey AS DOUBLE) AS val FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect_distinct', CAST(custkey AS DOUBLE) FROM (
        SELECT c_custkey AS custkey FROM customer
        INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'except_distinct', CAST(custkey AS DOUBLE) FROM (
        SELECT c_custkey AS custkey FROM customer
        EXCEPT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'except_all', l_quantity FROM (
        SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT ALL SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A')
    UNION ALL
    SELECT 'intersect_all', l_quantity FROM (
        SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A')
    """,
)
def setop_flavors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five set-operation flavors (union / intersect / except
    distinct, intersect/except ALL bag semantics) in one tagged union —
    every output row of every flavor is value-checked."""
    t = load_tables(spark, sf_dir)
    c, s, o, l = t["customer"], t["supplier"], t["orders"], t["lineitem"]

    def tag(name: str, df: DataFrame, col: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("flavor"), F.col(col).cast("double").alias("val")
        )

    union_d = (
        c.select(F.col("c_nationkey").alias("k"))
        .union(s.select("s_nationkey"))
        .distinct()
    )
    inter_d = c.select(F.col("c_custkey").alias("k")).intersect(
        o.select("o_custkey")
    )
    except_d = (
        c.select(F.col("c_custkey").alias("k"))
        .exceptAll(o.select("o_custkey"))
        .distinct()
    )
    r = l.filter(F.col("l_returnflag") == "R").select("l_quantity")
    a = l.filter(F.col("l_returnflag") == "A").select("l_quantity")
    return (
        tag("union_distinct", union_d, "k")
        .unionByName(tag("intersect_distinct", inter_d, "k"))
        .unionByName(tag("except_distinct", except_d, "k"))
        .unionByName(tag("except_all", r.exceptAll(a), "l_quantity"))
        .unionByName(tag("intersect_all", r.intersectAll(a), "l_quantity"))
    )


# ---------------------------------------------------------------------------
# Multidimensional aggregation combo (§2.4): rollup + cube + grouping sets.
# ---------------------------------------------------------------------------


@query(
    "agg_multidim",
    """
    SELECT 'rollup' AS mode, r_name AS g1, n_name AS g2,
           count(*) AS n, round(sum(c_acctbal), 4) AS sum_val
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'cube', l_returnflag, l_linestatus,
           count(*), round(sum(l_extendedprice), 4)
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'gsets', r_name, n_name,
           count(*), round(sum(c_acctbal), 4)
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
    """,
)
def agg_multidim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + explicit GROUPING SETS in one tagged union.
    Catalyst expands each to a single Expand+agg (one shuffle per arm,
    not one per grouping combination)."""
    t = load_tables(spark, sf_dir)
    c, n, r = t["customer"], t["nation"], t["region"]
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    rollup = (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"), _r4(F.sum("c_acctbal")).alias("sum_val"))
        .select(
            F.lit("rollup").alias("mode"),
            F.col("r_name").alias("g1"),
            F.col("n_name").alias("g2"),
            "n",
            "sum_val",
        )
    )
    cube = (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(F.sum("l_extendedprice")).alias("sum_val"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            "n",
            "sum_val",
        )
    )
    gsets = spark.sql(
        """
        SELECT 'gsets' AS mode, r_name AS g1, n_name AS g2,
               count(*) AS n, round(sum(c_acctbal), 4) AS sum_val
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gsets)


# ---------------------------------------------------------------------------
# Pivot → unpivot round trip (§2.4).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "agg_pivot_unpivot",
    """
    SELECT c_mktsegment, event_type, round(sum(value), 4) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    HAVING sum(value) IS NOT NULL
    """,
)
def agg_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list — stable schema, no discovery pass)
    then unpivot back to long form: both reshape operators in one plan.
    Null cells are filtered on BOTH sides (Spark: post-unpivot filter;
    oracle: HAVING sum IS NOT NULL) so the contract is data-independent
    — a group whose ``value`` column is entirely NULL (sum → NULL) is
    excluded identically whether it arises from an absent combination
    or from real NULL-valued rows."""
    t = load_tables(spark, sf_dir)
    e, c = t["events"], t["customer"]
    wide = (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("event_type", _EVENT_TYPES)
        .agg(_r4(F.sum("value")))
    )
    return (
        wide.unpivot(
            ids=["c_mktsegment"],
            values=_EVENT_TYPES,
            variableColumnName="event_type",
            valueColumnName="sum_value",
        )
        .filter(F.col("sum_value").isNotNull())
    )


# ---------------------------------------------------------------------------
# Distinct + percentile stats combo (§2.4).
# ---------------------------------------------------------------------------


@query(
    "agg_distinct_stats",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS distinct_suppliers,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(*)                  AS n_lines,
           round(median(l_extendedprice), 4)             AS med_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4)     AS p25_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct counts + exact median/percentiles per group.

    Deliberately TWO aggregations joined on the (tiny) group key, not
    one: mixing countDistinct with percentile in a single agg makes
    Catalyst Expand the input 3× and haul per-(key,gid) percentile
    object-buffers through the distinct shuffle — measured 5-9s at
    sf0.1 vs ~1s for this split shape. Each arm is the canonical plan
    (Expand+count for distincts, sort-agg for percentiles); the join is
    a broadcast over group-cardinality rows. At 100 TB swap in
    approx_count_distinct / approx_percentile sketches (see
    agg_approx_distinct_users)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    d = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    # r16 measured negative (VERDICT r15 #7, kept as the exact agg):
    # the two-pass rank-selection that wins for stats_quantile_bins'
    # GLOBAL quantiles (serial single-buffer sort → parallel hash aggs)
    # LOSES here — with 3 groups the exact percentile already
    # parallelizes across group partitions, and the selection's six
    # driver-actioned passes (2 value columns × geometry/histogram/
    # stripe) cost more than they save: 1.60 → 2.26 s wall, 3.4 → 9.7
    # CPU s same-session. At 100 TB per-group value buffers would still
    # force the swap (or approx_percentile, as documented below).
    p = l.groupBy("l_returnflag").agg(
        _r4(F.median("l_extendedprice")).alias("med_price"),
        _r4(F.percentile("l_extendedprice", F.lit(0.9))).alias("p90_price"),
        _r4(F.percentile("l_quantity", F.lit(0.25))).alias("p25_qty"),
    )
    return d.join(F.broadcast(p), "l_returnflag")


# ---------------------------------------------------------------------------
# Scalar-function suite (§2.8): surrogate key + datetime + regex + string
# functions in one per-row projection over orders.
# ---------------------------------------------------------------------------


@query(
    "scalar_functions_suite",
    """
    SELECT o_orderkey,
           sha256(concat_ws('|',
                  lower(trim(o_orderstatus)),
                  lower(trim(o_orderpriority)),
                  lower(trim(CAST(o_orderkey AS VARCHAR))))) AS order_uid,
           CAST(year(o_orderdate) AS INTEGER)  AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           date_trunc('month', o_orderdate)    AS month_start,
           CAST(regexp_extract(o_orderpriority, '(\\d+)-', 1) AS INTEGER)
               AS prio_num,
           regexp_replace(o_orderpriority, '[0-9-]', '', 'g') AS prio_word,
           substring(o_orderpriority, 1, 1)    AS prio_prefix
    FROM orders
    """,
)
def scalar_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar surface in one projection: the reference's surrogate
    uid idiom (sha2/concat_ws/lower/trim/cast —
    bronze_assets_to_silver_assets.py:139-149), date/time arithmetic,
    and regex extract/replace. All JVM codegen expressions."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        surrogate_uid("o_orderstatus", "o_orderpriority", "o_orderkey").alias(
            "order_uid"
        ),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.regexp_extract("o_orderpriority", r"(\d+)-", 1)
        .cast("int")
        .alias("prio_num"),
        F.regexp_replace("o_orderpriority", "[0-9-]", "").alias("prio_word"),
        F.substring("o_orderpriority", 1, 1).alias("prio_prefix"),
    )

@query("agg_approx_percentile")  # rows-only: t-digest sketch is engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch): the 100 TB percentile
    path — fixed-size sketch per partition merged at the driver side of
    the agg, vs the exact percentile's per-group full sort. No DuckDB
    oracle (sketch internals differ); the estimate is pinned within 1%
    of exact in tests/test_oracle_parity.py."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
            ).alias("price_percentiles"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
