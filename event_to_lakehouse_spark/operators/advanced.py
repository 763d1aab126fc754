"""Advanced relational catalog: TPC-H-class multi-join analytics,
multidimensional aggregation (cube / grouping sets / pivot), window
frames (ntile/percentile, range frames), range & as-of joins, regex and
array higher-order functions, and sliding event windows.

These fill the remaining SURVEY.md §2 ABSENT categories (joins §2.3,
aggregations §2.4, windows §2.5, scalar fns §2.8, streaming analogs
§2.9) beyond the base catalog in ``relational.py``. Oracle-parity
conventions are identical (see that module's docstring).

Scale notes (100 TB posture):
- multi-join pipelines put the fact table (lineitem/events) on the
  probe side and ``broadcast`` every dimension (region/nation/
  supplier/part at dimension cardinality); only fact↔fact joins
  (orders↔lineitem, events↔events) shuffle, on their natural keys.
- the self-joins (range/as-of/jaccard) are equi-keyed on high-
  cardinality keys (user_id, blocking prefix) so they hash-partition
  evenly; AQE's skew-join splitting covers hot users.
- window frames are per-partition sorts — no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_tables
from .relational import _r4, query

# ---------------------------------------------------------------------------
# TPC-H-class multi-join analytics (SURVEY §2.3/§2.4 fill)
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join with a non-equi
    residual (l_shipdate > o_orderdate). Catalyst plans the semi join
    on l_orderkey with the range predicate as join residual — no
    decorrelation machinery needed."""
    t = load_tables(spark, sf_dir)
    o, l = t["orders"], t["lineitem"]
    cond = (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate)
    return (
        o.filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01 00:00:00")))
        )
        .join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 5-way join. supplier and both nation copies are
    broadcast (dimension cardinality); orders↔lineitem is the only
    shuffle join, on the orderkey both sides already produce."""
    t = load_tables(spark, sf_dir)
    l, s, o, c = t["lineitem"], t["supplier"], t["orders"], t["customer"]
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by returned-item revenue.
    orderBy().limit() plans TakeOrderedAndProject — per-partition top-k
    then a k-row merge on the driver, never a global sort."""
    t = load_tables(spark, sf_dir)
    c, o, l, n = t["customer"], t["orders"], t["lineitem"], t["nation"]
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-03-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast
    dimension join — the ratio is computed in one pass."""
    t = load_tables(spark, sf_dir)
    l, p = t["lineitem"], t["part"]
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-03-01 00:00:00")))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            _r4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 4) AS total_price,
           round(sum(l_quantity), 4) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders. The HAVING subquery is a
    pre-aggregated semi join — the aggregate runs once and its (small)
    passing key set semi-joins the fact pipeline."""
    t = load_tables(spark, sf_dir)
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_r4(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _r4(F.col("o_totalprice")).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_preds",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    pushes the derivable single-side conjuncts (brand/size union,
    quantity union) below the join and keeps the cross-side residual."""
    t = load_tables(spark, sf_dir)
    l, p = t["lineitem"], t["part"]

    def arm(brand: str, smax: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )

    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#3", 15, 20, 30)
        )
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Multidimensional aggregation: cube / grouping sets / pivot (§2.4 fill)
# ---------------------------------------------------------------------------


@query(
    "agg_cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 4) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one shuffle (Catalyst
    expands to grouping sets, not k separate scans)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_extendedprice")).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_grouping_sets",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL on the registered views — region
    totals, region×nation detail, and grand total in one pass."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name, n_name, count(*) AS n_customers,
               round(sum(c_acctbal), 4) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        """
    )


@query(
    "agg_pivot_segment_events",
    """
    SELECT c_mktsegment,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 4) AS click,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 4) AS view,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 4) AS signup,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 4) AS error
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_pivot_segment_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct pass to
    discover columns — required for a stable schema at scale)."""
    t = load_tables(spark, sf_dir)
    e, c = t["events"], t["customer"]
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(_r4(F.sum("value")))
    )


@query("agg_approx_distinct_users")  # no oracle: HLL sketches are engine-specific
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale
    cardinality path — fixed-size sketch per partition, no exact
    distinct shuffle. Rows-only check (DuckDB's HLL differs)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "agg_unpivot_measures",
    """
    SELECT l_returnflag, measure, round(avg(val), 4) AS avg_val
    FROM (UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice,
                          l_discount, l_tax FROM lineitem)
          ON l_quantity, l_extendedprice, l_discount, l_tax
          INTO NAME measure VALUE val)
    GROUP BY l_returnflag, measure
    """,
)
def agg_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide measure columns to long (measure, value) rows
    — the inverse of pivot, one narrow projection (no shuffle until the
    aggregate)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .unpivot(
            ids=["l_returnflag"],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="val",
        )
        .groupBy("l_returnflag", "measure")
        .agg(_r4(F.avg("val")).alias("avg_val"))
    )


@query(
    "agg_median_percentile",
    """
    SELECT l_returnflag,
           round(median(l_extendedprice), 4)            AS med_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4)     AS p25_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / interpolated percentiles. Exact percentile is a
    full-sort-per-group aggregate — fine at dashboard cardinalities;
    the sketch path for 100 TB is approx_percentile (see
    agg_approx_distinct_users for the rows-only sketch pattern)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            _r4(F.median("l_extendedprice")).alias("med_price"),
            _r4(F.percentile("l_extendedprice", F.lit(0.9))).alias("p90_price"),
            _r4(F.percentile("l_quantity", F.lit(0.25))).alias("p25_qty"),
        )
    )


@query(
    "events_props_map_explode",
    """
    SELECT k AS prop_key, count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT)
             AS total
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def events_props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType path: JSON props parsed to map<string,bigint>, exploded
    to (key, value) rows, aggregated per key — the generic form of
    schema-on-read over semi-structured payloads (SURVEY §2.8
    from_json note)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(
            F.explode(
                F.from_json("props", T.MapType(T.StringType(), T.LongType()))
            ).alias("prop_key", "v")
        )
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )


# ---------------------------------------------------------------------------
# Window frames (§2.5 fill)
# ---------------------------------------------------------------------------


@query(
    "window_ntile_percentile",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INT) AS tile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist()    OVER w, 4) AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions; ordering carries a unique
    tiebreak (c_custkey) so every rank is deterministic."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("tile"),
        _r4(F.percent_rank().over(w)).alias("pct_rank"),
        _r4(F.cume_dist().over(w)).alias("cum_dist"),
    )


@query(
    "window_range_frame_90d",
    """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW), 4)
           AS rolling_90d
    FROM orders
    """,
)
def window_range_frame_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-customer 90-day rolling spend.
    Spark's rangeBetween needs a numeric ordering key, so the frame
    runs on epoch seconds — identical [t-90d, t] inclusive bounds."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        _r4(F.sum("o_totalprice").over(w)).alias("rolling_90d"),
    )


# ---------------------------------------------------------------------------
# Range & as-of joins (§2.3 fill — the reference has no joins at all)
# ---------------------------------------------------------------------------


@query(
    "join_range_follow_events",
    """
    SELECT a.event_id, count(*) AS n_follow, round(sum(b.value), 4) AS sum_follow
    FROM events a
    JOIN events b ON a.user_id = b.user_id
                 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
)
def join_range_follow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: activity within 1h after each purchase.
    Equi-keyed on user_id (hash-partitions evenly at scale) with the
    time range as join residual — never a cross product."""
    t = load_tables(spark, sf_dir)
    a = t["events"].filter(F.col("event_type") == "purchase").alias("a")
    b = t["events"].alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            _r4(F.sum(F.col("b.value"))).alias("sum_follow"),
        )
    )


@query(
    "join_asof_prior_purchase",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         cand AS (
           SELECT e.event_id, p.event_id AS purchase_id, p.value,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY p.ts DESC, p.event_id DESC) AS rn
           FROM e JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts
         )
    SELECT event_id, purchase_id, round(value, 4) AS purchase_value
    FROM cand WHERE rn = 1
    """,
)
def join_asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the most recent purchase by
    the same user at-or-before it. Composition of built-ins — equi
    join on user + row_number over the candidate set (SURVEY §7.4:
    custom operators as compositions first). Deterministic tiebreak on
    purchase event_id for identical timestamps."""
    t = load_tables(spark, sf_dir)
    e = (
        t["events"]
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .alias("e")
    )
    p = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            "value",
        )
        .alias("p")
    )
    w = Window.partitionBy("e.event_id").orderBy(
        F.desc("p_ts"), F.desc("purchase_id")
    )
    return (
        e.join(p, (F.col("e.user_id") == F.col("p_user")) & (F.col("p_ts") <= F.col("e.ts")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "purchase_id", _r4(F.col("value")).alias("purchase_value"))
    )


# ---------------------------------------------------------------------------
# Sliding event windows (§2.9 batch analog)
# ---------------------------------------------------------------------------


@query(
    "events_sliding_window",
    """
    WITH e AS (SELECT value, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
         c AS (SELECT value, (t // 1800) * 1800 AS s0 FROM e),
         x AS (SELECT value, unnest([s0, s0 - 1800]) AS window_start FROM c)
    SELECT window_start, count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM x GROUP BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h window / 30min slide): each event lands in
    exactly two epoch-aligned windows. Same F.window call works
    unchanged over readStream with a watermark (§2.9). Output key is
    epoch seconds (bigint) to sidestep engine timestamp-tz types."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "join_cross_region_pairs",
    """
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (dimension×dimension only — the one join
    shape that must never touch a fact table at scale)."""
    t = load_tables(spark, sf_dir)
    a = t["region"].select(F.col("r_name").alias("region_a"))
    b = t["region"].select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") < F.col("region_b"))


# ---------------------------------------------------------------------------
# Interval-overlap join (§2.3 fill — interval×interval, vs. the
# point-in-interval range join above)
# ---------------------------------------------------------------------------

# Bucket width (days) for the interval-overlap equi-join rewrite. Each
# interval explodes into ceil(len/B)+1 coarse buckets; candidate pairs
# meet on (key, bucket) and the exact overlap predicate runs as a join
# residual. B trades explode fan-out (len/B rows per interval) against
# per-bucket pair density — 30 days ≈ 18 buckets for the ~520-day
# median fulfillment span of this corpus.
IV_OVERLAP_BUCKET_DAYS = 30


@query(
    "join_interval_overlap",
    """
    WITH span AS (
      SELECT o.o_custkey AS custkey, o.o_orderkey AS okey,
             CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS s,
             greatest(
               CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT),
               CAST(min(floor(epoch(l.l_shipdate) / 86400)) AS BIGINT)
             ) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
    )
    SELECT a.custkey AS c_custkey,
           a.okey AS okey_a, b.okey AS okey_b,
           a.s AS start_a, b.s AS start_b,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_days
    FROM span a JOIN span b
      ON a.custkey = b.custkey AND a.okey < b.okey
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap self-join: pairs of the same
    customer's orders whose fulfillment windows [order date, first
    shipment] overlap — "how often does this customer have several
    orders open at once". Distinct from ``join_range_follow_events``
    (point-in-interval): BOTH sides are interval sets, the classic
    shape Spark has no native operator for.

    Scale plan (the 100 TB story): the naive theta join
    (a.s <= b.e AND b.s <= a.e) is a per-key cross product. Instead
    each interval explodes into ~len/30d coarse time buckets and the
    join runs EQUI-keyed on (custkey, bucket) with the exact overlap
    test as a residual; `.distinct()` collapses pairs that meet in
    more than one shared bucket (every projected column is
    functionally determined by the pair's order keys, so row-level
    distinct == pair-level dedup). Partitioning hashes evenly on
    (custkey, bucket); a hot customer's pairs split across its
    buckets, and AQE skew-split covers the rest. The oracle states
    the same semantics as the direct theta join.

    `greatest(s, min(shipdate))` clamps spans: this synthetic corpus
    ships some lines before the order date, and a negative-length
    interval would silently drop its order from the pair space.
    All arithmetic is epoch-day BIGINT — bit-exact cross-engine.
    """
    t = load_tables(spark, sf_dir)
    day = lambda c: F.floor(F.unix_timestamp(F.col(c)) / 86400).cast("long")  # noqa: E731
    spans = (
        t["orders"]
        .join(
            t["lineitem"].select("l_orderkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("okey"),
            day("o_orderdate").alias("s"),
        )
        .agg(F.greatest(F.col("s"), F.min(day("l_shipdate"))).alias("e"))
    )
    B = IV_OVERLAP_BUCKET_DAYS
    exploded = spans.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / B).cast("long"),
                F.floor(F.col("e") / B).cast("long"),
            )
        ),
    )
    # Both join inputs keep IDENTICAL column names through the
    # (custkey, bucket) exchange and only the post-join projection
    # renames — that keeps the two subplans canonically equal, so the
    # physical planner emits ONE shuffle and a ReusedExchange for the
    # other side (pinned by test_plan_shapes): the span derivation and
    # the explode run once, not once per join side.
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.custkey") == F.col("b.custkey"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .where(
            (F.col("a.okey") < F.col("b.okey"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
        )
        .select(
            F.col("a.custkey").alias("c_custkey"),
            F.col("a.okey").alias("okey_a"),
            F.col("b.okey").alias("okey_b"),
            F.col("a.s").alias("start_a"),
            F.col("b.s").alias("start_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_days"),
        )
        .distinct()
    )


@query(
    "setop_except_all_quantities",
    """
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_except_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics — duplicates preserved per
    multiplicity difference), completing the set-op surface next to the
    distinct-flavored intersect/except entries."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    r = l.filter(F.col("l_returnflag") == "R").select("l_quantity")
    a = l.filter(F.col("l_returnflag") == "A").select("l_quantity")
    return r.exceptAll(a)


@query(
    "setop_intersect_all_quantities",
    """
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (min multiplicity per value)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    r = l.filter(F.col("l_returnflag") == "R").select("l_quantity")
    a = l.filter(F.col("l_returnflag") == "A").select("l_quantity")
    return r.intersectAll(a)


# ---------------------------------------------------------------------------
# Regex + array higher-order scalar functions (§2.8 fill)
# ---------------------------------------------------------------------------


@query(
    "scalar_regex",
    """
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants
    FROM part
    WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)$')
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike — all JVM-side codegen
    expressions (no UDF)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_type").rlike("^(PROMO|ECONOMY)$"))
        .select(
            "p_partkey",
            F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("consonants"),
        )
    )


@query(
    "array_hof_vector_stats",
    """
    SELECT vec_id,
           round(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> x * x), 'sum'), 4) AS sq_norm,
           round(coalesce(list_aggregate(list_filter(CAST(embedding AS DOUBLE[]),
                                                     x -> x > 0), 'sum'), 0.0), 4)
             AS pos_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    """,
)
def array_hof_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform / filter / aggregate)
    over the embedding column — all Catalyst expressions, no Python.
    Floats are cast to double BEFORE arithmetic so both engines do
    identical IEEE-double math."""
    t = load_tables(spark, sf_dir)
    vec = F.col("embedding").cast("array<double>")
    return t["embeddings"].select(
        "vec_id",
        _r4(
            F.aggregate(
                F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("sq_norm"),
        _r4(
            F.aggregate(
                F.filter(vec, lambda x: x > 0), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("pos_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
    )


@query(
    "join_basket_copurchase",
    """
    WITH pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
    FROM pairs
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def join_basket_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase pairs: parts appearing in the same
    order, counted and top-k'd.

    Shape: a fact-fact SELF-join strictly equi-keyed on l_orderkey, so
    both sides co-partition on one shuffle key and the pair blow-up is
    bounded by per-order basket size (≤7 lines in TPC-H-shaped data),
    never corpus size. The pair aggregation reuses no extra exchange
    beyond its own groupBy, and the final top-20 is
    TakeOrderedAndProject — no global sort. Deterministic (count,
    part_a, part_b) ordering keeps the LIMIT engine-stable."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].select("l_orderkey", "l_partkey")
    # r15 (guide §2.4, the _copurchase_edges shape): ONE groupBy shuffle
    # builds per-order part LISTS (collect_list, not set — the oracle's
    # join counts every lineitem combination, so within-order part
    # repeats must keep their multiplicity: m_a·m_b pairs per order,
    # exactly what the row-local list×list expansion under a < b
    # yields); the previous fact-fact self-join co-partitioned the same
    # bytes twice. Basket size bounds the expansion as before.
    # r16: two chained generators instead of the nested transform×
    # transform HOF — same pair multiset (lists keep multiplicity), no
    # basket²-struct array allocation per row (see _copurchase_edges).
    return (
        l.groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("part_a"), "ps")
        .select("part_a", F.explode("ps").alias("part_b"))
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "agg_value_histogram",
    """
    SELECT event_type,
           CAST(floor(value / 25.0) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type, bucket
    """,
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per event type (25-unit buckets as
    ``floor(value/width)`` — arithmetic bucketing is engine-portable,
    unlike ``width_bucket`` which this DuckDB lacks) — the
    distribution-profiling primitive; one scan, one partial-aggregated
    groupBy over a bounded (type × bucket) key space."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 25.0).cast("int").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(F.min("value")).alias("lo"),
            _r4(F.max("value")).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Semi + anti join combo (§2.3).
# ---------------------------------------------------------------------------


@query(
    "join_semi_anti",
    """
    SELECT 'semi' AS kind, c_custkey, c_name
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'anti', c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti over the same key, tagged union — the two
    existence-join flavors in one checked result."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    semi = c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        F.lit("semi").alias("kind"), "c_custkey", "c_name"
    )
    anti = c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        F.lit("anti").alias("kind"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


ASOF_TOLERANCE_S = 3600  # forward as-of: match must be within 1 hour


@query(
    "join_asof_forward_tolerance",
    f"""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         cand AS (
           SELECT e.event_id, c.event_id AS click_id,
                  (epoch_us(c.ts) - epoch_us(e.ts)) // 1000000 AS gap_s,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY c.ts ASC, c.event_id ASC) AS rn
           FROM e JOIN c ON e.user_id = c.user_id
                        AND c.ts >= e.ts
                        AND epoch_us(c.ts) - epoch_us(e.ts)
                            <= CAST({ASOF_TOLERANCE_S} AS BIGINT) * 1000000
         )
    SELECT event_id, click_id, gap_s FROM cand WHERE rn = 1
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance bound: for each error, the
    next click by the same user within 1 hour (the "what did the user
    do right after the failure" shape; pandas merge_asof
    direction='forward' + tolerance). Same composition as the backward
    flavor — equi join on user, time-bounded predicate, row_number
    pick — so the candidate set is bounded by the tolerance window
    instead of the whole future, which is what keeps the join's
    per-key fan-in flat at 100 TB."""
    t = load_tables(spark, sf_dir)
    e = (
        t["events"]
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .alias("e")
    )
    c = (
        t["events"]
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .alias("c")
    )
    # exact µs arithmetic (floor-div to whole seconds): a difference of
    # per-timestamp second-casts is off by one when the sub-second
    # parts straddle, and DuckDB's epoch() rounds where Spark truncates
    gap_us = F.unix_micros(F.col("c_ts")) - F.unix_micros(F.col("e.ts"))
    gap = F.expr(
        "(unix_micros(c_ts) - unix_micros(e.ts)) div 1000000"
    )
    w = Window.partitionBy("e.event_id").orderBy(F.asc("c_ts"), F.asc("click_id"))
    return (
        e.join(
            c,
            (F.col("e.user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("e.ts"))
            & (gap_us <= ASOF_TOLERANCE_S * 1_000_000),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "click_id", gap.alias("gap_s"))
    )


# Tolerance for the nearest-direction as-of flavor: ±3 days bounds the
# candidate band (per-key fan-in stays flat at scale) while the sparse
# purchase stream still yields matches at every SF.
ASOF_NEAREST_TOLERANCE_S = 259_200


@query(
    "join_asof_nearest",
    f"""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         cand AS (
           SELECT e.event_id, p.event_id AS purchase_id,
                  abs(epoch_us(p.ts) - epoch_us(e.ts)) AS dist_us,
                  CASE WHEN p.ts <= e.ts THEN 'before' ELSE 'after' END AS side,
                  round(p.value, 4) AS purchase_value,
                  row_number() OVER (
                      PARTITION BY e.event_id
                      ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)) ASC,
                               p.event_id ASC) AS rn
           FROM e JOIN p ON e.user_id = p.user_id
            AND abs(epoch_us(p.ts) - epoch_us(e.ts))
                <= CAST({ASOF_NEAREST_TOLERANCE_S} AS BIGINT) * 1000000
         )
    SELECT event_id, purchase_id, side,
           dist_us // 1000000 AS dist_s, purchase_value
    FROM cand WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: for each error, the closest
    purchase by the same user in EITHER direction within ±3 days
    (pandas merge_asof direction='nearest' + tolerance — the sensor/
    trade alignment shape the backward and forward flavors above can't
    express). Same scale-safe composition: equi join on user_id, the
    tolerance band as join residual (bounds per-key fan-in), one
    row_number pick over exact-µs distance with the purchase id as the
    deterministic tie-break when a before and an after candidate are
    equidistant. All distance arithmetic is integer microseconds —
    bit-exact cross-engine (see the forward flavor's epoch note)."""
    t = load_tables(spark, sf_dir)
    e = (
        t["events"]
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .alias("e")
    )
    p = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            "value",
        )
        .alias("p")
    )
    dist_us = F.abs(F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("e.ts")))
    w = Window.partitionBy("e.event_id").orderBy(
        dist_us.asc(), F.asc("purchase_id")
    )
    return (
        e.join(
            p,
            (F.col("e.user_id") == F.col("p_user"))
            & (dist_us <= ASOF_NEAREST_TOLERANCE_S * 1_000_000),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "purchase_id",
            F.when(F.col("p_ts") <= F.col("e.ts"), F.lit("before"))
            .otherwise(F.lit("after"))
            .alias("side"),
            F.expr(
                "abs(unix_micros(p_ts) - unix_micros(e.ts)) div 1000000"
            ).alias("dist_s"),
            _r4(F.col("value")).alias("purchase_value"),
        )
    )
