"""Business-insight analytics: attribution, market-basket rules, RFM
segmentation, survival curves, time-weighted averages, and the
experimentation/statistics operators a metrics warehouse layers on the
event stream (SURVEY §2 "beyond the reference" analytics tier,
round-6 extension).

Like ``operators/stats.py``, everything here is built on the
SUFFICIENT-STATISTICS / bounded-output pattern: each query is one scan
of its fact table (plus broadcast-scale dims), a key-cardinality
shuffle of small partial states, and a FIXED IEEE expression tree over
exact integer counts wherever possible — so the DuckDB oracles match
bit-for-bit to well past round(4), and at 100 TB the shuffle carries
kilobytes, not data.

Determinism rules carried from the r5/r6 lessons:

- Ordering inside a query (ntile, row_number) never sorts on a raw
  float SUM: monetary ranks use exact integer cents
  (``CAST(round(sum*100) AS BIGINT)``) so cross-engine FP summation
  noise cannot flip a quantile boundary.
- log2 degree buckets use ``length(bin(deg)) - 1`` (pure integer bit
  length, both engines) instead of ``floor(ln(d)/ln(2))``, which
  flips at exact powers of two on libm ulp differences.
- Tie-averaged ranks follow the ``stats_mannwhitney_value`` recipe:
  row_number over a total order, then (min+max)/2 per value block —
  multiples of 0.5, exact in double.
- Tiny intermediate aggregates that feed scalar branches are
  ``localCheckpoint(eager=False)``-ed so Catalyst does not re-derive
  the base scan per branch (the r6 N-scan lesson).

Reference parity note: the reference pipeline
(``bronze_assets_to_silver_assets.py``) stops at normalized silver
rows; this module is part of the beyond-reference analytics tier the
build brief requires, not a port of any reference file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query

# ---------------------------------------------------------------------------
# Marketing attribution (first/last touch)
# ---------------------------------------------------------------------------

_TOUCH = "CASE WHEN event_type <> 'purchase' THEN event_type END"


@query(
    "events_attribution",
    f"""
    WITH touched AS (
        SELECT event_type, value,
               first_value({_TOUCH} IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS first_touch,
               last_value({_TOUCH} IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_touch
        FROM events
    )
    SELECT coalesce(first_touch, '(none)') AS first_touch,
           coalesce(last_touch, '(none)')  AS last_touch,
           CAST(count(*) AS BIGINT)        AS conversions,
           round(sum(value), 4)            AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution.

    For every ``purchase`` event, the first and the most recent
    non-purchase event of the same user strictly before it (by
    (ts, event_id) — a total order, so the windows are deterministic)
    get the credit; conversions with no prior touch map to
    ``'(none)'``. One scan + one per-user window + a 5×5-bounded
    groupBy — the shuffle keys are (user) then (touch pair), so at
    100 TB the cost is the user-partitioned sort, which any
    sessionization already pays.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touched = e.select(
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        touched.where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
        .agg(
            F.count("*").cast("long").alias("conversions"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (brand level)
# ---------------------------------------------------------------------------

_MIN_PAIR_SUPPORT = 5


@query(
    "market_basket_rules",
    f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
    supp AS (SELECT item, count(*) AS s FROM items GROUP BY 1),
    pair AS (
        SELECT a.item AS antecedent, b.item AS consequent,
               count(*) AS s_pair
        FROM items a JOIN items b
          ON a.ok = b.ok AND a.item <> b.item
        GROUP BY 1, 2
    )
    SELECT antecedent, consequent,
           CAST(s_pair AS BIGINT) AS pair_support,
           round(CAST(s_pair AS DOUBLE) / CAST(sa.s AS DOUBLE), 4)
             AS confidence,
           round(CAST(s_pair AS DOUBLE) * CAST(n_orders AS DOUBLE)
                 / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)), 4)
             AS lift
    FROM pair
    JOIN supp sa ON sa.item = antecedent
    JOIN supp sb ON sb.item = consequent
    CROSS JOIN n
    WHERE s_pair >= {_MIN_PAIR_SUPPORT}
    """,
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (confidence + lift) over order baskets at the
    brand level.

    Items are distinct (order, brand) memberships — brand (25 values)
    keeps the directed-pair space ≤ 25×24 regardless of fact volume,
    the same catalog-bounded-output trick as the sketch family. The
    basket build is one lineitem scan + a broadcast part join; the
    pair count is a self-join co-partitioned on the order key (the
    identical shape ``join_basket_copurchase`` certifies); supports
    and the order count are broadcast back onto ≤600 pair rows. All
    counts are exact integers; confidence/lift are fixed division
    trees, so the oracle matches exactly.
    """
    t = load_tables(spark, sf_dir)
    # r15 (guide §2.4, the _copurchase_edges shape): per-order distinct
    # brand SETS in ONE groupBy shuffle — collect_set dedups the
    # (order, brand) memberships exactly as the previous DISTINCT did —
    # then supports, the order count, and the catalog-bounded pair
    # expansion all derive row-locally from the checkpointed sets; the
    # old plan paid a distinct shuffle plus a fact-fact self-join.
    sets = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"]),
            t["lineitem"]["l_partkey"] == t["part"]["p_partkey"],
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .groupBy("ok")
        .agg(F.collect_set("item").alias("items"))
        # Reused three ways (pairs, supports, order count):
        # materialize once instead of three base scans (r6 N-scan lesson).
        .localCheckpoint(eager=False)
    )
    n = sets.agg(F.count(F.lit(1)).alias("n_orders"))  # one row per order
    supp = (
        sets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("s"))
    )
    # r16: two chained generators instead of the nested transform×
    # transform HOF — same pair multiset, no basket²-struct array
    # allocation per row (see _copurchase_edges).
    pair = (
        sets.select(F.explode("items").alias("antecedent"), "items")
        .select("antecedent", F.explode("items").alias("consequent"))
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("s_pair"))
        .where(F.col("s_pair") >= _MIN_PAIR_SUPPORT)
    )
    sa = supp.select(F.col("item").alias("antecedent"), F.col("s").alias("sa"))
    sb = supp.select(F.col("item").alias("consequent"), F.col("s").alias("sb"))
    res = (
        pair.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(n))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return res.select(
        "antecedent",
        "consequent",
        F.col("s_pair").cast("long").alias("pair_support"),
        F.round(d("s_pair") / d("sa"), 4).alias("confidence"),
        F.round(d("s_pair") * d("n_orders") / (d("sa") * d("sb")), 4).alias(
            "lift"
        ),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@query(
    "customer_rfm_segments",
    """
    WITH base AS (
        SELECT o_custkey AS custkey,
               count(*) AS frequency,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS monetary_cents,
               max(o_orderdate) AS last_order
        FROM orders GROUP BY 1
    ),
    g AS (SELECT max(last_order) AS maxd FROM base),
    scored AS (
        SELECT custkey, frequency, monetary_cents,
               CAST(date_diff('day', last_order, maxd) AS BIGINT)
                 AS recency_days
        FROM base CROSS JOIN g
    ),
    q AS (
        SELECT recency_days, frequency, monetary_cents,
               ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency, custkey)         AS f_score,
               ntile(5) OVER (ORDER BY monetary_cents, custkey)    AS m_score
        FROM scored
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new_or_light'
                ELSE 'core' END AS segment,
           CAST(count(*) AS BIGINT) AS customers,
           round(avg(CAST(monetary_cents AS DOUBLE)) / 100.0, 4)
             AS avg_monetary,
           round(avg(CAST(recency_days AS DOUBLE)), 4) AS avg_recency_days,
           round(avg(CAST(frequency AS DOUBLE)), 4) AS avg_frequency
    FROM q GROUP BY 1, 2, 3, 4
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation.

    The per-customer rollup is the only fact-sized step (one orders
    scan, custkey shuffle); the quintile windows then run over the
    DIM-SCALE customer aggregate — a deliberate global sort of
    #customers rows, which is the catalog side of a warehouse, not the
    fact side (documented single-partition window, same posture as
    the ntile in ``window_analytics``). Determinism: monetary ranks on
    exact integer cents, never on a raw double sum — cross-engine FP
    summation-order noise cannot flip a boundary; all three ntiles
    tie-break on custkey.

    The avg_* output columns are double MEANS but carry no
    summation-order risk (ADVICE r6 reviewed): every summand
    (monetary_cents, recency_days, frequency) is an exact integer
    whose running double sum stays far below 2^53, so each partial sum
    is exact regardless of order; the final divide + round is a single
    deterministic IEEE op tree identical on both engines.
    """
    o = load_tables(spark, sf_dir)["orders"]
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("monetary_cents"),
            F.max("o_orderdate").alias("last_order"),
        )
        # dim-scale; feeds both the global-max scalar and the ranks
        .localCheckpoint(eager=False)
    )
    g = base.agg(F.max("last_order").alias("maxd"))
    scored = base.crossJoin(F.broadcast(g)).select(
        "custkey",
        "frequency",
        "monetary_cents",
        F.datediff("maxd", "last_order").cast("long").alias("recency_days"),
    )
    q = scored.select(
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), "custkey"))
        .alias("r_score"),
        F.ntile(5).over(Window.orderBy("frequency", "custkey")).alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary_cents", "custkey"))
        .alias("m_score"),
    )
    r, f_, m = F.col("r_score"), F.col("f_score"), F.col("m_score")
    segment = (
        F.when((r >= 4) & (f_ >= 4) & (m >= 4), "champion")
        .when((r <= 2) & (f_ >= 4), "at_risk_loyal")
        .when((r >= 4) & (f_ <= 2), "new_or_light")
        .otherwise("core")
    )
    return (
        q.groupBy(
            r.cast("long").alias("r_score"),
            f_.cast("long").alias("f_score"),
            m.cast("long").alias("m_score"),
            segment.alias("segment"),
        )
        .agg(
            F.count("*").cast("long").alias("customers"),
            F.round(F.avg(F.col("monetary_cents").cast("double")) / 100.0, 4)
            .alias("avg_monetary"),
            F.round(F.avg(F.col("recency_days").cast("double")), 4).alias(
                "avg_recency_days"
            ),
            F.round(F.avg(F.col("frequency").cast("double")), 4).alias(
                "avg_frequency"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (first -> second order)
# ---------------------------------------------------------------------------


@query(
    "survival_kaplan_meier",
    """
    WITH seq AS (
        SELECT o_custkey AS custkey, o_orderdate AS d,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ),
    per AS (
        SELECT custkey,
               min(CASE WHEN rn = 1 THEN d END) AS t1,
               min(CASE WHEN rn = 2 THEN d END) AS t2,
               max(d) AS tmax
        FROM seq GROUP BY 1
    ),
    g AS (SELECT max(tmax) AS maxd FROM per),
    obs AS (
        SELECT CASE WHEN t2 IS NOT NULL
                    THEN CAST(date_diff('day', t1, t2) AS BIGINT)
                    ELSE CAST(date_diff('day', t1, maxd) AS BIGINT)
               END AS dur,
               CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per CROSS JOIN g
    ),
    tot AS (SELECT count(*) AS n0 FROM obs),
    byd AS (
        SELECT dur,
               CAST(sum(ev) AS BIGINT) AS d_i,
               CAST(sum(1 - ev) AS BIGINT) AS c_i
        FROM obs GROUP BY 1
    ),
    km AS (
        SELECT dur, d_i, c_i,
               CAST(n0 AS BIGINT)
               - CAST(coalesce(sum(d_i + c_i) OVER (
                     ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS BIGINT)
                 AS n_i
        FROM byd CROSS JOIN tot
    )
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(n_i AS BIGINT) AS at_risk,
           CAST(d_i AS BIGINT) AS events,
           CAST(c_i AS BIGINT) AS censored,
           CASE WHEN max(CASE WHEN d_i >= n_i THEN 1 ELSE 0 END)
                     OVER (ORDER BY dur) = 1
                THEN 0.0
                ELSE round(exp(sum(ln(CASE WHEN d_i >= n_i THEN 1.0
                                           ELSE 1.0 - CAST(d_i AS DOUBLE)
                                                      / CAST(n_i AS DOUBLE)
                                      END))
                               OVER (ORDER BY dur)), 4)
           END AS survival
    FROM km
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-repeat-purchase.

    Duration = days from a customer's first to second order; customers
    with a single order are right-censored at the global last order
    date. The per-customer reduce is the one fact-sized step (orders
    scan + custkey window); the KM table then lives at
    distinct-duration cardinality (calendar-bounded). The estimator is
    the exact product-limit form computed as exp(Σ ln(1 - d/n)) over a
    cumulative window — a fixed IEEE tree over exact integer d_i/n_i.
    The d_i >= n_i (survival hits zero) case is handled by an explicit
    cumulative flag on BOTH engines because Spark's ``ln(0)`` is NULL
    while DuckDB's RAISES an Out of Range error (verified against
    duckdb 1.x) — the flag makes the divergent branch unreachable.
    """
    o = load_tables(spark, sf_dir)["orders"]
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("d"),
        F.row_number().over(wseq).alias("rn"),
    )
    per = (
        seq.groupBy("custkey")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("t1"),
            F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("t2"),
            F.max("d").alias("tmax"),
        )
        # dim-scale; feeds the global max AND the duration rollup
        .localCheckpoint(eager=False)
    )
    g = per.agg(F.max("tmax").alias("maxd"))
    obs = per.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1").cast("long")
        )
        .otherwise(F.datediff("maxd", "t1").cast("long"))
        .alias("dur"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    byd = (
        obs.groupBy("dur")
        .agg(
            F.sum("ev").cast("long").alias("d_i"),
            F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c_i"),
        )
        .localCheckpoint(eager=False)
    )
    tot = byd.agg(F.sum(F.col("d_i") + F.col("c_i")).alias("n0"))
    wcum_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = byd.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d_i",
        "c_i",
        (
            F.col("n0").cast("long")
            - F.coalesce(
                F.sum(F.col("d_i") + F.col("c_i")).over(wcum_prev), F.lit(0)
            ).cast("long")
        ).alias("n_i"),
    )
    dead = F.when(F.col("d_i") >= F.col("n_i"), 1).otherwise(0)
    # Same guarded log argument on BOTH engines: Spark's ln(0) is NULL,
    # DuckDB's RAISES — the flag row's factor is replaced by 1.0 and its
    # (and every later row's) output overridden to 0.0 by the outer CASE.
    factor = F.when(F.col("d_i") >= F.col("n_i"), F.lit(1.0)).otherwise(
        F.lit(1.0) - F.col("d_i").cast("double") / F.col("n_i").cast("double")
    )
    surv = F.when(F.max(dead).over(wcum) == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(F.log(factor)).over(wcum)), 4)
    )
    return km.select(
        F.col("dur").alias("duration_days"),
        F.col("n_i").alias("at_risk"),
        F.col("d_i").alias("events"),
        F.col("c_i").alias("censored"),
        surv.alias("survival"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP) per event_type x day
# ---------------------------------------------------------------------------


@query(
    "events_twap",
    """
    WITH seq AS (
        SELECT event_type, date_trunc('day', ts) AS day, value,
               epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id
               ) AS tn,
               epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) AS day_end
        FROM events WHERE value IS NOT NULL
    ),
    w AS (
        SELECT event_type, day, value,
               CAST(coalesce(tn, day_end) - t AS DOUBLE) / 1000000.0 AS wt
        FROM seq
    )
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value * wt) / sum(wt), 4) AS twap,
           round(sum(value), 4) AS sum_value
    FROM w GROUP BY 1, 2
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per (event_type, day) — the
    estimator a metrics pipeline uses when observations arrive at
    irregular intervals and each reading is valid until the next one.

    Each observation is weighted by its holding time in seconds: the
    gap to the next observation in the same (type, day) partition, or
    to midnight for the last one. Weights come from exact integer
    microsecond arithmetic (``unix_micros``/``epoch_us``), so both
    engines form identical doubles before the one rounded division.
    Shape: one scan + one (type, day)-partitioned window + a
    calendar-bounded groupBy.
    """
    e = load_tables(spark, sf_dir)["events"]
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    seq = (
        e.where(F.col("value").isNotNull())
        .withColumn("day", day)
        .select(
            "event_type",
            "day",
            "value",
            "ts",
            "event_id",
            F.unix_micros(F.col("ts")).alias("t"),
            F.unix_micros(F.col("day") + F.expr("INTERVAL 1 DAY")).alias(
                "day_end"
            ),
        )
        .withColumn("tn", F.lead("t").over(w))
    )
    wt = (F.coalesce("tn", "day_end") - F.col("t")).cast("double") / F.lit(
        1000000.0
    )
    return (
        seq.select("event_type", "day", "value", wt.alias("wt"))
        .groupBy("event_type", "day")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("value") * F.col("wt")) / F.sum("wt"), 4).alias(
                "twap"
            ),
            # sum, not avg: the raw values are 2-decimal rationals, so the
            # rounded SUM sits far from any round(4) boundary, while the
            # MEAN of n of them is structurally boundary-prone (x.xxxx5) —
            # one sf0.001 group landed exactly there and the engines'
            # ulp-different averages rounded apart.
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's t-test (click vs view values)
# ---------------------------------------------------------------------------

TT_TYPE_A, TT_TYPE_B = "click", "view"


@query(
    "stats_welch_ttest",
    f"""
    WITH s AS (
        SELECT
            count(*) FILTER (event_type = '{TT_TYPE_A}') AS na,
            sum(value) FILTER (event_type = '{TT_TYPE_A}') AS sa,
            sum(value * value) FILTER (event_type = '{TT_TYPE_A}') AS qa,
            count(*) FILTER (event_type = '{TT_TYPE_B}') AS nb,
            sum(value) FILTER (event_type = '{TT_TYPE_B}') AS sb,
            sum(value * value) FILTER (event_type = '{TT_TYPE_B}') AS qb
        FROM events
        WHERE event_type IN ('{TT_TYPE_A}', '{TT_TYPE_B}')
          AND value IS NOT NULL
    ),
    m AS (
        SELECT CAST(na AS DOUBLE) AS na, CAST(nb AS DOUBLE) AS nb,
               sa / CAST(na AS DOUBLE) AS ma, sb / CAST(nb AS DOUBLE) AS mb,
               (qa - sa * sa / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)
                 AS va,
               (qb - sb * sb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)
                 AS vb
        FROM s
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
           round((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_stat,
           round(pow(va / na + vb / nb, 2)
                 / (pow(va / na, 2) / (na - 1)
                    + pow(vb / nb, 2) / (nb - 1)), 4) AS df_welch
    FROM m
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event types'
    ``value`` distributions — the parametric sibling of
    ``stats_mannwhitney_value``.

    One scan, six conditional partial sums (n, Σv, Σv² per arm), then
    the closed-form t statistic and Welch–Satterthwaite df as a fixed
    IEEE tree — the mergeable-sufficient-statistics pattern, so the
    test is one scan at any scale and partial states merge across
    batches.
    """
    e = load_tables(spark, sf_dir)["events"]
    pooled = e.where(
        F.col("event_type").isin(TT_TYPE_A, TT_TYPE_B)
        & F.col("value").isNotNull()
    )
    is_a = F.col("event_type") == TT_TYPE_A
    is_b = F.col("event_type") == TT_TYPE_B
    v = F.col("value")
    s = pooled.agg(
        F.count(F.when(is_a, 1)).alias("na"),
        F.sum(F.when(is_a, v)).alias("sa"),
        F.sum(F.when(is_a, v * v)).alias("qa"),
        F.count(F.when(is_b, 1)).alias("nb"),
        F.sum(F.when(is_b, v)).alias("sb"),
        F.sum(F.when(is_b, v * v)).alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb, qa, qb = F.col("sa"), F.col("sb"), F.col("qa"), F.col("qb")
    m = s.select(
        na.alias("na"),
        nb.alias("nb"),
        (sa / na).alias("ma"),
        (sb / nb).alias("mb"),
        ((qa - sa * sa / na) / (na - F.lit(1))).alias("va"),
        ((qb - sb * sb / nb) / (nb - F.lit(1))).alias("vb"),
    )
    na2, nb2 = F.col("na"), F.col("nb")
    ma, mb, va, vb = F.col("ma"), F.col("mb"), F.col("va"), F.col("vb")
    se2 = va / na2 + vb / nb2
    return m.select(
        na2.cast("long").alias("n_a"),
        nb2.cast("long").alias("n_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round((ma - mb) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(va / na2, 2) / (na2 - F.lit(1))
                + F.pow(vb / nb2, 2) / (nb2 - F.lit(1))
            ),
            4,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (daily order count vs daily revenue)
# ---------------------------------------------------------------------------


@query(
    "stats_spearman_daily",
    """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               count(*) AS x,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    rx AS (
        SELECT day, x, y,
               row_number() OVER (ORDER BY x, day) AS rnx
        FROM daily
    ),
    ry AS (
        SELECT day, x, y, rnx,
               row_number() OVER (ORDER BY y, day) AS rny
        FROM rx
    ),
    ranked AS (
        SELECT
            (CAST(min(rnx) OVER (PARTITION BY x) AS DOUBLE)
             + CAST(max(rnx) OVER (PARTITION BY x) AS DOUBLE)) / 2.0 AS rx,
            (CAST(min(rny) OVER (PARTITION BY y) AS DOUBLE)
             + CAST(max(rny) OVER (PARTITION BY y) AS DOUBLE)) / 2.0 AS ry
        FROM ry
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
               sum(rx * ry) AS sxy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
             AS spearman_rho
    FROM s
    """,
)
def stats_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order volume and daily
    revenue — the robust monotone-association check beside the Pearson
    ``stats_corr_matrix``.

    Tie handling uses the exact average-rank recipe from
    ``stats_mannwhitney_value`` (row_number over a total order, then
    (min+max)/2 per value block — 0.5-quantized doubles, exact FP).
    Revenue ranks on exact integer cents so cross-engine sum noise
    cannot reorder ties. The daily rollup is the one fact-sized step;
    ranks and the Pearson-on-ranks closed form run at calendar
    cardinality.
    """
    o = load_tables(spark, sf_dir)["orders"]
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.count("*").alias("x"),
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("y"),
        )
    )
    rx = daily.withColumn(
        "rnx", F.row_number().over(Window.orderBy("x", "day"))
    )
    ry = rx.withColumn("rny", F.row_number().over(Window.orderBy("y", "day")))
    wx, wy = Window.partitionBy("x"), Window.partitionBy("y")
    ranked = ry.select(
        (
            (
                F.min("rnx").over(wx).cast("double")
                + F.max("rnx").over(wx).cast("double")
            )
            / 2.0
        ).alias("rx"),
        (
            (
                F.min("rny").over(wy).cast("double")
                + F.max("rny").over(wy).cast("double")
            )
            / 2.0
        ).alias("ry"),
    )
    s = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        n.cast("long").alias("n_days"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            4,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------


@query(
    "stats_theilsen_trend",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               (CAST(b.y AS DOUBLE) - CAST(a.y AS DOUBLE))
               / (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) AS slope
        FROM daily a
        JOIN daily b ON a.event_type = b.event_type AND b.x > a.x
    ),
    q AS (
        SELECT event_type, count(*) AS n_pairs,
               quantile_cont(slope, [0.25, 0.50, 0.75]) AS qs
        FROM pairs GROUP BY 1
    )
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           round(qs[1], 4) AS slope_q1,
           round(qs[2], 4) AS ts_slope,
           round(qs[3], 4) AS slope_q3
    FROM q
    """,
)
def stats_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event counts per type: the
    median (and IQR) of all pairwise day-to-day slopes — immune to the
    outlier days that bend ``events_trend_ols``.

    The pair space is CALENDAR-bounded: after the daily rollup (the
    one fact-sized step) each type has #days rows, so the self-join
    produces ~days²/2 slope rows per type regardless of fact volume —
    the same bounded-intermediate argument as the brand-pair basket.
    All three quantiles come from ONE array-percentile aggregate (the
    r6 multi-quantile lesson: scalar percentile aggregates each
    re-sort the column). Slopes are exact rationals of integer counts
    and day indices, so both engines interpolate identical medians.
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("x"),
    ).agg(F.count("*").cast("long").alias("y"))
    a = daily.select("event_type", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select("event_type", F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = (
        a.join(b, "event_type")
        .where(F.col("xb") > F.col("xa"))
        .select(
            "event_type",
            (
                (F.col("yb").cast("double") - F.col("ya").cast("double"))
                / (F.col("xb").cast("double") - F.col("xa").cast("double"))
            ).alias("slope"),
        )
    )
    q = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.percentile("slope", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias(
            "qs"
        ),
    )
    return q.select(
        "event_type",
        "n_pairs",
        F.round(F.col("qs")[0], 4).alias("slope_q1"),
        F.round(F.col("qs")[1], 4).alias("ts_slope"),
        F.round(F.col("qs")[2], 4).alias("slope_q3"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

CUPED_SPLIT = "2024-01-16"


@query(
    "experiment_cuped",
    f"""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               coalesce(sum(value) FILTER (ts <  TIMESTAMP '{CUPED_SPLIT}'),
                        0.0) AS x,
               coalesce(sum(value) FILTER (ts >= TIMESTAMP '{CUPED_SPLIT}'),
                        0.0) AS y
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    v AS (
        SELECT variant, CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM per_user GROUP BY 1
    ),
    g AS (
        SELECT variant, n, sx, sy, sxx, syy, sxy,
               sum(n) OVER () AS gn, sum(sx) OVER () AS gsx,
               sum(sxx) OVER () AS gsxx, sum(sxy) OVER () AS gsxy,
               sum(sy) OVER () AS gsy
        FROM v
    ),
    t AS (
        SELECT *,
               (gsxy - gsx * gsy / gn)
                 / nullif(gsxx - gsx * gsx / gn, 0) AS theta,
               gsx / gn AS gmx
        FROM g
    )
    SELECT CAST(variant AS BIGINT) AS variant,
           CAST(n AS BIGINT) AS n_users,
           round(sy / n, 4) AS mean_y,
           round(sy / n - theta * (sx / n - gmx), 4) AS cuped_mean,
           round((syy - sy * sy / n) / (n - 1), 4) AS var_y,
           round(((syy - sy * sy / n)
                  + theta * theta * (sxx - sx * sx / n)
                  - 2 * theta * (sxy - sx * sy / n)) / (n - 1), 4)
             AS var_cuped,
           round(theta, 4) AS theta
    FROM t
    """,
)
def experiment_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled pre-experiment data) variance-reduced A/B
    readout: variant = user_id parity, metric y = a user's post-split
    value sum, covariate x = the same user's pre-split value sum.

    theta = cov(x,y)/var(x) is fitted GLOBALLY (both arms pooled, the
    standard CUPED recipe). The linearity of the adjustment means no
    second pass over users is needed: adjusted mean and adjusted
    variance per arm are closed forms over each arm's six sufficient
    sums plus the pooled sums — so the whole readout is one events
    scan, one user-key shuffle, then a 2-row window. ``nullif`` guards
    the degenerate var(x)=0 corpus identically on both engines.
    """
    e = load_tables(spark, sf_dir)["events"]
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = (
        e.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < split, F.col("value"))), F.lit(0.0)
            ).alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= split, F.col("value"))), F.lit(0.0)
            ).alias("y"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "x", "y")
    )
    x, y = F.col("x"), F.col("y")
    v = per_user.groupBy("variant").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = v.select(
        "*",
        F.sum("n").over(wall).alias("gn"),
        F.sum("sx").over(wall).alias("gsx"),
        F.sum("sxx").over(wall).alias("gsxx"),
        F.sum("sxy").over(wall).alias("gsxy"),
        F.sum("sy").over(wall).alias("gsy"),
    )
    gn, gsx, gsxx, gsxy, gsy = (
        F.col("gn"),
        F.col("gsx"),
        F.col("gsxx"),
        F.col("gsxy"),
        F.col("gsy"),
    )
    t = g.select(
        "*",
        (
            (gsxy - gsx * gsy / gn)
            / F.nullif(gsxx - gsx * gsx / gn, F.lit(0))
        ).alias("theta"),
        (gsx / gn).alias("gmx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    theta, gmx = F.col("theta"), F.col("gmx")
    return t.select(
        F.col("variant").cast("long").alias("variant"),
        n.cast("long").alias("n_users"),
        F.round(sy / n, 4).alias("mean_y"),
        F.round(sy / n - theta * (sx / n - gmx), 4).alias("cuped_mean"),
        F.round((syy - sy * sy / n) / (n - F.lit(1)), 4).alias("var_y"),
        F.round(
            (
                (syy - sy * sy / n)
                + theta * theta * (sxx - sx * sx / n)
                - F.lit(2) * theta * (sxy - sx * sy / n)
            )
            / (n - F.lit(1)),
            4,
        ).alias("var_cuped"),
        F.round(theta, 4).alias("theta"),
    )


# ---------------------------------------------------------------------------
# Welch sufficient-statistics partials (mergeable; streaming twin in
# streaming/jobs.py::welch_partials_stream)
# ---------------------------------------------------------------------------


def welch_partials(events: DataFrame) -> DataFrame:
    """Per-arm sufficient statistics (n, Σv, Σv²) for Welch's t-test —
    the mergeable partial state behind ``stats_welch_ttest``.

    One row per arm; partials from different batches/files/streams
    merge by plain addition (``merge_welch_partials``), which is how
    the test would be maintained incrementally at 100 TB: each
    ingest reduces to two tiny rows, and the t statistic is served
    off the state table at any time by ``welch_from_partials``.
    """
    v = F.col("value")
    return (
        events.where(
            F.col("event_type").isin(TT_TYPE_A, TT_TYPE_B)
            & F.col("value").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("q"),
        )
    )


def merge_welch_partials(*parts: DataFrame) -> DataFrame:
    """Merge any number of per-arm partial frames by addition."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy("event_type").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("q").alias("q")
    )


def welch_from_partials(sums: DataFrame) -> DataFrame:
    """Finish the Welch t statistic from merged per-arm partials.

    Same closed form as ``stats_welch_ttest``; the two arm rows are
    pivoted with conditional aggregation (key-cardinality input, so
    this is driver-free scalar plumbing).
    """
    is_a = F.col("event_type") == TT_TYPE_A
    is_b = F.col("event_type") == TT_TYPE_B
    s = sums.agg(
        F.sum(F.when(is_a, F.col("n"))).alias("na"),
        F.sum(F.when(is_a, F.col("s"))).alias("sa"),
        F.sum(F.when(is_a, F.col("q"))).alias("qa"),
        F.sum(F.when(is_b, F.col("n"))).alias("nb"),
        F.sum(F.when(is_b, F.col("s"))).alias("sb"),
        F.sum(F.when(is_b, F.col("q"))).alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb, qa, qb = F.col("sa"), F.col("sb"), F.col("qa"), F.col("qb")
    m = s.select(
        na.alias("na"),
        nb.alias("nb"),
        (sa / na).alias("ma"),
        (sb / nb).alias("mb"),
        ((qa - sa * sa / na) / (na - F.lit(1))).alias("va"),
        ((qb - sb * sb / nb) / (nb - F.lit(1))).alias("vb"),
    )
    na2, nb2 = F.col("na"), F.col("nb")
    ma, mb, va, vb = F.col("ma"), F.col("mb"), F.col("va"), F.col("vb")
    se2 = va / na2 + vb / nb2
    return m.select(
        na2.cast("long").alias("n_a"),
        nb2.cast("long").alias("n_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round((ma - mb) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(va / na2, 2) / (na2 - F.lit(1))
                + F.pow(vb / nb2, 2) / (nb2 - F.lit(1))
            ),
            4,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA across all event types
# ---------------------------------------------------------------------------


@query(
    "stats_anova_oneway",
    """
    WITH g AS (
        SELECT event_type, count(*) AS n, sum(value) AS s,
               sum(value * value) AS q
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    t AS (
        SELECT CAST(count(*) AS DOUBLE) AS k,
               CAST(sum(n) AS DOUBLE) AS nn,
               sum(s) AS ss,
               sum(s * s / CAST(n AS DOUBLE)) AS sb_raw,
               sum(q - s * s / CAST(n AS DOUBLE)) AS ssw
        FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(nn AS BIGINT) AS n_obs,
           round(sb_raw - ss * ss / nn, 4) AS ss_between,
           round(ssw, 4) AS ss_within,
           round(((sb_raw - ss * ss / nn) / (k - 1))
                 / (ssw / (nn - k)), 4) AS f_stat
    FROM t
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of ``value`` across ALL event types — the k-group
    generalization of ``stats_welch_ttest`` (classic equal-variance
    F-test form).

    Two-level sufficient statistics: per-group (n, Σv, Σv²) — one scan,
    5-row shuffle — then the F statistic is a fixed IEEE tree over the
    5-row aggregate (SSB = Σs²/n − S²/N, SSW = Σ(q − s²/n)). Both
    levels merge by addition, so the test is maintainable incrementally
    exactly like the Welch partials.
    """
    e = load_tables(spark, sf_dir)["events"]
    v = F.col("value")
    g = (
        e.where(v.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("q"),
        )
    )
    nD = F.col("n").cast("double")
    t = g.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("n").cast("double").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum(F.col("s") * F.col("s") / nD).alias("sb_raw"),
        F.sum(F.col("q") - F.col("s") * F.col("s") / nD).alias("ssw"),
    )
    k, nn, ss = F.col("k"), F.col("nn"), F.col("ss")
    sb = F.col("sb_raw") - ss * ss / nn
    return t.select(
        k.cast("long").alias("n_groups"),
        nn.cast("long").alias("n_obs"),
        F.round(sb, 4).alias("ss_between"),
        F.round(F.col("ssw"), 4).alias("ss_within"),
        F.round((sb / (k - F.lit(1))) / (F.col("ssw") / (nn - k)), 4).alias(
            "f_stat"
        ),
    )


# ---------------------------------------------------------------------------
# Cohort LTV triangle (acquisition month x age)
# ---------------------------------------------------------------------------


@query(
    "orders_cohort_ltv",
    """
    WITH seq AS (
        SELECT o_custkey AS custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                 AS midx,
               o_totalprice AS price
        FROM orders
    ),
    tagged AS (
        SELECT custkey, midx, price,
               min(midx) OVER (PARTITION BY custkey) AS cohort
        FROM seq
    ),
    cell AS (
        SELECT cohort, midx - cohort AS age_months,
               CAST(round(sum(price) * 100) AS BIGINT) AS rev_cents,
               count(DISTINCT custkey) AS active_customers
        FROM tagged GROUP BY 1, 2
    ),
    tri AS (
        SELECT cohort, age_months,
               CAST(rev_cents AS BIGINT) AS rev_cents,
               CAST(active_customers AS BIGINT) AS active_customers,
               CAST(sum(rev_cents) OVER (
                   PARTITION BY cohort ORDER BY age_months
               ) AS BIGINT) AS cum_cents,
               CAST(max(CASE WHEN age_months = 0 THEN active_customers END)
                    OVER (PARTITION BY cohort) AS BIGINT) AS n_customers
        FROM cell
    )
    SELECT CAST(cohort AS BIGINT) AS cohort_month,
           CAST(age_months AS BIGINT) AS age_months,
           CAST(active_customers AS BIGINT) AS active_customers,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(CAST(rev_cents AS DOUBLE) / 100.0, 4) AS revenue,
           round(CAST(cum_cents AS DOUBLE) * 100.0
                 / CAST(n_customers AS DOUBLE)) / 10000.0 AS ltv_per_customer
    FROM tri
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by acquisition month
    (month of FIRST order), revenue rolled up by months-since-
    acquisition, cumulative LTV per cohort member — the
    ``events_retention_cohorts`` sibling with money instead of
    presence.

    One orders scan: the cohort tag is a per-customer MIN window (no
    self-join), the triangle is a (cohort × age) groupBy — calendar²-
    bounded output. Cohort size needs no second pass: every member
    BY DEFINITION orders at age 0, so size = age-0 active count,
    lifted per cohort with a window max. Month index is exact integer
    arithmetic (year*12+month — Spark's fractional ``months_between``
    and DuckDB's boundary-counting ``date_diff`` disagree); revenue
    accumulates in exact integer cents so the running sum carries no
    FP reordering.
    """
    o = load_tables(spark, sf_dir)["orders"]
    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    tagged = o.select(
        F.col("o_custkey").alias("custkey"),
        midx.alias("midx"),
        F.col("o_totalprice").alias("price"),
    ).withColumn("cohort", F.min("midx").over(Window.partitionBy("custkey")))
    cell = tagged.groupBy(
        "cohort", (F.col("midx") - F.col("cohort")).alias("age_months")
    ).agg(
        F.round(F.sum("price") * 100).cast("long").alias("rev_cents"),
        F.count_distinct("custkey").cast("long").alias("active_customers"),
    )
    wc = Window.partitionBy("cohort").orderBy("age_months")
    wall = Window.partitionBy("cohort")
    tri = cell.select(
        "cohort",
        "age_months",
        "rev_cents",
        "active_customers",
        F.sum("rev_cents").over(wc).cast("long").alias("cum_cents"),
        F.max(
            F.when(F.col("age_months") == 0, F.col("active_customers"))
        )
        .over(wall)
        .cast("long")
        .alias("n_customers"),
    )
    return tri.select(
        F.col("cohort").alias("cohort_month"),
        "age_months",
        "active_customers",
        "n_customers",
        F.round(F.col("rev_cents").cast("double") / 100.0, 4).alias("revenue"),
        # Boundary-safe 4-dp LTV: the naive round(cents/100/n, 4) is a
        # DOUBLE divide chain whose x.xxxx5 half-boundary flips per
        # engine (the events_twap lesson; bit r7's avg_cc too). Instead
        # quantize on the exact integer micro-grid: cents*100/n is ONE
        # IEEE division of an exact integer (cum_cents*100 < 2^53 until
        # a single cohort exceeds ~$90T), identical bits in any engine;
        # round it to an integer count of 1e-4 dollars, then one exact
        # scale-down.
        (
            F.round(
                F.col("cum_cents").cast("double")
                * 100.0
                / F.col("n_customers").cast("double")
            ).cast("long")
            / 10000.0
        ).alias("ltv_per_customer"),
    )


# ---------------------------------------------------------------------------
# Robust (MAD) anomaly screen
# ---------------------------------------------------------------------------

MAD_K = 3.0
MAD_CONSISTENCY = 1.4826  # normal-consistency constant; same literal text both engines


@query(
    "events_anomaly_mad",
    f"""
    WITH med AS (
        SELECT event_type,
               quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
        FROM events e JOIN med m ON m.event_type = e.event_type
        WHERE e.value IS NOT NULL
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(d.med), 4) AS median_value,
           round(any_value(x.mad), 4) AS mad,
           CAST(sum(CASE WHEN d.adev > {MAD_K} * {MAD_CONSISTENCY} * x.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN d.adev > {MAD_K} * {MAD_CONSISTENCY}
                                    * x.mad THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS outlier_frac
    FROM dev d JOIN mad x ON x.event_type = d.event_type
    GROUP BY 1
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly screen: median / MAD (median absolute deviation)
    per event type, with the count of values beyond the standard
    3 × 1.4826 × MAD fence — the outlier detector that, unlike
    ``events_anomaly_zscore``'s mean/stddev, is itself immune to the
    outliers it hunts.

    Exact two-level medians force three scan-bound passes (median →
    deviation median → fence count), each a fact scan plus a
    BROADCAST of the 5-row per-type statistics — nothing fact-sized
    ever shuffles. At 100 TB the documented swap is sketch quantiles
    (``agg_quantile_histogram``'s mergeable bins) to fuse the passes
    into one; the exact form is what the oracle certifies. The fence
    compare is deterministic cross-engine: both sides compute
    |v − med| and k·c·mad from identical doubles (the consistency
    constant is the same literal text, hence the same IEEE double).
    """
    e = load_tables(spark, sf_dir)["events"]
    ev = e.where(F.col("value").isNotNull()).select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    fence = F.lit(MAD_K) * F.lit(MAD_CONSISTENCY) * F.col("mad")
    out = F.when(F.col("adev") > fence, 1).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.any_value(F.col("med")), 4).alias("median_value"),
            F.round(F.any_value(F.col("mad")), 4).alias("mad"),
            F.sum(out).cast("long").alias("n_outliers"),
            F.round(
                F.sum(out).cast("double") / F.count("*").cast("double"), 4
            ).alias("outlier_frac"),
        )
    )


@query(
    "stats_cohens_d_value",
    f"""
    WITH s AS (
        SELECT
            count(*) FILTER (event_type = '{TT_TYPE_A}') AS na,
            sum(value) FILTER (event_type = '{TT_TYPE_A}') AS sa,
            sum(value * value) FILTER (event_type = '{TT_TYPE_A}') AS qa,
            count(*) FILTER (event_type = '{TT_TYPE_B}') AS nb,
            sum(value) FILTER (event_type = '{TT_TYPE_B}') AS sb,
            sum(value * value) FILTER (event_type = '{TT_TYPE_B}') AS qb
        FROM events
        WHERE event_type IN ('{TT_TYPE_A}', '{TT_TYPE_B}')
          AND value IS NOT NULL
    ),
    m AS (
        SELECT CAST(na AS DOUBLE) AS na, CAST(nb AS DOUBLE) AS nb,
               sa / CAST(na AS DOUBLE) AS ma, sb / CAST(nb AS DOUBLE) AS mb,
               (qa - sa * sa / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)
                 AS va,
               (qb - sb * sb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)
                 AS vb
        FROM s
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ma - mb, 4) AS mean_diff,
           round(sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)), 4)
             AS pooled_sd,
           round((ma - mb)
                 / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)), 4)
             AS cohens_d
    FROM m
    """,
)
def stats_cohens_d_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size between the same two arms
    ``stats_welch_ttest`` compares — the magnitude the t-test's
    p-value deliberately ignores (a significant-but-d≈0.02 difference
    ships nothing). Pooled-SD convention: √(((n₁−1)s₁² + (n₂−1)s₂²)
    /(n₁+n₂−2)).

    Same sufficient-statistics shape as the t-test (one scan, six
    conditional partial sums, fixed IEEE tree) — the two entries share
    a contingency of moments, which the cross-entry pytest exploits:
    d and t must satisfy t ≈ d·√(n₁n₂/(n₁+n₂)) up to the
    equal-variance approximation."""
    e = load_tables(spark, sf_dir)["events"]
    pooled = e.where(
        F.col("event_type").isin(TT_TYPE_A, TT_TYPE_B)
        & F.col("value").isNotNull()
    )
    is_a = F.col("event_type") == TT_TYPE_A
    is_b = F.col("event_type") == TT_TYPE_B
    v = F.col("value")
    s = pooled.agg(
        F.count(F.when(is_a, 1)).alias("na"),
        F.sum(F.when(is_a, v)).alias("sa"),
        F.sum(F.when(is_a, v * v)).alias("qa"),
        F.count(F.when(is_b, 1)).alias("nb"),
        F.sum(F.when(is_b, v)).alias("sb"),
        F.sum(F.when(is_b, v * v)).alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma, mb = F.col("sa") / na, F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - 1)
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - 1)
    pooled_sd = F.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ma - mb, 4).alias("mean_diff"),
        F.round(pooled_sd, 4).alias("pooled_sd"),
        F.round((ma - mb) / pooled_sd, 4).alias("cohens_d"),
    )


@query(
    "orders_gini_concentration",
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS i
        FROM cust
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS total,
               CAST(sum(i * cents) AS BIGINT) AS weighted
        FROM ranked
    )
    SELECT n AS n_customers, total AS total_cents,
           round(2.0 * weighted / (CAST(n AS DOUBLE) * total)
                 - (CAST(n AS DOUBLE) + 1) / n, 4) AS gini
    FROM s
    """,
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the inequality summary next to ``events_pareto_concentration``'s
    top-share curve (one number for dashboards, the full curve for
    diagnosis). G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n over ascending-sorted
    per-customer totals.

    EXACT: per-customer revenue is per-row-rounded integer cents
    summed as BIGINT, the rank-weighted sum is BIGINT arithmetic
    (tie order among equal totals cannot change Σ i·xᵢ — tied blocks
    hold consecutive ranks whose sum is fixed), so the only doubles
    are the final two divisions. Shape: one scan → customer-cardinality
    agg → a RANGE-PARTITIONED exact rank of the per-customer frame
    (``stats._global_row_numbers``, ADVICE r12 follow-through: no
    single-partition sort even at customer cardinality; rank values
    bit-identical) → a scalar agg. int64 posture: i·x ≤ 10⁷·10¹² needs
    a quantile-sketch Lorenz path long before overflow at real scale;
    exact at every test SF."""
    from .stats import _global_row_numbers

    o = load_tables(spark, sf_dir)["orders"]
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    ranked = _global_row_numbers(cust, "cents", "o_custkey").select(
        "cents", F.col("rn").alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("weighted"),
    )
    n = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        F.round(
            2.0 * F.col("weighted") / (n * F.col("total"))
            - (n + 1) / n,
            4,
        ).alias("gini"),
    )
