"""Governance gauges: re-identification risk (k-anonymity) and
optimizer-facing table statistics with a join-strategy advisor.

Two capabilities a lakehouse platform team runs over every table, both
expressed as one-pass relational gauges so they cost a scan — not a
pipeline — at 100 TB:

- ``privacy_k_anonymity`` — the classic k-anonymity audit (Sweeney
  2002): group the table by a quasi-identifier (QI) tuple and measure
  the smallest group. Rows in groups of size < k are re-identifiable
  by linking the QI against public data. The gauge evaluates a
  GENERALIZATION LADDER (three QI coarsenings) in one report, which is
  exactly how an anonymization pass picks the least-destructive level
  that clears the k threshold. Each level is a groupBy + 1-row
  aggregate — the whole ladder is |levels| scans of the dimension, and
  each rung's group table is QI-cardinality, never row-cardinality.

- ``ops_table_stats_advisor`` — ANALYZE-style per-relation statistics
  (row count, join-key NDV) plus the System-R estimate they exist for:
  ``|L ⋈ R| ≈ |L|·|R| / max(ndv_L, ndv_R)`` under the containment
  assumption, and the physical-strategy call (broadcast the small
  side / sort-merge two facts) that Spark's CBO and AQE make from the
  same numbers. Expressing the advisor as a relational gauge makes the
  planner's reasoning auditable: when a production join misbehaves,
  this report says what the stats believed. Exact ``count(DISTINCT)``
  keeps the DuckDB oracle bit-exact (the ``profile`` discipline —
  ``profile_documents`` docstring); a 100 TB deployment swaps in
  ``approx_count_distinct`` or reads NDV straight from table-manifest
  stats (``storage/snapshots.py`` manifests carry per-commit row
  counts already).

All arithmetic that crosses the oracle boundary is integer (``div`` /
``//`` and basis points), per the repo's round(4)-of-double-divide
parity rule (``operators/relational.py`` docstring).

Reference parity: the reference (a 2-script event ETL) ships neither a
privacy audit nor planner statistics; this module is part of the
SURVEY §2 "beyond the reference" governance/ops fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query

K_ANON = 5  # groups smaller than this are re-identifiable

# Generalization ladder: level -> (description, DuckDB QI exprs).
# L0 is the finest cut (nation x segment x $100 balance band), L1
# coarsens the band 10x, L2 generalizes nation -> region and the band
# to its sign — the standard hierarchy walk (suppress precision until
# min group size clears k).
_QI_SQL = {
    0: (
        "nation,segment,balance_100",
        [
            "c_nationkey",
            "c_mktsegment",
            "CAST(floor(c_acctbal / 100) AS BIGINT)",
        ],
        "customer",
    ),
    1: (
        "nation,segment,balance_1000",
        [
            "c_nationkey",
            "c_mktsegment",
            "CAST(floor(c_acctbal / 1000) AS BIGINT)",
        ],
        "customer",
    ),
    2: (
        "region,segment,balance_sign",
        [
            "n_regionkey",
            "c_mktsegment",
            "CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END",
        ],
        "customer JOIN nation ON n_nationkey = c_nationkey",
    ),
}


def _k_level_sql(level: int) -> str:
    desc, qi, src = _QI_SQL[level]
    keys = ", ".join(qi)
    return f"""
    SELECT {level} AS level, '{desc}' AS qi, count(*) AS groups,
           min(sz) AS min_k,
           CAST(coalesce(sum(CASE WHEN sz < {K_ANON} THEN sz END), 0)
                AS BIGINT) AS rows_below_k,
           CAST((10000 * CAST(coalesce(sum(CASE WHEN sz < {K_ANON} THEN sz END), 0)
                         AS BIGINT)) // CAST(sum(sz) AS BIGINT) AS BIGINT) AS risk_bp
    FROM (
        SELECT count(*) AS sz FROM {src} GROUP BY {keys}
    )
    """


def k_anonymity_level(
    df: DataFrame, qi: list, level: int, desc: str, k: int = K_ANON
) -> DataFrame:
    """One rung of the ladder: group sizes over the QI tuple, then the
    1-row risk summary. The group table is QI-cardinality (bounded by
    the generalization, not the data), so the only row-scale work is
    the first groupBy's map-side partial aggregation."""
    sizes = df.groupBy(*qi).agg(F.count(F.lit(1)).alias("sz"))
    below = F.coalesce(
        F.sum(F.when(F.col("sz") < k, F.col("sz"))), F.lit(0)
    ).cast("long")
    return sizes.agg(
        F.lit(level).alias("level"),
        F.lit(desc).alias("qi"),
        F.count(F.lit(1)).alias("groups"),
        F.min("sz").alias("min_k"),
        below.alias("rows_below_k"),
        F.expr(
            f"(10000 * CAST(coalesce(sum(CASE WHEN sz < {k} THEN sz END), 0)"
            " AS BIGINT)) div sum(sz)"
        ).alias("risk_bp"),
    )


@query(
    "privacy_k_anonymity",
    " UNION ALL ".join(_k_level_sql(lv) for lv in sorted(_QI_SQL))
    + " ORDER BY level",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer dimension across a 3-level
    generalization ladder. ``min_k`` rising (and ``risk_bp`` — basis
    points of rows in below-k groups — falling) down the report is the
    anonymization trade-off curve; a release gate picks the first
    level with ``min_k >= K_ANON``. All ratios are integer basis
    points (``div``), never rounded doubles, for bit-exact parity."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    band100 = F.floor(F.col("c_acctbal") / 100).cast("long")
    band1000 = F.floor(F.col("c_acctbal") / 1000).cast("long")
    sign = F.when(F.col("c_acctbal") < 0, 0).otherwise(1)
    with_region = cust.join(
        F.broadcast(t["nation"].select("n_nationkey", "n_regionkey")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    )
    lv0 = k_anonymity_level(
        cust.select("c_nationkey", "c_mktsegment", band100.alias("b")),
        ["c_nationkey", "c_mktsegment", "b"],
        0,
        _QI_SQL[0][0],
    )
    lv1 = k_anonymity_level(
        cust.select("c_nationkey", "c_mktsegment", band1000.alias("b")),
        ["c_nationkey", "c_mktsegment", "b"],
        1,
        _QI_SQL[1][0],
    )
    lv2 = k_anonymity_level(
        with_region.select("n_regionkey", "c_mktsegment", sign.alias("b")),
        ["n_regionkey", "c_mktsegment", "b"],
        2,
        _QI_SQL[2][0],
    )
    return lv0.unionByName(lv1).unionByName(lv2).orderBy("level")


def _k_anonymize_sql() -> str:
    """The TRANSFORM twin of the k-anonymity gauge: replay the ladder,
    pick the first level whose min group size clears K_ANON (coarsest
    if none does), emit that level's generalized rows with residual
    below-k groups SUPPRESSED. Pick, generalization, and suppression
    all happen in SQL, so the released table is hash-verified."""
    def lvl(alias: str, lv: int) -> str:
        _, qi, src = _QI_SQL[lv]
        return (
            f"{alias} AS (SELECT CAST({qi[0]} AS BIGINT) AS qi1, "
            f"{qi[1]} AS qi2, CAST({qi[2]} AS BIGINT) AS qi3 FROM {src})"
        )

    def mk(lv: int) -> str:
        return (
            f"SELECT {lv} AS level, (SELECT min(sz) FROM ("
            f"SELECT count(*) AS sz FROM l{lv} GROUP BY qi1, qi2, qi3"
            f")) AS min_k"
        )

    return f"""
    WITH {lvl("l0", 0)},
    {lvl("l1", 1)},
    {lvl("l2", 2)},
    mk AS ({mk(0)} UNION ALL {mk(1)} UNION ALL {mk(2)}),
    pick AS (
      SELECT coalesce(min(level) FILTER (WHERE min_k >= {K_ANON}), 2) AS lv
      FROM mk
    ),
    uni AS (
      SELECT * FROM l0 WHERE 0 = (SELECT lv FROM pick)
      UNION ALL SELECT * FROM l1 WHERE 1 = (SELECT lv FROM pick)
      UNION ALL SELECT * FROM l2 WHERE 2 = (SELECT lv FROM pick)
    ),
    sz AS (SELECT qi1, qi2, qi3, count(*) AS sz FROM uni
           GROUP BY qi1, qi2, qi3)
    SELECT u.qi1, u.qi2, u.qi3,
           CAST((SELECT lv FROM pick) AS INTEGER) AS level
    FROM uni u
    JOIN sz s ON u.qi1 = s.qi1 AND u.qi2 = s.qi2 AND u.qi3 = s.qi3
    WHERE s.sz >= {K_ANON}
    ORDER BY u.qi1, u.qi2, u.qi3
    """


@query("privacy_k_anonymize", _k_anonymize_sql())
def privacy_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anonymization TRANSFORM (VERDICT r11 #5 — the gauge finally
    acts): walk the same generalization ladder ``privacy_k_anonymity``
    audits, pick the FIRST level whose min group size clears
    ``K_ANON`` (coarsest level if none does — the release-gate rule
    from the gauge's docstring), project every customer row to that
    level's generalized QI tuple, and SUPPRESS residual below-k groups
    (a no-op when the ladder cleared; the real safety valve when even
    the coarsest cut leaves singleton groups, which happens at small
    SFs). Output is the releasable table: (qi1, qi2, qi3, level), one
    row per surviving customer.

    Scale shape: each ladder probe is one map-side-partial groupBy of
    the dimension; the pick is a driver-side decision over ≤3
    metadata rows; suppression is a SEMI join against the
    QI-cardinality group-key set (broadcast — bounded by the
    generalization, never by the data). `test_audit_gauges` pins
    min-group-size ≥ K_ANON and pick == the gauge's pick."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    with_region = cust.join(
        F.broadcast(t["nation"].select("n_nationkey", "n_regionkey")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    )
    frames = [
        cust.select(
            F.col("c_nationkey").cast("long").alias("qi1"),
            F.col("c_mktsegment").alias("qi2"),
            F.floor(F.col("c_acctbal") / 100).cast("long").alias("qi3"),
        ),
        cust.select(
            F.col("c_nationkey").cast("long").alias("qi1"),
            F.col("c_mktsegment").alias("qi2"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("qi3"),
        ),
        with_region.select(
            F.col("n_regionkey").cast("long").alias("qi1"),
            F.col("c_mktsegment").alias("qi2"),
            F.when(F.col("c_acctbal") < 0, 0)
            .otherwise(1)
            .cast("long")
            .alias("qi3"),
        ),
    ]
    pick = len(frames) - 1
    for lv, frame in enumerate(frames):
        min_k = (
            frame.groupBy("qi1", "qi2", "qi3")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.min("sz").alias("m"))
            .first()["m"]
        )
        if min_k is not None and min_k >= K_ANON:
            pick = lv
            break
    chosen = frames[pick]
    keep = (
        chosen.groupBy("qi1", "qi2", "qi3")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") >= K_ANON)
        .select("qi1", "qi2", "qi3")
    )
    return (
        chosen.join(F.broadcast(keep), ["qi1", "qi2", "qi3"], "semi")
        .withColumn("level", F.lit(pick))
        .orderBy("qi1", "qi2", "qi3")
    )


# --- optimizer statistics + join-strategy advisor ---------------------------

# (join_name, left table, left key, right table, right key). Keys are
# the schema's natural join edges — the same edges every TPC-H entry
# in operators/tpch_full.py actually joins on.
_ADVISOR_JOINS = [
    ("customer-orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("nation-customer", "nation", "n_nationkey", "customer", "c_nationkey"),
    ("orders-lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part-lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier-lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
]

# Broadcast if the smaller side is under this many rows — a row-count
# stand-in for spark.sql.autoBroadcastJoinThreshold's byte bound, kept
# in rows so the gauge is storage-format independent.
ADVISOR_BROADCAST_ROWS = 100_000


def _advisor_sql(name: str, lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
    SELECT '{name}' AS join_name,
           ls.rows AS left_rows, rs.rows AS right_rows,
           ls.ndv AS left_ndv, rs.ndv AS right_ndv,
           (ls.rows * rs.rows) // greatest(ls.ndv, rs.ndv) AS est_out_rows,
           CASE WHEN ls.rows <= rs.rows THEN 'left' ELSE 'right'
                END AS build_side,
           CASE WHEN least(ls.rows, rs.rows) <= {ADVISOR_BROADCAST_ROWS}
                THEN 'broadcast' ELSE 'sort_merge' END AS strategy
    FROM (SELECT count(*) AS rows, count(DISTINCT {lk}) AS ndv FROM {lt}) ls,
         (SELECT count(*) AS rows, count(DISTINCT {rk}) AS ndv FROM {rt}) rs
    """


def table_join_stats(left: DataFrame, lk: str, right: DataFrame, rk: str) -> DataFrame:
    """1x1 crossJoin of the two sides' (rows, ndv) aggregates — each
    side is one scan with map-side partials, the combine is a 1-row
    exchange. The product/greatest math is System R's containment
    estimate; integer ``div`` keeps it oracle-exact."""
    ls = left.agg(
        F.count(F.lit(1)).alias("left_rows"),
        F.countDistinct(lk).alias("left_ndv"),
    )
    rs = right.agg(
        F.count(F.lit(1)).alias("right_rows"),
        F.countDistinct(rk).alias("right_ndv"),
    )
    return ls.crossJoin(rs)


@query(
    "ops_table_stats_advisor",
    " UNION ALL ".join(_advisor_sql(*j) for j in _ADVISOR_JOINS)
    + " ORDER BY join_name",
)
def ops_table_stats_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE + EXPLAIN-advisor gauge over the schema's five natural
    join edges: per-side row counts and join-key NDV, the System-R
    output-cardinality estimate, and the strategy call (broadcast vs
    sort-merge, build side = smaller input) a cost-based planner makes
    from exactly these statistics. The per-side aggregates are full
    scans HERE because the oracle must match bit-for-bit; the
    production source for the same numbers is manifest-stats + NDV
    sketches (see module docstring), making the advisor metadata-only
    at 100 TB."""
    t = load_tables(spark, sf_dir)
    out = None
    for name, lt, lk, rt, rk in _ADVISOR_JOINS:
        est = F.expr("(left_rows * right_rows) div greatest(left_ndv, right_ndv)")
        row = table_join_stats(t[lt], lk, t[rt], rk).select(
            F.lit(name).alias("join_name"),
            "left_rows",
            "right_rows",
            "left_ndv",
            "right_ndv",
            est.alias("est_out_rows"),
            F.when(F.col("left_rows") <= F.col("right_rows"), "left")
            .otherwise("right")
            .alias("build_side"),
            F.when(
                F.least("left_rows", "right_rows") <= ADVISOR_BROADCAST_ROWS,
                "broadcast",
            )
            .otherwise("sort_merge")
            .alias("strategy"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")


# --- join-order enumeration (mini-Selinger) ---------------------------------

# The 4-table PK-FK chain nation - customer - orders - lineitem.
# Left-deep orders whose every prefix is connected are exactly the
# ways to grow a contiguous interval of the path: 2^(k-1) = 8 orders
# (Selinger prunes the cross-product rest; so do we).
_CHAIN = ["nation", "customer", "orders", "lineitem"]
_CHAIN_KEYS = {  # edge (left, right) -> (left key, right key)
    ("nation", "customer"): ("n_nationkey", "c_nationkey"),
    ("customer", "orders"): ("c_custkey", "o_custkey"),
    ("orders", "lineitem"): ("o_orderkey", "l_orderkey"),
}


def _chain_orders() -> list[list[str]]:
    """All connected left-deep orders: start anywhere, then repeatedly
    extend the held interval left or right."""
    out = []

    def grow(lo: int, hi: int, acc: list[str]):
        if lo == 0 and hi == len(_CHAIN) - 1:
            out.append(acc)
            return
        if lo > 0:
            grow(lo - 1, hi, acc + [_CHAIN[lo - 1]])
        if hi < len(_CHAIN) - 1:
            grow(lo, hi + 1, acc + [_CHAIN[hi + 1]])

    for s in range(len(_CHAIN)):
        grow(s, s, [_CHAIN[s]])
    return sorted(out)


def _order_cost_exprs(order: list[str]) -> tuple[str, str]:
    """(cost_expr, final_expr) for one join order, as engine-neutral
    integer arithmetic over the scalar stats columns rows_<t> /
    ndv_<key> (``{div}`` is formatted per engine). The running
    estimate is System R's: |I ⋈ T| = |I|·|T| div max(ndv of the
    joining keys in their BASE tables) — the independence/containment
    assumption an actual CBO applies when only base-table stats
    exist."""
    held = {order[0]}
    est = f"rows_{order[0]}"
    intermediates = []
    for t in order[1:]:
        for (l, r), (lk, rk) in _CHAIN_KEYS.items():
            if (l in held) == (r in held):
                continue
            if t not in (l, r):
                continue
            est = (
                f"(({est}) * rows_{t} {{div}} "
                f"greatest(ndv_{lk}, ndv_{rk}))"
            )
            break
        held.add(t)
        intermediates.append(est)
    # cost = intermediate sizes EXCLUDING the final result (every
    # order produces the same final relation)
    cost = " + ".join(intermediates[:-1])
    return cost, intermediates[-1]


_STAT_KEYS = sorted({k for pair in _CHAIN_KEYS.values() for k in pair})


def _joinorder_sql() -> str:
    stats = ",\n".join(
        f"    s_{t} AS (SELECT count(*) AS rows_{t}"
        + "".join(
            f", count(DISTINCT {k}) AS ndv_{k}"
            for k in _STAT_KEYS
            if k.startswith(t[0] + "_") or (t == "nation" and k.startswith("n_"))
        )
        + f" FROM {t})"
        for t in _CHAIN
    )
    rows = " UNION ALL ".join(
        "SELECT '{name}' AS join_order, CAST({cost} AS BIGINT) AS est_cost_rows, "
        "CAST({fin} AS BIGINT) AS est_final_rows FROM allstats".format(
            name=">".join(o),
            cost=_order_cost_exprs(o)[0].format(div="//"),
            fin=_order_cost_exprs(o)[1].format(div="//"),
        )
        for o in _chain_orders()
    )
    return f"""
    WITH
{stats},
    allstats AS (SELECT * FROM s_nation, s_customer, s_orders, s_lineitem)
    SELECT join_order, est_cost_rows, est_final_rows,
           CAST(row_number() OVER (ORDER BY est_cost_rows, join_order)
                AS INTEGER) AS rank,
           row_number() OVER (ORDER BY est_cost_rows, join_order) = 1
               AS chosen
    FROM ({rows})
    ORDER BY rank
    """


@query("ops_join_order_advisor", _joinorder_sql())
def ops_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selinger-style join-order enumeration over the nation-customer-
    orders-lineitem chain: every connected left-deep order (8 — the
    cross-product rest is pruned, as in System R), costed as the sum
    of estimated INTERMEDIATE sizes under the containment estimate,
    ranked, cheapest marked ``chosen``. The ranking reproduces the
    classic lesson — the dimension-first orders (customer/nation
    before orders before lineitem) tie for cheapest at |C|+|O| while
    fact-first pays |L| per early intermediate — and the gauge makes
    the planner's arithmetic auditable the same
    way ``ops_table_stats_advisor`` does for single joins. Both
    engines evaluate the SAME generated integer expressions (one
    Python spec emits the Spark ``div`` and DuckDB ``//`` forms), so
    the whole DP table is bit-exact; the stats scans are exact-NDV
    for the oracle, manifest-stats at 100 TB (module docstring)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    one = None
    for name in _CHAIN:
        aggs = [F.count(F.lit(1)).alias(f"rows_{name}")]
        for k in _STAT_KEYS:
            if k.startswith(name[0] + "_") or (
                name == "nation" and k.startswith("n_")
            ):
                aggs.append(F.countDistinct(k).alias(f"ndv_{k}"))
        s = t[name].agg(*aggs)
        one = s if one is None else one.crossJoin(s)
    rows = F.array(
        *[
            F.struct(
                F.lit(">".join(o)).alias("join_order"),
                F.expr(
                    _order_cost_exprs(o)[0].format(div="div")
                ).cast("long").alias("est_cost_rows"),
                F.expr(
                    _order_cost_exprs(o)[1].format(div="div")
                ).cast("long").alias("est_final_rows"),
            )
            for o in _chain_orders()
        ]
    )
    melted = one.select(F.explode(rows).alias("r")).select("r.*")
    w = Window.orderBy("est_cost_rows", "join_order")
    return (
        melted.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("chosen", F.col("rank") == 1)
        .orderBy("rank")
    )


# --- l-diversity (attribute-disclosure complement of k-anonymity) -----------

L_DIV = 3  # groups with fewer distinct sensitive values are disclosing

# Ladder: same generalization walk as k-anonymity, but the sensitive
# attribute (c_mktsegment) is EXCLUDED from the QI — k-anonymity
# protects identity, l-diversity protects the attribute: a group where
# every member shares one segment discloses it even at k >= K_ANON.
_LDIV_SQL = {
    0: (
        "nation,balance_100",
        ["c_nationkey", "CAST(floor(c_acctbal / 100) AS BIGINT)"],
        "customer",
    ),
    1: (
        "nation,balance_1000",
        ["c_nationkey", "CAST(floor(c_acctbal / 1000) AS BIGINT)"],
        "customer",
    ),
    2: (
        "region,balance_sign",
        ["n_regionkey", "CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END"],
        "customer JOIN nation ON n_nationkey = c_nationkey",
    ),
}


def _l_level_sql(level: int) -> str:
    desc, qi, src = _LDIV_SQL[level]
    keys = ", ".join(qi)
    return f"""
    SELECT {level} AS level, '{desc}' AS qi, count(*) AS groups,
           min(l) AS min_l,
           CAST(coalesce(sum(CASE WHEN l < {L_DIV} THEN sz END), 0)
                AS BIGINT) AS rows_disclosing,
           CAST((10000 * CAST(coalesce(sum(CASE WHEN l < {L_DIV} THEN sz END), 0)
                              AS BIGINT)) // CAST(sum(sz) AS BIGINT)
                AS BIGINT) AS risk_bp
    FROM (
        SELECT count(*) AS sz, count(DISTINCT c_mktsegment) AS l
        FROM {src} GROUP BY {keys}
    )
    """


def l_diversity_level(
    df: DataFrame,
    qi: list,
    sensitive: str,
    level: int,
    desc: str,
    l_min: int = L_DIV,
) -> DataFrame:
    """One rung: per-QI-group size + distinct-sensitive count, then
    the 1-row disclosure summary (same shape as the k-anonymity rung —
    the group table is QI-cardinality, the sensitive distinct is a
    bounded per-group count)."""
    groups = df.groupBy(*qi).agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct(sensitive).alias("l"),
    )
    return groups.agg(
        F.lit(level).alias("level"),
        F.lit(desc).alias("qi"),
        F.count(F.lit(1)).alias("groups"),
        F.min("l").alias("min_l"),
        F.coalesce(F.sum(F.when(F.col("l") < l_min, F.col("sz"))), F.lit(0))
        .cast("long")
        .alias("rows_disclosing"),
        F.expr(
            f"CAST((10000 * CAST(coalesce(sum(CASE WHEN l < {l_min} THEN sz"
            " END), 0) AS BIGINT)) div CAST(sum(sz) AS BIGINT) AS BIGINT)"
        ).alias("risk_bp"),
    )


@query(
    "privacy_l_diversity",
    " UNION ALL ".join(_l_level_sql(lv) for lv in sorted(_LDIV_SQL))
    + " ORDER BY level",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the same generalization ladder as
    ``privacy_k_anonymity``, with c_mktsegment as the sensitive
    attribute (excluded from the QI): a QI group whose members all
    share one segment DISCLOSES it regardless of group size, which is
    the attack k-anonymity alone misses (Machanavajjhala 2006).
    ``min_l`` rises down the ladder (a merged group's distinct count
    dominates each constituent's — pytest pins the monotonicity);
    integer basis points as in the k gauge."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    band100 = F.floor(F.col("c_acctbal") / 100).cast("long")
    band1000 = F.floor(F.col("c_acctbal") / 1000).cast("long")
    sign = F.when(F.col("c_acctbal") < 0, 0).otherwise(1)
    with_region = cust.join(
        F.broadcast(t["nation"].select("n_nationkey", "n_regionkey")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    )
    lv0 = l_diversity_level(
        cust.select("c_nationkey", "c_mktsegment", band100.alias("b")),
        ["c_nationkey", "b"], "c_mktsegment", 0, _LDIV_SQL[0][0],
    )
    lv1 = l_diversity_level(
        cust.select("c_nationkey", "c_mktsegment", band1000.alias("b")),
        ["c_nationkey", "b"], "c_mktsegment", 1, _LDIV_SQL[1][0],
    )
    lv2 = l_diversity_level(
        with_region.select("n_regionkey", "c_mktsegment", sign.alias("b")),
        ["n_regionkey", "b"], "c_mktsegment", 2, _LDIV_SQL[2][0],
    )
    return lv0.unionByName(lv1).unionByName(lv2).orderBy("level")


# --- materialized-view rewrite advisor ---------------------------------------

# Candidate MVs over orders: (name, group keys, servable agg classes).
# Every MV here carries count + sum(o_totalprice) partials, so it can
# also serve avg (sum/count) — but NEVER a count(DISTINCT ...) it did
# not pre-aggregate: distincts don't fold across groups. The implicit
# candidate 'orders_base' serves everything at full-table cost.
_MV_SPECS: list[tuple[str, frozenset, frozenset, str]] = [
    (
        "mv_by_status",
        frozenset({"o_orderstatus"}),
        frozenset({"count", "sum_total", "avg_total"}),
        "least(ndv_o_orderstatus, rows_orders)",
    ),
    (
        "mv_by_status_priority",
        frozenset({"o_orderstatus", "o_orderpriority"}),
        frozenset({"count", "sum_total", "avg_total"}),
        "least(ndv_o_orderstatus * ndv_o_orderpriority, rows_orders)",
    ),
    (
        "mv_by_custkey",
        frozenset({"o_custkey"}),
        frozenset({"count", "sum_total", "avg_total"}),
        "least(ndv_o_custkey, rows_orders)",
    ),
]
_MV_ALL_AGGS = frozenset(
    {"count", "sum_total", "avg_total", "count_distinct_cust"}
)

# Query workload: (name, group keys, required aggs).
_MV_QUERIES: list[tuple[str, frozenset, frozenset]] = [
    ("q_count_by_status", frozenset({"o_orderstatus"}), frozenset({"count"})),
    (
        "q_avg_by_priority",
        frozenset({"o_orderpriority"}),
        frozenset({"avg_total"}),
    ),
    (
        "q_sum_by_status_priority",
        frozenset({"o_orderstatus", "o_orderpriority"}),
        frozenset({"sum_total"}),
    ),
    ("q_count_by_orderdate", frozenset({"o_orderdate"}), frozenset({"count"})),
    (
        "q_distinct_cust_by_status",
        frozenset({"o_orderstatus"}),
        frozenset({"count_distinct_cust"}),
    ),
]

_MV_STAT_KEYS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


def _mv_candidates() -> list[tuple[str, str, str, bool]]:
    """(query, candidate, est_rows expr, contained) for every pair —
    the containment decision is the STATIC part of view matching
    (query keys ⊆ view keys and every needed agg derivable from the
    view's partials), so one Python spec emits it for both engines;
    only the cardinalities come from live statistics."""
    rows = []
    for qname, qkeys, qaggs in _MV_QUERIES:
        for mname, mkeys, maggs, est in _MV_SPECS:
            rows.append(
                (qname, mname, est, qkeys <= mkeys and qaggs <= maggs)
            )
        rows.append((qname, "orders_base", "rows_orders", True))
    return rows


def _mv_rewrite_sql() -> str:
    ndvs = ", ".join(
        f"count(DISTINCT {k}) AS ndv_{k}" for k in _MV_STAT_KEYS
    )
    pairs = " UNION ALL ".join(
        f"SELECT '{q}' AS query_name, '{c}' AS candidate,"
        f" {str(ok).upper()} AS contained,"
        f" CAST({est} AS BIGINT) AS est_rows FROM stats"
        for q, c, est, ok in _mv_candidates()
    )
    return f"""
    WITH stats AS (
        SELECT count(*) AS rows_orders, {ndvs} FROM orders
    )
    SELECT query_name, candidate, contained, est_rows,
           contained AND row_number() OVER (
               PARTITION BY query_name
               ORDER BY contained DESC, est_rows, candidate) = 1
             AS chosen
    FROM ({pairs})
    ORDER BY query_name, candidate
    """


@query("ops_mv_rewrite_advisor", _mv_rewrite_sql())
def ops_mv_rewrite_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view rewrite advisor — the third leg of the r10
    CBO tier (table-stats advisor: single joins; join-order advisor:
    plan enumeration; THIS: answer-from-MV selection). For a fixed
    query workload and the candidate rollups ``RollupView`` maintains,
    decide per query which view CONTAINS it (keys ⊆ view keys, every
    agg derivable from the view's count/sum partials — a
    count(DISTINCT) is never derivable) and CHOOSE the cheapest
    contained candidate by estimated group count (NDV product capped
    at table rows — the same containment estimate the sibling
    advisors use), falling back to the base table. Containment is
    static (one Python spec emits both engines' rows); cardinalities
    are live stats — exact NDV here so the oracle is bit-for-bit,
    manifest/KMV stats at 100 TB (``StatsCatalog.advise_join``'s
    note applies verbatim)."""
    from pyspark.sql import Window

    stats = load_tables(spark, sf_dir)["orders"].agg(
        F.count(F.lit(1)).alias("rows_orders"),
        *[F.countDistinct(k).alias(f"ndv_{k}") for k in _MV_STAT_KEYS],
    )
    melted = stats.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("query_name"),
                        F.lit(c).alias("candidate"),
                        F.lit(ok).alias("contained"),
                        F.expr(est).cast("long").alias("est_rows"),
                    )
                    for q, c, est, ok in _mv_candidates()
                ]
            )
        ).alias("r")
    ).select("r.*")
    w = Window.partitionBy("query_name").orderBy(
        F.col("contained").desc(), "est_rows", "candidate"
    )
    return (
        melted.withColumn(
            "chosen", F.col("contained") & (F.row_number().over(w) == 1)
        )
        .orderBy("query_name", "candidate")
    )


# --- t-closeness (distribution-disclosure complement of l-diversity) --------

T_CLOSE_BP = 2500  # groups whose sensitive distribution drifts > 0.25

# Ladder: the k-anonymity walk with the sensitive attribute
# (c_mktsegment) EXCLUDED from the QI — l-diversity asks "are there
# enough DISTINCT sensitive values per group"; t-closeness asks the
# stronger question "is each group's sensitive DISTRIBUTION close to
# the table's" (an attacker learns nothing distributional from
# knowing the group). Distance is the total-variation distance on the
# exact integer grid: per group g, TV = sum_v |c_gv*N - c_v*n_g| /
# (2*N*n_g), reported in basis points via integer division — no
# doubles anywhere, so the whole ladder is hash-exact.
_TCLOSE_QI = {
    0: (
        "nation,balance_100",
        ["c_nationkey", "CAST(floor(c_acctbal / 100) AS BIGINT)"],
        "customer",
    ),
    1: (
        "nation,balance_1000",
        ["c_nationkey", "CAST(floor(c_acctbal / 1000) AS BIGINT)"],
        "customer",
    ),
    2: (
        "region,balance_sign",
        ["n_regionkey", "CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END"],
        "customer JOIN nation ON n_nationkey = c_nationkey",
    ),
}


def _tclose_level_sql(level: int) -> str:
    desc, qi, src = _TCLOSE_QI[level]
    kdef = ", ".join(f"{e} AS k{i}" for i, e in enumerate(qi))
    kcols = ", ".join(f"k{i}" for i in range(len(qi)))
    kjoin = " AND ".join(f"g.k{i} = gs.k{i}" for i in range(len(qi)))
    p = f"tc{level}"
    return f"""
    {p}_g AS (
        SELECT {kdef}, c_mktsegment AS s, CAST(count(*) AS BIGINT) AS c
        FROM {src} GROUP BY {kcols}, s
    ),
    {p}_tot AS (
        SELECT s, CAST(sum(c) AS BIGINT) AS cv FROM {p}_g GROUP BY s
    ),
    {p}_nn AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM {p}_g),
    {p}_gs AS (
        SELECT {kcols}, CAST(sum(c) AS BIGINT) AS ng
        FROM {p}_g GROUP BY {kcols}
    ),
    {p}_d AS (
        SELECT {kcols}, max(ng) AS ng,
               (10000 * sum(abs(coalesce(c, 0) * nn - cv * ng)))
                 // (2 * max(nn) * max(ng)) AS dist_bp
        FROM (
            SELECT gs.*, t.s, t.cv, n.nn, g.c
            FROM {p}_gs gs CROSS JOIN {p}_tot t CROSS JOIN {p}_nn n
            LEFT JOIN {p}_g g ON {kjoin} AND g.s = t.s
        ) GROUP BY {kcols}
    ),
    {p}_out AS (
        SELECT {level} AS level, '{desc}' AS qi,
               CAST(count(*) AS BIGINT) AS groups,
               CAST(max(dist_bp) AS BIGINT) AS max_t_bp,
               CAST(coalesce(sum(CASE WHEN dist_bp > {T_CLOSE_BP} THEN 1 END),
                             0) AS BIGINT) AS groups_above_t,
               CAST((10000 * coalesce(sum(CASE WHEN dist_bp > {T_CLOSE_BP}
                                               THEN ng END), 0))
                    // sum(ng) AS BIGINT) AS rows_above_bp
        FROM {p}_d
    )"""


def t_closeness_level(
    df: DataFrame, qi: list, level: int, desc: str
) -> DataFrame:
    """One rung: per-group total-variation distance of the sensitive
    distribution from the global one, on the exact integer grid, then
    the 1-row summary. The group×value matrix is QI-cardinality ×
    |segments| — bounded by the generalization, never by the data; the
    only row-scale work is the first groupBy's map-side partials."""
    g = df.groupBy(*qi, "s").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = g.groupBy("s").agg(F.sum("c").cast("long").alias("cv"))
    nn = g.agg(F.sum("c").cast("long").alias("nn"))
    gs = g.groupBy(*qi).agg(F.sum("c").cast("long").alias("ng"))
    m = (
        gs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nn))
        .join(g, [*qi, "s"], "left")
    )
    d = m.groupBy(*qi).agg(
        F.max("ng").alias("ng"),
        F.expr(
            "(10000 * sum(abs(coalesce(c, 0) * nn - cv * ng)))"
            " div (2 * max(nn) * max(ng))"
        ).alias("dist_bp"),
    )
    return d.agg(
        F.lit(level).alias("level"),
        F.lit(desc).alias("qi"),
        F.count(F.lit(1)).cast("long").alias("groups"),
        F.max("dist_bp").cast("long").alias("max_t_bp"),
        F.coalesce(
            F.sum(F.when(F.col("dist_bp") > T_CLOSE_BP, 1)), F.lit(0)
        ).cast("long").alias("groups_above_t"),
        F.expr(
            f"(10000 * coalesce(sum(CASE WHEN dist_bp > {T_CLOSE_BP}"
            " THEN ng END), 0)) div sum(ng)"
        ).cast("long").alias("rows_above_bp"),
    )


@query(
    "privacy_t_closeness",
    "WITH "
    + ",".join(_tclose_level_sql(lv) for lv in sorted(_TCLOSE_QI))
    + " SELECT * FROM ("
    + " UNION ALL ".join(f"SELECT * FROM tc{lv}_out" for lv in sorted(_TCLOSE_QI))
    + ") ORDER BY level",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the privacy tier
    (k-anonymity: identity; l-diversity: attribute presence; THIS:
    attribute DISTRIBUTION): per QI group, the total-variation
    distance between the group's c_mktsegment distribution and the
    whole table's, walked down the same generalization ladder. A
    release gate requires ``max_t_bp <= T_CLOSE_BP`` — coarsening the
    QI pulls every group's distribution toward the global one, so the
    report is the anonymity/utility trade-off curve in one table. All
    arithmetic is exact BIGINT (TV distance in basis points via
    integer division), so both engines agree bit-for-bit."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    band100 = F.floor(F.col("c_acctbal") / 100).cast("long")
    band1000 = F.floor(F.col("c_acctbal") / 1000).cast("long")
    sign = F.when(F.col("c_acctbal") < 0, 0).otherwise(1)
    seg = F.col("c_mktsegment").alias("s")
    with_region = cust.join(
        F.broadcast(t["nation"].select("n_nationkey", "n_regionkey")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    )
    lv0 = t_closeness_level(
        cust.select("c_nationkey", band100.alias("b"), seg),
        ["c_nationkey", "b"], 0, _TCLOSE_QI[0][0],
    )
    lv1 = t_closeness_level(
        cust.select("c_nationkey", band1000.alias("b"), seg),
        ["c_nationkey", "b"], 1, _TCLOSE_QI[1][0],
    )
    lv2 = t_closeness_level(
        with_region.select("n_regionkey", sign.alias("b"), seg),
        ["n_regionkey", "b"], 2, _TCLOSE_QI[2][0],
    )
    return lv0.unionByName(lv1).unionByName(lv2).orderBy("level")


# ---------------------------------------------------------------------------
# Differential privacy: seeded-Laplace noisy count release
# ---------------------------------------------------------------------------

DP_EPSILON = 1.0  # per-release budget; count sensitivity is 1
DP_SEED = "dp-release-1"  # release identifier -> reproducible noise draw
_DP_U_BITS = 16_777_216  # 2^24 uniform grid


def _dp_u_spark(key: str) -> str:
    from ..functions.hashing import hash60_spark

    h = hash60_spark(f"concat('{DP_SEED}:', {key})")
    return f"(CAST({h} % {_DP_U_BITS} AS DOUBLE) + 0.5) / {_DP_U_BITS}.0"


def _dp_u_duck(key: str) -> str:
    from ..functions.hashing import hash60_duck

    h = hash60_duck(f"'{DP_SEED}:' || {key}")
    return f"(CAST({h} % {_DP_U_BITS} AS DOUBLE) + 0.5) / {_DP_U_BITS}.0"


def _dp_oracle() -> str:
    u = _dp_u_duck("event_type")
    lap = (
        f"-(1.0 / {DP_EPSILON}) * (CASE WHEN ({u}) >= 0.5 THEN 1.0 ELSE -1.0 END)"
        f" * ln(1.0 - 2.0 * abs(({u}) - 0.5))"
    )
    return f"""
    WITH counts AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           round(greatest(0.0, CAST(n AS DOUBLE) + ({lap})), 4)
             AS noisy_count,
           {DP_EPSILON} AS epsilon
    FROM counts
    """


@query("privacy_dp_noisy_counts", _dp_oracle())
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """epsilon-DP noisy histogram release of event counts by type —
    the Laplace mechanism (Dwork et al. 2006): count queries have
    sensitivity 1, so adding Laplace(1/eps) noise to each cell gives
    an eps-DP release; negative results clamp to 0 post-noise
    (post-processing preserves DP).

    The noise draw is a SEEDED inverse-CDF transform — u = (h+0.5)/2^24
    from the portable 60-bit hash of (release-seed, key), then
    Laplace⁻¹(u) = -(1/eps)·sign(u-1/2)·ln(1-2|u-1/2|) — so the release
    is reproducible (same seed ⇒ same table, the property an audited
    publication pipeline needs) and DuckDB certifies every noisy cell
    bit-identically.

    MECHANISM DEMONSTRATION, NOT A PRIVACY-PROVIDING RELEASE (ADVICE
    r12): DP_SEED here is a public code constant, so anyone reading
    the repo can reconstruct every Laplace draw exactly and recover
    the true counts — the stated eps-DP guarantee holds ONLY if the
    seed is generated secretly per release (a CSPRNG draw), never
    persisted, and discarded after the noise is applied. Rotating to
    another KNOWN seed still voids the guarantee. This entry exists to
    certify the mechanism's arithmetic cross-engine; a real release
    swaps the seeded hash for secret entropy and gives up the oracle.
    Offset +0.5 keeps u strictly inside (0,1): ln(0) is
    unreachable, and u=0.5 (noise exactly 0) is well-defined. Shape:
    one scan, one key-cardinality agg, map-side-computable noise — the
    same cost as the raw histogram at any scale."""
    e = load_tables(spark, sf_dir)["events"]
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    u = F.expr(_dp_u_spark("event_type"))
    lap = (
        -(1.0 / DP_EPSILON)
        * F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return counts.select(
        "event_type",
        F.round(
            F.greatest(F.lit(0.0), F.col("n").cast("double") + lap), 4
        ).alias("noisy_count"),
        F.lit(DP_EPSILON).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# Local differential privacy: randomized response (Warner 1965)
# ---------------------------------------------------------------------------

RR_P_TRUTH = 0.75  # respond truthfully with this probability
RR_SEED = "rr-release-1"
RR_BAL_CUT = 5_000.0  # sensitive bit: account balance above this


def _rr_u_duck() -> str:
    from ..functions.hashing import hash60_duck

    h = hash60_duck(f"'{RR_SEED}:' || CAST(c_custkey AS VARCHAR)")
    return f"(CAST({h} % {_DP_U_BITS} AS DOUBLE) + 0.5) / {_DP_U_BITS}.0"


def _rr_u_spark() -> str:
    from ..functions.hashing import hash60_spark

    h = hash60_spark(f"concat('{RR_SEED}:', CAST(c_custkey AS STRING))")
    return f"(CAST({h} % {_DP_U_BITS} AS DOUBLE) + 0.5) / {_DP_U_BITS}.0"


@query(
    "privacy_randomized_response",
    f"""
    WITH resp AS (
        SELECT c_nationkey,
               CASE WHEN c_acctbal > {RR_BAL_CUT} THEN 1 ELSE 0 END AS a,
               CASE WHEN ({_rr_u_duck()}) < {RR_P_TRUTH}
                    THEN CASE WHEN c_acctbal > {RR_BAL_CUT} THEN 1 ELSE 0 END
                    ELSE CASE WHEN c_acctbal > {RR_BAL_CUT} THEN 0 ELSE 1 END
               END AS report
        FROM customer
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(report) AS BIGINT) AS n_report_yes,
           round((CAST(sum(report) AS DOUBLE) / count(*)
                  + {RR_P_TRUTH} - 1.0) / (2.0 * {RR_P_TRUTH} - 1.0), 4)
             AS pi_hat,
           round(CAST(sum(a) AS DOUBLE) / count(*), 4) AS true_rate
    FROM resp GROUP BY c_nationkey
    """,
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local DP via randomized response (Warner 1965): each row
    reports its sensitive bit truthfully with probability p and
    flipped otherwise, giving per-row plausible deniability
    (ε = ln(p/(1−p)) ≈ 1.1 at p=0.75); the population rate is then
    debiased as π̂ = (mean(report) + p − 1)/(2p − 1).

    The coin is the same seeded portable-hash uniform the Laplace
    release uses (``privacy_dp_noisy_counts``) — reproducible by seed,
    so the oracle certifies every flip and the debiased estimate
    cell-by-cell; the true rate rides along purely as certification.
    MECHANISM DEMONSTRATION, NOT A PRIVACY-PROVIDING RELEASE (ADVICE
    r12): with the seed a public code constant every flip is exactly
    reconstructable, so the plausible-deniability claim holds ONLY
    with a secret, discarded, per-release seed — and a real release
    also drops the true_rate column, which this entry emits solely so
    the oracle can certify the debiasing. All comparisons are against
    literal thresholds on identical doubles — exact both engines.
    Shape: one scan, one key-cardinality agg; the mechanism is
    map-side arithmetic, free at 100 TB."""
    c = load_tables(spark, sf_dir)["customer"]
    a = F.when(F.col("c_acctbal") > RR_BAL_CUT, 1).otherwise(0)
    u = F.expr(_rr_u_spark())
    report = F.when(u < RR_P_TRUTH, a).otherwise(1 - a)
    resp = c.select(
        "c_nationkey", a.alias("a"), report.alias("report")
    )
    mean_rep = F.sum("report").cast("double") / F.count(F.lit(1))
    return resp.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("report").cast("long").alias("n_report_yes"),
        F.round(
            (mean_rep + RR_P_TRUTH - 1.0) / (2.0 * RR_P_TRUTH - 1.0), 4
        ).alias("pi_hat"),
        F.round(F.sum("a").cast("double") / F.count(F.lit(1)), 4).alias(
            "true_rate"
        ),
    )
