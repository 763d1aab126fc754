"""Portable, oracle-verified sketches (SURVEY §2.4 sketch family).

Spark's own approx aggregates (``approx_count_distinct`` HLL++,
``approx_percentile`` t-digest) are engine-specific, so their registry
entries are rows-only with pytest rtol pins. This module adds PORTABLE
twins whose entire computation — hashing, register math, estimate —
is deterministic integer/IEEE arithmetic expressible identically in
DuckDB, so the driver value-checks the whole sketch pipeline:

- ``agg_hll_portable``: a real HyperLogLog (m=64 registers over the
  60-bit portable hash) whose register sum is computed EXACTLY in
  integers (sum of 2^(SCALE-rho-bucketbits) as BIGINT — no float pow),
  so both engines produce the identical estimate to 4 decimals.
- ``agg_quantile_histogram``: equi-width-histogram quantiles with
  linear interpolation — the classic two-pass mergeable estimator
  (bin counts are partial-aggregatable; at 100 TB the shuffle is
  NB bins per group, not the value space).

Like the count-min sketch (``events.events_heavyhitters_cm``), the
production path would flip the hash to xxhash64; the portable flavor
exists so correctness of the DESIGN is machine-checked, not asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60_duck, hash60_spark
from ..tables import load_tables
from .relational import query

# --- portable HyperLogLog ---------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
# h is 60 bits: low HLL_P bits pick the register, the remaining W bits
# feed the rank (leading-zero count). rho in [1, W+1].
HLL_W = 60 - HLL_P
# alpha_64 (standard HLL bias constant for m=64)
HLL_ALPHA = 0.709
# Exact register sum scale: sum_j 2^(HLL_W + 1 - rho_j) is a BIGINT
# (rho >= 1, so each term <= 2^W; 64 terms < 2^61 — no overflow).


def _rho_sql(w: str) -> str:
    """rank = leading zeros of the W-bit value + 1 == W+1 - bit_length,
    as a CASE chain of integer comparisons (exact in any engine; the
    float log2 alternative is off-by-one at powers of two)."""
    arms = " ".join(
        f"WHEN {w} >= {1 << (HLL_W - 1 - k)} THEN {k + 1}"
        for k in range(HLL_W)
    )
    return f"(CASE {arms} ELSE {HLL_W + 1} END)"


def _hll_estimate_sql(reg_sum: str, zeros: str, dialect_ln: str) -> str:
    """Shared estimate formula over the EXACT integer register sum.

    raw = alpha * m^2 / sum_j 2^-rho_j, where the sum is reg_sum / 2^W
    (reg_sum integer-exact). Small-range correction: if any register is
    empty and raw <= 2.5m, use linear counting m*ln(m/zeros)."""
    pow2w = float(1 << (HLL_W + 1))  # the register sum's exact scale
    raw = f"({HLL_ALPHA} * {HLL_M} * {HLL_M} * {pow2w} / {reg_sum})"
    lc = f"({HLL_M} * {dialect_ln}({HLL_M}.0 / {zeros}))"
    return (
        f"CASE WHEN {zeros} > 0 AND {raw} <= {2.5 * HLL_M} "
        f"THEN {lc} ELSE {raw} END"
    )


@query(
    "agg_hll_portable",
    f"""
    WITH h AS (
      SELECT {hash60_duck("'hll|' || CAST(user_id AS VARCHAR)")} AS hv
      FROM events WHERE user_id IS NOT NULL
    ),
    regs AS (
      SELECT CAST(hv % {HLL_M} AS INTEGER) AS bucket,
             max({_rho_sql(f"(hv // {HLL_M})")}) AS rho
      FROM h GROUP BY bucket
    ),
    s AS (
      SELECT CAST(sum(CAST(1 AS BIGINT) << ({HLL_W + 1} - rho)) AS BIGINT)
               AS reg_sum_present,
             count(*) AS n_regs
      FROM regs
    ),
    t AS (
      SELECT reg_sum_present
               + ({HLL_M} - n_regs) * (CAST(1 AS BIGINT) << {HLL_W + 1})
               AS reg_sum,
             {HLL_M} - n_regs AS zeros
      FROM s
    )
    SELECT round({_hll_estimate_sql("reg_sum", "zeros", "ln")}, 4)
             AS approx_distinct
    FROM t
    """,
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users by a fully-verified HyperLogLog. Distributed
    shape: one groupBy over 64 register ids (map-side combined max —
    the register table IS the mergeable sketch), then a scalar fold.
    Empty registers contribute 2^W to the exact integer register sum
    (2^-0 scaled), added arithmetically from the register count."""
    events = load_tables(spark, sf_dir)["events"]
    seeded = "concat('hll|', CAST(user_id AS STRING))"
    h = events.filter(F.col("user_id").isNotNull()).selectExpr(
        f"{hash60_spark(seeded)} AS hv"
    )
    regs = h.selectExpr(
        f"CAST(hv % {HLL_M} AS INT) AS bucket",
        f"{_rho_sql(f'(hv div {HLL_M})')} AS rho",
    ).groupBy("bucket").agg(F.max("rho").alias("rho"))
    s = regs.selectExpr(
        f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - rho) AS term"
    ).agg(
        F.sum("term").alias("reg_sum_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    t = s.selectExpr(
        f"reg_sum_present + ({HLL_M} - n_regs)"
        f" * shiftleft(CAST(1 AS BIGINT), {HLL_W + 1}) AS reg_sum",
        f"{HLL_M} - n_regs AS zeros",
    )
    return t.selectExpr(
        f"round({_hll_estimate_sql('reg_sum', 'zeros', 'ln')}, 4)"
        " AS approx_distinct"
    )


# --- histogram quantiles ----------------------------------------------------

NB = 128  # equi-width bins; the sketch is NB counts per group
QUANTILES = (0.5, 0.9, 0.99)


@query(
    "agg_quantile_histogram",
    f"""
    WITH b AS (
      SELECT min(value) AS mn, max(value) AS mx
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT CASE WHEN b.mx = b.mn THEN 0
                  ELSE least(CAST(floor((value - b.mn) / (b.mx - b.mn) * {NB})
                             AS INTEGER), {NB - 1})
             END AS bin
      FROM events, b WHERE value IS NOT NULL
    ),
    hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY bin),
    cum AS (
      SELECT bin, c,
             sum(c) OVER (ORDER BY bin) AS cum_c,
             sum(c) OVER () AS total
      FROM hist
    ),
    q AS (
      SELECT CAST(x AS DOUBLE) AS q
      FROM (VALUES {", ".join(f"({q})" for q in QUANTILES)}) v(x)
    ),
    pick AS (
      SELECT q.q, min(cum.bin) AS bin
      FROM q JOIN cum ON cum.cum_c >= q.q * cum.total
      GROUP BY q.q
    )
    SELECT p.q,
           round(b.mn + (b.mx - b.mn) / {NB} * (
             p.bin + (p.q * c2.total - (c2.cum_c - c2.c)) / c2.c
           ), 4) AS est
    FROM pick p JOIN cum c2 ON p.bin = c2.bin CROSS JOIN b
    ORDER BY p.q
    """,
)
def agg_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value by equi-width-histogram interpolation
    — the mergeable two-pass quantile sketch (bin counts combine across
    partitions/executors; only NB counts shuffle). Estimate: first bin
    whose cumulative count covers the target, linearly interpolated
    within the bin."""
    events = load_tables(spark, sf_dir)["events"]
    v = events.filter(F.col("value").isNotNull()).select("value")
    b = v.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    # Degenerate range (constant column / single row): (value-mn)/(mx-mn)
    # is 0/0 — put everything in bin 0 and the mn + (mx-mn)*... estimate
    # collapses to the constant.
    binned = v.crossJoin(F.broadcast(b)).selectExpr(
        "CASE WHEN mx = mn THEN 0 ELSE "
        f"least(CAST(floor((value - mn) / (mx - mn) * {NB}) AS INT), {NB - 1})"
        " END AS bin"
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    cum = hist.select(
        "bin",
        "c",
        F.sum("c").over(Window.orderBy("bin")).alias("cum_c"),
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qs = events.sparkSession.createDataFrame(
        [(q,) for q in QUANTILES], ["q"]
    )
    pick = (
        F.broadcast(qs)
        .join(cum, F.col("cum_c") >= F.col("q") * F.col("total"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        pick.join(cum, "bin")
        .crossJoin(F.broadcast(b))
        .selectExpr(
            "q",
            f"round(mn + (mx - mn) / {NB} * ("
            "bin + (q * total - (cum_c - c)) / c), 4) AS est",
        )
    )
    return est.orderBy("q")


@query(
    "agg_hll_portable_merge",
    f"""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day,
             {hash60_duck("'hll|' || CAST(user_id AS VARCHAR)")} AS hv
      FROM events WHERE user_id IS NOT NULL
    ),
    day_regs AS (
      SELECT day, CAST(hv % {HLL_M} AS INTEGER) AS bucket,
             max({_rho_sql(f"(hv // {HLL_M})")}) AS rho
      FROM h GROUP BY day, bucket
    ),
    merged AS (
      SELECT bucket, max(rho) AS rho FROM day_regs GROUP BY bucket
    ),
    s AS (
      SELECT CAST(sum(CAST(1 AS BIGINT) << ({HLL_W + 1} - rho)) AS BIGINT)
               AS reg_sum_present,
             count(*) AS n_regs
      FROM merged
    ),
    t AS (
      SELECT reg_sum_present
               + ({HLL_M} - n_regs) * (CAST(1 AS BIGINT) << {HLL_W + 1})
               AS reg_sum,
             {HLL_M} - n_regs AS zeros
      FROM s
    )
    SELECT CAST((SELECT count(*) FROM day_regs) AS BIGINT) AS n_partials,
           round({_hll_estimate_sql("reg_sum", "zeros", "ln")}, 4)
             AS approx_distinct
    FROM t
    """,
)
def agg_hll_portable_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY, oracle-verified: per-day register tables
    (the partial sketches a daily pipeline would persist) max-merged
    into one register set — the merged estimate is computed by the
    same fold and must equal the one-pass estimate, which the pytest
    pin asserts and the DuckDB oracle value-checks. This is the
    re-aggregatable pattern that lets 365 daily sketches answer
    "distinct users this year" without touching raw data."""
    events = load_tables(spark, sf_dir)["events"]
    seeded = "concat('hll|', CAST(user_id AS STRING))"
    h = events.filter(F.col("user_id").isNotNull()).selectExpr(
        "CAST(ts AS DATE) AS day", f"{hash60_spark(seeded)} AS hv"
    )
    day_regs = (
        h.selectExpr(
            "day",
            f"CAST(hv % {HLL_M} AS INT) AS bucket",
            f"{_rho_sql(f'(hv div {HLL_M})')} AS rho",
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = day_regs.groupBy("bucket").agg(F.max("rho").alias("rho"))
    s = merged.selectExpr(
        f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - rho) AS term"
    ).agg(
        F.sum("term").alias("reg_sum_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    t = s.selectExpr(
        f"reg_sum_present + ({HLL_M} - n_regs)"
        f" * shiftleft(CAST(1 AS BIGINT), {HLL_W + 1}) AS reg_sum",
        f"{HLL_M} - n_regs AS zeros",
    )
    n_p = day_regs.agg(F.count(F.lit(1)).alias("n_partials"))
    return t.crossJoin(F.broadcast(n_p)).selectExpr(
        "n_partials",
        f"round({_hll_estimate_sql('reg_sum', 'zeros', 'ln')}, 4)"
        " AS approx_distinct",
    )


# --- KMV (k-minimum-values) distinct sketch with set operations ------------

KMV_K = 16
#: (K-1) * 2^60 — exactly representable in a double (4-bit mantissa ×
#: power of two), so the literal is bit-identical in both engines.
_KMV_NUM = float((KMV_K - 1) << 60)
_KMV_A, _KMV_B = "click", "purchase"


@query(
    "agg_kmv_setops",
    f"""
    WITH m AS (
        SELECT event_type, user_id FROM events
        WHERE event_type IN ('{_KMV_A}', '{_KMV_B}') AND user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    h AS (
        SELECT event_type,
               {hash60_duck("'kmv|' || CAST(user_id AS VARCHAR)")} AS hv
        FROM m
    ),
    perset AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM h
    ),
    est_ab AS (
        SELECT event_type AS measure,
               CASE WHEN max(cnt) < {KMV_K} THEN CAST(max(cnt) AS DOUBLE)
                    ELSE {_KMV_NUM!r}
                         / CAST(max(CASE WHEN rn = {KMV_K} THEN hv END) AS DOUBLE)
               END AS est,
               CAST(max(cnt) AS DOUBLE) AS exact_v
        FROM perset GROUP BY event_type
    ),
    u AS (SELECT hv, count(*) AS sides FROM h GROUP BY hv),
    ru AS (
        SELECT hv, sides,
               row_number() OVER (ORDER BY hv) AS rn,
               count(*) OVER () AS cnt
        FROM u
    ),
    est_u AS (
        SELECT CASE WHEN max(cnt) < {KMV_K} THEN CAST(max(cnt) AS DOUBLE)
                    ELSE {_KMV_NUM!r}
                         / CAST(max(CASE WHEN rn = {KMV_K} THEN hv END) AS DOUBLE)
               END AS est_union,
               CAST(max(cnt) AS DOUBLE) AS exact_union,
               CAST(sum(CASE WHEN rn <= {KMV_K} AND sides = 2 THEN 1 ELSE 0 END)
                    AS DOUBLE)
                 / CAST(least({KMV_K}, max(cnt)) AS DOUBLE) AS rho,
               CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 AS exact_inter
        FROM ru
    )
    SELECT measure, round(est, 4) AS est, round(exact_v, 4) AS exact_v
    FROM est_ab
    UNION ALL
    SELECT 'union', round(est_union, 4), round(exact_union, 4) FROM est_u
    UNION ALL
    SELECT 'intersection', round(rho * est_union, 4), round(exact_inter, 4)
    FROM est_u
    UNION ALL
    SELECT 'jaccard', round(rho, 4), round(exact_inter / exact_union, 4)
    FROM est_u
    """,
)
def agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch with UNION/INTERSECTION
    estimates between two user populations — the set-operation family
    HLL cannot provide (HLL unions but never intersects without
    inclusion-exclusion blowup).

    Sketch: the K smallest 60-bit portable hashes of each population.
    est(S) = (K-1) / h_(K) (normalized); union sketch = K smallest of
    the merged hash sets; Jaccard ρ = |K-min(U) ∩ A ∩ B| / K and
    intersection ≈ ρ · est(U) — the classic KMV coincidence estimator.
    Populations smaller than K short-circuit to their exact count
    (exercised at sf0.001 where each side has 15 users; the estimator
    path runs from sf0.01 up). Distributed shape: per-population
    top-K-smallest is a partial-aggregatable min-heap (here: window
    rank over the deduplicated hash table, key-cardinality); nothing
    fact-sized crosses the shuffle. ``exact_v`` columns carry the
    true values so the sketch error is visible in the result itself.
    """
    events = load_tables(spark, sf_dir)["events"]
    m = (
        events.where(
            F.col("event_type").isin(_KMV_A, _KMV_B) & F.col("user_id").isNotNull()
        )
        .select("event_type", "user_id")
        .distinct()
    )
    seeded = "concat('kmv|', CAST(user_id AS STRING))"
    h = m.selectExpr("event_type", f"{hash60_spark(seeded)} AS hv")
    w_set = Window.partitionBy("event_type").orderBy("hv")
    perset = h.select(
        "event_type",
        "hv",
        F.row_number().over(w_set).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("cnt"),
    )
    kth = F.max(F.when(F.col("rn") == KMV_K, F.col("hv")))
    est_ab = perset.groupBy(F.col("event_type").alias("measure")).agg(
        F.when(F.max("cnt") < KMV_K, F.max("cnt").cast("double"))
        .otherwise(F.lit(_KMV_NUM) / kth.cast("double"))
        .alias("est"),
        F.max("cnt").cast("double").alias("exact_v"),
    )
    u = h.groupBy("hv").agg(F.count("*").alias("sides"))
    ru = u.select(
        "hv",
        "sides",
        F.row_number().over(Window.orderBy("hv")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    est_u = ru.agg(
        F.when(F.max("cnt") < KMV_K, F.max("cnt").cast("double"))
        .otherwise(F.lit(_KMV_NUM) / kth.cast("double"))
        .alias("est_union"),
        F.max("cnt").cast("double").alias("exact_union"),
        (
            F.sum(
                F.when((F.col("rn") <= KMV_K) & (F.col("sides") == 2), 1).otherwise(0)
            ).cast("double")
            / F.least(F.lit(KMV_K), F.max("cnt")).cast("double")
        ).alias("rho"),
        F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
        .cast("double")
        .alias("exact_inter"),
    )
    rows_ab = est_ab.select(
        "measure", F.round("est", 4).alias("est"), F.round("exact_v", 4).alias("exact_v")
    )
    rows_u = est_u.select(
        F.lit("union").alias("measure"),
        F.round("est_union", 4).alias("est"),
        F.round("exact_union", 4).alias("exact_v"),
    )
    rows_i = est_u.select(
        F.lit("intersection").alias("measure"),
        F.round(F.col("rho") * F.col("est_union"), 4).alias("est"),
        F.round("exact_inter", 4).alias("exact_v"),
    )
    rows_j = est_u.select(
        F.lit("jaccard").alias("measure"),
        F.round("rho", 4).alias("est"),
        F.round(F.col("exact_inter") / F.col("exact_union"), 4).alias("exact_v"),
    )
    return rows_ab.unionAll(rows_u).unionAll(rows_i).unionAll(rows_j)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Build the KMV state: the ``KMV_K`` smallest portable hashes of
    the distinct keys (optionally per group). The state IS the sketch —
    ``kmv_merge`` of per-batch states equals the whole-corpus state
    EXACTLY (k smallest of a union is a pure function of the per-batch
    k-smallest sets), which ``test_kmv_merge_equals_full`` pins."""
    grp = [group_col] if group_col else []
    seeded = f"concat('kmv|', CAST({key_col} AS STRING))"
    h = (
        df.where(F.col(key_col).isNotNull())
        .select(*grp, F.expr(f"{hash60_spark(seeded)}").alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(*grp).orderBy("hv") if grp else Window.orderBy("hv")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_merge(*sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge KMV states: k smallest of the union of k-min sets."""
    un = sketches[0]
    for s in sketches[1:]:
        un = un.unionByName(s)
    grp = [c for c in un.columns if c != "hv"]
    dedup = un.distinct()
    w = Window.partitionBy(*grp).orderBy("hv") if grp else Window.orderBy("hv")
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate from a KMV state (per group if any):
    (K-1)/h_(K) normalized, exact count when the population is < K."""
    grp = [c for c in sketch.columns if c != "hv"]
    w = Window.partitionBy(*grp).orderBy("hv") if grp else Window.orderBy("hv")
    ranked = sketch.withColumn("rn", F.row_number().over(w))
    kth = F.max(F.when(F.col("rn") == k, F.col("hv")))
    num = float((k - 1) << 60)  # exact in double for any small k
    agg = [
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.lit(num) / kth.cast("double"))
        .alias("est")
    ]
    return ranked.groupBy(*grp).agg(*agg) if grp else ranked.agg(*agg)
