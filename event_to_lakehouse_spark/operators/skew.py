"""Skew mitigation: salted aggregation and salted joins.

AQE (`spark.sql.adaptive.skewJoin`) splits skewed SORT-MERGE partitions
automatically, and broadcast joins sidestep skew entirely — those are
the defaults this engine relies on. Salting is the remaining tool for
the cases AQE does not cover:

- **hot-key aggregation**: one key holding >> 1/partitions of the rows
  makes a single reducer the straggler even with map-side partials
  (partials only combine within a task). ``salted_agg`` shards each
  key across ``n_salt`` reducers, then combines shards — two small
  shuffles instead of one stalled one.
- **hot-key equi-join** where neither side broadcasts: ``salted_join``
  replicates the smaller side ``n_salt``× with an explicit salt column
  and shards the big side deterministically (hash of the row's join
  payload — no rand(), so retries/speculative tasks stay consistent).

Both preserve exact results (tests pin salted == unsalted); they only
change the shuffle key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query

DEFAULT_SALT = 16

# Aggregates that re-combine losslessly from per-shard partials.
_COMBINABLE = {"sum", "count", "min", "max"}


def _salt_col(df: DataFrame, n_salt: int) -> Column:
    """Deterministic shard id: hash over every column (stable across
    retries, unlike rand()); uniform because xxhash64 mixes well."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column → (fn, input column), fn in
    {sum, count, min, max} (the partial-recombinable set; avg = sum +
    count composed by the caller). Stage 1 aggregates per (keys, salt)
    — the hot key fans out over ``n_salt`` reducers; stage 2 combines
    shards per key (count shards re-combine by SUM)."""
    for out, (fn, _src) in aggs.items():
        if fn not in _COMBINABLE:
            raise ValueError(f"{out}: {fn!r} not in {sorted(_COMBINABLE)}")

    salted = df.withColumn("_salt", _salt_col(df, n_salt))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(src).alias(out)
            for out, (fn, src) in aggs.items()
        ]
    )
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    return stage1.groupBy(*keys).agg(
        *[
            getattr(F, recombine[fn])(out).alias(out)
            for out, (fn, _src) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys sharded over ``n_salt``
    reducers. The small side is replicated ``n_salt``× (explode over a
    literal salt array — cheap for dimension-scale inputs; if the small
    side broadcasts, use ``broadcast()`` instead of salting at all)."""
    big_salted = big.withColumn("_salt", _salt_col(big, n_salt))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_salted.join(small_rep, on + ["_salt"], how)
    return out.drop("_salt")


# ---------------------------------------------------------------------------
# Key-skew profiler — the gauge that decides when the salted paths
# above (and AQE skew-join) need to engage
# ---------------------------------------------------------------------------

SKEW_SALT_THRESHOLD = 16.0  # max/median count ratio; mirrors DEFAULT_SALT


def key_skew_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per join-key-candidate column: row/key cardinality, the count
    distribution of its hottest keys (max, p50, p99), and a salt
    verdict — the diagnosis a 100 TB pipeline runs BEFORE a shuffle
    lands on a hot key, deciding between a plain hash join,
    ``salted_join``, or an AQE skew split.

    ONE fact scan: every profiled column rides a single ``stack``
    unpivot into (key_col, key_val), then ONE groupBy shuffle whose
    output is key-cardinality-scale; the distribution stats aggregate
    those small count rows (the p50/p99 sort is key-scale, never
    fact-scale). Determinism: counts are exact integers; the shares
    and ratios are quantized on the integer 1e-4 grid (one IEEE
    division of exact operands, then round-to-int — the
    ``orders_cohort_ltv`` lesson) and p50/p99 ride the proven
    ``F.percentile`` ↔ ``quantile_cont`` parity pair as ONE array
    percentile (one key-scale sort, not two — the
    ``stats_quantile_bins`` lesson).
    """
    pairs = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in cols
    )
    keyed = df.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (key_col, key_val)"
    )
    cnts = keyed.groupBy("key_col", "key_val").count()
    cnt = F.col("count").cast("double")
    qs = F.percentile(cnt, F.array(F.lit(0.5), F.lit(0.99)))
    agg = cnts.groupBy("key_col").agg(
        F.sum("count").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("count").cast("long").alias("max_cnt"),
        qs.alias("_qs"),
    )
    mx = F.col("max_cnt").cast("double")
    p50 = F.col("_qs")[0]
    return agg.select(
        "key_col",
        "n_rows",
        "n_keys",
        "max_cnt",
        F.round(p50, 4).alias("p50_cnt"),
        F.round(F.col("_qs")[1], 4).alias("p99_cnt"),
        (F.round(mx * 10000.0 / F.col("n_rows").cast("double")) / 10000.0).alias(
            "top1_share"
        ),
        (F.round(mx * 10000.0 / p50) / 10000.0).alias("skew_ratio"),
        F.when(mx > F.lit(SKEW_SALT_THRESHOLD) * p50, F.lit("salt"))
        .otherwise(F.lit("plain"))
        .alias("salt_verdict"),
    )


def _skew_oracle() -> str:
    # The SQL twin unions one SELECT per profiled column (DuckDB has no
    # stack); semantically identical to the Spark side's single-scan
    # unpivot — the oracle runs at gate SF where the double scan is free.
    return """
    WITH keyed AS (
        SELECT 'user_id' AS key_col, CAST(user_id AS VARCHAR) AS key_val
        FROM events
        UNION ALL
        SELECT 'event_type', event_type FROM events
    ),
    cnts AS (
        SELECT key_col, key_val, count(*) AS cnt
        FROM keyed GROUP BY 1, 2
    )
    SELECT key_col,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(quantile_cont(CAST(cnt AS DOUBLE), 0.5), 4) AS p50_cnt,
           round(quantile_cont(CAST(cnt AS DOUBLE), 0.99), 4) AS p99_cnt,
           round(CAST(max(cnt) AS DOUBLE) * 10000.0
                 / CAST(sum(cnt) AS DOUBLE)) / 10000.0 AS top1_share,
           round(CAST(max(cnt) AS DOUBLE) * 10000.0
                 / quantile_cont(CAST(cnt AS DOUBLE), 0.5)) / 10000.0
             AS skew_ratio,
           CASE WHEN CAST(max(cnt) AS DOUBLE)
                     > 16.0 * quantile_cont(CAST(cnt AS DOUBLE), 0.5)
                THEN 'salt' ELSE 'plain' END AS salt_verdict
    FROM cnts GROUP BY 1
    """


# --- small-file compaction planning (ops tier) -----------------------------

# Target rows per compacted output file for the ledger twin below.
# SnapshotTable.compaction_plan applies the SAME rule to its manifest
# (storage/snapshots.py), so the cross-engine parity here certifies
# the packing arithmetic the table-maintenance path runs on.
COMPACT_TARGET_ROWS = 500


def compaction_bins(
    files: DataFrame,
    part_cols: list[str],
    order_col: str,
    rows_col: str,
    target: int,
) -> DataFrame:
    """Streaming bin-pack: assign each small file (``rows < target``)
    to compaction bin ``floor(cum_rows_of_prior_small_files / target)``
    within its partition, in ``order_col`` order; files already at or
    above the target keep bin -1 (never rewritten). The cumulative rule
    is single-pass (no lookahead), so the same arithmetic runs
    identically as this distributed window, as a stream fold, and as
    the driver-side loop in ``SnapshotTable.compaction_plan``.

    Scale: the window sorts per PARTITION (table partition key) — the
    unit real compaction jobs plan over — and a file ledger is
    metadata-scale (one row per file), so even the per-partition sort
    is file-count-, not data-, sized."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    small = F.when(F.col(rows_col) < target, F.col(rows_col)).otherwise(F.lit(0))
    staged = files.withColumn(
        "cum_before", F.coalesce(F.sum(small).over(w), F.lit(0))
    )
    return staged.withColumn(
        "compact_bin",
        F.when(
            F.col(rows_col) < target,
            F.expr(f"cum_before div {target}"),
        ).otherwise(F.lit(-1).cast("long")),
    ).drop("cum_before")


@query(
    "ops_compaction_plan",
    f"""
    WITH f AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS part_year,
             CAST(floor(epoch(date_trunc('month', l_shipdate)) / 86400)
                  AS BIGINT) AS file_id,
             count(*) AS n_rows
      FROM lineitem GROUP BY 1, 2
    ),
    staged AS (
      SELECT part_year, file_id, n_rows,
             coalesce(CAST(sum(CASE WHEN n_rows < {COMPACT_TARGET_ROWS}
                                    THEN n_rows ELSE 0 END)
                           OVER (PARTITION BY part_year ORDER BY file_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS BIGINT),
                      0) AS cum_before
      FROM f
    )
    SELECT part_year, file_id, n_rows,
           CASE WHEN n_rows < {COMPACT_TARGET_ROWS}
                THEN cum_before // {COMPACT_TARGET_ROWS}
                ELSE CAST(-1 AS BIGINT) END AS compact_bin
    FROM staged
    """,
)
def ops_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner over a deterministic file ledger
    (one "file" per l_shipdate month, partitioned by year — the shape
    of a real lakehouse manifest): pack each partition's small files
    into ≈``COMPACT_TARGET_ROWS``-row bins with the streaming
    cumulative rule in ``compaction_bins``; files already at target
    stay put (bin -1). ``SnapshotTable.compaction_plan`` /
    ``compact_small_files`` (storage/snapshots.py) run the SAME rule
    over real manifests — this oracle-checked twin certifies the
    packing arithmetic cross-engine. One scan, one groupBy shuffle,
    one per-partition file-count-scale window sort."""
    li = load_tables(spark, sf_dir)["lineitem"]
    ledger = li.groupBy(
        F.year("l_shipdate").cast("long").alias("part_year"),
        F.floor(
            F.unix_timestamp(F.date_trunc("month", F.col("l_shipdate"))) / 86400
        )
        .cast("long")
        .alias("file_id"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return compaction_bins(
        ledger, ["part_year"], "file_id", "n_rows", COMPACT_TARGET_ROWS
    )


@query("ops_key_skew_profile", _skew_oracle())
def ops_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew gauge over the events table's two join-key candidates:
    ``user_id`` (high-cardinality, bot-heavy tail) and ``event_type``
    (low-cardinality, guaranteed hot) — the ops-tier pre-flight a
    100 TB pipeline runs before keying a shuffle on either column.
    See ``key_skew_profile`` for the one-scan plan and determinism
    notes."""
    ev = load_tables(spark, sf_dir)["events"]
    return key_skew_profile(ev, ["user_id", "event_type"])
