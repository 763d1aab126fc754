"""Event-stream analytics over the ``events`` table.

The reference's core competence is JSON event normalization
(``scripts/bronze_assets_to_silver_assets.py``): parse JSON, filter
corrupt rows, derive typed columns, stamp a surrogate key. Here the same
semantics are expressed per-column with ``from_json`` /
``get_json_object`` (batch/expression twins of the reference's
whole-file JSON reads — SURVEY §2.8), plus the event-time semantics the
reference lacks (tumbling windows, sessionization — SURVEY §2.9).

Batch forms live here with DuckDB oracles; the streaming flavors in
``..streaming`` reuse the same transform functions on an unbounded
DataFrame (the reference's own foreachBatch pattern, :275-277).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.keys import surrogate_uid
from ..tables import load_tables
from .relational import _r4, query

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def parse_props(c: Column | str) -> Column:
    """PERMISSIVE JSON parse of the ``props`` payload column: malformed
    JSON yields a NULL struct rather than failing the job — the
    expression-level twin of the reference's PERMISSIVE +
    ``_corrupt_record`` read options (:28-32)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.from_json(col, PROPS_SCHEMA)


@query(
    "events_json_extract",
    """
    SELECT event_type,
           count(*)                     AS n_events,
           round(avg(value), 4)         AS avg_value,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)              AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select("event_type", "value", parse_props("props").getField("k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r4(F.avg("value")).alias("avg_value"),
            F.sum("k").alias("sum_k"),
        )
    )


@query(
    "events_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value), 4)  AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch form of F.window; both engines
    align 1h buckets to the epoch)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions,
           count(*)                             AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min idle gap) via lag + cumulative
    flag — the batch twin of streaming session_window (SURVEY §2.9)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = t["events"].select(
        "user_id",
        F.when(gap > 1_800_000_000, 1).otherwise(0).alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        (F.sum("new_session") + F.lit(1)).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_normalized_contract",
    """
    SELECT sha256(concat_ws('|',
               lower(trim(CAST(user_id AS VARCHAR))),
               lower(trim(event_type)),
               lower(trim(CAST(event_id AS VARCHAR))))) AS event_uid,
           event_id, user_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           round(value, 4) AS value
    FROM events
    WHERE event_type IN ('purchase', 'signup', 'error')
    """,
)
def events_normalized_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-faithful normalization slice: filter → typed extraction
    → surrogate uid → ordered contract projection — the
    bronze→silver shape (:89-162) on the events table."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type").isin("purchase", "signup", "error"))
        .select(
            surrogate_uid("user_id", "event_type", "event_id").alias("event_uid"),
            "event_id",
            "user_id",
            "event_type",
            parse_props("props").getField("k").alias("prop_k"),
            _r4(F.col("value")).alias("value"),
        )
    )


@query(
    "events_retention_cohorts",
    """
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
        FROM events
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(datediff('week', cohort_week, activity_week) AS INTEGER)
               AS week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix: users bucketed by first-seen week, then
    counted per weeks-since-cohort offset — the standard product-
    analytics triangle.

    Shape: two aggregations over one events scan, both keyed on
    user_id, so the distinct-activity pass and the first-seen pass
    share a single hash partitioning; the cohort join is user_id-
    co-partitioned (no extra exchange under AQE), and the final rollup
    groups the tiny (cohort, offset) space. Both week columns are
    week-truncated dates, so the offset is exact integer division —
    engine-stable."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = ev.select("user_id", week(F.col("ts")).alias("activity_week")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "events_funnel_conversion",
    """
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT DISTINCT s.user_id
        FROM s JOIN events p
          ON p.user_id = s.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= s.signup_ts
         AND p.ts < s.signup_ts + INTERVAL 7 DAY
    )
    SELECT CAST(date_trunc('day', signup_ts) AS TIMESTAMP) AS signup_day,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(count(conv.user_id) AS BIGINT) AS n_converted,
           round(count(conv.user_id) / CAST(count(*) AS DOUBLE), 4)
               AS conversion_rate
    FROM s LEFT JOIN conv USING (user_id)
    GROUP BY signup_day
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: of each day's first-time signups, how
    many purchased within 7 days.

    Shape: first-touch aggregation, then a range SEMI join (purchase
    within the window) — all three legs key on user_id, so one hash
    partitioning serves the agg, the semi join, and the left join;
    the final rollup is per-day tiny. The semi join keeps the plan
    safe at 100 TB: candidate purchases never multiply signup rows."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(
            p,
            (s.user_id == F.col("p_user"))
            & (F.col("p_ts") >= s.signup_ts)
            & (F.col("p_ts") < s.signup_ts + F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .select("user_id")
        .withColumn("_conv", F.lit(1))
    )
    return (
        s.join(conv, "user_id", "left")
        .groupBy(F.date_trunc("day", "signup_ts").alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("_conv").alias("n_converted"),
            _r4(F.count("_conv") / F.count(F.lit(1)).cast("double")).alias(
                "conversion_rate"
            ),
        )
    )


@query(
    "window_first_last",
    """
    SELECT event_id, user_id,
           CAST(first_value(value) OVER w AS DOUBLE) AS first_val,
           CAST(last_value(value)  OVER w AS DOUBLE) AS last_val,
           CAST(nth_value(value, 2) OVER w AS DOUBLE) AS second_val
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit unbounded
    frame (SURVEY §2.5's analytic set) — per-user first, latest, and
    second purchase amounts on every purchase row. The deterministic
    (ts, event_id) ordering makes last/nth engine-stable."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
            F.nth_value("value", 2).over(w).alias("second_val"),
        )
    )


@query(
    "events_json_path",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
           CAST(len(json_keys(props)) AS INTEGER)            AS n_keys,
           list_contains(json_keys(props), 'k')              AS has_k
    FROM events
    """,
)
def events_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining §2.8 JSON/map surface in one projection:
    ``get_json_object`` path extraction (the expression twin of
    ``from_json`` for ad-hoc single-path reads), ``map_keys`` over the
    schema-free map parse, and ``array_contains`` membership.
    (``schema_of_json`` — the inference utility — backs the registry's
    sampled schema inference instead of a per-row expression.)"""
    t = load_tables(spark, sf_dir)
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return t["events"].select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
    )


@query(
    "events_file_lineage",
    # the testdata table is exactly one parquet file, so the expected
    # lineage rollup is static — the oracle pins the Spark side's
    # input_file_name() + basename extraction + per-file count
    """
    SELECT 'events.parquet' AS file_name, count(*) AS n_rows FROM events
    """,
)
def events_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-provenance audit (SURVEY §2.1 S7): every row tagged with its
    source file via ``input_file_name()``, rolled up per file — the
    primitive behind per-file quarantine/replay and bad-file isolation.
    Basename-normalized so the oracle (DuckDB ``filename=true``) agrees
    across URI schemes."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "events_variant_path",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def events_variant_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``parse_json``
    once into a binary-encoded variant, then typed ``try_variant_get``
    path extraction — the open-format answer to schema-on-read that
    avoids per-path string re-parsing (the variant parse happens once
    per row however many paths are read). Missing paths yield NULL, not
    errors. Oracle mirrors the VALUES via DuckDB's JSON path functions."""
    t = load_tables(spark, sf_dir)
    v = F.parse_json("props")
    return (
        t["events"]
        .select(
            "event_type",
            F.try_variant_get(v, "$.k", "bigint").alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("m"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
    )


# ---------------------------------------------------------------------------
# Events payload-parse combo (§2.8 JSON): struct path + map-explode path.
# ---------------------------------------------------------------------------


@query(
    "events_payload_parse",
    """
    SELECT 'json_struct' AS path, event_type AS key,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS total,
           round(avg(value), 4) AS avg_val
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'map_explode', k, count(*),
           CAST(sum(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def events_payload_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both semi-structured parse paths over the JSON payload column:
    typed ``from_json`` struct extraction (the reference's PERMISSIVE
    normalization idiom) and schema-free map parse + explode — tagged
    union, both aggregated per key."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    struct_path = (
        ev.select(
            "event_type",
            "value",
            F.from_json(
                "props", T.StructType([T.StructField("k", T.LongType())])
            ).getField("k").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("total"),
            _r4(F.avg("value")).alias("avg_val"),
        )
        .select(
            F.lit("json_struct").alias("path"),
            F.col("event_type").alias("key"),
            "n",
            "total",
            "avg_val",
        )
    )
    map_path = (
        ev.select(
            F.explode(
                F.from_json("props", T.MapType(T.StringType(), T.LongType()))
            ).alias("key", "v")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .select(
            F.lit("map_explode").alias("path"),
            "key",
            "n",
            "total",
            F.lit(None).cast("double").alias("avg_val"),
        )
    )
    return struct_path.unionByName(map_path)


# ---------------------------------------------------------------------------
# Event-time window combo (§2.9 batch analogs): tumbling + sliding.
# ---------------------------------------------------------------------------


@query(
    "events_windowed_agg",
    """
    WITH e AS (SELECT event_type, value,
                      CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events)
    SELECT 'tumble_1h' AS mode, (t // 3600) * 3600 AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM e GROUP BY 2, 3
    UNION ALL
    SELECT 'slide_1h_30m', window_start, CAST(NULL AS VARCHAR),
           count(*), round(sum(value), 4)
    FROM (SELECT value, unnest([(t // 1800) * 1800, (t // 1800) * 1800 - 1800])
                 AS window_start FROM e)
    GROUP BY 2
    """,
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h) and sliding (1h window / 30min slide) event-time
    windows in one tagged union — the same ``F.window`` calls run
    unchanged over ``readStream`` with a watermark (§2.9); batch twins
    here carry the DuckDB oracle. Output keys are epoch seconds."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    tumble = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.lit("tumble_1h").alias("mode"),
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    slide = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.lit("slide_1h_30m").alias("mode"),
            F.col("w.start").cast("long").alias("window_start"),
            F.lit(None).cast("string").alias("event_type"),
            "n_events",
            "sum_value",
        )
    )
    return tumble.unionByName(slide)

# ---------------------------------------------------------------------------
# Time-series gap fill: dense hourly grid per series with zero-filled
# missing buckets — the "resample" operation every event dashboard
# needs; sequence+explode keeps it fully relational (registry entry).
# ---------------------------------------------------------------------------


@query(
    "events_gap_fill",
    """
    WITH e AS (
        SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS h,
               value
        FROM events
    ),
    hourly AS (
        SELECT event_type, h, count(*) AS n, round(sum(value), 4) AS sv
        FROM e GROUP BY 1, 2
    ),
    b AS (SELECT event_type, min(h) AS mn, max(h) AS mx FROM e GROUP BY 1),
    grid AS (
        SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS h FROM b
    )
    SELECT g.event_type, g.h AS window_start,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           coalesce(sv, 0.0) AS sum_value
    FROM grid g LEFT JOIN hourly USING (event_type, h)
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample per event_type: hours with no events appear
    as explicit zero rows between each series' first and last bucket.

    Shape: one hourly aggregation, a per-series bounds aggregation
    (both share the scan), then ``sequence``+``explode`` builds the
    grid RELATIONALLY — grid size is (span-hours × series), independent
    of event count, and the fill join is an equi left join on
    (series, hour). No driver-side date loops; at 100 TB the grid side
    is tiny and broadcasts."""
    t = load_tables(spark, sf_dir)
    e = t["events"].select(
        "event_type",
        (F.col("ts").cast("long") - (F.col("ts").cast("long") % 3600)).alias("h"),
        "value",
    )
    hourly = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"), _r4(F.sum("value")).alias("sv")
    )
    grid = (
        e.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.lit(3600))).alias("h"),
        )
    )
    return grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("window_start"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Approximate heavy hitters: count-min sketch (SURVEY §2.4 sketch family)
# ---------------------------------------------------------------------------

# Sketch geometry: d hash rows × w buckets. The sketch is a FIXED-SIZE
# (d·w rows) mergeable aggregate no matter the key cardinality — the
# shuffle carries at most d·w partial-combined groups per task, which
# is the whole point at 100 TB (an exact groupBy(key) shuffles the key
# space). Estimates only over-count (bucket collisions), never under.
CM_D = 4
CM_W = 256
CM_TOPK = 20


def _cm_bucket_spark(j: int, expr: str) -> str:
    from ..functions.hashing import hash60_spark

    seeded = "concat('cm" + str(j) + "|', CAST(" + expr + " AS STRING))"
    return f"({hash60_spark(seeded)} % {CM_W})"


def _cm_bucket_duck(j: int, expr: str) -> str:
    from ..functions.hashing import hash60_duck

    seeded = "'cm" + str(j) + "|' || CAST(" + expr + " AS VARCHAR)"
    return f"({hash60_duck(seeded)} % {CM_W})"


def _cm_oracle() -> str:
    row_arms = "\n      UNION ALL ".join(
        f"SELECT {j} AS j, {_cm_bucket_duck(j, 'user_id')} AS bucket FROM events"
        for j in range(CM_D)
    )
    cand_arms = "\n      UNION ALL ".join(
        f"SELECT user_id, {j} AS j, {_cm_bucket_duck(j, 'user_id')} AS bucket FROM cand"
        for j in range(CM_D)
    )
    return f"""
    WITH rows_ AS (
      {row_arms}
    ),
    sketch AS (
      SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
      FROM rows_ GROUP BY j, bucket
    ),
    cand AS (SELECT DISTINCT user_id FROM events),
    crows AS (
      {cand_arms}
    ),
    est AS (
      SELECT user_id, min(c) AS est_count
      FROM crows JOIN sketch USING (j, bucket) GROUP BY user_id
    )
    SELECT user_id, est_count FROM est
    ORDER BY est_count DESC, user_id LIMIT {CM_TOPK}
    """


@query("events_heavyhitters_cm", _cm_oracle())
def events_heavyhitters_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k heaviest users by count-min estimate.

    Build: each event fans out to its d (row, bucket) cells (explode of
    a d-element array — map-side), then ONE fixed-size groupBy: the
    shuffle is ≤ d·w combined groups per task regardless of user
    cardinality. Estimate: candidate keys (here the distinct key set —
    at 100 TB a sampled/streamed candidate feed) probe the broadcast
    sketch; est = min over the d cells. The portable hash keeps every
    bucket bit-identical to the DuckDB oracle."""
    t = load_tables(spark, sf_dir)
    events = t["events"]
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_cm_bucket_spark(j, "user_id")).alias("bucket"),
            )
            for j in range(CM_D)
        ]
    )
    sketch = (
        events.select(F.explode(cells).alias("e"))
        .select("e.j", "e.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cand = events.select("user_id").distinct()
    crows = cand.select("user_id", F.explode(cells).alias("e")).select(
        "user_id", "e.j", "e.bucket"
    )
    est = (
        crows.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    return est.orderBy(F.desc("est_count"), "user_id").limit(CM_TOPK)


# ---------------------------------------------------------------------------
# Time-series smoothing: truncated EWMA (§2.5 window-family extension)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_K = 8  # lookback truncation: weights below a(1-a)^7 ~ 2.5% dropped


def _ewma_weights() -> list[float]:
    # literal weights embedded in BOTH engines' SQL: same doubles, and
    # the fold is the same left-to-right sum, so results match bitwise
    return [
        round(EWMA_ALPHA * (1 - EWMA_ALPHA) ** i, 10) for i in range(EWMA_K)
    ]


def _ewma_oracle() -> str:
    w = _ewma_weights()
    terms = " + ".join(
        f"CASE WHEN len(win) >= {i + 1} THEN {w[i]} * win[len(win) - {i}] "
        "ELSE 0.0 END"
        for i in range(EWMA_K)
    )
    norm = " + ".join(
        f"CASE WHEN len(win) >= {i + 1} THEN {w[i]} ELSE 0.0 END"
        for i in range(EWMA_K)
    )
    return f"""
    WITH s AS (
      SELECT user_id, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN {EWMA_K - 1} PRECEDING AND CURRENT ROW) AS win
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id, round(({terms}) / ({norm}), 4) AS ewma
    FROM s
    """


@query("events_ewma_smooth", _ewma_oracle())
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated EWMA of event value — the standard smoothing
    signal, expressed as ONE window pass: a K-row frame collects the
    trailing values, a literal-weight fold computes the weighted sum,
    and the weight mass is renormalized over however many rows exist
    (so early rows are unbiased). Truncation at K=8 keeps the operator
    a fixed-width frame — state per series is K values regardless of
    history length, the property that makes it streamable and cheap at
    100 TB (the exact recursive EWMA needs an unbounded running
    product, which neither engine's windows express)."""
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    e = t["events"].filter(F.col("value").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_K - 1), W.currentRow)
    )
    wts = _ewma_weights()
    win = F.collect_list("value").over(w)
    # win is oldest-first; weight i applies to the i-th newest element
    terms = " + ".join(
        f"CASE WHEN size(win) >= {i + 1} THEN {wts[i]} * element_at(win, "
        f"size(win) - {i}) ELSE 0.0D END"
        for i in range(EWMA_K)
    )
    norm = " + ".join(
        f"CASE WHEN size(win) >= {i + 1} THEN {wts[i]} ELSE 0.0D END"
        for i in range(EWMA_K)
    )
    return (
        e.select("user_id", "event_id", "value", win.alias("win"))
        .selectExpr(
            "user_id", "event_id", f"round(({terms}) / ({norm}), 4) AS ewma"
        )
    )


ZS_LOOKBACK = 24  # trailing observed hours in the baseline window
ZS_THRESHOLD = 3.0


@query(
    "events_anomaly_zscore",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    stats AS (
      SELECT event_type, hour, n,
             avg(n) OVER w AS mu,
             stddev_samp(n) OVER w AS sigma,
             count(*) OVER w AS n_base
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN {ZS_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, n,
           round(CASE WHEN n_base >= 2 AND sigma > 0
                      THEN (n - mu) / sigma END, 4) AS zscore,
           (n_base >= 2 AND CASE
              WHEN sigma > 0 THEN abs((n - mu) / sigma) > {ZS_THRESHOLD}
              ELSE n <> mu END) AS is_anomaly
    FROM stats
    ORDER BY event_type, hour
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection — the observability query every event
    pipeline runs: hourly counts per event type scored against the
    TRAILING 24-observed-hour baseline (mean/sample-std,
    current hour excluded so a spike can't mask itself); |z| > 3
    flags. Baselines with under 2 trailing hours score NULL and never
    flag; a ZERO-VARIANCE baseline (perfectly steady series) can't
    quantify a z-score (NULL) but ANY deviation from it flags — a
    constant series jumping is the clearest anomaly there is.

    Scale shape: ONE shuffle for the hourly rollup (map-side combined
    counts), whose (event_type) partitioning the analytic window then
    reuses; frames are bounded rows, so state per series is O(24)
    regardless of history length — the same fixed-frame property that
    makes the EWMA operator streamable."""
    events = load_tables(spark, sf_dir)["events"]
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-ZS_LOOKBACK, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_base"),
    )
    base_ok = F.col("n_base") >= 2
    var_ok = F.col("sigma") > 0
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return stats.select(
        "event_type",
        "hour",
        "n",
        F.round(F.when(base_ok & var_ok, z), 4).alias("zscore"),
        (
            base_ok
            & F.when(var_ok, F.abs(z) > ZS_THRESHOLD).otherwise(
                F.col("n") != F.col("mu")
            )
        ).alias("is_anomaly"),
    ).orderBy("event_type", "hour")


# --- interval islands (gaps-and-islands over derived intervals) ------------
#
# Each event opens an activity interval [ts, ts + dur] where dur is the
# event's `value` clamped to [0, IV_MAX_S] seconds (NULL -> 0). Islands
# are the connected unions of OVERLAPPING intervals per user — distinct
# from sessionization (events_sessionize), which chains on inter-EVENT
# gaps; interval union instead asks "how much wall-clock was covered",
# the primitive behind utilization / active-time / SLA-coverage rollups.
IV_MAX_S = 600


@query(
    "events_interval_islands",
    f"""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(round(least(greatest(coalesce(value, 0), 0), {IV_MAX_S}))
                      AS BIGINT) AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= s
                  THEN 0 ELSE 1 END AS new_island
      FROM iv
    ),
    labeled AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id
                                   ORDER BY s, e, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           min(s) AS island_start, max(e) AS island_end,
           CAST(max(e) - min(s) AS BIGINT) AS covered_s,
           count(*) AS n_events
    FROM labeled
    GROUP BY user_id, island_id
    ORDER BY user_id, island_id
    """,
)
def events_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-event activity intervals into islands
    (classic gaps-and-islands): an island breaks where an interval
    starts strictly after the running max end of everything before it.

    Scale shape: ONE shuffle on user_id; both windows are running
    accumulations over the same (user_id, s) ordering, so they fuse
    into one Window exec with bounded state — streamable, and the
    final groupBy on (user_id, island_id) partial-aggregates map-side.
    Epoch-second BIGINTs keep the arithmetic engine-portable."""
    events = load_tables(spark, sf_dir)["events"]
    dur = F.round(
        F.least(F.greatest(F.coalesce(F.col("value"), F.lit(0.0)), F.lit(0.0)),
                F.lit(float(IV_MAX_S)))
    ).cast("long")
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + dur).alias("e"),
    )
    return interval_islands(iv).orderBy("user_id", "island_id")


def interval_islands(iv: DataFrame) -> DataFrame:
    """Core gaps-and-islands merge over (user_id, event_id, s, e)
    interval rows (epoch-second bounds, s <= e): one island per maximal
    run of overlapping-or-touching intervals per user. Randomized-
    vs-reference pytest (`test_properties`) pins the merge semantics
    independently of the oracle."""
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(F.max("e").over(w_prev) >= F.col("s"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    # the running sum MUST share the flag window's full (s, e,
    # event_id) tiebreak: under a bare (s, e) ordering, two identical
    # intervals could interleave across the flag row and split one
    # island's tied rows into two labels nondeterministically
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    labeled = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    return labeled.groupBy(
        "user_id", F.col("island_id").cast("long").alias("island_id")
    ).agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        (F.max("e") - F.min("s")).cast("long").alias("covered_s"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_winsorize",
    """
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN e.value < b.p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(sum(CASE WHEN e.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           round(b.p05, 4) AS p05,
           round(b.p95, 4) AS p95,
           round(avg(e.value), 4) AS mean_raw,
           round(avg(least(greatest(e.value, b.p05), b.p95)), 4)
             AS mean_winsorized
    FROM events e JOIN b ON e.event_type = b.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, b.p05, b.p95
    ORDER BY e.event_type
    """,
)
def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp the metric to its own group's
    exact [p05, p95] band and report raw-vs-winsorized means plus clamp
    counts — the outlier-robustification step that precedes any mean /
    regression over heavy-tailed telemetry.

    Scale shape: pass 1 aggregates exact per-type percentiles (group
    count is the event-type cardinality — tiny), which then BROADCAST
    back onto the fact, so pass 2 is a map-side clamp + one partial-
    aggregated shuffle. At 100 TB the exact percentile pass is the cost
    driver; swap it for approx_percentile partials (same broadcast
    shape) when the per-group row count no longer sorts in memory."""
    events = load_tables(spark, sf_dir)["events"].filter(F.col("value").isNotNull())
    bounds = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    clamped = events.join(F.broadcast(bounds), "event_type").withColumn(
        "w_value", F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    )
    return (
        clamped.groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("p05")).cast("long")).alias("n_clamped_low"),
            F.sum((F.col("value") > F.col("p95")).cast("long")).alias(
                "n_clamped_high"
            ),
            _r4(F.avg("value")).alias("mean_raw"),
            _r4(F.avg("w_value")).alias("mean_winsorized"),
        )
        .select(
            "event_type",
            "n",
            "n_clamped_low",
            "n_clamped_high",
            _r4(F.col("p05")).alias("p05"),
            _r4(F.col("p95")).alias("p95"),
            "mean_raw",
            "mean_winsorized",
        )
        .orderBy("event_type")
    )


@query(
    "events_rollup_cascade",
    """
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
             count(*) AS n, sum(value) AS sv,
             sum(value * value) AS svv, max(value) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n_events, sum_value,
           sum_value / n_events AS avg_value,
           CASE WHEN n_events > 1 THEN
             sqrt((sq_value - sum_value * sum_value / n_events)
                  / (n_events - 1)) END AS std_value,
           max_value
    FROM (
      SELECT event_type, CAST(date_trunc('day', hour) AS TIMESTAMP) AS day,
             CAST(sum(n) AS BIGINT) AS n_events,
             round(sum(sv), 4) AS sum_value,
             round(sum(svv), 4) AS sq_value,
             max(mx) AS max_value
      FROM hourly
      GROUP BY event_type, date_trunc('day', hour)
    )
    ORDER BY event_type, day
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup CASCADE (the hypertable / continuous-
    aggregate pattern): the daily tier is re-aggregated FROM the hourly
    tier's mergeable partials — (n, Σv, Σv², max) — never from the raw
    facts, including avg and sample-std reconstructed from the moment
    sums. This is the oracle-checked proof that the partial set is
    sufficient: at 100 TB the raw scan happens once for the finest
    tier, and every coarser resolution (day/month/year) is a rollup of
    the previous tier's partials — shuffles shrink with each tier.

    Spark side mirrors it literally: the daily agg consumes the hourly
    DataFrame, so the physical plan is two chained partial-aggregated
    shuffles, the second over hour-cardinality rows."""
    events = load_tables(spark, sf_dir)["events"]
    hourly = events.groupBy(
        "event_type", F.window("ts", "1 hour").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
        F.max("value").alias("mx"),
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", F.col("w.start")).alias("day")
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        # avg/std derive from the ROUNDED moment sums (not the raw
        # accumulators): the raw double sums can differ from the
        # oracle's by an ulp of accumulation order, and a derived
        # quotient landing on a .00005 boundary then rounds apart —
        # deriving from the rounded, already-hash-matched sums makes
        # the downstream arithmetic bit-deterministic cross-engine.
        _r4(F.sum("sv")).alias("sum_value"),
        _r4(F.sum("svv")).alias("sq_value"),
        F.max("mx").alias("max_value"),
    )
    n, s, q = F.col("n_events"), F.col("sum_value"), F.col("sq_value")
    return daily.select(
        "event_type",
        "day",
        "n_events",
        "sum_value",
        # UNROUNDED on purpose: both engines derive these from the
        # bit-identical rounded sums, so the IEEE quotient/sqrt are
        # bit-identical too — while round(q, 4) would re-introduce the
        # engines' half-tie semantic gap (decimal-string HALF_UP vs
        # binary round-half-away) exactly at .00005 boundaries, which
        # quotients of 4-decimal sums by small counts hit routinely.
        (s / n).alias("avg_value"),
        F.when(n > 1, F.sqrt((q - s * s / n) / (n - 1))).alias("std_value"),
        "max_value",
    ).orderBy("event_type", "day")


@query(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, count(*) AS n
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY cur, nxt
    )
    SELECT cur AS from_state, nxt AS to_state, n,
           round(n / sum(n) OVER (PARTITION BY cur), 4) AS p
    FROM pairs
    ORDER BY from_state, to_state
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the behavioral-model
    summary behind journey analysis and anomalous-sequence detection.

    Scale shape: ONE fact shuffle (user_id window) feeding a partial-
    aggregated (cur, nxt) rollup whose cardinality is event-type²; the
    row-normalizing window then runs on that tiny matrix. The sequence
    pairing is lead() — no self-join of the fact against itself."""
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    w_norm = Window.partitionBy("cur")
    return (
        pairs.select(
            F.col("cur").alias("from_state"),
            F.col("nxt").alias("to_state"),
            "n",
            _r4(F.col("n") / F.sum("n").over(w_norm)).alias("p"),
        )
        .orderBy("from_state", "to_state")
    )


BOT_RATE = 3  # events per active day at/above which a user is "heavy"
BOT_ENTROPY = 0.75  # normalized type entropy below which heavy = bot-like


@query(
    "events_bot_score",
    f"""
    WITH base AS (
        SELECT user_id, event_type, ts, event_id
        FROM events WHERE user_id IS NOT NULL
    ),
    act AS (
        SELECT user_id, count(*) AS n_events,
               count(DISTINCT date_trunc('day', ts)) AS active_days
        FROM base GROUP BY 1
    ),
    tc AS (
        SELECT user_id, event_type, count(*) AS c
        FROM base GROUP BY 1, 2
    ),
    tt AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS tot, count(*) AS n_types
        FROM tc GROUP BY 1
    ),
    ent AS (
        SELECT tt.user_id,
               CASE WHEN tt.n_types = 1 THEN NULL
                    ELSE round(-sum((CAST(tc.c AS DOUBLE) / CAST(tt.tot AS DOUBLE))
                                    * ln(CAST(tc.c AS DOUBLE) / CAST(tt.tot AS DOUBLE)))
                               / ln(CAST(tt.n_types AS DOUBLE)), 4)
               END AS norm_entropy
        FROM tc JOIN tt ON tt.user_id = tc.user_id
        GROUP BY tt.user_id, tt.n_types, tt.tot
    ),
    seq AS (
        SELECT user_id, epoch_us(ts) AS t,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS pt
        FROM base
    ),
    gap AS (
        SELECT user_id,
               round(CAST(sum(t - pt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     / 1000000.0, 4) AS avg_gap_s
        FROM seq WHERE pt IS NOT NULL GROUP BY 1
    )
    SELECT a.user_id, a.n_events, a.active_days,
           ent.norm_entropy, gap.avg_gap_s,
           CASE WHEN a.n_events >= {BOT_RATE} * a.active_days
                     AND coalesce(ent.norm_entropy, 0.0) <= {BOT_ENTROPY}
                THEN 'bot_like'
                WHEN a.n_events >= {BOT_RATE} * a.active_days THEN 'heavy'
                ELSE 'normal'
           END AS verdict
    FROM act a
    JOIN ent ON ent.user_id = a.user_id
    LEFT JOIN gap ON gap.user_id = a.user_id
    """,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bot-likelihood signals + a bucketed verdict — the
    composite behavioral screen a data-curation pass runs before
    counting a user's events as organic training signal: volume rate
    (events per active day), behavioral diversity (normalized
    event-type entropy), and arrival cadence (mean inter-event gap).

    Determinism: the rate gate compares EXACT integers
    (n_events ≥ {BOT_RATE}·active_days — no float boundary), and the
    entropy gate compares a double both engines derive from the same
    expression tree over exact counts, so the verdict is value-stable
    cross-engine. Entropy is NULL for single-type users (undefined
    normalization) and coalesced to 0 in the gate — monotone behavior
    is "bot-like": ALL activity in one event type. Shape: three
    per-user aggregates off one scan (count/distinct-day, type
    entropy, lag-gap) joined on user_id — every shuffle is
    user-cardinality, and each aggregate is the already-certified
    pattern (``events_user_entropy``, ``events_interarrival_stats``).
    """
    e = load_tables(spark, sf_dir)["events"]
    base = e.where(F.col("user_id").isNotNull()).select(
        "user_id", "event_type", "ts", "event_id"
    )
    act = base.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.date_trunc("day", "ts")).alias("active_days"),
    )
    tc = base.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tt = tc.groupBy("user_id").agg(
        F.sum("c").alias("tot"), F.count("*").alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("tot").cast("double")
    ent = (
        tc.join(tt, "user_id")
        .groupBy("user_id", "n_types", "tot")
        .agg(
            F.when(F.col("n_types") == 1, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    -F.sum(p * F.log(p)) / F.log(F.col("n_types").cast("double")), 4
                )
            )
            .alias("norm_entropy")
        )
        .select("user_id", "norm_entropy")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = base.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.lag(F.unix_micros("ts")).over(w).alias("pt"),
    )
    gap = (
        seq.where(F.col("pt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("t") - F.col("pt")).cast("double")
                / F.count("*").cast("double")
                / 1000000.0,
                4,
            ).alias("avg_gap_s")
        )
    )
    heavy = F.col("n_events") >= BOT_RATE * F.col("active_days")
    return (
        act.join(ent, "user_id")
        .join(gap, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "active_days",
            "norm_entropy",
            "avg_gap_s",
            F.when(
                heavy & (F.coalesce("norm_entropy", F.lit(0.0)) <= BOT_ENTROPY),
                F.lit("bot_like"),
            )
            .when(heavy, F.lit("heavy"))
            .otherwise(F.lit("normal"))
            .alias("verdict"),
        )
    )


@query(
    "events_interpolate_hourly",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    mm AS (
        SELECT event_type, min(h) AS lo, max(h) AS hi
        FROM hourly GROUP BY 1
    ),
    cal AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM mm
    ),
    j AS (
        SELECT cal.event_type, cal.h, hourly.c
        FROM cal LEFT JOIN hourly
          ON hourly.event_type = cal.event_type AND hourly.h = cal.h
    ),
    f AS (
        SELECT event_type, h, c,
               last_value(c IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               first_value(c IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM j
    )
    SELECT event_type, h AS hour, c IS NOT NULL AS observed, c AS cnt,
           round(CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                 ELSE CAST(pv AS DOUBLE)
                      + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                        * date_diff('hour', ph, h)
                        / date_diff('hour', ph, nh) END, 4) AS interp
    FROM f
    """,
)
def events_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-regular hourly series per event type with LINEAR
    interpolation over the gaps — the resampling step between raw
    events and any fixed-step model (forecasters, FFTs, anomaly
    scans). Complements ``events_gap_fill`` (zero-fill) with the
    interpolating flavor.

    Construction: per-type [min, max] hour range expanded with
    ``sequence``/``generate_series`` (calendar rows are derived, never
    stored), left-joined against observed counts, then the classic
    four-window interpolation frame: last/first non-null value and
    hour on each side (``ignoreNulls`` ↔ ``IGNORE NULLS`` — same
    semantics both engines), interp = pv + (nv−pv)·(h−ph)/(nh−ph)
    over exact integer hour distances. Endpoints are observed by
    construction (the range is min..max of OBSERVED hours), so the
    interpolation expression never sees a NULL side. Shape: one scan →
    (type, hour) groupBy → a per-type window over calendar-cardinality
    rows — nothing fact-sized past the first aggregate.
    """
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("long").alias("c"))
    mm = hourly.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    cal = mm.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = cal.join(hourly, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    c = F.col("c")
    obs_h = F.when(c.isNotNull(), F.col("h"))
    f = j.select(
        "event_type",
        "h",
        "c",
        F.last(c, ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first(c, ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("nh"),
    )
    hours = lambda a, b: (  # noqa: E731 — exact integer hour distance
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(3600)
    ).cast("long")
    return f.select(
        "event_type",
        F.col("h").alias("hour"),
        c.isNotNull().alias("observed"),
        c.alias("cnt"),
        F.round(
            F.when(c.isNotNull(), c.cast("double")).otherwise(
                F.col("pv").cast("double")
                + (F.col("nv").cast("double") - F.col("pv").cast("double"))
                * hours(F.col("ph"), F.col("h")).cast("double")
                / hours(F.col("ph"), F.col("nh")).cast("double")
            ),
            4,
        ).alias("interp"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing: recursive state as a higher-order fold
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.3  # level smoothing
HOLT_BETA = 0.1  # trend smoothing
HOLT_H = 7  # forecast horizon (days)


def _holt_oracle() -> str:
    a, b1, h = HOLT_ALPHA, HOLT_BETA, HOLT_H
    lnew = f"CAST({a} AS DOUBLE) * i.x + CAST({1 - a} AS DOUBLE) * (r.l + r.b)"
    return f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    holt AS (
        SELECT event_type, rn, x AS l, CAST(0.0 AS DOUBLE) AS b
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.event_type, i.rn,
               {lnew},
               CAST({b1} AS DOUBLE) * (({lnew}) - r.l)
                 + CAST({1 - b1} AS DOUBLE) * r.b
        FROM holt r JOIN idx i
          ON i.event_type = r.event_type AND i.rn = r.rn + 1
    ),
    last AS (
        SELECT event_type, CAST(max(rn) AS BIGINT) AS n_days
        FROM idx GROUP BY event_type
    )
    SELECT h.event_type, last.n_days,
           round(h.l, 4) AS level,
           round(h.b, 4) AS trend,
           round(h.l + {h} * h.b, 4) AS forecast_{h}d
    FROM holt h JOIN last ON h.event_type = last.event_type
    WHERE h.rn = last.n_days
    """


@query("ts_holt_linear_forecast", _holt_oracle())
def ts_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing of the per-type daily count
    series, plus the h-step linear forecast — the capacity-planning
    baseline one notch above ``events_ewma_smooth`` (which has no
    trend term).

    Recursion: l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}); b_t =
    β(l_t−l_{t−1}) + (1−β)b_{t−1}, initialized l₁=x₁, b₁=0 (stated
    convention — both engines implement exactly this). Spark expresses
    the per-series recursion as a JVM-side higher-order fold:
    sort_array(collect_list(struct(day,x))) per type, then
    ``aggregate()`` threads a (level, trend) struct through the
    sequence — whole-stage-codegen arithmetic, no Python, state is two
    doubles per series. The oracle replays the identical expression
    tree through a recursive CTE, and the inputs are exact integer
    daily counts, so every intermediate double matches bitwise.

    Scale: series cardinality = event types, series length =
    calendar days — both tiny next to the corpus. The one scan
    aggregates to (type, day) with map-side partials; the collected
    array per type is days-long (decades ≈ 10⁴ doubles), safely
    in-executor. A million-series version (per user) shards the same
    plan by series key — the fold is per-group and never shuffles
    data wider than the daily aggregate."""
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(d, x))), s -> s.x)"
        ).alias("xs")
    )
    a, b1 = HOLT_ALPHA, HOLT_BETA
    lnew = (
        f"CAST({a} AS DOUBLE) * x + CAST({1 - a} AS DOUBLE) * (acc.l + acc.b)"
    )
    fold = f"""
    aggregate(
        slice(xs, 2, size(xs) - 1),
        named_struct('l', CAST(element_at(xs, 1) AS DOUBLE),
                     'b', CAST(0.0 AS DOUBLE)),
        (acc, x) -> named_struct(
            'l', {lnew},
            'b', CAST({b1} AS DOUBLE) * (({lnew}) - acc.l)
                   + CAST({1 - b1} AS DOUBLE) * acc.b),
        acc -> acc
    )
    """
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        F.expr(fold).alias("st"),
    ).select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 4).alias("level"),
        F.round(F.col("st.b"), 4).alias("trend"),
        F.round(F.col("st.l") + HOLT_H * F.col("st.b"), 4).alias(
            f"forecast_{HOLT_H}d"
        ),
    )


# ---------------------------------------------------------------------------
# Data-freshness SLO report: per-stream lag vs the newest arrival
# ---------------------------------------------------------------------------

FRESH_SLO_SEC = 1800  # 30-minute freshness objective


@query(
    "ops_data_freshness_slo",
    f"""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch
        FROM events GROUP BY event_type
    ),
    g AS (SELECT max(last_epoch) AS global_epoch FROM m)
    SELECT event_type, n_events,
           CAST(global_epoch - last_epoch AS BIGINT) AS lag_sec,
           (global_epoch - last_epoch) <= {FRESH_SLO_SEC} AS within_slo
    FROM m, g
    """,
)
def ops_data_freshness_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness lag against the newest arrival anywhere in
    the table — the landing-page gauge of every ingestion dashboard
    (a stream whose max(ts) trails the corpus high-water mark has a
    stuck producer or a dead partition; at the reference this is the
    manual check after `jobs/normalize_stream.py` deploys).

    The clock is the DATA's own high-water mark, not wall time, so the
    report is deterministic and oracle-checkable; lags are integer
    epoch-second differences (exact cross-engine). The 30-minute SLO
    flag fires on the synthetic corpus (2 of 5 types breach at
    sf0.01). Shape: one scan, one key-cardinality agg, a scalar
    broadcast of the high-water row — free at 100 TB, and the same
    plan serves a streaming foreachBatch health probe unchanged."""
    e = load_tables(spark, sf_dir)["events"]
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.unix_timestamp(F.max("ts")).cast("long").alias("last_epoch"),
    )
    g = m.agg(F.max("last_epoch").alias("global_epoch"))
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        (F.col("global_epoch") - F.col("last_epoch"))
        .cast("long")
        .alias("lag_sec"),
        (
            (F.col("global_epoch") - F.col("last_epoch")) <= FRESH_SLO_SEC
        ).alias("within_slo"),
    )
