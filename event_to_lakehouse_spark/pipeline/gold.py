"""Silver → gold marts (the reference's declared-but-unbuilt layer).

The reference's README promises "Bronze → Silver (→ Gold)"
(``README.md:25``) but ships no gold code; this module supplies the
layer as idiomatic Spark over the 32-column silver assets contract
(``contracts.SILVER_ASSETS_CONTRACT``):

- ``current_assets`` — latest-wins state per ``asset_uid`` (the
  deferred cross-source join the reference provisions key columns for,
  ``bronze_assets_to_silver_assets.py:139-149,244-255``).
- ``asset_posture`` — dimensional rollup per (source_system,
  os_family): fleet counts, governance ratios, risk and vuln totals.
- ``riskiest_assets`` — per-source top-N by risk score (window rank
  over the *deduplicated* current state, so re-ingested assets don't
  appear twice).

Scale posture: every mart derives from one ``current_assets`` pass —
``refresh_gold`` materializes it and the derived marts read it back,
so silver is scanned once; marts are tiny relative to silver and are
published stage-then-rename (readers see old or new, never partial;
see ``refresh_gold`` for the object-store caveat), which makes refresh
idempotent under replays — the same gap the reference's blind-append
writer leaves open for silver (SURVEY §7.4). Refresh via
``Trigger.AvailableNow`` on a schedule; a
continuously-updated gold would instead stream silver with update-mode
aggregations, which no mart here needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.relational import _r4, query
from ..tables import load_tables
from .upsert import latest_per_key

__all__ = [
    "current_assets",
    "asset_posture",
    "riskiest_assets",
    "refresh_gold",
    "refresh_current_assets_incremental",
    "start_gold_refresh_stream",
]


def current_assets(silver: DataFrame) -> DataFrame:
    """Latest-wins asset state: one row per ``asset_uid`` by newest
    ``ingest_ts`` (deterministic tiebreak on source_system)."""
    return latest_per_key(
        silver, key="asset_uid", order_col="ingest_ts", tiebreak="source_system"
    )


def asset_posture(current: DataFrame) -> DataFrame:
    """Fleet posture rollup per (source_system, os_family)."""
    return (
        current.groupBy("source_system", F.coalesce("os_family", F.lit("unknown")).alias("os_family"))
        .agg(
            F.count(F.lit(1)).alias("asset_count"),
            F.sum(F.when(F.col("approved"), 1).otherwise(0)).alias("approved_count"),
            F.sum(F.when(F.col("unmanaged"), 1).otherwise(0)).alias("unmanaged_count"),
            F.round(F.avg("risk_score"), 4).alias("avg_risk_score"),
            F.max("risk_score").alias("max_risk_score"),
            F.sum(F.coalesce("vuln_total", F.lit(0))).alias("vuln_total"),
            F.sum(F.coalesce("vuln_critical", F.lit(0))).alias("vuln_critical"),
            F.sum(F.coalesce("vuln_exploits", F.lit(0))).alias("vuln_exploits"),
        )
    )


def riskiest_assets(current: DataFrame, top_n: int = 10) -> DataFrame:
    """Per-source top-N assets by risk score (vuln_total, asset_uid
    tiebreaks keep the ranking deterministic)."""
    w = Window.partitionBy("source_system").orderBy(
        F.col("risk_score").desc_nulls_last(),
        F.col("vuln_total").desc_nulls_last(),
        "asset_uid",
    )
    return (
        current.withColumn("risk_rank", F.row_number().over(w))
        .filter(F.col("risk_rank") <= top_n)
        .select(
            "source_system",
            F.col("risk_rank").cast("int").alias("risk_rank"),
            "asset_uid",
            "asset_name",
            "primary_ip",
            "os_family",
            "risk_score",
            "vuln_total",
            "vuln_critical",
        )
    )


def refresh_gold(
    spark: SparkSession, silver_path: str, gold_root: str, top_n: int = 10
) -> dict[str, str]:
    """Batch gold refresh. Silver is scanned ONCE: ``current_assets``
    is materialized first and the derived marts read it back, instead
    of re-deriving the latest-wins subtree three times.

    Publish is write-then-repoint: each mart writes to a fresh
    versioned directory and the stable mart path is a SYMLINK swapped
    with one atomic ``os.replace`` — readers resolving the mart path
    always land on a complete directory (old or new, never missing or
    partial), and a mid-refresh failure leaves the previous mart
    published. (Atomic on posix local filesystems; on HDFS use the
    rename-based variant, on object stores a table format with
    snapshot commits — see ``storage.snapshots`` — since parquet
    ``mode=overwrite`` alone is delete-then-write with an empty
    window.) Returns mart name → path."""
    import os
    import shutil
    import uuid
    from pathlib import Path

    root = Path(gold_root)
    root.mkdir(parents=True, exist_ok=True)

    def publish(df, name: str) -> str:
        final = root / name
        tag = uuid.uuid4().hex[:8]
        versioned = root / f"_{name}_{tag}"
        df.write.mode("overwrite").parquet(str(versioned))
        old_target = os.readlink(final) if final.is_symlink() else None
        if final.exists() and not final.is_symlink():
            # one-time migration from a plain-directory mart
            final.rename(root / f"_migrated_{name}_{tag}")
        link_tmp = root / f"_link_{name}_{tag}"
        os.symlink(versioned.name, link_tmp)  # relative target
        os.replace(link_tmp, final)  # atomic repoint
        # Deferred retention: a reader that resolved the symlink just
        # before the swap (or a Spark job mid-scan during streaming
        # refresh) may still be reading the OLD version, so it is never
        # deleted synchronously. Keep {current, previous}; sweep only
        # versions unreferenced since before the last refresh — a full
        # refresh cycle of grace.
        keep = {versioned.name, old_target} - {None}
        for stale in root.glob(f"_{name}_*"):
            if stale.is_dir() and stale.name not in keep:
                shutil.rmtree(stale, ignore_errors=True)
        return str(final)

    silver = spark.read.parquet(silver_path)
    out = {"current_assets": publish(current_assets(silver), "current_assets")}
    cur = spark.read.parquet(out["current_assets"])  # the one silver pass
    out["asset_posture"] = publish(asset_posture(cur), "asset_posture")
    out["riskiest_assets"] = publish(riskiest_assets(cur, top_n=top_n), "riskiest_assets")
    return out


def refresh_current_assets_incremental(silver_table, gold_table):
    """Incrementally maintain the ``current_assets`` mart between two
    snapshot-versioned tables: fold ONLY silver's rows appended since
    the last refresh into the mart — the 100 TB answer to
    ``refresh_gold``'s full silver re-scan (fine for small marts,
    ruinous when silver is the lakehouse).

    Mechanics: the mart is itself a ``SnapshotTable`` whose batch-token
    chain carries a watermark token ``silver:v{N}`` per refresh.

    1. resolve the highest silver version already folded in (max over
       watermark tokens — replays and crash-restarts are no-ops);
    2. ``silver_table.changes(last, cur)`` = the appended delta
       (manifest diff, no data read for the resolution);
    3. pre-collapse the delta to latest-per-key, then COW ``merge``
       into the mart (latest ``ingest_ts`` wins across old state and
       delta — associative, so folding increments equals the full
       rebuild) with the new watermark token in the same atomic commit
       — state update + progress marker can't diverge;
    4. a rewrite commit in silver's range (COW merge/delete/compaction
       re-emits rows ``changes`` can't classify) falls back to one
       full rebuild via ``overwrite``, same watermark semantics.

    Returns the mart's new snapshot."""
    cur_v = silver_table._latest_version()
    gold_snap = gold_table.snapshot()
    done = [
        int(tok.rsplit(":v", 1)[1])
        for tok in (gold_snap.batch_tokens if gold_snap else [])
        if tok.startswith("silver:v")
    ]
    last = max(done, default=0)
    if cur_v <= last:
        return gold_snap  # nothing new (or a replay) — no-op
    token = f"silver:v{cur_v}"
    try:
        delta = silver_table.changes(last, cur_v)
        full = False
    except ValueError:  # rewrite commit in range → rebuild once
        delta, full = silver_table.read(cur_v), True
    mart_delta = current_assets(delta)
    if full or gold_snap is None:
        return gold_table.overwrite(mart_delta, batch_token=token)
    return gold_table.merge(
        mart_delta,
        key="asset_uid",
        order_col="ingest_ts",
        tiebreak="source_system",
        batch_token=token,
    )


def start_gold_refresh_stream(
    spark: SparkSession,
    silver_path: str,
    gold_root: str,
    checkpoint: str,
    top_n: int = 10,
    trigger: dict | None = None,
):
    """Continuously-refreshed gold: watch the silver table as a file
    stream and rebuild the marts whenever new silver files land.

    The micro-batch content is only the CHANGE SIGNAL — marts are
    latest-wins over ALL of silver, so each refresh re-reads the full
    table via ``refresh_gold`` (stage-then-rename publish, so readers
    never see a partial mart). This is the standard
    incremental-trigger / full-rebuild pattern for small marts; a mart
    too large to rebuild would instead stream with update-mode
    aggregations. ``availableNow`` default drains pending files and
    stops — the scheduled-refresh mode the module docstring describes."""
    trigger = trigger or {"availableNow": True}
    silver_schema = spark.read.parquet(silver_path).schema
    signal = spark.readStream.schema(silver_schema).parquet(silver_path)

    def _refresh(batch_df, batch_id: int) -> None:
        refresh_gold(spark, silver_path, gold_root, top_n=top_n)

    return (
        signal.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .foreachBatch(_refresh)
        .start()
    )


@query(
    "gold_current_assets",
    """
    WITH cur AS (
        SELECT user_id, event_id, event_type, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id AS asset_uid, event_id AS last_event_id,
           event_type AS source_system, round(value, 4) AS risk_score,
           ts AS ingest_ts
    FROM cur WHERE rn = 1
    """,
)
def gold_current_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pipeline.gold.current_assets`` semantics on the events table:
    latest-wins state per asset key (``latest_per_key`` — the same
    operator ``current_assets`` wraps, with an explicit per-event
    tiebreak because an event log can carry same-timestamp rows).
    One key-partitioned window, no driver-side state."""
    t = load_tables(spark, sf_dir)
    obs = t["events"].select(
        F.col("user_id").alias("asset_uid"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("ts").alias("ingest_ts"),
    )
    cur = latest_per_key(obs, key="asset_uid", order_col="ingest_ts", tiebreak="event_id")
    return cur.select(
        "asset_uid",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("source_system"),
        _r4(F.col("value")).alias("risk_score"),
        "ingest_ts",
    )


@query(
    "gold_asset_posture",
    """
    WITH cur AS (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    mapped AS (
        SELECT event_type AS source_system,
               CASE WHEN user_id % 3 = 0 THEN 'linux'
                    WHEN user_id % 3 = 1 THEN 'windows'
                    ELSE NULL END AS os_family,
               value > 50      AS approved,
               value IS NULL   AS unmanaged,
               value           AS risk_score,
               event_id % 5    AS vuln_total,
               event_id % 2    AS vuln_critical,
               CASE WHEN user_id % 7 = 0 THEN NULL
                    ELSE event_id % 3 END AS vuln_exploits
        FROM cur WHERE rn = 1
    )
    SELECT source_system, coalesce(os_family, 'unknown') AS os_family,
           count(*) AS asset_count,
           CAST(sum(CASE WHEN approved THEN 1 ELSE 0 END) AS BIGINT)
               AS approved_count,
           CAST(sum(CASE WHEN unmanaged THEN 1 ELSE 0 END) AS BIGINT)
               AS unmanaged_count,
           round(avg(risk_score), 4) AS avg_risk_score,
           max(risk_score) AS max_risk_score,
           CAST(sum(coalesce(vuln_total, 0)) AS BIGINT)    AS vuln_total,
           CAST(sum(coalesce(vuln_critical, 0)) AS BIGINT) AS vuln_critical,
           CAST(sum(coalesce(vuln_exploits, 0)) AS BIGINT) AS vuln_exploits
    FROM mapped GROUP BY 1, 2
    """,
)
def gold_asset_posture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pipeline.gold.asset_posture`` (the real mart function) over a
    posture-shaped mapping of the latest-wins event state — fleet
    counts, governance ratios, risk aggregates per (source_system,
    os_family), including the NULL-os 'unknown' branch and NULL-vuln
    coalesce paths."""
    t = load_tables(spark, sf_dir)
    obs = t["events"].select(
        F.col("user_id").alias("asset_uid"),
        "event_id",
        "event_type",
        "value",
        F.col("ts").alias("ingest_ts"),
    )
    cur = latest_per_key(obs, key="asset_uid", order_col="ingest_ts", tiebreak="event_id")
    mapped = cur.select(
        F.col("event_type").alias("source_system"),
        F.when(F.col("asset_uid") % 3 == 0, "linux")
        .when(F.col("asset_uid") % 3 == 1, "windows")
        .otherwise(F.lit(None).cast("string"))
        .alias("os_family"),
        (F.col("value") > 50).alias("approved"),
        F.col("value").isNull().alias("unmanaged"),
        F.col("value").alias("risk_score"),
        (F.col("event_id") % 5).alias("vuln_total"),
        (F.col("event_id") % 2).alias("vuln_critical"),
        F.when(F.col("asset_uid") % 7 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("event_id") % 3)
        .alias("vuln_exploits"),
    )
    return asset_posture(mapped)


# ---------------------------------------------------------------------------
# The driver-facing catalog: ≤50 names, previously-unverified-first order
# (hedges a time-capped driver; a count-capped driver fits either way).
# ---------------------------------------------------------------------------


@query(
    "gold_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id AS asset_uid, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT asset_uid, state, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT asset_uid, state, valid_from,
           lead(valid_from) OVER (PARTITION BY asset_uid
                                  ORDER BY valid_from, event_id) AS valid_to,
           lead(valid_from) OVER (PARTITION BY asset_uid
                                  ORDER BY valid_from, event_id) IS NULL
             AS is_current,
           CAST(row_number() OVER (PARTITION BY asset_uid
                                   ORDER BY valid_from, event_id) AS INTEGER)
             AS version
    FROM changes
    ORDER BY asset_uid, version
    """,
)
def gold_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history built from the event
    log: consecutive same-state observations collapse, each state
    CHANGE opens a version row with [valid_from, valid_to) effectivity
    and an is_current flag on the open tail. This is the history twin
    of ``gold_current_assets`` (latest-wins state) — the reference's
    silver layer only keeps current state (bronze_assets_to_silver_
    assets.py latest-wins upsert); a lakehouse gold layer needs the
    as-was view for point-in-time joins and audit.

    Scale shape: ONE hash shuffle on the dimension key: both windows
    share the (user_id, ts, event_id) partitioning+sort, so the lead/
    row_number Window rides the lag Window's exchange. The key/time
    columns keep their ORIGINAL names until the final projection —
    renaming them between the windows breaks Catalyst's alias-aware
    partitioning propagation and costs a second full shuffle (measured:
    2 hash exchanges with the mid-pipeline rename, 1 without). Output
    size is change-count, not event-count."""
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    changes = ordered.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    ).select("user_id", "state", "ts", "event_id")
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versioned = changes.select(
        F.col("user_id").alias("asset_uid"),
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
    return versioned.orderBy("asset_uid", "version")


# --- incremental SCD2 maintenance ------------------------------------------
#
# ``gold_scd2_history`` recomputes the full dimension from all events;
# at 100 TB the operating mode is INCREMENTAL: each micro-batch closes
# the affected open versions and appends new ones, touching only the
# keys present in the batch. Storage rides SnapshotTable.merge (COW,
# exactly-once batch tokens): each history row carries a surrogate
# ``hist_key`` = (asset_uid, version) and a ``closed`` ordinal, so
# "close the open row" is a latest-wins merge where the closed copy
# (closed=1) beats the stored open copy (closed=0) — no row-level
# UPDATE primitive needed.

_SCD2_COLS = [
    "asset_uid", "state", "valid_from", "valid_to", "is_current", "version",
]


def _scd2_finish(versions: DataFrame) -> DataFrame:
    """Stamp the storage columns (hist_key surrogate + closed ordinal)
    onto computed version rows."""
    return versions.select(
        *_SCD2_COLS,
        F.concat_ws(":", F.col("asset_uid"), F.col("version")).alias("hist_key"),
        (~F.col("is_current")).cast("int").alias("closed"),
    )


def scd2_apply_batch(
    table,
    batch: DataFrame,
    batch_token: str | None = None,
    keep_tokens: bool | int = True,
) -> dict:
    """Apply one event batch (asset_uid, state, ts, event_id) to the
    SCD2 history held in ``table`` (a SnapshotTable).

    Batches must be time-ordered per key: an event older than its key's
    open-version ``valid_from`` is LATE — counted, dropped, reported
    (rewriting closed history needs a backfill recompute, not a merge).
    Within that contract the result equals ``gold_scd2_history`` over
    the union of all applied batches (pytest-pinned).

    Scale shape: the open-row lookup is a key-co-partitioned join
    against an is_current filter (on Iceberg/Delta this is the
    current-partition scan); change detection is the same one-shuffle
    lag/lead/row_number stack as the full recompute, but over
    |batch| + |touched keys| rows only; the merge rewrites only files
    whose stats overlap the touched hist_keys. Cost tracks batch size,
    not history size."""
    events = batch.select(
        "asset_uid", "state", "ts", F.col("event_id").cast("long").alias("event_id")
    )
    snap = table.snapshot()
    if snap is None:
        open_info = None
    else:
        keys = events.select("asset_uid").distinct()
        open_info = (
            table.read()
            .filter(F.col("is_current"))
            .join(keys, "asset_uid")
            .select(
                "asset_uid",
                F.col("state").alias("_open_state"),
                F.col("valid_from").alias("_vf"),
                F.col("version").alias("_base_version"),
            )
        )

    if open_info is not None:
        joined = events.join(open_info, "asset_uid", "left")
        late = joined.filter(
            F.col("_vf").isNotNull() & (F.col("ts") < F.col("_vf"))
        )
        n_late = late.count()
        ok = joined.filter(F.col("_vf").isNull() | (F.col("ts") >= F.col("_vf")))
        # seed: the open version as a pseudo-event ordered BEFORE any
        # batch event at the same timestamp (event_id -1)
        seed = open_info.select(
            "asset_uid",
            F.col("_open_state").alias("state"),
            F.col("_vf").alias("ts"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(1).alias("_is_seed"),
            "_base_version",
        )
        stream = ok.select(
            "asset_uid", "state", "ts", "event_id",
            F.lit(0).alias("_is_seed"), "_base_version",
        ).unionByName(seed)
    else:
        n_late = 0
        stream = events.select(
            "asset_uid", "state", "ts", "event_id",
            F.lit(0).alias("_is_seed"),
            F.lit(None).cast("int").alias("_base_version"),
        )

    w = Window.partitionBy("asset_uid").orderBy("ts", "event_id")
    flagged = stream.select(
        "asset_uid", "state", "ts", "event_id", "_is_seed", "_base_version",
        F.lag("state").over(w).alias("_prev"),
    )
    # `ts` keeps its name through the second window — renaming it here
    # would break alias-aware partitioning propagation and re-shuffle
    # (see gold_scd2_history's scale note).
    changes = flagged.filter(
        (F.col("_is_seed") == 0)
        & (F.col("_prev").isNull() | (F.col("_prev") != F.col("state")))
    ).select("asset_uid", "state", "ts", "event_id", "_base_version")
    w2 = Window.partitionBy("asset_uid").orderBy("ts", "event_id")
    new_versions = changes.select(
        "asset_uid",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        (
            F.coalesce(F.col("_base_version"), F.lit(0))
            + F.row_number().over(w2)
        ).cast("int").alias("version"),
    )

    updates = _scd2_finish(new_versions)
    if open_info is not None:
        # close the formerly-open row of every key the batch changed
        first_change = changes.groupBy("asset_uid").agg(
            F.min("ts").alias("_close_ts")
        )
        closures = open_info.join(first_change, "asset_uid").select(
            "asset_uid",
            F.col("_open_state").alias("state"),
            F.col("_vf").alias("valid_from"),
            F.col("_close_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
            F.col("_base_version").alias("version"),
        )
        updates = updates.unionByName(_scd2_finish(closures))

    n_new = updates.filter(F.col("is_current")).count()
    snap = table.merge(
        updates,
        key="hist_key",
        order_col="closed",
        batch_token=batch_token,
        keep_tokens=keep_tokens,
    )
    return {"snapshot": snap, "n_late_dropped": n_late, "n_open_after": n_new}


@query(
    "join_point_in_time_scd2",
    """
    WITH hist AS (
      SELECT user_id AS asset_uid, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT asset_uid, state, ts AS valid_from, event_id
      FROM hist WHERE prev_state IS NULL OR prev_state <> state
    ),
    scd2 AS (
      SELECT asset_uid, state, valid_from,
             lead(valid_from) OVER (PARTITION BY asset_uid
                                    ORDER BY valid_from, event_id)
               AS valid_to
      FROM changes
    ),
    probes AS (
      SELECT event_id, user_id, ts, round(value, 4) AS value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.value,
           s.state AS state_at_purchase,
           s.valid_from
    FROM probes p JOIN scd2 s
      ON p.user_id = s.asset_uid
     AND p.ts >= s.valid_from
     AND (s.valid_to IS NULL OR p.ts < s.valid_to)
    ORDER BY p.event_id
    """,
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each probe row is enriched with
    the SCD2 version whose [valid_from, valid_to) effectivity interval
    contains the probe's event time — the as-was lookup that makes the
    history dimension useful (training-data labeling without leakage,
    audit reconstruction). Each probe matches EXACTLY one version
    (intervals partition the key's timeline from its first
    observation, and probes are drawn from the same event log, so
    none precede it).

    Scale shape: equi-join on the dimension key with the interval
    predicate as a residual filter — co-partitioned fact-fact join,
    NOT an interval cross-product: rows pair only within a key, and a
    key's version count is small by construction (change-count). The
    SCD2 side here is derived inline (registry queries are
    self-contained); production points this at the maintained
    SnapshotTable (scd2_apply_batch), where file skipping on hist_key
    prunes the dimension scan."""
    events = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    changes = hist.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    ).select("user_id", "state", "ts", "event_id")
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd2 = changes.select(
        F.col("user_id").alias("asset_uid"),
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    probes = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), _r4("value").alias("value")
    )
    joined = probes.join(
        scd2,
        (probes["user_id"] == scd2["asset_uid"])
        & (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to"))),
    )
    return joined.select(
        "event_id",
        "user_id",
        "value",
        F.col("state").alias("state_at_purchase"),
        "valid_from",
    ).orderBy("event_id")
