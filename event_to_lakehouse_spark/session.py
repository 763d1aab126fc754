"""SparkSession factory tuned for the local[32] harness but written for
cluster scale: every setting here is also what you would deploy with on a
1000-executor cluster (AQE, skew handling, Arrow), except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "configure_runtime"]

# Runtime (SET-able) confs applied to any session we are handed, including
# the driver's own session in __spark_entry__.queries() callables. These are
# all dynamic confs — safe to set after session start.
_RUNTIME_CONFS = {
    # Oracle parity: both engines pinned to UTC (SURVEY.md §7.4).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-plan, skew-join splitting, partition coalescing.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # r15 (guide §6 small files / §2.2): let AQE re-plan CACHED frames
    # too. The durable-index builders persist their batch frames before
    # committing them (minhash signatures, band rows, PQ codes …); with
    # this off — the upstream default, kept for consumers that depend
    # on a cached plan's exact output partitioning — every persisted
    # frame materializes at the raw spark.sql.shuffle.partitions width
    # and each SnapshotTable append wrote that many near-empty parquet
    # files (measured: 256 → 4 files and 19.5 → 11.1 s warm on the
    # admission pipeline at sf0.1). Scale-neutral: AQE sizes partitions
    # from runtime statistics on any cluster; results are unchanged.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # local[32] sizing; on a real cluster this would be ~2-3x total cores.
    "spark.sql.shuffle.partitions": "64",
    # The testdata events table stores TIMESTAMP(NANOS), which Spark's
    # parquet reader rejects; read as long and convert in load_tables
    # (ns div 1000 → timestamp_micros, matching DuckDB's ns→µs cast).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — how the driver
    # now writes events.ts — would otherwise be inferred as
    # TIMESTAMP_NTZ, which Spark 4 refuses to cast to epoch numerics.
    # Read it as the session-tz TimestampType instead: with the UTC pin
    # above, the wall-clock value IS the UTC instant, which is exactly
    # how DuckDB's epoch() treats a naive timestamp — oracle parity.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be static in some deployments; keep going
    return spark


def get_spark(app_name: str = "event-to-lakehouse-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure_runtime(builder.getOrCreate())
