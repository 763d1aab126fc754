"""Maintenance ops: partition-scoped upsert (silver MERGE semantics)
and small-file compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from event_to_lakehouse_spark.pipeline.upsert import latest_per_key, upsert_silver
from event_to_lakehouse_spark.storage.compaction import (
    compact,
    data_file_count,
    plan_output_files,
)


def _silver(spark, rows):
    return spark.createDataFrame(
        rows, ["asset_uid", "source_system", "ingest_ts", "asset_name"]
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))


def test_latest_per_key_deterministic(spark):
    df = _silver(
        spark,
        [
            ("u1", "rapid7", "2024-01-01 00:00:00", "old"),
            ("u1", "rapid7", "2024-01-02 00:00:00", "new"),
            ("u2", "rapid7", "2024-01-01 00:00:00", "only"),
        ],
    )
    out = {r.asset_uid: r.asset_name for r in latest_per_key(df, "asset_uid", "ingest_ts").collect()}
    assert out == {"u1": "new", "u2": "only"}


def test_upsert_scoped_to_touched_partitions(spark, tmp_dir):
    path = f"{tmp_dir}/silver"
    base = _silver(
        spark,
        [
            ("u1", "rapid7", "2024-01-01 00:00:00", "r7-v1"),
            ("u2", "rapid7", "2024-01-01 00:00:00", "r7-keep"),
            ("u3", "fortisiem", "2024-01-01 00:00:00", "fs-keep"),
        ],
    )
    upsert_silver(spark, base, path)  # bootstrap
    forti_files = {
        f for f in os.listdir(f"{path}/source_system=fortisiem") if f.endswith(".parquet")
    }

    updates = _silver(
        spark,
        [
            ("u1", "rapid7", "2024-01-02 00:00:00", "r7-v2"),  # update
            ("u4", "rapid7", "2024-01-02 00:00:00", "r7-new"),  # insert
        ],
    )
    upsert_silver(spark, updates, path)

    back = {r.asset_uid: r.asset_name for r in spark.read.parquet(path).collect()}
    assert back == {
        "u1": "r7-v2",
        "u2": "r7-keep",
        "u3": "fs-keep",
        "u4": "r7-new",
    }
    # untouched partition's files are byte-identical (not rewritten)
    assert {
        f for f in os.listdir(f"{path}/source_system=fortisiem") if f.endswith(".parquet")
    } == forti_files


def test_plan_output_files():
    assert plan_output_files(0, 128) == 1
    assert plan_output_files(129, 128) == 2
    assert plan_output_files(128 * 10, 128) == 10


def test_compact_binpacks_and_preserves_rows(spark, tmp_dir):
    path = f"{tmp_dir}/events_many"
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 50).alias("k"), F.rand(7).alias("v")
    )
    df.repartition(40).write.parquet(path)
    assert data_file_count(path) == 40
    before = df.count()

    n_files = compact(spark, path, target_file_bytes=10 * 1024 * 1024, sort_cols=["k"])
    assert n_files <= 2  # ~100KB of data bin-packs into one 10MB target
    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))
    # no staging leftovers
    assert not os.path.exists(f"{path}__compacting")
    assert not os.path.exists(f"{path}__precompact")
