"""Key-based upsert (merge) into the silver table.

The reference only ever appends (`bronze_assets_to_silver_assets.py:277`)
— re-ingested assets pile up as duplicate rows, deferring dedup to
readers. This operator gives silver MERGE semantics on plain parquet:
latest row per business key wins (SCD type 1), without a table format.

Scale design: a naive merge rewrites the whole table per batch. Here
the rewrite is scoped to the *partitions touched by the update batch*
(dynamic partition overwrite — the parquet-level analog of Iceberg/
Delta MERGE file pruning):

1. affected = distinct partition values in the updates (driver-side:
   only K partition names, never data);
2. read ONLY those partitions of the target (partition pruning),
   union with the updates;
3. keep the latest row per key (`row_number` over ``order_col`` desc);
4. overwrite — with ``partitionOverwriteMode=dynamic`` Spark replaces
   exactly the affected partition directories, leaving the rest of the
   table untouched bytes.

On Iceberg/Delta, swap steps 2-4 for ``MERGE INTO`` and get snapshot
isolation too; the dataflow (prune → combine → latest-wins) is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key: str, order_col: str, tiebreak: str | None = None
) -> DataFrame:
    """Latest-wins survivor per key; deterministic under ``order_col``
    ties via ``tiebreak`` (falls back to the key itself)."""
    order = [F.col(order_col).desc(), F.col(tiebreak or key).desc()]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_silver(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: str = "asset_uid",
    order_col: str = "ingest_ts",
    partition_col: str = "source_system",
) -> None:
    """Merge ``updates`` into the partitioned silver table at ``path``."""
    try:
        target = spark.read.parquet(path)
        exists = True
    except Exception:
        exists = False

    if not exists:
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return

    # K partition names only — not data — cross the driver.
    affected = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    scoped = target.filter(F.col(partition_col).isin(affected))
    merged = latest_per_key(
        scoped.unionByName(updates), key, order_col
    )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
