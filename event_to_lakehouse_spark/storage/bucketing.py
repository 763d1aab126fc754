"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact↔fact join (orders↔lineitem,
events↔events) is shuffling both sides on the join key — every query,
every time. Bucketing moves that shuffle to WRITE time, once: both
tables are hash-clustered into the same number of buckets on the join
key, so Catalyst plans the join with ZERO exchanges (each task reads
bucket i of both sides). Same for groupBy on the bucket key.

This is the file-format-level equivalent of Iceberg's hidden bucket
partitioning (the reference's catalog would provide it via a partition
spec — docker-compose.yml:336-339 configures the catalog but the
reference never declares a spec; SURVEY §4 'no partition spec
configured').

Rules enforced here:
- both sides bucketed on the SAME columns into the SAME bucket count;
- ``sortBy`` within buckets lets sort-merge join skip its sort;
- bucket pruning: equality filters on the bucket column read 1/N files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as an external bucketed table (metadata in the session
    catalog, data at ``path``). The one-time shuffle happens here so
    downstream joins/aggs on ``bucket_cols`` never shuffle again."""
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata attaches to the scan, which is
    what lets Catalyst drop the join-side exchanges."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
