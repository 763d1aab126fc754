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
a single asset_uid-partitioned shuffle reused by the window and the
rollup; marts are tiny relative to silver and are rewritten atomically
(overwrite), which makes refresh idempotent under replays — the same
gap the reference's blind-append writer leaves open for silver
(SURVEY §7.4). Refresh via ``Trigger.AvailableNow`` on a schedule; a
continuously-updated gold would instead stream silver with update-mode
aggregations, which no mart here needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .upsert import latest_per_key

__all__ = [
    "current_assets",
    "asset_posture",
    "riskiest_assets",
    "refresh_gold",
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
    """Batch gold refresh: read silver parquet, rebuild every mart under
    ``gold_root`` with atomic overwrite. Returns mart name → path."""
    silver = spark.read.parquet(silver_path)
    cur = current_assets(silver)
    marts = {
        "current_assets": cur,
        "asset_posture": asset_posture(cur),
        "riskiest_assets": riskiest_assets(cur, top_n=top_n),
    }
    out: dict[str, str] = {}
    for name, df in marts.items():
        path = f"{gold_root}/{name}"
        df.write.mode("overwrite").parquet(path)
        out[name] = path
    return out
