"""Oracle certification of the CHANGE DATA FEED under out-of-order
CDC — the queryable face of ``SnapshotTable.apply_changes(
changelog=True)`` / ``change_feed`` (``snapshots.py``).

ADVICE r10 (high) found the feed was derived from batch INTENT: a
stale upsert — the base row is newer by ``order_col``, latest-wins
keeps the base — emitted a ``'-'`` for the surviving pre-image and a
``'+'`` for the never-applied change, silently diverging every feed
consumer from the fact table. The fix derives the feed from the
APPLIED outcome; this entry locks that contract behind the DuckDB
oracle by replaying a batch that MIXES winning upserts, losing (stale)
upserts, and deletes, then hash-checking the recorded feed against the
feed a correct CDC engine must emit:

- winning upsert → ``'-'`` old row and ``'+'`` new row,
- stale upsert  → NOTHING (no effect was applied),
- delete        → ``'-'`` old row only.

Reference parity: the reference sink is blind-append
(``bronze_assets_to_silver_assets.py:275-277``) — no delete or update
path exists there at all; this is the Delta CHANGE DATA FEED /
Iceberg changelog-scan shape the ABSENT-fill storage tier supplies.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import query
from ..tables import load_tables
from .snapshots import SnapshotTable

__all__ = ["storage_cdc_changelog"]


@query(
    "storage_cdc_changelog",
    """
    WITH base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, cents AS old_cents,
               CASE WHEN o_orderkey % 2 = 0 THEN cents + 501
                    ELSE cents - 501 END AS new_cents
        FROM base WHERE o_orderkey % 3 = 0
    ),
    feed AS (
        SELECT o_orderkey, new_cents AS cents, '+' AS chg
        FROM upd WHERE new_cents > old_cents
        UNION ALL
        SELECT o_orderkey, old_cents, '-'
        FROM upd WHERE new_cents > old_cents
        UNION ALL
        SELECT o_orderkey, cents, '-'
        FROM base WHERE o_orderkey % 3 <> 0 AND o_orderkey % 7 = 0
    )
    SELECT o_orderkey, cents, chg FROM feed
    ORDER BY o_orderkey, chg
    """,
)
def storage_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply one CDC batch that mixes WINNING upserts (even keys:
    cents+501, newer than base), STALE upserts (odd keys: cents−501,
    older than base — latest-wins must keep the base row and the feed
    must stay SILENT), and deletes; return the recorded change feed.
    The oracle constructs the applied-effect feed independently, so a
    regression to intent-derived feeds (or any drift in latest-wins)
    hash-mismatches.

    Scale shape: the merge itself is the manifest-pruned
    ``apply_changes`` COW path; the feed is changed-keys-sized and the
    sidecar read is one parquet scan of exactly that."""
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = SnapshotTable(
        spark,
        tempfile.mkdtemp(prefix="cdc_feed_"),
        stats_col="o_orderkey",
    )
    t.append(orders)
    v1 = t.snapshot().version
    k = F.col("o_orderkey")
    upd = orders.withColumn(
        "cents",
        F.when(k % 2 == 0, F.col("cents") + 501).otherwise(
            F.col("cents") - 501
        ),
    ).filter(k % 3 == 0).withColumn("_op", F.lit("U"))
    dels = orders.filter((k % 3 != 0) & (k % 7 == 0)).withColumn(
        "_op", F.lit("D")
    )
    t.apply_changes(
        upd.unionByName(dels),
        key="o_orderkey",
        order_col="cents",
        changelog=True,
    )
    return (
        t.change_feed(v1)
        .select("o_orderkey", "cents", F.col("_change").alias("chg"))
        .orderBy("o_orderkey", "chg")
    )
