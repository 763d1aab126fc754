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


@query(
    "ops_snapshot_diff",
    """
    WITH base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    v2 AS (
        SELECT o_orderkey,
               cents + CASE WHEN o_orderkey % 5 = 0 THEN 777 ELSE 0 END
                 AS cents
        FROM base WHERE NOT (o_orderkey % 5 <> 0 AND o_orderkey % 11 = 0)
        UNION ALL
        SELECT -o_orderkey, cents + 11
        FROM base WHERE o_orderkey % 13 = 0 AND o_orderkey > 0
    )
    SELECT coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS diff,
           b.cents AS old_cents, n.cents AS new_cents
    FROM base b FULL OUTER JOIN v2 n ON b.o_orderkey = n.o_orderkey
    WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
          OR b.cents <> n.cents
    ORDER BY o_orderkey
    """,
)
def ops_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic TIME-TRAVEL diff between two snapshot versions — the
    state-vs-state complement of ``change_feed`` (which needs recorded
    sidecars; the diff works between ANY two retained versions,
    including across commits that never recorded a feed): commit a
    base version, then one CDC commit that upserts the %5 keys
    (cents+777), deletes the %5-coprime %11 keys, and inserts fresh
    negative keys; full-outer-join ``read(v1)`` against ``read(v2)``
    on the key and classify added / removed / changed (unchanged rows
    are excluded — the diff is change-sized, not table-sized, in its
    output). The oracle reconstructs v2 relationally, so both the
    time-travel reads and the diff classification are hash-checked.

    Scale shape: one join of two manifest-resolved scans, equi on the
    stats key — at 100 TB, zone maps align both sides' file ranges and
    the unchanged-row filter collapses output to the churn size."""
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="snap_diff_"), stats_col="o_orderkey"
    )
    v1 = t.append(orders).version
    k = F.col("o_orderkey")
    changes = (
        orders.filter(k % 5 == 0)
        .withColumn("cents", F.col("cents") + 777)
        .withColumn("_op", F.lit("U"))
        .unionByName(
            orders.filter((k % 5 != 0) & (k % 11 == 0)).withColumn(
                "_op", F.lit("D")
            )
        )
        .unionByName(
            # k > 0: key 0 would negate onto itself and collide with
            # its own upsert (the testdata's orderkeys start at 0)
            orders.filter((k % 13 == 0) & (k > 0)).select(
                (-k).alias("o_orderkey"),
                (F.col("cents") + 11).alias("cents"),
                F.lit("I").alias("_op"),
            )
        )
    )
    v2 = t.apply_changes(
        changes, key="o_orderkey", order_col="cents"
    ).version
    old = t.read(version=v1).select(
        F.col("o_orderkey").alias("b_key"), F.col("cents").alias("old_cents")
    )
    new = t.read(version=v2).select(
        F.col("o_orderkey").alias("n_key"), F.col("cents").alias("new_cents")
    )
    j = old.join(new, old.b_key == new.n_key, "full_outer")
    return (
        j.filter(
            F.col("b_key").isNull()
            | F.col("n_key").isNull()
            | (F.col("old_cents") != F.col("new_cents"))
        )
        .select(
            F.coalesce("b_key", "n_key").alias("o_orderkey"),
            F.when(F.col("b_key").isNull(), "added")
            .when(F.col("n_key").isNull(), "removed")
            .otherwise("changed")
            .alias("diff"),
            "old_cents",
            "new_cents",
        )
        .orderBy("o_orderkey")
    )
