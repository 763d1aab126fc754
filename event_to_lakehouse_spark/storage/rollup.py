"""Incremental aggregate-view maintenance over a snapshot table.

``pipeline.gold.refresh_current_assets_incremental`` maintains a
LATEST-WINS mart by COW-merging deltas; this module maintains the other
canonical materialized-view class — GROUP-BY AGGREGATES — by folding
each refresh's appended delta into stored mergeable partials:

    refresh cost = O(delta) + O(view),   never O(fact)

The stored state is (keys, n_rows, sum_<c>…): count and sum are
self-maintainable under inserts (fold = add), and every derived measure
(mean, rate, share) is a projection over them at read time — the same
partials-first discipline as ``events_rollup_cascade`` and the
streaming ``*_partials_stream`` jobs, here bound to a
:class:`~.snapshots.SnapshotTable` changelog instead of a stream.

Progress tracking reuses the gold-mart watermark-token pattern: each
refresh commits the folded view WITH a ``fact:v{N}`` batch token in the
same atomic manifest write, so state and progress can't diverge, crash
replays are no-ops, and concurrent duplicate refreshes collapse. A
rewrite commit in the fact's range (COW merge/delete/compaction —
``changes()`` can't classify its re-emitted rows as inserts) falls back
to ONE full rebuild, exactly like the gold path.

At 100 TB: the fact table is the lakehouse; the view is group-keys
sized. Each refresh shuffles only the delta (map-side partials into
view-sized groups) plus a view-sized union-fold, then rewrites the
view — the full-fact groupBy happens once at bootstrap, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .snapshots import SnapshotTable

__all__ = ["RollupView"]


class RollupView:
    """A maintained ``fact.groupBy(keys).agg(count, sum(measures))``.

    ``read()`` returns the view plus derived ``avg_<c>`` columns;
    ``refresh(fact)`` folds everything appended to ``fact`` since the
    last refresh. Equivalence with a full recompute after any append
    sequence — including refreshes spanning several fact commits — is
    pytest-pinned.
    """

    def __init__(
        self,
        spark,
        root: str,
        keys: list[str],
        sums: list[str],
    ):
        self.spark = spark
        self.keys = list(keys)
        self.sums = list(sums)
        self.table = SnapshotTable(spark, root)

    # -- aggregation shapes --------------------------------------------------

    def _partials(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sums],
        )

    def _fold(self, state: DataFrame, delta_partials: DataFrame) -> DataFrame:
        return (
            state.unionByName(delta_partials)
            .groupBy(*self.keys)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sums],
            )
        )

    # -- maintenance ---------------------------------------------------------

    # Token-chain bound: _folded_version only needs the NEWEST fact:vN
    # token, so each refresh carries just this many parent tokens
    # forward — without it the view manifest grows O(#refreshes) over a
    # long-running maintenance loop (the ADVICE-r5 keep_tokens valve,
    # which ADVICE r9 flagged this module had not applied to itself).
    KEEP_TOKENS = 8

    def _folded_version(self, snap) -> int:
        done = [
            int(tok.rsplit(":v", 1)[1])
            for tok in (snap.batch_tokens if snap else [])
            if tok.startswith("fact:v")
        ]
        return max(done, default=0)

    def refresh(self, fact: SnapshotTable, max_retries: int = 5):
        """Fold fact commits ``(last_folded, latest]`` into the view.
        Returns the view's snapshot (unchanged on no-op/replay).

        The fold is a read-merge-overwrite, so the commit is ANCHORED
        on the view version the state was read at (ADVICE r9): two
        concurrent refreshes can't both succeed with one silently
        dropping the other's fold — the loser collides, re-reads, and
        either no-ops (the winner already folded its fact range) or
        re-merges against the winner's state."""
        for _ in range(max_retries):
            cur_v = fact._latest_version()
            snap = self.table.snapshot()
            last = self._folded_version(snap)
            if cur_v <= last:
                return snap  # nothing new, or a replayed refresh
            token = f"fact:v{cur_v}"
            try:
                delta = fact.changes(last, cur_v)
                full = snap is None
            except ValueError:  # rewrite commit in range → one full rebuild
                delta, full = fact.read(cur_v), True
            if full:
                folded = self._partials(delta)
            else:
                folded = self._fold(
                    self.table.read(snap.version), self._partials(delta)
                )
            # The view is group-keys-sized: a full rewrite of it per
            # refresh is the cheap side of the trade (vs. re-scanning
            # the fact).
            try:
                return self.table.overwrite(
                    folded,
                    batch_token=token,
                    keep_tokens=self.KEEP_TOKENS,
                    parent_version=snap.version if snap else 0,
                )
            except FileExistsError:
                continue  # a racing refresh committed first: re-resolve
        raise RuntimeError(
            f"refresh lost the commit race {max_retries} times"
        )

    # -- serving -------------------------------------------------------------

    def read(self) -> DataFrame:
        """The maintained view + derived means (projection-only)."""
        df = self.table.read()
        for c in self.sums:
            df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n_rows"))
        return df


def _maintained_oracle() -> str:
    """The whole point as SQL: the maintained view must equal the plain
    groupBy over everything ever appended — the oracle IS the full
    recompute the incremental path avoids. Measures ride the integer
    cents grid (the events_twap / orders_cohort_ltv lesson): per-row
    cents are exact BIGINTs, so sums are order-independent and the
    avg's round(4) sees the identical double in both engines — a raw
    double sum would differ by ulps and split at x.xxxx5 boundaries."""
    return """
    WITH c AS (
      SELECT o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)                     AS n_rows,
           round(sum(cents) / 100.0, 4)                 AS sum_price,
           round(sum(cents) / (100.0 * count(*)), 4)    AS avg_price
    FROM c
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """


def _register() -> None:
    """Registry face (deferred import: operators.relational imports
    nothing from storage, so this is cycle-free but kept lazy to match
    the storage package's no-registry-at-import discipline elsewhere)."""
    import tempfile

    from ..operators.relational import query
    from ..tables import load_tables

    @query("ops_rollup_view_maintenance", _maintained_oracle())
    def ops_rollup_view_maintenance(spark, sf_dir: str) -> DataFrame:
        """Incremental aggregate-view maintenance, driver-checkable
        end-to-end: append orders in three fact commits, refresh the
        RollupView at two cadences (after #1, then once spanning
        #2+#3 — the multi-commit catch-up path), and serve the view.
        The oracle is the full groupBy over the union — green means
        fold == recompute, certified through the actual SnapshotTable
        changelog machinery, not a simulation."""
        orders = load_tables(spark, sf_dir)["orders"].select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        root = tempfile.mkdtemp(prefix="rollup_view_")
        fact = SnapshotTable(spark, f"{root}/fact")
        view = RollupView(
            spark, f"{root}/view", keys=["o_orderstatus"], sums=["cents"]
        )
        fact.append(orders.filter(F.col("o_orderkey") % 3 == 0))
        view.refresh(fact)
        fact.append(orders.filter(F.col("o_orderkey") % 3 == 1))
        fact.append(orders.filter(F.col("o_orderkey") % 3 == 2))
        view.refresh(fact)
        return (
            view.read()
            .select(
                "o_orderstatus",
                "n_rows",
                F.round(F.col("sum_cents") / 100.0, 4).alias("sum_price"),
                F.round(
                    F.col("sum_cents") / (100.0 * F.col("n_rows")), 4
                ).alias("avg_price"),
            )
            .orderBy("o_orderstatus")
        )


_register()
