"""Incremental aggregate-view maintenance over a snapshot table.

``pipeline.gold.refresh_current_assets_incremental`` maintains a
LATEST-WINS mart by COW-merging deltas; this module maintains the other
canonical materialized-view class — GROUP-BY AGGREGATES — by folding
each refresh's appended delta into stored mergeable partials:

    refresh cost = O(delta) + O(view),   never O(fact)

The stored state is (keys, n_rows, sum_<c>…, min_<c>…, max_<c>…):
count/sum are self-maintainable under inserts (fold = add) and under
CDC retractions (fold = signed add); min/max are insert-self-
maintainable (fold = least/greatest) and fall back to a PER-AFFECTED-
GROUP recompute under deletes (retractions can't restore a deleted
extreme). Every derived measure (mean, rate, share) is a projection at
read time — the same partials-first discipline as
``events_rollup_cascade`` and the streaming ``*_partials_stream``
jobs, here bound to a :class:`~.snapshots.SnapshotTable` changelog
instead of a stream.

Progress tracking reuses the gold-mart watermark-token pattern: each
refresh commits the folded view WITH a ``fact:v{N}`` batch token in the
same atomic manifest write, so state and progress can't diverge, crash
replays are no-ops, and concurrent refreshes are anchored (the loser
collides and re-resolves). A rewrite commit in the fact's range folds
incrementally when its change feed was recorded
(``apply_changes(changelog=True)`` → signed retractions); any other
rewrite (compaction, plain merge) falls back to ONE full rebuild,
exactly like the gold path.

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
    """A maintained ``fact.groupBy(keys).agg(count, sum, min, max)``.

    ``read()`` returns the view plus derived ``avg_<c>`` columns;
    ``refresh(fact)`` folds everything committed to ``fact`` since the
    last refresh. Three maintenance paths, cheapest applicable wins:

    1. append-only range (``fact.changes``): count/sum fold by
       addition, min/max by ``least``/``greatest`` — all partials are
       insert-self-maintainable;
    2. delete/upsert range recorded as a change feed
       (``apply_changes(changelog=True)`` → ``fact.change_feed``):
       count/sum fold the feed's ``'+'``/``'-'`` rows as signed
       retractions; min/max are NOT retraction-self-maintainable, so
       ONLY the groups the feed touched recompute from the fact (a
       semi-joined, prunable scan), never the whole table;
    3. any other rewrite (compaction, plain merge): one full rebuild.

    Equivalence with a full recompute after any append/CDC sequence —
    including refreshes spanning several fact commits — is
    pytest-pinned and oracle-checked (``ops_rollup_view_maintenance``).
    """

    def __init__(
        self,
        spark,
        root: str,
        keys: list[str],
        sums: list[str],
        mins: list[str] | None = None,
        maxs: list[str] | None = None,
    ):
        self.spark = spark
        self.keys = list(keys)
        self.sums = list(sums)
        self.mins = list(mins or [])
        self.maxs = list(maxs or [])
        self.table = SnapshotTable(spark, root)

    # -- aggregation shapes --------------------------------------------------

    def _mm_aggs(self) -> list:
        return [
            *[F.min(c).alias(f"min_{c}") for c in self.mins],
            *[F.max(c).alias(f"max_{c}") for c in self.maxs],
        ]

    def _partials(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sums],
            *self._mm_aggs(),
        )

    def _fold(self, state: DataFrame, delta_partials: DataFrame) -> DataFrame:
        """Insert-only fold: every stored partial is self-maintainable
        under appends (add counts/sums, least/greatest the extremes)."""
        return (
            state.unionByName(delta_partials)
            .groupBy(*self.keys)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sums],
                *[F.min(f"min_{c}").alias(f"min_{c}") for c in self.mins],
                *[F.max(f"max_{c}").alias(f"max_{c}") for c in self.maxs],
            )
        )

    def _fold_feed(self, state: DataFrame, feed: DataFrame, fact_now: DataFrame) -> DataFrame:
        """Retraction fold: ``'+'`` rows add, ``'-'`` rows subtract for
        count/sum; min/max recompute ONLY for the groups the feed
        touched (from ``fact_now``, semi-joined — at scale a fact
        clustered by the group keys prunes this to the touched files);
        groups folding to zero rows drop out of the view."""
        sign = F.when(F.col("_change") == "+", F.lit(1)).otherwise(F.lit(-1))
        delta = feed.groupBy(*self.keys).agg(
            F.sum(sign).alias("n_rows"),
            *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in self.sums],
        )
        counts = (
            state.select(
                *self.keys,
                "n_rows",
                *[f"sum_{c}" for c in self.sums],
            )
            .unionByName(delta)
            .groupBy(*self.keys)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sums],
            )
            .filter(F.col("n_rows") > 0)
        )
        if not (self.mins or self.maxs):
            return counts
        affected = feed.select(*self.keys).distinct()
        mm_new = (
            fact_now.join(affected, self.keys, "semi")
            .groupBy(*self.keys)
            .agg(F.lit(True).alias("_affected"), *self._mm_aggs())
        )
        mm_cols = [f"min_{c}" for c in self.mins] + [
            f"max_{c}" for c in self.maxs
        ]
        mm_old = state.select(
            *self.keys, *[F.col(c).alias(f"_old_{c}") for c in mm_cols]
        )
        out = counts.join(mm_new, self.keys, "left").join(
            mm_old, self.keys, "left"
        )
        # touched groups take the recomputed extreme; untouched keep the
        # stored one (a NEW group is always touched, so never NULL-NULL)
        picked = [
            F.when(F.col("_affected"), F.col(c))
            .otherwise(F.col(f"_old_{c}"))
            .alias(c)
            for c in mm_cols
        ]
        return out.select(
            *self.keys,
            "n_rows",
            *[f"sum_{c}" for c in self.sums],
            *picked,
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
            folded = None
            try:
                delta = fact.changes(last, cur_v)
                if snap is None:
                    folded = self._partials(delta)
                else:
                    folded = self._fold(
                        self.table.read(snap.version), self._partials(delta)
                    )
            except ValueError:
                # rewrite in range: fold its change feed as retractions
                # if every commit recorded one, else one full rebuild
                try:
                    if snap is not None:
                        folded = self._fold_feed(
                            self.table.read(snap.version),
                            fact.change_feed(last, cur_v),
                            fact.read(cur_v),
                        )
                except ValueError:
                    pass
            if folded is None:
                folded = self._partials(fact.read(cur_v))
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

    def equals_recompute(self, fact: SnapshotTable) -> bool:
        """Audit: does the maintained view equal the full recompute
        RIGHT NOW? (exceptAll both ways over the partial columns —
        view-sized work; the recompute is the one fact scan this class
        exists to avoid, so this is a VERIFICATION tool, not a serving
        path). The compare is EXACT, so double-typed sum measures can
        report spurious ulps-level mismatches (a folded double sum and
        a fresh one differ in summation order) — keep sums on an
        integer/decimal grid (cents/micros, the repo-wide lesson) for
        a bit-checkable view."""
        want = self._partials(fact.read())
        got = self.table.read().select(*want.columns)
        return got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def _maintained_oracle() -> str:
    """The whole point as SQL: the maintained view must equal the plain
    groupBy over the fact's FINAL state — after the appends AND the CDC
    commit (deletes of the %7 keys, group-migrating upserts of the %5
    keys) — so the oracle checks the retraction fold and the
    affected-group min/max recompute, not just insert folding. Measures
    ride the integer cents grid (the events_twap / orders_cohort_ltv
    lesson): per-row cents are exact BIGINTs, so sums are
    order-independent and every round(4) sees the identical double in
    both engines."""
    return """
    WITH mx AS (
      SELECT CAST(max(o_orderkey) // 10 AS BIGINT) AS thr FROM orders
    ),
    c AS (
      SELECT CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
                       AND o_orderkey <= thr
                  THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
                          AND o_orderkey <= thr
                      THEN 1111 ELSE 0 END AS cents
      FROM orders, mx
      WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey <= thr)
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)                     AS n_rows,
           round(sum(cents) / 100.0, 4)                 AS sum_price,
           round(sum(cents) / (100.0 * count(*)), 4)    AS avg_price,
           round(min(cents) / 100.0, 4)                 AS min_price,
           round(max(cents) / 100.0, 4)                 AS max_price
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
        end-to-end across ALL THREE maintenance paths: append orders in
        three fact commits, refresh at two cadences (after #1, then one
        multi-commit catch-up), then commit a CDC batch via
        ``apply_changes(changelog=True)`` — deleting the %7 keys and
        upserting the %5 keys into a DIFFERENT group with a shifted
        measure, all within the FIRST DECILE of the key space — and
        refresh again, which folds the change feed as signed
        retractions and recomputes min/max only for the touched groups.
        The fact carries ``stats_col='o_orderkey'`` and orders.parquet
        is key-sorted, so the CDC rewrite prunes to the files whose key
        range the batch touches (~1/10 of the fact) — the manifest-
        pruned COW cost model, measured, not asserted. The oracle is
        the full groupBy over the fact's final state — green means
        fold == recompute through the real SnapshotTable changelog +
        change-feed machinery."""
        orders = load_tables(spark, sf_dir)["orders"].select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        root = tempfile.mkdtemp(prefix="rollup_view_")
        fact = SnapshotTable(spark, f"{root}/fact", stats_col="o_orderkey")
        view = RollupView(
            spark,
            f"{root}/view",
            keys=["o_orderstatus"],
            sums=["cents"],
            mins=["cents"],
            maxs=["cents"],
        )
        k = F.col("o_orderkey")
        fact.append(orders.filter(k % 3 == 0))
        view.refresh(fact)
        fact.append(orders.filter(k % 3 == 1))
        fact.append(orders.filter(k % 3 == 2))
        view.refresh(fact)
        thr = orders.agg(F.max("o_orderkey")).first()[0] // 10
        upd = (
            orders.filter((k % 5 == 0) & (k % 7 != 0) & (k <= thr))
            .withColumn("o_orderstatus", F.lit("X"))
            .withColumn("cents", F.col("cents") + 1111)
            .withColumn("_op", F.lit("U"))
        )
        dels = orders.filter((k % 7 == 0) & (k <= thr)).select(
            "o_orderkey",
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("long").alias("cents"),
            F.lit("D").alias("_op"),
        )
        fact.apply_changes(
            upd.unionByName(dels),
            key="o_orderkey",
            order_col="cents",
            changelog=True,
        )
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
                F.round(F.col("min_cents") / 100.0, 4).alias("min_price"),
                F.round(F.col("max_cents") / 100.0, 4).alias("max_price"),
            )
            .orderBy("o_orderstatus")
        )

    @query(
        "ops_mv_rewrite_answer",
        """
        WITH c AS (
          SELECT o_orderstatus,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        )
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT)  AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(min(cents) AS BIGINT) AS min_cents,
               CAST(max(cents) AS BIGINT) AS max_cents
        FROM c GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
    )
    def ops_mv_rewrite_answer(spark, sf_dir: str) -> DataFrame:
        """The EXECUTION leg of ``ops_mv_rewrite_advisor``: answer a
        COARSER query from a maintained finer-grained rollup by
        re-aggregating its partials — count as sum-of-counts, sum as
        sum-of-sums, min/max as min-of-mins/max-of-maxs — which is
        exactly the derivability law the advisor's containment check
        assumes. The view is keyed (o_orderstatus, o_orderpriority)
        and maintained over TWO fact commits; the served answer groups
        by o_orderstatus alone and must hash-equal the direct groupBy
        over the raw fact (the oracle). At 100 TB the re-aggregation
        reads the GROUPS table (statuses × priorities rows), never the
        fact — the whole point of answering from the view."""
        orders = load_tables(spark, sf_dir)["orders"].select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        root = tempfile.mkdtemp(prefix="mv_answer_")
        fact = SnapshotTable(spark, f"{root}/fact", stats_col="o_orderkey")
        view = RollupView(
            spark,
            f"{root}/view",
            keys=["o_orderstatus", "o_orderpriority"],
            sums=["cents"],
            mins=["cents"],
            maxs=["cents"],
        )
        k = F.col("o_orderkey")
        fact.append(orders.filter(k % 2 == 0))
        view.refresh(fact)
        fact.append(orders.filter(k % 2 == 1))
        view.refresh(fact)
        return (
            view.read()
            .groupBy("o_orderstatus")
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("sum_cents").cast("long").alias("sum_cents"),
                F.min("min_cents").cast("long").alias("min_cents"),
                F.max("max_cents").cast("long").alias("max_cents"),
            )
            .orderBy("o_orderstatus")
        )


_register()
