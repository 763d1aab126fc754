"""Incremental aggregate-view maintenance: fold-equals-recompute after
any append sequence, replay no-ops, multi-commit catch-up, and the
rewrite-commit full-rebuild fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_to_lakehouse_spark.storage.rollup import RollupView
from event_to_lakehouse_spark.storage.snapshots import SnapshotTable
from event_to_lakehouse_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_tables(spark, SF)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _expected(df):
    return {
        (r.o_orderstatus, r.n_rows, round(r.sum_o_totalprice, 2))
        for r in df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_totalprice").alias("sum_o_totalprice"),
        )
        .collect()
    }


def _got(view):
    return {
        (r.o_orderstatus, r.n_rows, round(r.sum_o_totalprice, 2))
        for r in view.read().collect()
    }


def test_fold_equals_recompute_across_appends(spark, tmp_dir):
    """Three appends, refreshed at different cadences (after #1, then
    once spanning #2+#3): the maintained view equals the full groupBy
    at every point."""
    orders = _orders(spark)
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark, f"{tmp_dir}/view", keys=["o_orderstatus"], sums=["o_totalprice"]
    )

    b1 = orders.filter(F.col("o_orderkey") % 3 == 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 1)
    b3 = orders.filter(F.col("o_orderkey") % 3 == 2)

    fact.append(b1)
    view.refresh(fact)
    assert _got(view) == _expected(b1)

    fact.append(b2)
    fact.append(b3)  # two fact commits, ONE catch-up refresh
    view.refresh(fact)
    assert _got(view) == _expected(orders)

    # derived means are projections over the partials
    row = view.read().filter(F.col("o_orderstatus") == "O").first()
    assert abs(row.avg_o_totalprice - row.sum_o_totalprice / row.n_rows) < 1e-9


def test_refresh_is_replay_safe(spark, tmp_dir):
    """A refresh with nothing new (or a crash-replayed refresh) leaves
    the view's version untouched."""
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark, f"{tmp_dir}/view", keys=["o_orderstatus"], sums=["o_totalprice"]
    )
    fact.append(_orders(spark))
    view.refresh(fact)
    v = view.table.snapshot().version
    view.refresh(fact)  # no new fact commits
    assert view.table.snapshot().version == v


def test_cdc_refresh_folds_feed_not_rebuild(spark, tmp_dir):
    """A delete/upsert commit recorded via apply_changes(changelog=True)
    must maintain the view through the RETRACTION fold (count/sum
    signed, min/max per affected group), not a full rebuild — pinned by
    spying on the fold paths — and still equal the recompute, including
    a group migration and a fully-deleted group dropping out."""
    orders = _orders(spark).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    ).drop("o_totalprice")
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark,
        f"{tmp_dir}/view",
        keys=["o_orderstatus"],
        sums=["cents"],
        mins=["cents"],
        maxs=["cents"],
    )
    fact.append(orders)
    view.refresh(fact)

    k = F.col("o_orderkey")
    upd = (
        orders.filter(k % 5 == 0)
        .withColumn("o_orderstatus", F.lit("X"))  # group migration
        .withColumn("cents", F.col("cents") + 700)
        .withColumn("_op", F.lit("U"))
    )
    dels = orders.filter((k % 5 != 0) & (k % 2 == 0)).select(
        "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
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

    paths = {"feed": 0, "rebuild": 0}
    real_fold_feed, real_partials = view._fold_feed, view._partials

    def spy_feed(*a, **kw):
        paths["feed"] += 1
        return real_fold_feed(*a, **kw)

    view._fold_feed = spy_feed
    view.refresh(fact)
    view._fold_feed = real_fold_feed
    assert paths["feed"] == 1  # the CDC commit folded, not rebuilt

    got = {
        (r.o_orderstatus, r.n_rows, r.sum_cents, r.min_cents, r.max_cents)
        for r in view.read().collect()
    }
    want = {
        (r.o_orderstatus, r.n_rows, r.sum_cents, r.min_cents, r.max_cents)
        for r in fact.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .collect()
    }
    assert got == want
    assert view.equals_recompute(fact)
    del real_partials


def test_minmax_fold_under_appends_uses_least_greatest(spark, tmp_dir):
    """Insert-only refreshes maintain min/max by folding partials —
    equal to the recompute across a multi-commit catch-up. (Measure on
    the integer cents grid so the exact-compare audit can't split on
    double summation order.)"""
    orders = _orders(spark).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    ).drop("o_totalprice")
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark,
        f"{tmp_dir}/view",
        keys=["o_orderstatus"],
        sums=["cents"],
        mins=["cents"],
        maxs=["cents"],
    )
    fact.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    view.refresh(fact)
    fact.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    view.refresh(fact)
    assert view.equals_recompute(fact)


def test_change_feed_contents_and_gap_handling(spark, tmp_dir):
    """change_feed: appends emit '+', a CDC commit emits its recorded
    -pre-image/+post-image pairs, and a rewrite WITHOUT a sidecar
    (plain merge) raises instead of yielding a silently wrong delta."""
    import pytest as _pytest

    orders = _orders(spark).limit(100)
    t = SnapshotTable(spark, f"{tmp_dir}/t")
    t.append(orders)
    v1 = t.snapshot().version
    upd = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        .withColumn("_op", F.lit("U"))
    )
    t.apply_changes(upd, key="o_orderkey", order_col="o_totalprice",
                    changelog=True)
    feed = t.change_feed(0).collect()
    n_upd = upd.count()
    plus = [r for r in feed if r._change == "+"]
    minus = [r for r in feed if r._change == "-"]
    assert len(minus) == n_upd  # one pre-image per replaced key
    assert len(plus) == 100 + n_upd  # initial append + post-images
    # net replay of the feed == the table's current state
    assert t.change_feed(v1).count() == 2 * n_upd

    t.merge(upd.drop("_op"), key="o_orderkey", order_col="o_totalprice")
    with _pytest.raises(ValueError, match="changelog"):
        t.change_feed(0)


def test_concurrent_refresh_race_loses_no_fold(spark, tmp_dir):
    """ADVICE r9: two concurrent refreshes must not both 'succeed' with
    the second silently dropping the first's fold. The anchored commit
    makes the stale refresher collide; on re-resolve it sees the fact
    version already folded and no-ops — the view still equals the
    recompute and carries exactly one fold commit for that range."""
    orders = _orders(spark)
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    root = f"{tmp_dir}/view"
    view = RollupView(
        spark, root, keys=["o_orderstatus"], sums=["o_totalprice"]
    )
    fact.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    view.refresh(fact)
    fact.append(orders.filter(F.col("o_orderkey") % 2 == 1))

    real_snapshot = view.table.snapshot
    state = {"interleaved": False}

    def racy_snapshot(*args, **kwargs):
        s = real_snapshot(*args, **kwargs)
        if not state["interleaved"]:
            state["interleaved"] = True
            # a racing maintenance job folds the same delta first
            RollupView(
                spark, root, keys=["o_orderstatus"], sums=["o_totalprice"]
            ).refresh(fact)
        return s

    view.table.snapshot = racy_snapshot
    try:
        view.refresh(fact)
    finally:
        view.table.snapshot = real_snapshot

    assert _got(view) == _expected(orders)  # nothing double- or un-folded
    toks = view.table.snapshot().batch_tokens
    assert len([t for t in toks if t == f"fact:v{fact._latest_version()}"]) == 1


def test_refresh_token_chain_is_bounded(spark, tmp_dir):
    """Each refresh carries at most KEEP_TOKENS parent tokens (ADVICE
    r9: unbounded carry grew the manifest O(#refreshes)); replay
    protection only needs the newest fact:vN, which survives."""
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark, f"{tmp_dir}/view", keys=["o_orderstatus"], sums=["o_totalprice"]
    )
    orders = _orders(spark)
    for i in range(RollupView.KEEP_TOKENS + 4):
        fact.append(orders.filter(F.col("o_orderkey") % 16 == i))
        view.refresh(fact)
    toks = view.table.snapshot().batch_tokens
    assert len(toks) <= RollupView.KEEP_TOKENS + 1
    assert f"fact:v{fact._latest_version()}" in toks
    v = view.table.snapshot().version
    view.refresh(fact)  # replay: still a no-op under the bounded chain
    assert view.table.snapshot().version == v


def test_rewrite_commit_triggers_full_rebuild(spark, tmp_dir):
    """A COW merge in the fact's unfolded range can't be folded as
    inserts — the refresh must fall back to one full rebuild and still
    match the recompute."""
    orders = _orders(spark)
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark, f"{tmp_dir}/view", keys=["o_orderstatus"], sums=["o_totalprice"]
    )
    fact.append(orders)
    view.refresh(fact)

    # COW-merge an update: flip some orders' status (rewrite commit)
    upd = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_orderstatus", F.lit("Z")
    )
    fact.merge(upd, key="o_orderkey", order_col="o_totalprice")
    view.refresh(fact)
    assert _got(view) == _expected(fact.read())


def test_cdc_fold_with_stale_upserts_matches_recompute(spark, tmp_dir):
    """ADVICE r10 (high), consumer side: when a CDC batch mixes
    WINNING upserts with STALE ones (base row newer by order_col —
    latest-wins keeps the base), the recorded feed folds to EXACTLY
    the recompute. Before the applied-effect fix the feed retracted
    surviving base rows and added never-applied upserts, so the fold
    silently diverged — this pins the out-of-order CDC case the
    r10 tests never exercised."""
    orders = _orders(spark).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    ).drop("o_totalprice")
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    view = RollupView(
        spark,
        f"{tmp_dir}/view",
        keys=["o_orderstatus"],
        sums=["cents"],
        mins=["cents"],
        maxs=["cents"],
    )
    fact.append(orders)
    view.refresh(fact)

    k = F.col("o_orderkey")
    upd = (
        orders.filter(k % 4 == 0)
        .withColumn(
            "cents",
            # half the changes arrive OUT OF ORDER (older than base)
            F.when(k % 8 == 0, F.col("cents") + 700).otherwise(
                F.col("cents") - 700
            ),
        )
        .withColumn("_op", F.lit("U"))
    )
    fact.apply_changes(upd, key="o_orderkey", order_col="cents",
                       changelog=True)

    paths = {"feed": 0}
    real_fold = view._fold_feed

    def spy(*a, **kw):
        paths["feed"] += 1
        return real_fold(*a, **kw)

    view._fold_feed = spy
    view.refresh(fact)
    view._fold_feed = real_fold
    assert paths["feed"] == 1  # folded the feed, not rebuilt
    assert view.equals_recompute(fact)
