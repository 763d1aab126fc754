"""Invariants for operators/audit.py — the k-anonymity privacy gauge
and the table-stats join advisor (beyond the per-value parity that
tools/parity.py already certifies against DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_to_lakehouse_spark.operators.audit import (
    ADVISOR_BROADCAST_ROWS,
    K_ANON,
    k_anonymity_level,
    ops_table_stats_advisor,
    privacy_k_anonymity,
    table_join_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def test_k_anonymity_ladder_is_monotone(spark):
    """Each ladder level is a strict coarsening of the previous QI
    tuple (band100 -> band1000 -> sign; nation -> region), so groups
    can only MERGE: group count falls, min group size rises, and the
    at-risk mass (rows_below_k, risk_bp) falls — the anonymization
    trade-off curve the gauge exists to expose."""
    rows = privacy_k_anonymity(spark, SF_DIR).collect()
    assert [r.level for r in rows] == [0, 1, 2]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.groups <= prev.groups
        assert cur.min_k >= prev.min_k
        assert cur.rows_below_k <= prev.rows_below_k
        assert cur.risk_bp <= prev.risk_bp
    for r in rows:
        assert 0 <= r.risk_bp <= 10000
        # consistency: no at-risk rows exactly when every group >= k
        assert (r.rows_below_k == 0) == (r.min_k >= K_ANON)


def test_k_anonymity_level_exact_on_known_groups(spark):
    """Hand-built table: QI group sizes {a:2, b:7} with k=5 ->
    2 groups, min_k=2, 2 rows at risk, 2222 bp of 9 rows."""
    df = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 7, ["qi_col"]
    )
    row = k_anonymity_level(df, ["qi_col"], 0, "test", k=5).collect()[0]
    assert row.groups == 2
    assert row.min_k == 2
    assert row.rows_below_k == 2
    assert row.risk_bp == (10000 * 2) // 9


def test_advisor_pkfk_estimate_is_exact(spark):
    """For every advised edge the left key is the primary key, so
    max(ndv) == left_rows and the System-R containment estimate
    collapses to the fact-side row count exactly — the estimate is
    not just plausible, it is provably right on PK-FK joins."""
    rows = ops_table_stats_advisor(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.left_ndv == r.left_rows  # PK side
        assert r.est_out_rows == r.right_rows


def test_advisor_strategy_follows_stats(spark):
    """The strategy/build-side calls are pure functions of the stats
    columns in the same row — re-derive and compare."""
    for r in ops_table_stats_advisor(spark, SF_DIR).collect():
        small = min(r.left_rows, r.right_rows)
        want = "broadcast" if small <= ADVISOR_BROADCAST_ROWS else "sort_merge"
        assert r.strategy == want
        assert r.build_side == (
            "left" if r.left_rows <= r.right_rows else "right"
        )


def test_table_join_stats_single_row(spark):
    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(30).select((F.col("id") % 10).alias("k"))
    row = table_join_stats(left, "k", right, "k").collect()[0]
    assert (row.left_rows, row.left_ndv) == (10, 10)
    assert (row.right_rows, row.right_ndv) == (30, 10)


def test_join_order_advisor_ranks_dimension_first(spark):
    """8 connected left-deep orders; the chosen order starts with the
    two dimensions, its cost is exactly |customer| + |orders| (each
    PK-FK intermediate collapses to the fact side), every fact-first
    order pays |lineitem| at least once, and est_final_rows is
    identical for all orders (join order never changes the result)."""
    from event_to_lakehouse_spark.operators.audit import (
        ops_join_order_advisor,
    )
    from event_to_lakehouse_spark.tables import load_tables

    rows = ops_join_order_advisor(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert [r.rank for r in rows] == list(range(1, 9))
    t = load_tables(spark, SF_DIR)
    n_c, n_o, n_l = t["customer"].count(), t["orders"].count(), t["lineitem"].count()
    best = rows[0]
    assert best.chosen and all(not r.chosen for r in rows[1:])
    first_two = set(best.join_order.split(">")[:2])
    assert first_two == {"nation", "customer"}
    assert best.est_cost_rows == n_c + n_o
    assert len({r.est_final_rows for r in rows}) == 1
    for r in rows:
        if r.join_order.startswith("lineitem") or ">lineitem>" in r.join_order:
            assert r.est_cost_rows >= n_l
        assert r.est_cost_rows >= best.est_cost_rows


def test_chain_orders_enumeration_is_connected_and_complete(spark):
    """Pure-logic pin: 2^(k-1) orders, each a permutation whose every
    prefix is a contiguous interval of the chain (= connected)."""
    from event_to_lakehouse_spark.operators.audit import _CHAIN, _chain_orders

    orders = _chain_orders()
    assert len(orders) == 2 ** (len(_CHAIN) - 1)
    assert len({tuple(o) for o in orders}) == len(orders)
    pos = {t: i for i, t in enumerate(_CHAIN)}
    for o in orders:
        assert sorted(o) == sorted(_CHAIN)
        for i in range(1, len(o) + 1):
            idxs = sorted(pos[t] for t in o[:i])
            assert idxs == list(range(idxs[0], idxs[-1] + 1))


def test_l_diversity_ladder_monotone_and_exact(spark):
    """Coarsening only merges QI groups, and a merged group's distinct
    sensitive count dominates each constituent's — min_l is monotone
    up the ladder and risk only falls. Plus a hand-built exact case:
    groups with 1 and 3 distinct sensitive values at l_min=2."""
    from event_to_lakehouse_spark.operators.audit import (
        L_DIV,
        l_diversity_level,
        privacy_l_diversity,
    )

    rows = privacy_l_diversity(spark, SF_DIR).collect()
    assert [r.level for r in rows] == [0, 1, 2]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.groups <= prev.groups
        assert cur.min_l >= prev.min_l
        assert cur.risk_bp <= prev.risk_bp
    for r in rows:
        assert 0 <= r.risk_bp <= 10000
        assert (r.rows_disclosing == 0) == (r.min_l >= L_DIV)

    df = spark.createDataFrame(
        [("a", "x")] * 4 + [("b", "x"), ("b", "y"), ("b", "z")],
        ["qi_col", "sens"],
    )
    row = l_diversity_level(
        df, ["qi_col"], "sens", 0, "test", l_min=2
    ).collect()[0]
    assert row.groups == 2
    assert row.min_l == 1
    assert row.rows_disclosing == 4  # group a: 4 rows, all one value
    assert row.risk_bp == (10000 * 4) // 7


def test_mv_rewrite_advisor_chooses_contained_cheapest(spark):
    """Exactly one chosen candidate per query; chosen implies
    contained; the non-derivable count(DISTINCT) query and the
    uncovered-key query fall back to the base table; a covered query
    picks the CHEAPEST containing view, never the base table."""
    from event_to_lakehouse_spark.operators.audit import (
        ops_mv_rewrite_advisor,
    )

    rows = ops_mv_rewrite_advisor(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_name, []).append(r)
    assert len(by_q) == 5
    for q, cands in by_q.items():
        chosen = [r for r in cands if r.chosen]
        assert len(chosen) == 1, q
        assert chosen[0].contained
    pick = {q: [r for r in c if r.chosen][0].candidate
            for q, c in by_q.items()}
    assert pick["q_distinct_cust_by_status"] == "orders_base"
    assert pick["q_count_by_orderdate"] == "orders_base"
    assert pick["q_count_by_status"] == "mv_by_status"
    assert pick["q_avg_by_priority"] == "mv_by_status_priority"
    est = {r.candidate: r.est_rows for r in by_q["q_count_by_status"]}
    assert est["mv_by_status"] <= est["mv_by_status_priority"]


def test_expectations_report_internal_consistency(spark):
    """passed == (n_violations == 0); bps is the integer ratio; all
    expectations over one table see the same n_rows (one-scan
    contract); the RI and uniqueness rows hold on this corpus."""
    from event_to_lakehouse_spark.operators.expectations import (
        quality_expectations_report,
    )

    rows = quality_expectations_report(spark, SF_DIR).collect()
    assert len(rows) == 8
    per_table = {}
    for r in rows:
        assert r.passed == (r.n_violations == 0)
        assert r.violation_bps == (10000 * r.n_violations) // r.n_rows
        tbl = r.expectation.split(".")[0]
        per_table.setdefault(tbl, set()).add(r.n_rows)
    assert all(len(v) == 1 for v in per_table.values())
    byname = {r.expectation: r for r in rows}
    assert byname["orders.o_orderkey.unique"].passed
    assert byname["lineitem.l_orderkey.ref_orders"].passed


def test_t_closeness_hand_computed_and_bounded(spark):
    """TV distance on a constructed frame matches the hand-computed
    value (disjoint-support groups: 0.5 -> 5000 bps; identical
    distributions -> 0), and the real ladder's basis points live in
    [0, 10000] with all three levels present."""
    from event_to_lakehouse_spark.operators.audit import (
        privacy_t_closeness,
        t_closeness_level,
    )

    # group 1 all 'A', group 2 all 'B', global 50/50 -> TV = 0.5
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "B"), (2, "B")], ["k", "s"]
    )
    row = t_closeness_level(df, ["k"], 0, "hand").collect()[0]
    assert (row.groups, row.max_t_bp) == (2, 5000)

    # every group mirrors the global distribution -> TV = 0
    uni = spark.createDataFrame(
        [(g, s) for g in (1, 2) for s in ("A", "B")], ["k", "s"]
    )
    assert t_closeness_level(uni, ["k"], 0, "uni").collect()[0].max_t_bp == 0

    rows = privacy_t_closeness(spark, SF_DIR).collect()
    assert [r.level for r in rows] == [0, 1, 2]
    for r in rows:
        assert 0 <= r.max_t_bp <= 10000
        assert 0 <= r.rows_above_bp <= 10000
        assert r.groups_above_t <= r.groups


def test_k_anonymize_transform_matches_gauge_pick(spark):
    """The anonymization TRANSFORM (VERDICT r11 #5): every released
    group has size >= K_ANON (the whole point), the stamped level
    equals the gauge's release-gate pick (first level with min_k >=
    K_ANON, coarsest if none clears), and suppression — not
    generalization alone — is what guarantees the bound when the
    ladder doesn't clear."""
    from event_to_lakehouse_spark.operators.audit import privacy_k_anonymize

    out = privacy_k_anonymize(spark, SF_DIR)
    sizes = out.groupBy("qi1", "qi2", "qi3").agg(
        F.count(F.lit(1)).alias("sz")
    )
    assert sizes.filter(F.col("sz") < K_ANON).count() == 0

    gauge = privacy_k_anonymity(spark, SF_DIR).collect()
    cleared = [r["level"] for r in gauge if r["min_k"] >= K_ANON]
    expected_pick = min(cleared) if cleared else max(r["level"] for r in gauge)
    assert out.select("level").distinct().collect()[0]["level"] == expected_pick

    # suppression accounting: released rows == customers minus the
    # picked level's below-k mass (the gauge's rows_below_k at that
    # level when the coarsest level was picked without clearing)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    suppressed = next(
        r["rows_below_k"] for r in gauge if r["level"] == expected_pick
    )
    assert out.count() == n_cust - suppressed
