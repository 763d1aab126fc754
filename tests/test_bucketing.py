"""Bucketed co-located joins: the write-once-shuffle-never contract,
verified on the physical plan."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from event_to_lakehouse_spark.plans import audit_plan
from event_to_lakehouse_spark.storage.bucketing import (
    drop_table,
    read_table,
    write_bucketed,
)
from event_to_lakehouse_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark, tmp_dir):
    sfx = uuid.uuid4().hex[:8]
    t = load_tables(spark, SF_DIR)
    names = (f"orders_b_{sfx}", f"lineitem_b_{sfx}")
    write_bucketed(
        t["orders"], names[0], f"{tmp_dir}/orders_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        t["lineitem"], names[1], f"{tmp_dir}/lineitem_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield names
    for n in names:
        drop_table(spark, n)


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    orders, lineitem = bucketed_pair
    o, l = read_table(spark, orders), read_table(spark, lineitem)
    joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    # at test SF the orders side is broadcast-small, which would bypass
    # the bucketed path entirely; disable auto-broadcast to audit the
    # big↔big shape bucketing exists for
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = audit_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # the join itself must not exchange either side; only the final
    # small aggregate on o_orderpriority may shuffle
    assert a.sort_merge_joins + a.shuffled_hash_joins >= 1
    assert a.shuffle_exchanges <= 1
    # correctness unchanged vs the unbucketed plan
    t = load_tables(spark, SF_DIR)
    expect = (
        t["orders"].join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .groupBy("o_orderpriority").count()
    )
    got = {r.o_orderpriority: r.n for r in joined.collect()}
    want = {r.o_orderpriority: r["count"] for r in expect.collect()}
    assert got == want


def test_bucketed_groupby_no_shuffle(spark, bucketed_pair):
    _orders, lineitem = bucketed_pair
    l = read_table(spark, lineitem)
    agg = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    a = audit_plan(agg)
    assert a.shuffle_exchanges == 0  # bucket layout satisfies the clustering


def test_pagerank_round_one_exchange_on_bucketed_edges(spark, tmp_dir):
    """graph.py's scale note — "a production run would bucket the edge
    table by src so every round's join is exchange-free" — pinned on
    the physical plan: with the co-purchase edge list persisted as a
    src-bucketed table, one PageRank round (degree count + rank join +
    contribution rollup) plans exactly ONE exchange (the unavoidable
    dst rollup); degree groupBy and the rank join ride the bucket
    clustering. Values match the in-memory round exactly."""
    from event_to_lakehouse_spark.operators.graph import _copurchase_edges

    sfx = uuid.uuid4().hex[:8]
    name = f"edges_b_{sfx}"
    edges = _copurchase_edges(spark, SF_DIR)
    write_bucketed(edges, name, f"{tmp_dir}/edges_b", ["src"], 8)
    try:
        e = read_table(spark, name)

        def one_round(src_edges):
            deg = src_edges.groupBy("src").agg(F.count("*").alias("deg"))
            n = 200  # node count is a scalar; irrelevant to plan shape
            ranks = deg.select(
                F.col("src").alias("node"), F.lit(1.0 / n).alias("pr")
            )
            links = src_edges.join(deg, "src")
            return (
                links.join(ranks, links.src == ranks.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    (F.lit(0.15 / n) + F.lit(0.85) * F.sum(F.col("pr") / F.col("deg")))
                    .alias("pr")
                )
            )

        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = audit_plan(one_round(e))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        assert a.shuffle_exchanges == 1, a.text
        got = {r.node: r.pr for r in one_round(e).collect()}
        want = {r.node: r.pr for r in one_round(edges).collect()}
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12)
    finally:
        drop_table(spark, name)
