"""Semantic invariants for the round-5 quality/history operator batch
(interval islands, SCD2 history, winsorize, constraint suite, TF-IDF,
source overlap, hard negatives). Cross-engine value equality is the
oracle-parity gate's job; these tests pin the SEMANTIC contracts the
hash can't express (disjointness, effectivity chaining, clamp bounds).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def islands(spark):
    from event_to_lakehouse_spark.operators.events import events_interval_islands

    return events_interval_islands(spark, SF_SMALL).toPandas()


def test_islands_are_disjoint_and_ordered(islands):
    for _, g in islands.groupby("user_id"):
        g = g.sort_values("island_id")
        # strictly increasing, non-touching: next start > previous end
        prev_end = None
        for _, r in g.iterrows():
            assert r.island_end >= r.island_start
            assert r.covered_s == r.island_end - r.island_start
            if prev_end is not None:
                assert r.island_start > prev_end
            prev_end = r.island_end


def test_islands_conserve_events(spark, islands):
    from event_to_lakehouse_spark.tables import load_tables

    n_events = load_tables(spark, SF_SMALL)["events"].count()
    assert islands.n_events.sum() == n_events


@pytest.fixture(scope="module")
def scd2(spark):
    from event_to_lakehouse_spark.pipeline.gold import gold_scd2_history

    return gold_scd2_history(spark, SF_SMALL).toPandas()


def test_scd2_one_current_per_key(scd2):
    cur = scd2.groupby("asset_uid")["is_current"].sum()
    assert (cur == 1).all()


def test_scd2_versions_chain(scd2):
    for _, g in scd2.groupby("asset_uid"):
        g = g.sort_values("version")
        assert list(g.version) == list(range(1, len(g) + 1))
        # effectivity chains: valid_to of v_k == valid_from of v_{k+1}
        closed = g.iloc[:-1]
        nxt = g.iloc[1:]
        assert (closed.valid_to.values == nxt.valid_from.values).all()
        # consecutive versions represent a real change
        assert (closed.state.values != nxt.state.values).all()
        # only the last version is open
        assert g.iloc[-1].is_current and g.iloc[-1:].valid_to.isna().all()


def test_winsorize_bounds(spark):
    from event_to_lakehouse_spark.operators.events import events_winsorize

    df = events_winsorize(spark, SF_SMALL).toPandas()
    assert len(df) > 0
    assert (df.p05 <= df.p95).all()
    assert ((df.mean_winsorized >= df.p05 - 1e-4) & (df.mean_winsorized <= df.p95 + 1e-4)).all()
    assert (df.n_clamped_low + df.n_clamped_high <= df.n).all()
    # clamping at the 5%/95% band touches roughly 10% of rows
    frac = (df.n_clamped_low + df.n_clamped_high) / df.n
    assert (frac <= 0.2).all()


def test_quality_constraints_verdicts(spark):
    from event_to_lakehouse_spark.operators.profiling import quality_constraints

    df = quality_constraints(spark, SF_SMALL).toPandas()
    assert len(df) == 5
    assert (df.passed == (df.metric >= df.threshold - 1e-9)).all()
    # TPC-H data is clean: every constraint holds
    assert df.passed.all(), df.to_string()


def test_tfidf_topk_shape(spark):
    from event_to_lakehouse_spark.textops import TFIDF_TOPK, text_tfidf_topterms

    df = text_tfidf_topterms(spark, SF_SMALL).toPandas()
    for _, g in df.groupby("source"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= TFIDF_TOPK
        # scores non-increasing down the ranking
        assert (g.tfidf.diff().dropna() <= 1e-9).all()


def test_source_overlap_metric_algebra(spark):
    from event_to_lakehouse_spark.curation import corpus_source_overlap

    df = corpus_source_overlap(spark, SF_SMALL).toPandas()
    assert len(df) > 0
    assert (df.source_a < df.source_b).all()
    assert ((df.containment > 0) & (df.containment <= 1)).all()
    # jaccard can never exceed containment (union >= min size)
    assert (df.jaccard <= df.containment + 1e-9).all()


def test_hard_negatives_labels_differ(spark):
    from event_to_lakehouse_spark.similarity.ann import (
        HN_TOP_K,
        N_QUERIES,
        ann_hard_negatives,
    )
    from event_to_lakehouse_spark.tables import load_tables

    df = ann_hard_negatives(spark, SF_SMALL).toPandas()
    emb = (
        load_tables(spark, SF_SMALL)["embeddings"]
        .select("vec_id", "label")
        .toPandas()
        .set_index("vec_id")["label"]
    )
    for qid, g in df.groupby("query_id"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= HN_TOP_K
        assert qid < N_QUERIES
        assert (g.label != emb.loc[qid]).all()


def test_rollup_cascade_equals_direct_daily(spark):
    """The tiered rollup's defining property: the daily tier computed
    FROM hourly partials equals aggregating the raw facts straight to
    daily (count/sum/max exactly; avg/std to float tolerance)."""
    from pyspark.sql import functions as F

    from event_to_lakehouse_spark.operators.events import events_rollup_cascade
    from event_to_lakehouse_spark.tables import load_tables

    got = events_rollup_cascade(spark, SF_SMALL).toPandas()
    ev = load_tables(spark, SF_SMALL)["events"]
    direct = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
            F.stddev_samp("value").alias("std_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
    )
    key = ["event_type", "day"]
    got = got.sort_values(key).reset_index(drop=True)
    direct = direct.sort_values(key).reset_index(drop=True)
    assert (got.n_events.values == direct.n_events.values).all()
    assert (got.max_value.values == direct.max_value.values).all()
    assert abs(got.sum_value.values - direct.sum_value.values).max() < 1e-2
    assert abs(got.avg_value.values - direct.avg_value.values).max() < 1e-4
    assert abs(got.std_value.values - direct.std_value.values).max() < 1e-3


def test_markov_rows_normalize(spark):
    from event_to_lakehouse_spark.operators.events import events_markov_transitions

    df = events_markov_transitions(spark, SF_SMALL).toPandas()
    assert len(df) > 0
    sums = df.groupby("from_state")["p"].sum()
    assert ((sums - 1.0).abs() < 0.01).all()  # rows sum to 1 (4-dp rounding)
    assert (df.n > 0).all()


def test_bm25_ranking_sane(spark):
    from event_to_lakehouse_spark.textops import BM25_TOPK, text_bm25_search

    df = text_bm25_search(spark, SF_SMALL).toPandas()
    assert 0 < len(df) <= BM25_TOPK
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    assert (df.score.diff().dropna() <= 1e-9).all()  # non-increasing
    assert (df.score > 0).all() and (df.n_terms_hit >= 1).all()
