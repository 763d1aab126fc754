"""Bloom pre-filter: zero false negatives (structural), live FPR within
analytic bounds, bitmap compactness, broadcast-only probe plan, and the
gauge entry's invariants on the real documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_to_lakehouse_spark.dedup.bloom import (
    BITS_PER_KEY,
    K_HASHES,
    bloom_bits,
    bloom_maybe,
    build_bloom,
    dedup_bloom_prefilter,
)

SF = "/root/testdata/sf0.001"


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("k")
    )


def test_no_false_negatives_planted(spark):
    """Every indexed key must pass the filter — Bloom's one hard
    guarantee, and the property the incremental-dedup composition
    relies on (a miss skips the exact join entirely)."""
    held = _keys(spark, "held-", 400)
    m = bloom_bits(400)
    words = build_bloom(held, "k", m)
    probes = held.unionAll(_keys(spark, "new-", 400))
    got = bloom_maybe(probes, "k", words, m)
    missed = got.filter(
        F.col("k").startswith("held-") & ~F.col("bloom_maybe")
    ).count()
    assert missed == 0


def test_fpr_within_analytic_bound(spark):
    """Non-members pass at roughly (1-e^{-k/b})^k ≈ 5.6% for the module
    geometry; assert under 3× that so the test stays seed-stable."""
    held = _keys(spark, "held-", 500)
    m = bloom_bits(500)
    words = build_bloom(held, "k", m)
    fresh = _keys(spark, "new-", 1000)
    fp = bloom_maybe(fresh, "k", words, m).filter("bloom_maybe").count()
    assert fp / 1000 < 3 * (1 - 2.718281828 ** (-K_HASHES / BITS_PER_KEY)) ** K_HASHES


def test_bitmap_is_word_bounded(spark):
    """The bitmap never exceeds m/32 rows regardless of key count —
    the property that makes it broadcastable at any corpus size."""
    held = _keys(spark, "held-", 300)
    m = bloom_bits(300)
    assert build_bloom(held, "k", m).count() <= m // 32


def test_probe_plan_is_broadcast_only(spark):
    """The probe side must never shuffle the bitmap or the verdicts:
    both joins in bloom_maybe are broadcast-hash, so at 100 TB the
    arriving batch is filtered where it already sits."""
    held = _keys(spark, "held-", 200)
    m = bloom_bits(200)
    words = build_bloom(held, "k", m)
    plan = bloom_maybe(
        _keys(spark, "new-", 200), "k", words, m
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gauge_invariants_on_documents(spark):
    """On the real corpus split: no probe is missed (n_missed == 0
    everywhere), every member is caught inside the bloom-pass set, and
    the pass set is a strict subset of the probes (the filter actually
    filters at this geometry)."""
    rows = dedup_bloom_prefilter(spark, SF).collect()
    assert rows, "gauge returned no rows"
    assert sum(r.n_missed for r in rows) == 0
    for r in rows:
        assert r.n_bloom_pass >= r.n_members
        assert r.n_false_pos == r.n_bloom_pass - r.n_members
    assert sum(r.n_bloom_pass for r in rows) < sum(r.n_probes for r in rows)


def test_bloom_index_union_equivalence(spark, tmp_dir):
    """bit_or is commutative/associative/idempotent: indexing two
    batches must yield EXACTLY the bitmap of one build over the union."""
    from event_to_lakehouse_spark.dedup.bloom import BloomIndex, build_bloom

    m = bloom_bits(400)
    idx = BloomIndex(spark, f"{tmp_dir}/bf", m_bits=m)
    idx.add_batch(_keys(spark, "a-", 200), "k", batch_token="b1")
    idx.add_batch(_keys(spark, "b-", 200), "k", batch_token="b2")
    got = {(r.word_idx, r.word) for r in idx._stored().collect()}
    want = {
        (r.word_idx, r.word)
        for r in build_bloom(
            _keys(spark, "a-", 200).unionAll(_keys(spark, "b-", 200)), "k", m
        ).collect()
    }
    assert got == want


def test_bloom_index_reopen_replay_and_geometry(spark, tmp_dir):
    """Reopen adopts the stored geometry; a replayed batch_token is a
    storage no-op; probes after reopen still admit every held key and
    conflicting explicit geometry raises."""
    import pytest as _pytest

    from event_to_lakehouse_spark.dedup.bloom import BloomIndex

    m = bloom_bits(300)
    idx = BloomIndex(spark, f"{tmp_dir}/bf2", m_bits=m)
    idx.add_batch(_keys(spark, "a-", 300), "k", batch_token="b1")
    v1 = idx.table.snapshot().version

    re = BloomIndex(spark, f"{tmp_dir}/bf2")  # geometry from sidecar
    assert (re.m_bits, re.k) == (m, K_HASHES)
    re.add_batch(_keys(spark, "a-", 300), "k", batch_token="b1")  # replay
    assert re.table.snapshot().version == v1

    got = re.probe(_keys(spark, "a-", 300), "k")
    assert got.filter(~F.col("bloom_maybe")).count() == 0

    with _pytest.raises(ValueError):
        BloomIndex(spark, f"{tmp_dir}/bf2", m_bits=m * 2)


def test_bloom_index_empty_probe(spark, tmp_dir):
    """An index with no batches admits nothing (all guaranteed-new)."""
    from event_to_lakehouse_spark.dedup.bloom import BloomIndex

    idx = BloomIndex(spark, f"{tmp_dir}/bf3", m_bits=64)
    assert idx.word_count() == 0
    assert (
        idx.probe(_keys(spark, "x-", 10), "k").filter("bloom_maybe").count()
        == 0
    )
