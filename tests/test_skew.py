"""Salted aggregation / join: exactness vs the unsalted plan, and the
shuffle-key shape that makes them skew-proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_to_lakehouse_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # one hot key (90%) + long tail
    hot = spark.range(900).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("t"), (F.col("id") % 10)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_unsalted(spark):
    df = _skewed_df(spark)
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "s": ("sum", "v"),
                "n": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            n_salt=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_noncombinable(spark):
    import pytest

    with pytest.raises(ValueError, match="avg"):
        salted_agg(_skewed_df(spark), ["k"], {"a": ("avg", "v")})


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("t1", "tail-dim")], ["k", "label"]
    )
    plain = sorted(
        (r.k, r.v, r.label) for r in big.join(dim, ["k"]).collect()
    )
    salted = sorted(
        (r.k, r.v, r.label) for r in salted_join(big, dim, ["k"], n_salt=4).collect()
    )
    assert plain == salted and len(plain) == 900 + 10


def test_salted_agg_shuffles_on_salt(spark):
    """Stage-1 exchange must partition on (k, _salt), not k alone."""
    from event_to_lakehouse_spark.plans import audit_plan

    out = salted_agg(_skewed_df(spark), ["k"], {"s": ("sum", "v")}, n_salt=8)
    a = audit_plan(out)
    assert "_salt" in a.text
    assert a.shuffle_exchanges == 2  # shard stage + combine stage


def _boilerplate_corpus(spark):
    """300 byte-identical boilerplate docs (one degenerate block/bucket)
    + 20 planted near-dup pairs of genuinely distinct docs."""
    boiler = "quarterly compliance report filed on time by the records team " * 4
    rows = [(i, boiler) for i in range(300)]
    for i in range(20):
        base = f"unique document {i} about topic_{i} " + " ".join(
            f"word{i}_{j}" for j in range(30)
        )
        rows.append((1000 + i, base))
        rows.append((2000 + i, base + " trailing addendum"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_hot_bucket_guard_on_boilerplate(spark):
    """A boilerplate-heavy corpus must NOT blow up the LSH candidate
    join: the 300 identical docs share every band bucket, so MAX_BUCKET
    (200) drops those buckets entirely — zero boilerplate pairs — while
    planted near-dups in healthy buckets still surface."""
    from event_to_lakehouse_spark.dedup.minhash import candidate_pairs

    pairs = candidate_pairs(_boilerplate_corpus(spark)).collect()
    boiler_pairs = [
        r for r in pairs if r.doc_id_a < 300 and r.doc_id_b < 300
    ]
    assert boiler_pairs == []  # guard fired; would be 44850 pairs without
    found = {(r.doc_id_a, r.doc_id_b) for r in pairs}
    hits = sum((1000 + i, 2000 + i) in found for i in range(20))
    assert hits >= 18, f"planted near-dups lost: {hits}/20"


def test_jaccard_block_guard_on_boilerplate(spark):
    """Same corpus through exact n-gram Jaccard: the shared 30-char
    prefix block exceeds MAX_BLOCK and is dropped before the self-join;
    planted pairs (distinct prefixes) keep their exact scores."""
    from event_to_lakehouse_spark.dedup.jaccard import jaccard_pairs

    pairs = jaccard_pairs(_boilerplate_corpus(spark)).collect()
    assert [r for r in pairs if r.doc_a < 300 and r.doc_b < 300] == []
    found = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    hits = sum((1000 + i, 2000 + i) in found for i in range(20))
    assert hits == 20
    assert all(j >= 0.6 for j in found.values())


def test_simhash_band_guard_on_boilerplate(spark):
    """SimHash banded pairing on the same corpus: 300 byte-identical
    docs share every 16-bit band, so MAX_BAND drops those buckets
    (exact dups are the cheap exact-dedup pass's job); planted textual
    near-dups still pair within Hamming distance."""
    from event_to_lakehouse_spark.dedup.simhash import near_pairs

    pairs = near_pairs(_boilerplate_corpus(spark)).collect()
    assert [r for r in pairs if r.doc_id_a < 300 and r.doc_id_b < 300] == []
    found = {(r.doc_id_a, r.doc_id_b) for r in pairs}
    hits = sum((1000 + i, 2000 + i) in found for i in range(20))
    # simhash banding is coarser than minhash (a ≤8-bit difference can
    # still straddle all 4 bands), so recall here is honestly lower —
    # the guard must not make it WORSE than the algorithm's own ~85%
    assert hits >= 15, f"planted near-dups lost: {hits}/20"


def test_key_skew_profile_verdicts_and_exactness(spark):
    """The skew gauge on a constructed frame with one hot key: exact
    counts, correct max/median ratio, and the salt verdict flips
    exactly at SKEW_SALT_THRESHOLD x the median."""
    from event_to_lakehouse_spark.operators.skew import key_skew_profile

    rows = (
        [("hot", i) for i in range(170)]        # one 170-row key
        + [(f"u{k}", k) for k in range(9)]      # nine 1-row keys -> p50=1
        + [("a", 0)] * 5                        # uniform-ish second col? no
    )
    df = spark.createDataFrame(rows, "k string, v long")
    prof = {r["key_col"]: r for r in key_skew_profile(df, ["k"]).collect()}
    p = prof["k"]
    assert p["n_rows"] == 184 and p["max_cnt"] == 170
    assert p["n_keys"] == 11
    # median of per-key counts [170,5,1x9] -> 1.0; ratio 170 -> salt
    assert p["p50_cnt"] == 1.0
    assert p["skew_ratio"] == 170.0
    assert p["salt_verdict"] == "salt"
    # a uniform column stays plain
    uni = spark.createDataFrame(
        [(f"k{i % 8}", i) for i in range(64)], "k string, v long"
    )
    q = key_skew_profile(uni, ["k"]).first()
    assert q["max_cnt"] == 8 and q["p50_cnt"] == 8.0
    assert q["skew_ratio"] == 1.0 and q["salt_verdict"] == "plain"
