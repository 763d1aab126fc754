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
