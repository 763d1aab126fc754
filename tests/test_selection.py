"""Pin the two-pass exact rank-selection (functions/selection.py) to
``F.percentile`` BIT-FOR-BIT — the equivalence ``stats_quantile_bins``'
r16 rework rests on."""

import math
import struct
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from event_to_lakehouse_spark.functions.selection import exact_percentiles

SF = "/root/testdata/sf0.001"
PS = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]


def _bits(x):
    return None if x is None else struct.pack(">d", float(x)).hex()


def test_exact_percentiles_matches_spark_percentile(spark):
    t = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = exact_percentiles(t, "l_extendedprice", PS)[()]
    want = t.agg(
        F.percentile(
            F.col("l_extendedprice"), F.array(*[F.lit(p) for p in PS])
        ).alias("q")
    ).first()["q"]
    assert [_bits(a) for a in got] == [_bits(b) for b in want]

    got_g = exact_percentiles(t, "l_quantity", PS, ["l_returnflag"])
    want_g = {
        r["l_returnflag"]: r["q"]
        for r in t.groupBy("l_returnflag")
        .agg(
            F.percentile(
                F.col("l_quantity"), F.array(*[F.lit(p) for p in PS])
            ).alias("q")
        )
        .collect()
    }
    assert set(want_g) == {k[0] for k in got_g}
    for k, want_row in want_g.items():
        assert [_bits(a) for a in got_g[(k,)]] == [
            _bits(b) for b in want_row
        ]


def test_exact_percentiles_edge_cases(spark):
    rows = [
        (None, 1.0),        # null group key
        ("a", 5.0), ("a", 5.0), ("a", 5.0),   # all-equal group
        ("b", 2.0), ("b", 3.0),               # 2-row interpolation
        ("c", 7.5),                           # singleton
        ("d", None), ("d", None),             # all-null values
        ("e", -4.0), ("e", 0.0), ("e", 0.0), ("e", 11.0),  # ties+negatives
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = exact_percentiles(df, "v", PS, ["g"])
    want = {
        r["g"]: r["q"]
        for r in df.groupBy("g")
        .agg(
            F.percentile(F.col("v"), F.array(*[F.lit(p) for p in PS])).alias(
                "q"
            )
        )
        .collect()
    }
    for k, want_row in want.items():
        got_row = got[(k,)]
        if want_row is None:
            assert got_row == [None] * len(PS)
            continue
        assert [_bits(a) for a in got_row] == [_bits(b) for b in want_row]
    # the interpolation itself follows Spark's formula
    g_b = got[("b",)]
    pos = 0.25 * 1
    assert g_b[1] == (math.ceil(pos) - pos) * 2.0 + (pos - math.floor(pos)) * 3.0
