"""q21 scale experiment (VERDICT r3 #6): the triple-lineitem self-join
showed a 3.7x runtime ratio on 10x data. Compare three formulations at
sf0.1 and 10x:

  current  — semi + anti joins (the registered shape)
  salted   — the anti-join side sharded via operators/skew.salted_join
  onepass  — ONE groupBy(l_orderkey) computing supplier count + the
             late-supplier set, then a per-row verdict (no self-joins:
             the 100 TB formulation — three shuffles collapse to one)

Prints per-variant timings + ratio and asserts all three agree row-for-
row at sf0.1. Usage: python tools/q21_scale_probe.py [--copies 10]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import BASE, build_corpus, time_query  # noqa: E402


def q21_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Q21: per-order supplier stats once, verdict per row.

    EXISTS(other supplier) == n_supp > 1; NOT EXISTS(other LATE
    supplier) == the order's late-supplier set is within {own key}:
    late_supp_n - int(self is late3) == 0. One lineitem shuffle on
    l_orderkey (reused by the join back), no self-joins."""
    from event_to_lakehouse_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    l, s = t["lineitem"], t["supplier"]
    o = t["orders"].select("o_orderkey", "o_orderstatus", "o_orderdate")

    lo = l.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    )
    late3 = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.collect_set(F.when(late3, F.col("l_suppkey"))).alias("late3_supps"),
    )
    cand = (
        lo.filter(F.col("o_orderstatus") == "F")
        .filter(late3)  # l1's own late predicate (same 60-day form)
        .join(per_order, "l_orderkey")
        .filter(F.col("n_supp") > 1)
        .filter(
            F.size(F.col("late3_supps"))
            - F.array_contains("late3_supps", F.col("l_suppkey")).cast("int")
            == 0
        )
    )
    return (
        cand.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q21_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered shape but with the NOT-EXISTS anti-join replaced
    by a salted left_anti (the skew.salted_join pattern, spelled out
    because of the <> residual) on l_orderkey."""
    from event_to_lakehouse_spark.operators.tpch_full import _late
    from event_to_lakehouse_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    l, s = t["lineitem"], t["supplier"]
    o = t["orders"].filter(F.col("o_orderstatus") == "F")

    l1 = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(_late(l, o))
    l2 = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l1 = l1.join(
        l2,
        (l1["l_orderkey"] == l2["ok2"]) & (l1["l_suppkey"] != l2["sk2"]),
        "left_semi",
    )
    late_lines = (
        l.join(
            o.select("o_orderkey", "o_orderdate"),
            l["l_orderkey"] == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(
            F.col("l_orderkey").alias("l_orderkey"),
            F.col("l_suppkey").alias("sk3"),
        )
    )
    # salt l1 deterministically, replicate late_lines over the salt
    # space, anti-join on (key, salt) + the <> residual
    n_salt = 8
    l1s = l1.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_suppkey"), F.lit(n_salt))
    )
    reps = late_lines.crossJoin(
        F.broadcast(spark.range(n_salt).select(F.col("id").cast("int").alias("_salt")))
    )
    l1a = l1s.join(
        reps,
        (l1s["l_orderkey"] == reps["l_orderkey"])
        & (l1s["_salt"] == reps["_salt"])
        & (l1s["l_suppkey"] != reps["sk3"]),
        "left_anti",
    )
    return (
        l1a.join(F.broadcast(s), l1a["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from event_to_lakehouse_spark.catalog import QUERIES
    from event_to_lakehouse_spark.session import get_spark

    spark = get_spark("q21-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = build_corpus(spark, args.copies)

    variants = {
        "current": QUERIES["q21_waiting_suppliers"],
        "salted": q21_salted,
        "onepass": q21_onepass,
    }
    # correctness: all variants agree at sf0.1
    ref = sorted(map(tuple, variants["current"](spark, BASE).collect()))
    for name, fn in variants.items():
        got = sorted(map(tuple, fn(spark, BASE).collect()))
        assert got == ref, f"{name} disagrees with current at sf0.1"
    print("variants agree at sf0.1", flush=True)

    out = {}
    for name, fn in variants.items():
        qd = {name: fn}
        t1 = time_query(qd, name, spark, BASE, args.runs)
        t10 = time_query(qd, name, spark, big, args.runs)
        out[name] = {
            "base_s": round(t1, 2),
            "big_s": round(t10, 2),
            "ratio": round(t10 / t1, 1),
        }
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({"copies": args.copies, "variants": out}))


if __name__ == "__main__":
    main()
