"""Corpus-independence probe for the incremental near-dup index.

Builds NearDupIndex instances over corpora of 1x and Kx the sf0.1
documents table (reusing scale_probe's shifted-id corpus builder),
then times indexing the SAME fresh batch against each. If the design
claim holds — per-batch compute scales with the batch; the corpus
enters only as broadcast-probed columnar scans — the probe time stays
near-flat while the indexed corpus grows Kx.

Usage: python tools/incremental_probe.py [--copies 10] [--runs 3]
Prints a markdown table plus one JSON line for SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import BASE, build_corpus  # noqa: E402

SCRATCH = "/tmp/incremental_probe"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from event_to_lakehouse_spark.dedup.incremental import NearDupIndex
    from event_to_lakehouse_spark.session import get_spark

    spark = get_spark("incremental-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # salted: copies are NOT duplicates of each other, so both indexes
    # genuinely hold copies× more entries (unsalted, the exact index
    # collapses to the base distinct-content count by design)
    big = build_corpus(spark, args.copies, salt=True)

    # The "newly arrived" batch: the base documents shifted far past
    # every indexed id — same batch, same text, probed at both scales.
    batch = spark.read.parquet(f"{BASE}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id") + F.lit(900_000_000)
    )

    from event_to_lakehouse_spark.dedup.incremental import ExactDedupIndex

    exact = {}
    for tag, src in (("1x", BASE), (f"{args.copies}x", big)):
        root = Path(SCRATCH) / f"exact-{tag}"
        shutil.rmtree(root, ignore_errors=True)
        eidx = ExactDedupIndex(spark, str(root))
        eidx.index_batch(
            spark.read.parquet(f"{src}/documents.parquet"), batch_token="corpus"
        ).write.format("noop").mode("overwrite").save()
        ts = []
        for run in range(args.runs):
            b = batch.withColumn(
                "doc_id", F.col("doc_id") + F.lit(run * 1_000_000)
            )
            t0 = time.time()
            eidx.index_batch(b, batch_token=f"probe-{run}").write.format(
                "noop"
            ).mode("overwrite").save()
            ts.append(time.time() - t0)
        exact[tag] = {
            "indexed": eidx.doc_count(),
            "probe_s": round(statistics.mean(ts), 2),
        }

    results = {}
    for tag, src in (("1x", BASE), (f"{args.copies}x", big)):
        root = Path(SCRATCH) / tag
        shutil.rmtree(root, ignore_errors=True)
        idx = NearDupIndex(spark, str(root))
        t0 = time.time()
        idx.index_batch(
            spark.read.parquet(f"{src}/documents.parquet"), batch_token="corpus"
        ).write.format("noop").mode("overwrite").save()
        build_s = time.time() - t0
        n_docs = idx.doc_count()
        ts = []
        for run in range(args.runs):
            # fresh ids per run so each probe batch is genuinely new
            b = batch.withColumn(
                "doc_id", F.col("doc_id") + F.lit(run * 1_000_000)
            )
            t0 = time.time()
            idx.index_batch(b, batch_token=f"probe-{run}").write.format(
                "noop"
            ).mode("overwrite").save()
            ts.append(time.time() - t0)
        results[tag] = {
            "indexed_docs": n_docs,
            "index_build_s": round(build_s, 2),
            "probe_s": round(statistics.mean(ts), 2),
            "probe_sd": round(statistics.stdev(ts), 2) if len(ts) > 1 else 0.0,
        }

    print("| corpus | indexed docs | index build s | probe same batch s |")
    print("|---|---|---|---|")
    for tag, r in results.items():
        print(
            f"| {tag} | {r['indexed_docs']} | {r['index_build_s']} "
            f"| {r['probe_s']} ± {r['probe_sd']} |"
        )
    print("| corpus | exact-index docs | exact probe s |")
    print("|---|---|---|")
    for tag, r in exact.items():
        print(f"| {tag} | {r['indexed']} | {r['probe_s']} |")
    flat = results[f"{args.copies}x"]["probe_s"] / results["1x"]["probe_s"]
    eflat = exact[f"{args.copies}x"]["probe_s"] / exact["1x"]["probe_s"]
    print(json.dumps({"copies": args.copies, "probe_ratio": round(flat, 2),
                      "exact_probe_ratio": round(eflat, 2),
                      "results": results, "exact": exact}))


if __name__ == "__main__":
    main()
