"""10x scale probe: measure runtime growth of the headline queries on a
synthetic 10x corpus (SCALING.md's method, now reusable).

Builds the 10x corpus by self-unioning the sf0.1 fact tables K=10 times
with per-copy key offsets (orderkeys, event/doc/vec ids and user ids
shifted so join keys, sessionization keys, and dedup keys stay
realistic; dimension tables unchanged), writes it to scratch once, then
times each probe query warm (noop sink, steady state) at sf0.1 vs 10x.

Usage: python tools/scale_probe.py [--copies 10] [--runs 2]
Prints one markdown table row per query plus a final JSON line.
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

BASE = "/root/testdata/sf0.1"
SCRATCH = "/tmp/scale_probe"

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table -> columns to offset per copy (offset = copy * stride)
FACTS = {
    "orders": {"o_orderkey": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "window_analytics",
    "agg_multidim",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "text_enrich",
    "text_repetition_filter",
    "corpus_domain_mix",
    "events_heavyhitters_cm",
    "dedup_cluster_labels",
    "corpus_curation",
    "ann_lsh_bucketed_topk",
    "dedup_embedding_neardup",
    "events_windowed_agg",
    "gold_asset_posture",
]


def build_corpus(spark, copies: int, salt: bool = False) -> str:
    """``salt=True`` keeps the DUPLICATION RATE constant instead of
    planting ``copies`` near-identical twins of every doc: each copy's
    words get a per-copy suffix (every shingle differs across copies →
    zero cross-copy Jaccard) and its embedding is circularly shifted by
    the copy index (random vectors under a permutation are ~orthogonal
    → no cross-copy cosine pairs). Unsalted, pair counts necessarily
    grow ~quadratically in ``copies`` because the corpus BY
    CONSTRUCTION holds ``copies`` duplicates of everything — that probes
    output-explosion behavior; salted probes pure corpus scaling."""
    out = Path(SCRATCH) / (f"x{copies}-salt" if salt else f"x{copies}")
    if (out / "_DONE").exists():
        return str(out)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    for t in DIMS:
        shutil.copy(f"{BASE}/{t}.parquet", out / f"{t}.parquet")
    for t, offsets in FACTS.items():
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(copies):
            df = base
            for col, stride in offsets.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * stride))
            if salt and i > 0 and t == "documents":
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1c{i}")
                )
            if salt and i > 0 and t == "embeddings":
                dim = len(base.first()["embedding"])
                k = i % dim or 1
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", k + 1, dim - k),
                        F.slice("embedding", 1, k),
                    ),
                )
            parts.append(df)
        un = parts[0]
        for p in parts[1:]:
            un = un.unionByName(p)
        # single parquet file per table to mirror the testdata layout
        un.coalesce(max(1, copies // 2)).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    (out / "_DONE").touch()
    return str(out)


def time_query(qs, name, spark, sf_dir, runs) -> float:
    # warm once (file-index listing + codegen), then time `runs` passes
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    return statistics.mean(ts)


def _auto_neardup(spark, sf_dir):
    """The embedding near-dup with its PRODUCTION knobs — n_bits
    auto-derived from the corpus count (the registry entry pins n_bits
    for oracle determinism, so the auto path needs its own probe)."""
    from event_to_lakehouse_spark.similarity.ann import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb.select("vec_id", "embedding"))


def _pagerank_support2(spark, sf_dir):
    """PageRank with the production densification knob (min_support=2):
    the 10× corpus multiplies orders over a FIXED part catalog, so the
    support-1 co-purchase graph saturates toward completeness; support
    thresholds are how a real pipeline keeps the graph signal-sparse."""
    from event_to_lakehouse_spark.operators.graph import (
        _copurchase_edges,
        pagerank,
    )

    return pagerank(_copurchase_edges(spark, sf_dir, min_support=2))


def _triangles_support2(spark, sf_dir):
    from event_to_lakehouse_spark.operators.graph import (
        _copurchase_edges,
        triangle_counts,
    )

    return triangle_counts(_copurchase_edges(spark, sf_dir, min_support=2))


def _linkpred_capped(spark, sf_dir):
    """Link prediction with the hub-degree cap engaged (the wedge-
    volume control measured against the uncapped registry entry)."""
    from event_to_lakehouse_spark.operators.graph import (
        _copurchase_edges,
        link_prediction,
    )

    return link_prediction(
        _copurchase_edges(spark, sf_dir), max_center_degree=150
    )


def _linkpred_support_scaled(spark, sf_dir):
    """The volume-relative support posture: the registry entry pins
    support=2 (right at sf0.1); on a corpus where every basket repeats
    K times, any FIXED support threshold degenerates to the support-1
    graph (measured: 33.5× on the 10× duplicate corpus), so the
    production knob scales with duplication — support = 2 × K recovers
    the sf0.1 signal graph exactly. $SPARK_GRAFT_PROBE_SUPPORT sets K×2
    (default 20 for the 10× corpus)."""
    import os

    from event_to_lakehouse_spark.operators.graph import (
        LP_CAP,
        _copurchase_edges,
        link_prediction,
    )

    support = int(os.environ.get("SPARK_GRAFT_PROBE_SUPPORT", "20"))
    return link_prediction(
        _copurchase_edges(spark, sf_dir, min_support=support),
        max_center_degree=LP_CAP,
    )


EXTRA_QUERIES = {
    "embedding_neardup_auto": _auto_neardup,
    "graph_pagerank_support2": _pagerank_support2,
    "graph_triangles_support2": _triangles_support2,
    "graph_linkpred_cap150": _linkpred_capped,
    "graph_linkpred_support_scaled": _linkpred_support_scaled,
}


def _index_build_probes():
    """BUILD-phase probes for the durable-index entries (VERDICT r13
    #5): SCALING.md's query rows cover serving; these time the
    one-per-corpus index CONSTRUCTION (train + two exactly-once
    batch commits) — expected ~linear map-side work (encode/tokenize)
    over a sub-linear shuffle (posting/cell groupBy keyed on
    vocabulary/cells, not corpus rows). Each call builds into a fresh
    temp root so commits are real, never replay no-ops, and RETURNS
    the root so ``time_build`` can rmtree it off the clock (ADVICE
    r14: repeated --builds runs were accumulating full index copies
    in /tmp)."""
    import tempfile

    from event_to_lakehouse_spark import textindex as ti
    from event_to_lakehouse_spark.similarity import ivfpq as iv
    from event_to_lakehouse_spark.similarity import pq

    def ivfpq_build(spark, sf_dir):
        root = tempfile.mkdtemp(prefix="probe_ivfpq_")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        idx = iv.IVFPQIndex.build(
            spark,
            root,
            train=emb,
            train_iters=pq.PQ_TRAIN_ITERS,
            coarse_iters=iv.COARSE_TRAIN_ITERS,
        )
        idx.add_batch(emb.filter(F.col("vec_id") % 2 == 0), batch_token="even")
        idx.add_batch(emb.filter(F.col("vec_id") % 2 == 1), batch_token="odd")
        return root

    def bm25_build(spark, sf_dir):
        root = tempfile.mkdtemp(prefix="probe_inv_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        idx = ti.InvertedIndex(spark, root)
        idx.add_batch(docs.filter(F.col("doc_id") % 2 == 0), batch_token="even")
        idx.add_batch(docs.filter(F.col("doc_id") % 2 == 1), batch_token="odd")
        return root

    return {
        "ivfpq_index_build": ivfpq_build,
        "bm25_index_build": bm25_build,
    }


def time_build(fn, spark, sf_dir, runs) -> float:
    """Builds are eager (commits run on call): one untimed warm pass
    (codegen + file-index listing), then the mean of ``runs`` timed
    fresh builds. Each build returns its temp index root, which is
    rmtree'd OUTSIDE the timed region (ADVICE r14: roots were leaking
    into /tmp; deleting inside the clock would bias the 10x/30x
    ratios since delete cost scales with index size)."""
    import shutil

    shutil.rmtree(fn(spark, sf_dir), ignore_errors=True)
    ts = []
    for _ in range(runs):
        t0 = time.time()
        root = fn(spark, sf_dir)
        ts.append(time.time() - t0)
        shutil.rmtree(root, ignore_errors=True)
    return statistics.mean(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=PROBE_QUERIES)
    ap.add_argument(
        "--salt", action="store_true",
        help="constant-duplication corpus (see build_corpus): probes "
        "pure corpus scaling instead of output explosion",
    )
    ap.add_argument(
        "--counts", action="store_true",
        help="also record result row counts at both scales (for the "
        "dedup/ANN family these are the PAIR counts — the quantity "
        "that must not grow super-linearly)",
    )
    ap.add_argument(
        "--builds", action="store_true",
        help="probe the durable-index BUILD phases (IVFPQ + BM25) "
        "instead of queries (VERDICT r13 #5)",
    )
    args = ap.parse_args()

    from event_to_lakehouse_spark.session import get_spark
    from event_to_lakehouse_spark.catalog import QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = build_corpus(spark, args.copies, salt=args.salt)

    if args.builds:
        rows = {}
        print("| build | sf0.1 s | " + f"{args.copies}x s | ratio |")
        print("|---|---|---|---|")
        for name, fn in _index_build_probes().items():
            t1 = time_build(fn, spark, BASE, args.runs)
            t10 = time_build(fn, spark, big, args.runs)
            rows[name] = {
                "base_s": round(t1, 2),
                "big_s": round(t10, 2),
                "ratio": round(t10 / t1, 1) if t1 > 0 else None,
            }
            r = rows[name]
            print(f"| {name} | {r['base_s']} | {r['big_s']} | {r['ratio']} |")
        print(json.dumps({"copies": args.copies, "runs": args.runs,
                          "salt": args.salt, "builds": rows}))
        return

    qs = dict(QUERIES)
    qs.update(EXTRA_QUERIES)

    rows = {}
    hdr = ["query", "sf0.1 s", f"{args.copies}x s", "ratio"]
    if args.counts:
        hdr += ["rows @1x", f"rows @{args.copies}x", "rows ratio"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for name in args.queries:
        t1 = time_query(qs, name, spark, BASE, args.runs)
        t10 = time_query(qs, name, spark, big, args.runs)
        rows[name] = {
            "base_s": round(t1, 2),
            "big_s": round(t10, 2),
            "ratio": round(t10 / t1, 1) if t1 > 0 else None,
        }
        r = rows[name]
        cells = [name, r["base_s"], r["big_s"], r["ratio"]]
        if args.counts:
            n1 = qs[name](spark, BASE).count()
            n10 = qs[name](spark, big).count()
            r["rows_base"] = n1
            r["rows_big"] = n10
            r["rows_ratio"] = round(n10 / n1, 1) if n1 else None
            cells += [n1, n10, r["rows_ratio"]]
        print("| " + " | ".join(str(c) for c in cells) + " |")
    print(json.dumps({"copies": args.copies, "runs": args.runs,
                      "salt": args.salt, "queries": rows}))


if __name__ == "__main__":
    main()
