"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf", "runs", "sd"}.

Each query is forced end-to-end with the noop sink (full computation,
zero driver-side collection) — the number measures the engine, not
toPandas serialization. $SPARK_GRAFT_BENCH_RUNS (default 3) timed
passes are averaged; "value" is the mean total, "sd" its standard
deviation across runs, "queries" the per-query means.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# The shipped driver-catalog surface (catalog.FINAL_CATALOG names);
# combos cover the round-1 entries they merged (e.g. events_payload_parse
# ⊇ events_json_extract, agg_multidim ⊇ agg_rollup_region_nation).
# dedup_minhash_lsh / dedup_simhash_pairs stay here by their xxhash64
# names even though the driver catalog now ships the _portable
# (md5-oracle) successors: the xxhash64 flavor is the PRODUCTION
# default — the one whose throughput matters — and keeping the name
# keeps the round-over-round per-query comparison intact.
HEADLINE = [
    "q1_pricing_summary",
    "q2_min_cost_per_part",
    "q3_shipping_priority",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "q22_untapped_segments",
    "agg_multidim",
    "agg_distinct_stats",
    "window_rank_topk",
    "window_analytics",
    "scalar_functions_suite",
    "setop_flavors",
    "events_payload_parse",
    "events_windowed_agg",
    "events_sessionize",
    "events_retention_cohorts",
    "events_funnel_conversion",
    "join_asof_prior_purchase",
    "join_range_follow_events",
    "join_basket_copurchase",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_cluster_labels",
    "dedup_embedding_neardup",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
    "text_enrich",
    "text_token_topk",
    "text_decontaminate",
    "text_chunks",
    "corpus_curation",
    "events_gap_fill",
    "multimodal_features",
    "multimodal_transform",
    "profile_documents",
    "gold_current_assets",
    "gold_asset_posture",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from event_to_lakehouse_spark.session import get_spark
    from event_to_lakehouse_spark.catalog import QUERIES  # master registry

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = QUERIES

    # Warmup, not counted: one pass at the smallest SF compiles every
    # whole-stage-codegen class (identical plan shapes), then one pass
    # at the TARGET SF pays the one-time parquet file-index listing and
    # JIT profiling — so the timed runs measure steady-state engine
    # throughput, not cold-start, and run-to-run sd stays meaningful.
    for warm_dir in ("/root/testdata/sf0.001", sf_dir):
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass  # warmup is best-effort; the timed run reports real errors

    per_query: dict[str, list[float]] = {name: [] for name in HEADLINE}
    totals: list[float] = []
    for _ in range(n_runs):
        run_total = 0.0
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            per_query[name].append(dt)
            run_total += dt
        totals.append(run_total)

    timings = {n: round(statistics.mean(v), 3) for n, v in per_query.items()}
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(statistics.mean(totals), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": n_runs,
        "sd": round(statistics.stdev(totals), 3) if n_runs > 1 else 0.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
