"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full computation,
zero driver-side collection) — the number measures the engine, not
toPandas serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q18_large_orders",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q21_waiting_suppliers",
    "agg_rollup_region_nation",
    "window_rank_topk",
    "events_json_extract",
    "events_tumbling_window",
    "events_sessionize",
    "events_sliding_window",
    "join_asof_prior_purchase",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_fingerprints",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
    "text_metrics",
    "text_token_topk",
    "text_bpe_tokens",
    "multimodal_features",
    "multimodal_frame_sample",
    "profile_documents",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from event_to_lakehouse_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warmup, not counted: each query once at the smallest SF compiles
    # its whole-stage-codegen classes (identical plan shape, so the
    # timed run below measures the engine, not janino compilation —
    # the 64-aggregate simhash alone costs ~9s of one-time codegen).
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the timed run reports real errors

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
