"""Per-query Spark JOB counter + wall/CPU profile for the r16
optimization round: how many jobs does one execution of a query
launch, and where does the wall time go?

Usage: python tools/job_profile.py [--runs 2] [--sf-dir ...] name...

Job ids come from the status tracker (works with spark.ui.enabled
false): the delta of ``getJobIdsForGroup(None)`` across the execution.
One JSON line per query: {"query", "jobs", "wall", "cpu", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    import bench
    from event_to_lakehouse_spark.catalog import QUERIES
    from event_to_lakehouse_spark.session import get_spark

    spark = get_spark("job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(json.dumps({"query": name, "err": "unknown"}), flush=True)
            continue
        try:
            # warm-up
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out = {"query": name, "jobs": [], "wall": [], "cpu": []}
            for r in range(runs):
                group = f"jobprofile:{name}:{r}"
                spark.sparkContext.setJobGroup(group, group)
                c0 = bench._tree_cpu_sec()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                out["wall"].append(round(time.time() - t0, 3))
                out["cpu"].append(round(bench._tree_cpu_sec() - c0, 3))
                out["jobs"].append(len(tracker.getJobIdsForGroup(group)))
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"query": name, "err": str(e)[:200]}), flush=True)
        finally:
            spark.sparkContext.setJobGroup("", "")


if __name__ == "__main__":
    main()
