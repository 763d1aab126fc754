"""Optimization-round profiler: solo-time queries and dump their plans.

Usage:
  python tools/opt_profile.py [--plans-dir plans/r15] [--suffix before] \
      [--runs 3] [--sf-dir /root/testdata/sf0.1] [name ...]

For each named query (default: the bench HEADLINE list) this
 - captures ``explain("formatted")`` to <plans-dir>/<name>_<suffix>.txt
 - times ``runs`` noop-sink executions after one warm-up, printing
   per-run wall seconds and process-tree CPU seconds (bench.py's
   ``_tree_cpu_sec``), min/median over runs.

One JSON line per query goes to stdout so the numbers are easy to
collect into OPTIMIZATION_r15.md.
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
    plans_dir = REPO / "plans" / "r15"
    suffix = "before"
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans-dir":
            plans_dir = REPO / args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--runs":
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

    if not names:
        names = list(bench.HEADLINE)
    plans_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(json.dumps({"query": name, "err": "unknown"}), flush=True)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}_{suffix}.txt").write_text(plan)
            # warm-up (uncounted): pays parquet listing + codegen JIT
            df.write.format("noop").mode("overwrite").save()
            wall: list[float] = []
            cpu: list[float] = []
            for _ in range(runs):
                c0 = bench._tree_cpu_sec()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall.append(round(time.time() - t0, 3))
                cpu.append(round(bench._tree_cpu_sec() - c0, 3))
            print(
                json.dumps(
                    {
                        "query": name,
                        "wall": wall,
                        "cpu": cpu,
                        "wall_min": min(wall),
                        "cpu_min": min(cpu),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep going; report the failure
            print(
                json.dumps({"query": name, "err": str(e)[:200]}), flush=True
            )
        finally:
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
