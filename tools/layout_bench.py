"""Quantify the single-row-group scan tax (SCALING.md, VERDICT r3 #3).

The driver-generated testdata stores each table as ONE parquet file
with ONE row group, so every base scan is single-task no matter how
many cores exist. This tool rewrites the tables through the
``storage/compaction.py`` sizing (bin-packed multi-file layout — what
this engine would itself write) into scratch, then runs the bench
HEADLINE loop against BOTH layouts in one session, so the layout tax
is measured instead of being folded into every bench number.

Usage: python tools/layout_bench.py [--target-mb 1] [--runs 2] [sf_dir]
Prints one JSON line:
  {"driver_layout_sec", "split_layout_sec", "tax_pct", "files": {...}}
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import HEADLINE  # noqa: E402
from event_to_lakehouse_spark.session import get_spark  # noqa: E402
from event_to_lakehouse_spark.storage.compaction import (  # noqa: E402
    plan_output_files,
)
from event_to_lakehouse_spark.tables import TABLES, table  # noqa: E402


def rewrite_split(spark, sf_dir: str, out_dir: Path, target_bytes: int) -> dict:
    """Rewrite each table into its compaction-sized file count. The
    testdata is table-per-file, so input bytes = that file's size."""
    files = {}
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        src = Path(sf_dir) / f"{name}.parquet"
        n_out = plan_output_files(src.stat().st_size, target_bytes)
        dst = out_dir / f"{name}.parquet"
        if dst.exists():
            shutil.rmtree(dst)
        table(spark, sf_dir, name).repartition(n_out).write.parquet(str(dst))
        files[name] = n_out
    return files


def run_headline(spark, qs, sf_dir: str, runs: int) -> float:
    for name in HEADLINE:  # warm: compile plans against this layout
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    totals = []
    for _ in range(runs):
        t_run = 0.0
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_run += time.time() - t0
        totals.append(t_run)
    return min(totals)  # min-of-runs: least-noise estimate of the floor


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        k: v
        for k, v in (a[2:].split("=") for a in sys.argv[1:] if a.startswith("--"))
    }
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    target_mb = float(opts.get("target-mb", "1"))
    runs = int(opts.get("runs", "2"))

    from event_to_lakehouse_spark.catalog import QUERIES

    spark = get_spark("layout-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = REPO / ".scratch" / f"split-{Path(sf_dir).name}"
    files = rewrite_split(spark, sf_dir, scratch, int(target_mb * 1024 * 1024))

    driver_sec = run_headline(spark, QUERIES, sf_dir, runs)
    split_sec = run_headline(spark, QUERIES, str(scratch), runs)

    print(
        json.dumps(
            {
                "driver_layout_sec": round(driver_sec, 3),
                "split_layout_sec": round(split_sec, 3),
                "tax_pct": round(100 * (driver_sec - split_sec) / split_sec, 1),
                "target_mb": target_mb,
                "runs": runs,
                "files": files,
            }
        )
    )


if __name__ == "__main__":
    main()
