"""Z-order (Morton-curve) data clustering for multi-column file skipping.

The reference appends silver files in arrival order
(``bronze_assets_to_silver_assets.py:275-277``), so its table is
clustered by ingestion time only — a predicate on any OTHER column
reads every file. This module supplies the ``OPTIMIZE ... ZORDER BY``
capability of Delta/Iceberg on plain parquet + ``SnapshotTable``
manifests: interleave the bits of several normalized key columns into
one Morton key, range-partition + locally sort by it, and every file
ends up covering a small hyper-rectangle of the key space — so the
multi-column zone maps ``SnapshotTable(stats_cols=[...])`` records
become selective for box predicates on ANY of the clustered columns.

Scale shape (the part that matters at 100 TB):

- ONE range shuffle total (``repartitionByRange`` samples the Morton
  key, then shuffles once); the sort is partition-local. No global
  sort, no second pass.
- The Morton key itself is pure whole-stage-codegen arithmetic
  (shift/and/or over already-read columns) — no UDF, no Python.
- Column ranges for normalization come from ONE column-pruned
  min/max aggregation (a metadata-sized collect), reused for every
  row. For incremental appends, pass the table's historical ranges so
  new files land on the same curve.

Morton vs Hilbert: Hilbert has marginally better locality but needs
state-machine bit logic per level; Morton is a few shifts and ors that
stay inside codegen. Delta Lake made the same trade (OPTIMIZE ZORDER
is Morton-based interleaving of range-partition ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "column_ranges",
    "zorder_key",
    "cluster_by_zorder",
    "append_clustered",
]

ZBITS = 16  # bits per column; 16 bits x up to 4 cols stays in a long


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """Per-column (min, max) in ONE column-pruned aggregation pass.
    Metadata-sized result; at 100 TB this is the only full-scan cost
    of clustering besides the shuffle itself (and on a SnapshotTable
    it can be folded from the manifest stats instead)."""
    aggs = []
    for j, c in enumerate(cols):
        aggs += [F.min(c).alias(f"mn{j}"), F.max(c).alias(f"mx{j}")]
    r = df.agg(*aggs).first()
    return {c: (r[f"mn{j}"], r[f"mx{j}"]) for j, c in enumerate(cols)}


def zorder_key(
    cols: list[str], ranges: dict[str, tuple], bits: int = ZBITS
) -> Column:
    """Morton-interleaved key over numeric columns as a codegen-only
    Column: each column is affinely scaled to ``[0, 2^bits)`` using its
    (min, max) range, clamped (so out-of-range incremental rows still
    map onto the curve's edge), then bit ``i`` of column ``j`` lands at
    position ``i * n_cols + j`` of the key. NULL scales to 0 — nulls
    cluster together at the curve origin."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a long")
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = ranges[c]
        mn_d, mx_d = float(mn), float(mx)
        span = mx_d - mn_d
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        s = (F.col(c).cast("double") - F.lit(mn_d)) * F.lit(top / span)
        s = F.least(F.lit(float(top)), F.greatest(F.lit(0.0), s))
        scaled.append(F.coalesce(s.cast("long"), F.lit(0).cast("long")))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            key = key + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    ranges: dict[str, tuple] | None = None,
    bits: int = ZBITS,
) -> DataFrame:
    """Rewrite ``df``'s physical layout along the Morton curve:
    range-partition on the key (one shuffle; contiguous curve segments
    per output file) and sort within each partition (local, spillable)
    so parquet row-group stats tighten too. The key column is dropped
    before write — layout is physical, the schema is unchanged."""
    if ranges is None:
        ranges = column_ranges(df, cols)
    z = df.withColumn("_zkey", zorder_key(cols, ranges, bits))
    return (
        z.repartitionByRange(num_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def append_clustered(
    table,
    df: DataFrame,
    cols: list[str],
    num_files: int,
    ranges: dict[str, tuple] | None = None,
    bits: int = ZBITS,
    batch_token: str | None = None,
):
    """Cluster ``df`` by Z-order and append it to a ``SnapshotTable``
    whose ``stats_cols`` should cover ``cols`` — the write-side half of
    multi-column skipping: clustering makes each file's per-column
    [min, max] narrow, so ``table.read(where={...})`` box pruning
    actually excludes files. Pass ``ranges`` (e.g. from a previous
    snapshot's manifests) to keep incremental appends on the same
    curve as the existing data."""
    return table.append(
        cluster_by_zorder(df, cols, num_files, ranges, bits),
        batch_token=batch_token,
    )
