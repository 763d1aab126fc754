"""Distributed EXACT percentile selection — the two-pass rank-selection
alternative to ``F.percentile``'s collect-all-values-per-group buffer
(VERDICT r15 #7).

``F.percentile`` (exact) is an ObjectHashAggregate whose buffer holds
EVERY value of the group; the final merge concatenates all partition
buffers into one task and sorts there — a single-task sort of the whole
column at any scale, plus object-buffer serialization through the
shuffle. Exactness forbids sketches, but an order STATISTIC does not
need a full sort: only the values at two ranks per requested quantile.

Plan shape (per call, any number of groups):

1. one columnar agg per group: ``(count, min, max)`` — sets the
   histogram geometry;
2. one map-side-combinable histogram: ``group × bucket → count`` with
   ``bucket = floor((v - min) / width)`` over ``NBUCKETS`` equi-width
   buckets (≤ groups × NBUCKETS rows cross to the driver — bounded by
   the GEOMETRY, not the data);
3. cumulative counts locate, for each target rank, its bucket and
   in-bucket offset — driver arithmetic over the histogram;
4. one stripe scan: ``group × distinct value → count`` restricted to
   the needed buckets (n/NBUCKETS-scale), walked driver-side to the
   exact order statistics.

The returned quantiles are BIT-IDENTICAL to ``F.percentile``: the
interpolation reproduces Spark's own formula — ``position =
p * (n - 1)``, ``(higher - position) * v_lo + (position - lower) *
v_hi`` — over the same IEEE doubles (CPython floats are IEEE-754
doubles with the same strict +/* semantics as the JVM), pinned by
``test_exact_percentiles_matches_spark_percentile``.

Scale: every Spark stage is a hash aggregation with map-side partials;
nothing data-sized is ever collected, sorted globally, or held in one
task. NaN values are unsupported (assert-guarded); NULLs are ignored
exactly as ``F.percentile`` ignores them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_percentiles", "NBUCKETS"]

NBUCKETS = 4096


def _spark_interp(p: float, n: int, value_at) -> float:
    """Spark's Percentile.getPercentile arithmetic, bit-for-bit:
    ``value_at(i)`` returns the 0-based i-th smallest value."""
    position = p * (n - 1)
    lower = math.floor(position)
    higher = math.ceil(position)
    v_lo = float(value_at(lower))
    if higher == lower:
        return v_lo
    v_hi = float(value_at(higher))
    return (higher - position) * v_lo + (position - lower) * v_hi


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    group_cols: list[str] | None = None,
) -> dict[tuple, list[float | None]]:
    """{group tuple: [quantile, ...]} — exact, two-pass, distributed.

    ``group_cols=None`` computes global quantiles under the key ``()``.
    A group with no non-null values maps to ``[None, ...]`` (matching
    ``F.percentile`` over an all-null group).
    """
    gcols = list(group_cols or [])
    v = F.col(value_col)
    base = df.filter(v.isNotNull())

    # pass 1: per-group geometry (over the UNfiltered frame so an
    # all-null group still shows up, mapping to [None, ...] exactly as
    # F.percentile would return NULL for it)
    geo = {
        tuple(r[c] for c in gcols): (r["_n"], r["_mn"], r["_mx"])
        for r in df.groupBy(*gcols)
        .agg(
            F.count(v).alias("_n"),
            F.min(v).alias("_mn"),
            F.max(v).alias("_mx"),
        )
        .collect()
    }
    out: dict[tuple, list[float | None]] = {}
    ranks: dict[tuple, set[int]] = {}
    widths: dict[tuple, float] = {}
    for g, (n, mn, mx) in geo.items():
        if n == 0:  # all-null group: F.percentile returns NULL
            out[g] = [None] * len(ps)
            continue
        assert not (
            isinstance(mn, float) and (math.isnan(mn) or math.isnan(mx))
        ), "exact_percentiles does not support NaN values"
        if float(mn) == float(mx):  # single distinct value (or n == 1)
            out[g] = [float(mn)] * len(ps)
            continue
        widths[g] = (float(mx) - float(mn)) / NBUCKETS
        need = set()
        for p in ps:
            position = p * (n - 1)
            need.add(math.floor(position))
            need.add(math.ceil(position))
        ranks[g] = need
    if not ranks:  # every group degenerate (or no groups at all)
        return out

    # pass 2: equi-width histogram; bucket is computed ONCE here and
    # reused verbatim in the stripe filter, so float-boundary rows can
    # never land on different sides of the two passes.
    def bucket_expr():
        expr = None
        for g, w in widths.items():
            mn = float(geo[g][1])
            b = F.least(
                F.floor((v.cast("double") - F.lit(mn)) / F.lit(w)),
                F.lit(NBUCKETS - 1),
            ).cast("int")
            if not gcols:
                return b
            cond = None
            for c, val in zip(gcols, g):
                eq = F.col(c).eqNullSafe(F.lit(val))
                cond = eq if cond is None else (cond & eq)
            expr = b if expr is None else F.when(cond, b).otherwise(expr)
        # wrap so the last group's bucket applies under its own cond too
        return expr

    live = sorted(ranks)  # groups that still need selection
    if gcols:
        gfilter = None
        for g in live:
            cond = None
            for c, val in zip(gcols, g):
                eq = F.col(c).eqNullSafe(F.lit(val))
                cond = eq if cond is None else (cond & eq)
            gfilter = cond if gfilter is None else (gfilter | cond)
        hist_base = base.filter(gfilter)
    else:
        hist_base = base
    hist = (
        hist_base.withColumn("_b", bucket_expr())
        .groupBy(*gcols, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    by_group: dict[tuple, dict[int, int]] = {}
    for r in hist:
        g = tuple(r[c] for c in gcols)
        by_group.setdefault(g, {})[r["_b"]] = r["_c"]

    # locate each rank's bucket + the cumulative count below it
    needed: dict[tuple, set[int]] = {}
    below: dict[tuple, dict[int, int]] = {}
    for g in live:
        cum = 0
        hist_g = by_group[g]
        below_g = {}
        for b in sorted(hist_g):
            below_g[b] = cum
            cum += hist_g[b]
        below[g] = below_g
        bs = sorted(hist_g)
        need_b = set()
        for r in ranks[g]:
            for b in bs:
                if below_g[b] + hist_g[b] > r:
                    need_b.add(b)
                    break
        needed[g] = need_b

    # pass 3: distinct values + counts inside the needed buckets only
    stripe_f = None
    for g in live:
        in_b = F.col("_b").isin(*[int(b) for b in needed[g]])
        if gcols:
            cond = None
            for c, val in zip(gcols, g):
                eq = F.col(c).eqNullSafe(F.lit(val))
                cond = eq if cond is None else (cond & eq)
            in_b = cond & in_b
        stripe_f = in_b if stripe_f is None else (stripe_f | in_b)
    stripe = (
        hist_base.withColumn("_b", bucket_expr())
        .filter(stripe_f)
        .groupBy(*gcols, "_b", v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    vals: dict[tuple, dict[int, list]] = {}
    for r in stripe:
        g = tuple(r[c] for c in gcols)
        vals.setdefault(g, {}).setdefault(r["_b"], []).append(
            (r["_v"], r["_c"])
        )

    for g in live:
        n = geo[g][0]
        bvals = {b: sorted(rows) for b, rows in vals[g].items()}

        def value_at(i: int, g=g, bvals=bvals):
            for b in sorted(needed[g]):
                lo = below[g][b]
                hi = lo + sum(c for _, c in bvals.get(b, []))
                if lo <= i < hi:
                    acc = lo
                    for val, c in bvals[b]:
                        acc += c
                        if acc > i:
                            return val
            raise IndexError(f"rank {i} not covered by stripe for {g}")

        out[g] = [_spark_interp(p, n, value_at) for p in ps]
    return out
