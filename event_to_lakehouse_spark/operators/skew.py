"""Skew mitigation: salted aggregation and salted joins.

AQE (`spark.sql.adaptive.skewJoin`) splits skewed SORT-MERGE partitions
automatically, and broadcast joins sidestep skew entirely — those are
the defaults this engine relies on. Salting is the remaining tool for
the cases AQE does not cover:

- **hot-key aggregation**: one key holding >> 1/partitions of the rows
  makes a single reducer the straggler even with map-side partials
  (partials only combine within a task). ``salted_agg`` shards each
  key across ``n_salt`` reducers, then combines shards — two small
  shuffles instead of one stalled one.
- **hot-key equi-join** where neither side broadcasts: ``salted_join``
  replicates the smaller side ``n_salt``× with an explicit salt column
  and shards the big side deterministically (hash of the row's join
  payload — no rand(), so retries/speculative tasks stay consistent).

Both preserve exact results (tests pin salted == unsalted); they only
change the shuffle key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16

# Aggregates that re-combine losslessly from per-shard partials.
_COMBINABLE = {"sum", "count", "min", "max"}


def _salt_col(df: DataFrame, n_salt: int) -> Column:
    """Deterministic shard id: hash over every column (stable across
    retries, unlike rand()); uniform because xxhash64 mixes well."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column → (fn, input column), fn in
    {sum, count, min, max} (the partial-recombinable set; avg = sum +
    count composed by the caller). Stage 1 aggregates per (keys, salt)
    — the hot key fans out over ``n_salt`` reducers; stage 2 combines
    shards per key (count shards re-combine by SUM)."""
    for out, (fn, _src) in aggs.items():
        if fn not in _COMBINABLE:
            raise ValueError(f"{out}: {fn!r} not in {sorted(_COMBINABLE)}")

    salted = df.withColumn("_salt", _salt_col(df, n_salt))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(src).alias(out)
            for out, (fn, src) in aggs.items()
        ]
    )
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    return stage1.groupBy(*keys).agg(
        *[
            getattr(F, recombine[fn])(out).alias(out)
            for out, (fn, _src) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys sharded over ``n_salt``
    reducers. The small side is replicated ``n_salt``× (explode over a
    literal salt array — cheap for dimension-scale inputs; if the small
    side broadcasts, use ``broadcast()`` instead of salting at all)."""
    big_salted = big.withColumn("_salt", _salt_col(big, n_salt))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_salted.join(small_rep, on + ["_salt"], how)
    return out.drop("_salt")
