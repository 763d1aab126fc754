"""Statistical analytics over the events stream: per-key OLS trend,
day-of-week seasonal decomposition, and a chi-square independence
test (SURVEY §2 "beyond the reference" analytics tier).

All three are built on the SUFFICIENT-STATISTICS pattern: every
estimator is derived from exact integer sums (n, Σx, Σy, Σxy, Σx²,
Σy²) that Spark partial-aggregates map-side, so at 100 TB each query
is one scan + one key-cardinality shuffle of tiny partial states —
the same mergeability story as the sketch family
(``operators/sketches.py``). It also makes the oracles exact: the
integer sums are bit-identical across engines, and each derived
value is a FIXED expression tree of IEEE divisions/sqrt over them,
so both engines produce the same double to well past round(4) —
no reliance on engine-internal ``stddev``/``regr_*`` algorithms
(DuckDB and Spark implement those with different summation orders).

Operators:

- ``events_trend_ols`` — per-event-type linear trend of daily counts
  (closed-form OLS slope / intercept / r² from the six sums).
- ``events_seasonal_adjust`` — day-of-week seasonal profile (mean/sd
  per weekday from exact sums), per-day residual and z-score, 2σ
  anomaly flag. Complements ``events_anomaly_zscore`` (trailing
  window z) with the calendar-profile decomposition.
- ``stats_chisq_independence`` — chi-square test of event_type ×
  weekday: per-cell observed/expected/contribution plus the total
  statistic. The contingency table is key-cardinality (types ×
  7), so the test costs one scan regardless of corpus size.

Weekday convention: DuckDB's ``dayofweek`` is Sunday=0, Spark's is
Sunday=1 — both sides normalize to Sunday=0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query

# Daily counts per event type, as shared CTE text (DuckDB).
_DAILY_BY_TYPE = """
    daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
               count(*) AS y
        FROM events
        GROUP BY 1, 2
    )
"""


def _daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("x"),
    ).agg(F.count("*").alias("y"))


@query(
    "events_trend_ols",
    f"""
    WITH {_DAILY_BY_TYPE},
    sums AS (
        SELECT event_type,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM daily GROUP BY 1
    )
    SELECT event_type, n AS n_days, CAST(sy AS BIGINT) AS total_events,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 4)
           END AS slope,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round((CAST(sy AS DOUBLE)
                            - (CAST(n * sxy - sx * sy AS DOUBLE)
                               / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                           / CAST(n AS DOUBLE), 4)
           END AS intercept,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
                ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)
                            * CAST(n * sxy - sx * sy AS DOUBLE))
                           / (CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 4)
           END AS r2
    FROM sums
    """,
)
def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of daily volume, closed form.

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over exact BIGINT sums —
    one scan, one small shuffle of six-number partials per type. The
    same partials roll up across days/files/batches unchanged, which
    is how the trend would be maintained incrementally at 100 TB.
    """
    return trend_from_partials(trend_partials(_daily_by_type(spark, sf_dir)))


def trend_partials(daily: DataFrame) -> DataFrame:
    """The mergeable sufficient-statistics state: six exact BIGINT
    sums per key. Partials from disjoint day batches merge by summing
    column-wise (``merge_trend_partials``) — the incremental-
    maintenance contract ``test_trend_partials_merge_equals_full``
    pins as an exact (not approximate) equality."""
    x, y = F.col("x"), F.col("y")
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )


def merge_trend_partials(*parts: DataFrame) -> DataFrame:
    """Combine per-batch partial states: column-wise sums per key."""
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
    )


def trend_from_partials(sums: DataFrame) -> DataFrame:
    """Finisher: closed-form OLS from the six-sum state.

    Overflow discipline (ADVICE r5): ``cov_n``/``var_xn``/``var_yn``
    stay exact int64 (bounded by n·Σx² ≪ 2⁶³ at any plausible daily
    volume), but their PRODUCTS are cast to double BEFORE multiplying —
    cov_n² alone exceeds int64 once daily counts reach ~1e6, and Spark
    (non-ANSI) would wrap silently where DuckDB promotes to HUGEINT.
    Zero guards (single-day keys: var_xn = 0) run on the exact integer
    and NULL out slope/intercept/r2 identically in both engines."""
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy  # n² × cov, exact
    var_xn = n * sxx - sx * sx  # n² × var(x), exact
    var_yn = n * syy - sy * sy
    cov_d, vx_d, vy_d = (c.cast("double") for c in (cov_n, var_xn, var_yn))
    slope = cov_d / vx_d
    null_d = F.lit(None).cast("double")
    return sums.select(
        "event_type",
        n.alias("n_days"),
        sy.alias("total_events"),
        F.when(var_xn == 0, null_d).otherwise(F.round(slope, 4)).alias("slope"),
        F.when(var_xn == 0, null_d)
        .otherwise(
            F.round(
                (sy.cast("double") - slope * sx.cast("double")) / n.cast("double"), 4
            )
        )
        .alias("intercept"),
        F.when((var_xn == 0) | (var_yn == 0), null_d)
        .otherwise(F.round((cov_d * cov_d) / (vx_d * vy_d), 4))
        .alias("r2"),
    )


@query(
    "events_seasonal_adjust",
    """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d, count(*) AS c
        FROM events GROUP BY 1
    ),
    typed AS (SELECT d, c, dayofweek(d) AS dow FROM daily),
    prof AS (
        SELECT dow, count(*) AS n, sum(c) AS s, sum(c * c) AS ss
        FROM typed GROUP BY 1
    )
    SELECT t.d AS day, t.dow, t.c AS cnt,
           round(CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE), 4) AS dow_mean,
           round(CAST(t.c AS DOUBLE)
                 - CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE), 4) AS resid,
           CASE WHEN p.n < 2
                  OR CAST(p.n AS DOUBLE) * CAST(p.ss AS DOUBLE)
                     - CAST(p.s AS DOUBLE) * CAST(p.s AS DOUBLE) = 0 THEN NULL
                ELSE round((CAST(t.c AS DOUBLE) - CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE))
                           / sqrt((CAST(p.n AS DOUBLE) * CAST(p.ss AS DOUBLE)
                                   - CAST(p.s AS DOUBLE) * CAST(p.s AS DOUBLE))
                                  / (CAST(p.n AS DOUBLE) * (CAST(p.n AS DOUBLE) - 1))), 4)
           END AS zscore
    FROM typed t JOIN prof p ON p.dow = t.dow
    """,
)
def events_seasonal_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily event volume.

    The weekday profile (mean, sample sd) comes from exact integer
    sums — a 7-row broadcast side — so the residual/z-score join is
    scan-local. resid is the seasonally adjusted series; |z| > 2 is
    the anomaly criterion (left to the caller; the z-score column
    carries it deterministically).
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(F.count("*").alias("c"))
    typed = daily.select("d", "c", (F.dayofweek("d") - 1).cast("long").alias("dow"))
    prof = typed.groupBy("dow").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    n, s, ss, c = F.col("n"), F.col("s"), F.col("ss"), F.col("c")
    mean = s.cast("double") / n.cast("double")
    # var_num is formed in DOUBLE, not int64 (ADVICE r5): s·s wraps in
    # Spark's non-ANSI int64 once per-weekday count sums reach ~3e9,
    # while DuckDB promotes to HUGEINT — the double form (same IEEE op
    # order both sides) is divergence-free at any volume.
    var_num = n.cast("double") * ss.cast("double") - s.cast("double") * s.cast("double")
    sd = F.sqrt(var_num / (n.cast("double") * (n.cast("double") - 1)))
    return typed.join(F.broadcast(prof), "dow").select(
        F.col("d").alias("day"),
        "dow",
        c.alias("cnt"),
        F.round(mean, 4).alias("dow_mean"),
        F.round(c.cast("double") - mean, 4).alias("resid"),
        F.when((n < 2) | (var_num == 0), F.lit(None).cast("double"))
        .otherwise(F.round((c.cast("double") - mean) / sd, 4))
        .alias("zscore"),
    )


@query(
    "stats_chisq_independence",
    """
    WITH obs AS (
        SELECT event_type, dayofweek(date_trunc('day', ts)) AS dow,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, dow, o,
               sum(o) OVER (PARTITION BY event_type) AS rt,
               sum(o) OVER (PARTITION BY dow) AS ct,
               sum(o) OVER () AS n
        FROM obs
    ),
    cells AS (
        SELECT event_type, dow, o,
               CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS exp_cnt
        FROM tot
    )
    SELECT event_type, dow, o AS observed,
           round(exp_cnt, 4) AS expected,
           round((CAST(o AS DOUBLE) - exp_cnt) * (CAST(o AS DOUBLE) - exp_cnt)
                 / exp_cnt, 6) AS contrib,
           round(sum((CAST(o AS DOUBLE) - exp_cnt) * (CAST(o AS DOUBLE) - exp_cnt)
                     / exp_cnt) OVER (), 4) AS chi2_total
    FROM cells
    """,
)
def stats_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: event_type × weekday.

    The contingency table is (types × 7) rows after one scan, so the
    window sums that produce row/column/grand totals and the final
    statistic all run on a metadata-scale frame — the test is free
    at any corpus size once the groupBy lands. Expected counts are a
    fixed expression over exact integers (rt·ct/n); contributions
    and the total are the usual Pearson terms.
    """
    e = load_tables(spark, sf_dir)["events"]
    obs = e.groupBy(
        "event_type",
        (F.dayofweek(F.date_trunc("day", "ts")) - 1).cast("long").alias("dow"),
    ).agg(F.count("*").alias("o"))
    o = F.col("o")
    tot = (
        obs.withColumn("rt", F.sum(o).over(Window.partitionBy("event_type")))
        .withColumn("ct", F.sum(o).over(Window.partitionBy("dow")))
        .withColumn("n", F.sum(o).over(Window.partitionBy()))
    )
    exp_cnt = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast("double")
    cells = tot.withColumn("exp_cnt", exp_cnt)
    contrib = (o.cast("double") - F.col("exp_cnt")) * (
        o.cast("double") - F.col("exp_cnt")
    ) / F.col("exp_cnt")
    return cells.select(
        "event_type",
        "dow",
        o.alias("observed"),
        F.round("exp_cnt", 4).alias("expected"),
        F.round(contrib, 6).alias("contrib"),
        F.round(F.sum(contrib).over(Window.partitionBy()), 4).alias("chi2_total"),
    )


@query(
    "events_interarrival_stats",
    """
    WITH seq AS (
        SELECT event_type, epoch_us(ts) AS t,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS pt
        FROM events
    ),
    gaps AS (SELECT event_type, t - pt AS gap FROM seq WHERE pt IS NOT NULL)
    SELECT event_type, count(*) AS n_gaps,
           round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 / 1000000.0, 4) AS avg_gap_s,
           round(median(gap) / 1000000.0, 4) AS med_gap_s,
           round(quantile_cont(gap, 0.9) / 1000000.0, 4) AS p90_gap_s
    FROM gaps GROUP BY 1
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: mean / median /
    p90 of the gap between consecutive events (the arrival-process
    profile behind rate limiting, anomaly baselines, and session
    tuning).

    Gaps are EXACT integer microseconds from a lag window ordered by
    (ts, event_id) — the id tiebreak makes the sequence, and therefore
    every gap, deterministic under equal timestamps. One shuffle
    (partition by type), sort within partition; the quantiles are the
    exact sort-aggregate flavor (`quantile_cont` ↔ `F.percentile`,
    the proven-parity pair) — at 100 TB the sketch path swaps in
    ``approx_percentile`` / the mergeable histogram sketch unchanged.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.lag(F.unix_micros("ts")).over(w).alias("pt"),
    )
    gaps = seq.where(F.col("pt").isNotNull()).select(
        "event_type", (F.col("t") - F.col("pt")).alias("gap")
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(
            F.sum("gap").cast("double") / F.count("*").cast("double") / 1000000.0, 4
        ).alias("avg_gap_s"),
        F.round(F.median("gap") / 1000000.0, 4).alias("med_gap_s"),
        F.round(F.percentile("gap", F.lit(0.9)) / 1000000.0, 4).alias("p90_gap_s"),
    )


_CORR_VARS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pair_sql(a: str, b: str) -> str:
    """One correlation-matrix row from the shared sufficient sums."""
    num = f"(n * s_{a}_{b} - s_{a} * s_{b})"
    da = f"(n * s_{a}_{a} - s_{a} * s_{a})"
    db = f"(n * s_{b}_{b} - s_{b} * s_{b})"
    return (
        f"SELECT '{a}' AS var_a, '{b}' AS var_b, n,"
        f" round({num} / sqrt({da} * {db}), 4) AS corr FROM sums"
    )


@query(
    "stats_corr_matrix",
    """
    WITH sums AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
    """
    + ",\n".join(
        f"           sum({a}) AS s_{a}" for a in _CORR_VARS
    )
    + ",\n"
    + ",\n".join(
        f"           sum({a} * {b}) AS s_{a}_{b}"
        for i, a in enumerate(_CORR_VARS)
        for b in _CORR_VARS[i:]
    )
    + """
        FROM lineitem
    )
    """
    + "\n    UNION ALL ".join(
        _corr_pair_sql(a, b)
        for i, a in enumerate(_CORR_VARS)
        for b in _CORR_VARS[i + 1 :]
    ),
)
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the lineitem measures,
    from ONE scan of shared sufficient statistics (n, Σx per var,
    Σxy per pair) — 15 running sums total, map-side combinable, so
    the whole matrix costs a single reduce of one 15-number state at
    any corpus size. Engine-native ``corr()`` is deliberately avoided:
    DuckDB and Spark implement it with different recurrences
    (single-pass covariance updates), while the textbook
    (nΣxy − ΣxΣy)/√(…) form over identically-ordered IEEE sums is
    stable to round(4) cross-engine (the subtraction's cancellation
    error is ~1e-8 relative at these magnitudes — analyzed, not
    guessed). The upper triangle is emitted as rows (var_a < var_b
    in declaration order)."""
    t = load_tables(spark, sf_dir)["lineitem"]
    aggs = [F.count("*").cast("double").alias("n")]
    aggs += [F.sum(a).alias(f"s_{a}") for a in _CORR_VARS]
    aggs += [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}")
        for i, a in enumerate(_CORR_VARS)
        for b in _CORR_VARS[i:]
    ]
    sums = t.agg(*aggs)
    # ONE aggregate branch: a union of per-pair selects over `sums`
    # would make Catalyst plan six independent scans of lineitem
    # (column pruning specializes each branch, defeating
    # ReuseExchange — verified in the executed plan), so the six
    # matrix rows are built as a literal struct array over the single
    # sums row and exploded.
    n = F.col("n")
    pair_structs = []
    for i, a in enumerate(_CORR_VARS):
        for b in _CORR_VARS[i + 1 :]:
            num = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            da = n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
            db = n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    n.alias("n"),
                    F.round(num / F.sqrt(da * db), 4).alias("corr"),
                )
            )
    return sums.select(F.explode(F.array(*pair_structs)).alias("r")).select(
        "r.var_a", "r.var_b", "r.n", "r.corr"
    )


@query(
    "events_user_entropy",
    """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    t AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS tot,
               count(*) AS n_types
        FROM c GROUP BY 1
    )
    SELECT t.user_id, t.n_types, t.tot AS n_events,
           round(-sum((CAST(c.c AS DOUBLE) / CAST(t.tot AS DOUBLE))
                      * ln(CAST(c.c AS DOUBLE) / CAST(t.tot AS DOUBLE))), 4)
             AS entropy,
           CASE WHEN t.n_types = 1 THEN NULL
                ELSE round(-sum((CAST(c.c AS DOUBLE) / CAST(t.tot AS DOUBLE))
                                * ln(CAST(c.c AS DOUBLE) / CAST(t.tot AS DOUBLE)))
                           / ln(CAST(t.n_types AS DOUBLE)), 4)
           END AS norm_entropy
    FROM c JOIN t ON t.user_id = c.user_id
    GROUP BY t.user_id, t.n_types, t.tot
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity signal (bot/burst detection, engagement
    scoring, the label-diversity gauge a curation pass uses on
    category columns). norm_entropy divides by ln(n_types) to land in
    [0, 1] regardless of how many types the user touches
    (single-type users have zero entropy and an undefined
    normalization → NULL).

    Shape: two key-cardinality groupBys ((user, type) then user) and
    a broadcast-sized join back — counts are exact integers, entropy
    is a fixed -Σ p·ln p expression over them, so cross-engine values
    agree to round(4) (the inner sum is over ≤ |event types| terms).
    """
    e = load_tables(spark, sf_dir)["events"]
    c = (
        e.where(F.col("user_id").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
    )
    t = c.groupBy("user_id").agg(
        F.sum("c").alias("tot"), F.count("*").alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("tot").cast("double")
    ent = -F.sum(p * F.log(p))
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "n_types", "tot")
        .agg(
            F.round(ent, 4).alias("entropy"),
            F.when(F.col("n_types") == 1, F.lit(None).cast("double"))
            .otherwise(F.round(ent / F.log(F.col("n_types").cast("double")), 4))
            .alias("norm_entropy"),
        )
        .select(
            "user_id",
            "n_types",
            F.col("tot").alias("n_events"),
            "entropy",
            "norm_entropy",
        )
    )
