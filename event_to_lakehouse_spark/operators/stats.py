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


@query(
    "events_autocorr_lag1",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
               count(*) AS y
        FROM events
        GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type, y,
               lag(y) OVER (PARTITION BY event_type ORDER BY x) AS py
        FROM daily
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(py) AS DOUBLE) AS sp,
               CAST(sum(y * py) AS DOUBLE) AS syp,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(py * py) AS DOUBLE) AS spp
        FROM seq WHERE py IS NOT NULL GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n * syy - sy * sy = 0 OR n * spp - sp * sp = 0 THEN NULL
                ELSE round((n * syp - sy * sp)
                           / sqrt((n * syy - sy * sy) * (n * spp - sp * sp)), 4)
           END AS autocorr_lag1
    FROM s
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily event volume per type — the
    persistence signal behind burst detection and forecasting-model
    choice (near 0: memoryless; near 1: trending/level shifts).

    Pairs (y_t, y_{t-1}) come from a lag window over the OBSERVED-day
    series (missing days are skipped, not zero-filled — compose with
    ``events_gap_fill`` upstream for the calendar-regular variant);
    the correlation is the textbook Pearson form over per-type sums.
    Following the r5 overflow advisory, every sum is cast to double
    BEFORE any product is formed (n·Σy² wraps int64 once daily counts
    reach ~1e6 at 100 TB volume), and both engines evaluate the same
    IEEE expression tree, so round(4) parity is exact. Shape: one scan
    → day groupBy → a types-cardinality window → a types-cardinality
    final agg; nothing fact-sized crosses the wire twice.
    """
    daily = _daily_by_type(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("x")
    seq = daily.select(
        "event_type", "y", F.lag("y").over(w).alias("py")
    ).where(F.col("py").isNotNull())
    y, py = F.col("y"), F.col("py")
    s = seq.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(py).cast("double").alias("sp"),
        F.sum(y * py).cast("double").alias("syp"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(py * py).cast("double").alias("spp"),
    )
    n, sy, sp = F.col("n"), F.col("sy"), F.col("sp")
    syp, syy, spp = F.col("syp"), F.col("syy"), F.col("spp")
    vy = n * syy - sy * sy
    vp = n * spp - sp * sp
    return s.select(
        "event_type",
        n.cast("long").alias("n_pairs"),
        F.when((vy == 0) | (vp == 0), F.lit(None).cast("double"))
        .otherwise(F.round((n * syp - sy * sp) / F.sqrt(vy * vp), 4))
        .alias("autocorr_lag1"),
    )


MW_TYPE_A = "click"
MW_TYPE_B = "purchase"


@query(
    "stats_mannwhitney_value",
    f"""
    WITH pooled AS (
        SELECT event_type, value, event_id
        FROM events
        WHERE event_type IN ('{MW_TYPE_A}', '{MW_TYPE_B}')
          AND value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (ORDER BY value, event_id) AS rn
        FROM pooled
    ),
    tied AS (
        SELECT event_type,
               (CAST(min(rn) OVER (PARTITION BY value) AS DOUBLE)
                + CAST(max(rn) OVER (PARTITION BY value) AS DOUBLE)) / 2.0
                 AS avg_rank
        FROM ranked
    ),
    s AS (
        SELECT
            count(*) FILTER (event_type = '{MW_TYPE_A}') AS n_a,
            count(*) FILTER (event_type = '{MW_TYPE_B}') AS n_b,
            sum(avg_rank) FILTER (event_type = '{MW_TYPE_A}') AS r_a
        FROM tied
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0, 1)
             AS u_a,
           round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                 - (r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0), 1)
             AS u_b,
           round(((r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0)
                  - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                 / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                        * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1) / 12.0), 4)
             AS z_approx
    FROM s
    """,
)
def stats_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test of the ``value`` distribution between two
    event types (the nonparametric A/B-comparison a metrics pipeline
    runs when normality is off the table).

    Rank construction keeps everything EXACT: row_number over
    (value, event_id) is deterministic; within a tie block those
    row numbers are consecutive, so the tie-averaged rank is
    (min+max)/2 — a multiple of 0.5 represented exactly in double, and
    the rank-sum over them is exact FP addition (no rounding until the
    final z). U_a = R_a − n_a(n_a+1)/2; z uses the no-tie-correction
    normal approximation (documented; the correction term is a fixed
    expression over tie-group sizes if ever needed). Shape: one scan,
    then a RANGE-PARTITIONED exact rank (``_global_row_numbers``,
    ADVICE r12 — no single-partition sort; bit-identical values), then
    scalar aggregation.
    """
    e = load_tables(spark, sf_dir)["events"]
    pooled = e.where(
        F.col("event_type").isin(MW_TYPE_A, MW_TYPE_B)
        & F.col("value").isNotNull()
    ).select("event_type", "value", "event_id")
    ranked = _global_row_numbers(pooled, "value", "event_id")
    wv = Window.partitionBy("value")
    tied = ranked.select(
        "event_type",
        (
            (F.min("rn").over(wv).cast("double") + F.max("rn").over(wv).cast("double"))
            / 2.0
        ).alias("avg_rank"),
    )
    is_a = F.col("event_type") == MW_TYPE_A
    is_b = F.col("event_type") == MW_TYPE_B
    s = tied.agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(is_b, 1)).alias("n_b"),
        F.sum(F.when(is_a, F.col("avg_rank"))).alias("r_a"),
    )
    n_a, n_b, r_a = (
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
        F.col("r_a"),
    )
    u_a = r_a - n_a * (n_a + 1) / 2.0
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round(n_a * n_b - u_a, 1).alias("u_b"),
        F.round(
            (u_a - n_a * n_b / 2.0)
            / F.sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0),
            4,
        ).alias("z_approx"),
    )


BIN_QS = (0.25, 0.5, 0.75)


@query(
    "stats_quantile_bins",
    """
    WITH q AS (
        SELECT qs[1] AS q1, qs[2] AS q2, qs[3] AS q3
        FROM (SELECT quantile_cont(l_extendedprice, [0.25, 0.50, 0.75]) AS qs
              FROM lineitem)
    ),
    b AS (
        SELECT CASE WHEN l_extendedprice <= q.q1 THEN 0
                    WHEN l_extendedprice <= q.q2 THEN 1
                    WHEN l_extendedprice <= q.q3 THEN 2
                    ELSE 3 END AS bin,
               l_extendedprice AS v
        FROM lineitem CROSS JOIN q
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           round(min(v), 4) AS lo, round(max(v), 4) AS hi,
           round(sum(v) / count(*), 4) AS avg_value
    FROM b GROUP BY bin
    """,
)
def stats_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretizer (the feature-binning pass an ML-prep
    pipeline runs before bucketized features / monotonic-binning
    models): exact quartile edges, then a scan-local CASE assignment
    and per-bin profile.

    The edges come from the exact sort-based percentile (the proven
    ``quantile_cont`` ↔ ``F.percentile`` parity pair), so the bin
    boundaries — and therefore every assignment comparison — are the
    SAME doubles in both engines. Shape: one edges aggregate (a
    single-row broadcast), one scan with the CASE projection, one
    4-group rollup. At 100 TB swap the exact percentile for
    ``approx_percentile`` and nothing downstream changes; the exact
    flavor here is what makes the oracle bit-checkable.
    """
    from ..functions.selection import exact_percentiles

    t = load_tables(spark, sf_dir)["lineitem"]
    v = F.col("l_extendedprice")
    # r16 (VERDICT r15 #7): the edges come from the two-pass exact
    # rank-selection instead of a single F.percentile aggregate — the
    # exact aggregate collects EVERY value into one object buffer and
    # sorts it in one task (serial at any scale; wall ≈ CPU here), while
    # the selection runs three map-side-combinable hash aggregations
    # and touches only the ~n/4096 candidate stripe row-wise. The
    # returned doubles are BIT-IDENTICAL to F.percentile (its own
    # interpolation formula over the same order statistics —
    # test_exact_percentiles_matches_spark_percentile), so every bin
    # comparison below sees the same edge values as before.
    q1, q2, q3 = exact_percentiles(t, "l_extendedprice", list(BIN_QS))[()]
    b = t.select(
        F.when(v <= F.lit(q1), 0)
        .when(v <= F.lit(q2), 1)
        .when(v <= F.lit(q3), 2)
        .otherwise(3)
        .alias("bin"),
        v.alias("v"),
    )
    return b.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.min("v"), 4).alias("lo"),
        F.round(F.max("v"), 4).alias("hi"),
        F.round(F.sum("v") / F.count("*"), 4).alias("avg_value"),
    )


@query(
    "events_cusum_changepoint",
    """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d, count(*) AS y
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu
        FROM daily
    ),
    c AS (
        SELECT d, y,
               sum(CAST(y AS DOUBLE) - m.mu) OVER (
                   ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cusum
        FROM daily CROSS JOIN m
    ),
    mx AS (SELECT max(abs(cusum)) AS peak FROM c)
    SELECT c.d AS day, CAST(c.y AS BIGINT) AS cnt,
           round(c.cusum, 4) AS cusum,
           abs(c.cusum) = mx.peak AS is_peak
    FROM c CROSS JOIN mx
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen over daily event volume: the running
    sum of deviations from the series mean. A level shift at day t
    makes |CUSUM| peak at t (the classic offline CUSUM estimator);
    ``is_peak`` marks the argmax day(s).

    Determinism: the mean is one fixed division over exact integer
    sums; the running sum adds the SAME doubles in the SAME day order
    in both engines (a windowed prefix sum is sequential by
    definition), and the peak flag compares each |cusum| against the
    max of those exact same doubles — so even the boundary row
    agrees cross-engine. Shape: one scan → day groupBy → a
    calendar-cardinality window + one scalar broadcast; the 100 TB
    cost is the daily rollup, which every other time-series operator
    here already pays.
    """
    e = load_tables(spark, sf_dir)["events"]
    # checkpoint the day-cardinality rollup: mean, running sum, and the
    # peak max all branch from it — unchecked, each branch re-scans
    # events (the N-scan trap).
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("y")
    ).localCheckpoint(eager=False)
    m = daily.agg(
        (F.sum("y").cast("double") / F.count("*").cast("double")).alias("mu")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.crossJoin(F.broadcast(m)).select(
        "d",
        "y",
        F.sum(F.col("y").cast("double") - F.col("mu")).over(w).alias("cusum"),
    )
    mx = c.agg(F.max(F.abs("cusum")).alias("peak"))
    return c.crossJoin(F.broadcast(mx)).select(
        F.col("d").alias("day"),
        F.col("y").cast("long").alias("cnt"),
        F.round("cusum", 4).alias("cusum"),
        (F.abs("cusum") == F.col("peak")).alias("is_peak"),
    )


@query(
    "stats_ks_test",
    f"""
    WITH pooled AS (
        SELECT event_type, value
        FROM events
        WHERE event_type IN ('{MW_TYPE_A}', '{MW_TYPE_B}')
          AND value IS NOT NULL
    ),
    g AS (
        SELECT value,
               sum(CASE WHEN event_type = '{MW_TYPE_A}' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = '{MW_TYPE_B}' THEN 1 ELSE 0 END) AS cb
        FROM pooled GROUP BY value
    ),
    t AS (
        SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        FROM g
    ),
    c AS (
        SELECT value,
               sum(ca) OVER (ORDER BY value) AS cum_a,
               sum(cb) OVER (ORDER BY value) AS cum_b
        FROM g
    ),
    d AS (
        SELECT c.value,
               abs(CAST(cum_a AS DOUBLE) / CAST(t.na AS DOUBLE)
                   - CAST(cum_b AS DOUBLE) / CAST(t.nb AS DOUBLE)) AS dd
        FROM c CROSS JOIN t
    ),
    m AS (SELECT max(dd) AS dmax FROM d)
    SELECT t.na AS n_a, t.nb AS n_b,
           round(m.dmax, 4) AS ks_d,
           round(min(CASE WHEN d.dd = m.dmax THEN d.value END), 4) AS at_value,
           round(m.dmax * sqrt(CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)
                               / (CAST(t.na AS DOUBLE) + CAST(t.nb AS DOUBLE))),
                 4) AS ks_scaled
    FROM d CROSS JOIN m CROSS JOIN t
    GROUP BY t.na, t.nb, m.dmax
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test of the ``value`` distribution
    between the same two event types as ``stats_mannwhitney_value`` —
    the SHAPE complement to that test's location signal: D is the max
    gap between the two empirical CDFs, ``at_value`` where it occurs
    (min such value under ties), ``ks_scaled`` = D·√(n·m/(n+m)) (the
    statistic compared against the Kolmogorov distribution).

    Determinism: the ECDFs are cumulative EXACT integer counts over
    the distinct-value grid divided by exact totals — both engines
    build the same doubles in the same order (a value-ordered prefix
    sum), so max, the tie-broken argmax, and the scaled statistic all
    hash-match. Shape: one scan → distinct-value groupBy → ONE ordered
    prefix-sum window over the value grid (value-cardinality, not
    row-cardinality) → scalar rollup; the 100 TB lever is a quantized
    value grid (bin first), which only coarsens D monotonically.
    """
    e = load_tables(spark, sf_dir)["events"]
    pooled = e.where(
        F.col("event_type").isin(MW_TYPE_A, MW_TYPE_B)
        & F.col("value").isNotNull()
    ).select("event_type", "value")
    g = pooled.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == MW_TYPE_A, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == MW_TYPE_B, 1).otherwise(0)).alias("cb"),
    ).localCheckpoint(eager=False)  # grid reused by totals/ECDF/max: one scan
    t = g.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    w = Window.orderBy("value").rangeBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        "value",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    d = c.crossJoin(F.broadcast(t)).select(
        "value",
        "na",
        "nb",
        F.abs(
            F.col("cum_a").cast("double") / F.col("na").cast("double")
            - F.col("cum_b").cast("double") / F.col("nb").cast("double")
        ).alias("dd"),
    )
    m = d.agg(F.max("dd").alias("dmax"))
    na_d, nb_d = F.col("na").cast("double"), F.col("nb").cast("double")
    return (
        d.crossJoin(F.broadcast(m))
        .groupBy("na", "nb", "dmax")
        .agg(
            F.round(
                F.min(F.when(F.col("dd") == F.col("dmax"), F.col("value"))), 4
            ).alias("at_value")
        )
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.round("dmax", 4).alias("ks_d"),
            "at_value",
            F.round(
                F.col("dmax") * F.sqrt(na_d * nb_d / (na_d + nb_d)), 4
            ).alias("ks_scaled"),
        )
    )


@query(
    "events_pareto_concentration",
    """
    WITH c AS (
        SELECT event_type, user_id, count(*) AS cnt
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, cnt,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cnt, user_id) AS i,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cnt DESC, user_id) AS j,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM c
    ),
    s AS (
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(cnt) AS BIGINT) AS tot,
               CAST(sum(i * cnt) AS BIGINT) AS swx,
               CAST(sum(CASE WHEN j <= CAST(ceil(n / 10.0) AS BIGINT)
                             THEN cnt ELSE 0 END) AS BIGINT) AS topk
        FROM r GROUP BY 1
    )
    SELECT event_type, n AS n_users, tot AS total_events,
           round(2.0 * CAST(swx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 4) AS gini,
           round(CAST(topk AS DOUBLE) / CAST(tot AS DOUBLE), 4)
             AS top_decile_share
    FROM s
    """,
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration profile per event type: Gini coefficient
    of per-user event counts (0 = egalitarian, →1 = one user does
    everything) and the top-decile share — the two numbers a curation
    pass reads before deciding per-user caps / bot exclusions (heavy
    concentration means a handful of accounts dominate the corpus).

    Gini uses the closed rank form G = 2·Σ i·xᵢ / (n·Σxᵢ) − (n+1)/n
    over counts sorted ascending with a user_id tiebreak — every input
    is an exact integer and the rank order is total, so both engines
    aggregate identical values (Σ i·xᵢ is exact int64 under
    n·total_events < 2⁶³; past that, cast the product to double — the
    same bound discipline as the trend finisher). The top-decile cut
    is an integer rank compare against ceil(n/10). Shape: one scan →
    user-cardinality groupBy → two rank windows per type → a
    types-cardinality rollup.
    """
    e = load_tables(spark, sf_dir)["events"]
    c = (
        e.where(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("cnt"))
    )
    wi = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    wj = Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), "user_id")
    wn = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cnt",
        F.row_number().over(wi).alias("i"),
        F.row_number().over(wj).alias("j"),
        F.count("*").over(wn).alias("n"),
    )
    topk_cut = F.ceil(F.col("n") / 10.0).cast("long")
    s = r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("cnt")).cast("long").alias("swx"),
        F.sum(F.when(F.col("j") <= topk_cut, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("topk"),
    )
    n_d, tot_d = F.col("n").cast("double"), F.col("tot").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.col("tot").alias("total_events"),
        F.round(
            2.0 * F.col("swx").cast("double") / (n_d * tot_d) - (n_d + 1.0) / n_d,
            4,
        ).alias("gini"),
        F.round(F.col("topk").cast("double") / tot_d, 4).alias("top_decile_share"),
    )


# Benford expected first-digit probabilities as shared literals: both
# engines parse the same decimal literals to the same doubles, so the
# expected counts and chi-square contributions are bit-aligned.
_BENFORD_P = {d: round(__import__("math").log10(1 + 1 / d), 10) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items())
    + " END"
)


@query(
    "stats_benford_firstdigit",
    f"""
    WITH v AS (
        SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM lineitem WHERE l_extendedprice >= 1
    ),
    o AS (SELECT digit, count(*) AS observed FROM v GROUP BY digit),
    t AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM o)
    SELECT o.digit, CAST(o.observed AS BIGINT) AS observed,
           round(CAST(t.n AS DOUBLE) * ({_BENFORD_CASE}), 4) AS expected,
           round((CAST(o.observed AS DOUBLE)
                  - CAST(t.n AS DOUBLE) * ({_BENFORD_CASE}))
                 * (CAST(o.observed AS DOUBLE)
                    - CAST(t.n AS DOUBLE) * ({_BENFORD_CASE}))
                 / (CAST(t.n AS DOUBLE) * ({_BENFORD_CASE})), 4) AS contrib
    FROM o CROSS JOIN t
    """,
)
def stats_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over a monetary measure — the
    classic synthetic-data / fraud / unit-mixup detector a data-quality
    pass runs on financial columns: observed first-digit counts vs the
    log10(1+1/d) expectation, with per-digit chi-square contributions
    (large contrib on a digit = that digit is over/under-represented).

    The first digit comes from the integer part's decimal rendering —
    via an explicit ``floor`` before the BIGINT cast, because Spark's
    double→long cast truncates while DuckDB's ROUNDS (a x999.995-style
    price lands in different digit buckets without it — caught by the
    sf0.01 parity gate); expected probabilities
    are shared 10-decimal literals, so expected counts and
    contributions are identical IEEE expressions over exact counts.
    Shape: one scan → 9-row groupBy → scalar broadcast; free at any
    corpus size once the scan lands. (TPC-H prices are uniform-ish,
    NOT Benford — the screen is expected to fire here; the operator
    reports the evidence, the threshold policy is the caller's.)
    """
    t = load_tables(spark, sf_dir)["lineitem"]
    v = t.where(F.col("l_extendedprice") >= 1).select(
        F.substring(
            F.floor("l_extendedprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    o = v.groupBy("digit").agg(F.count("*").alias("observed")).localCheckpoint(
        eager=False
    )  # 9-row histogram reused by the total and the output: one scan
    tot = o.agg(F.sum("observed").cast("long").alias("n"))
    p = F.element_at(
        F.create_map(
            *[F.lit(x) for dp in _BENFORD_P.items() for x in dp]
        ),
        F.col("digit"),
    )
    exp = F.col("n").cast("double") * p
    dev = F.col("observed").cast("double") - exp
    return o.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("observed").cast("long").alias("observed"),
        F.round(exp, 4).alias("expected"),
        F.round(dev * dev / exp, 4).alias("contrib"),
    )


# --- population-stability drift screen (PSI) ---------------------------------


@query(
    "stats_psi_drift",
    """
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
                 AS day
        FROM events
    ),
    bounds AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM d),
    counts AS (
        SELECT event_type,
               sum(CASE WHEN day < mid THEN 1 ELSE 0 END) AS n_base,
               sum(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS n_curr
        FROM d, bounds GROUP BY 1
    ),
    tot AS (
        SELECT count(*) AS t, sum(n_base) AS sb, sum(n_curr) AS sc
        FROM counts
    )
    SELECT event_type,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_curr AS BIGINT) AS n_curr,
           round((CAST(n_base + 1 AS DOUBLE) / (sb + t)
                  - CAST(n_curr + 1 AS DOUBLE) / (sc + t))
                 * ln((CAST(n_base + 1 AS DOUBLE) / (sb + t))
                      / (CAST(n_curr + 1 AS DOUBLE) / (sc + t))), 6)
             AS psi_contrib
    FROM counts, tot
    ORDER BY event_type
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event timeline, per event_type — the standard drift screen a
    training-data pipeline runs before trusting a refreshed snapshot
    (PSI > 0.25 on any bucket = investigate). The timeline splits at
    the integer midpoint day (one metadata-scale min/max pass);
    Laplace +1 smoothing keeps one-sided buckets finite, so a type
    that appears or vanishes outright still yields a bounded, ranked
    contribution instead of an infinity.

    Scale shape: one scan producing per-type conditional partials
    (map-side combine), a broadcast of the 1-row midpoint and the
    k-row totals — nothing fact-sized shuffles. All ratios divide
    exact integers, so both engines see bit-identical doubles."""
    e = load_tables(spark, sf_dir)["events"]
    d = e.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
    )
    mid = d.agg(F.expr("(min(day) + max(day) + 1) div 2").alias("mid"))
    counts = (
        d.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("day") < F.col("mid"), 1).otherwise(0)
            ).alias("n_base"),
            F.sum(
                F.when(F.col("day") >= F.col("mid"), 1).otherwise(0)
            ).alias("n_curr"),
        )
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("n_base").alias("sb"),
        F.sum("n_curr").alias("sc"),
    )
    pa = (F.col("n_base") + 1).cast("double") / (F.col("sb") + F.col("t"))
    pc = (F.col("n_curr") + 1).cast("double") / (F.col("sc") + F.col("t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_curr").cast("long").alias("n_curr"),
            F.round((pa - pc) * F.log(pa / pc), 6).alias("psi_contrib"),
        )
        .orderBy("event_type")
    )


# --- seasonal-naive forecast backtest ----------------------------------------


@query(
    "ts_seasonal_naive_backtest",
    """
    WITH d AS (
        SELECT date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
                 AS day,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    paired AS (
        SELECT a.day AS day, a.n AS actual, f.n AS forecast
        FROM d a JOIN d f ON f.day = a.day - 7
    ),
    scored AS (
        SELECT day % 7 AS dow,
               (20000 * abs(actual - forecast)) // (actual + forecast)
                 AS smape_bps
        FROM paired
    )
    SELECT CAST(dow AS INTEGER) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(smape_bps) AS BIGINT) AS sum_smape_bps,
           CAST(sum(smape_bps) // count(*) AS BIGINT) AS avg_smape_bps
    FROM scored GROUP BY dow ORDER BY dow
    """,
)
def ts_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest of daily event volume: forecast(day) =
    actual(day − 7), scored as integer sMAPE basis points
    (20000·|a−f| div (a+f) — symmetric MAPE on the integer grid, so
    the whole gauge is hash-exact), aggregated per day-of-week
    (day mod 7 — epoch-anchored, calendar-free). This is the baseline
    every capacity forecast must beat, and a per-dow error profile is
    the standard way to catch weekly-seasonality regressions in an
    ingest pipeline.

    Scale shape: the daily rollup is one map-side-combined scan; the
    lag-7 pairing is a self-join of the DAILY series (metadata-scale —
    days, not events), then a k≤7-row aggregate."""
    e = load_tables(spark, sf_dir)["events"]
    d = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    f = d.select((F.col("day") + 7).alias("day"), F.col("n").alias("forecast"))
    paired = d.withColumnRenamed("n", "actual").join(f, "day")
    scored = paired.select(
        (F.col("day") % 7).alias("dow"),
        F.expr(
            "(20000 * abs(actual - forecast)) div (actual + forecast)"
        ).alias("smape_bps"),
    )
    return (
        scored.groupBy(F.col("dow").cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("smape_bps").cast("long").alias("sum_smape_bps"),
            F.expr("CAST(sum(smape_bps) div count(*) AS LONG)").alias(
                "avg_smape_bps"
            ),
        )
        .orderBy("dow")
    )


# --- bootstrap confidence interval (hash-resampled, engine-exact) ------------

BOOT_B = 200  # bootstrap replicates; 2.5%/97.5% = sorted ranks 5 / 196


def _boot_sql() -> str:
    from ..functions.hashing import hash60_duck

    h = hash60_duck("CAST(bs.b * m.m + idx.i AS VARCHAR)")
    return f"""
    WITH d AS (
        SELECT date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
                 AS day,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT n, row_number() OVER (ORDER BY day) - 1 AS i FROM d
    ),
    m AS (SELECT count(*) AS m FROM d),
    bs AS (SELECT r.b FROM range(0, {BOOT_B}) r(b)),
    draws AS (
        SELECT bs.b, {h} % m.m AS pick
        FROM idx CROSS JOIN bs CROSS JOIN m
    ),
    means AS (
        SELECT dr.b,
               (1000000 * sum(t.n)) // max(m.m) AS mm
        FROM draws dr JOIN idx t ON t.i = dr.pick CROSS JOIN m
        GROUP BY dr.b
    ),
    ranked AS (
        SELECT mm, row_number() OVER (ORDER BY mm, b) AS r FROM means
    ),
    obs AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(n) AS BIGINT) AS n_total,
               CAST((1000000 * sum(n)) // count(*) AS BIGINT)
                 AS obs_mean_micro
        FROM d
    )
    SELECT o.n_days, o.n_total, o.obs_mean_micro,
           CAST(min(CASE WHEN r = 5 THEN mm END) AS BIGINT)
             AS boot_lo_micro,
           CAST(min(CASE WHEN r = {BOOT_B - 4} THEN mm END) AS BIGINT)
             AS boot_hi_micro
    FROM ranked, obs o
    GROUP BY 1, 2, 3
    """


@query("stats_bootstrap_ci", _boot_sql())
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% confidence interval for the mean daily event
    volume — uncertainty quantification with NO randomness source:
    replicate ``b``'s ``i``-th draw picks day index
    ``hash60(b·m + i) mod m`` (the portable md5-prefix hash both
    engines compute bit-identically — the repo's sampling discipline),
    so the full resample matrix, every replicate mean (exact integer
    micros), and the rank-5 / rank-{BOOT_B - 4} percentile ends are
    hash-exact cross-engine.

    Scale shape: the daily rollup is the only corpus-sized pass; the
    resample matrix is days × {BOOT_B} rows of (replicate, pick)
    integers — series-scale, not event-scale — and the replicate means
    are one groupBy over it. At 100 TB you bootstrap the AGGREGATED
    series (as here) or a fixed-size hash-sample of rows; never the
    raw fact."""
    from ..functions.hashing import hash60_spark

    e = load_tables(spark, sf_dir)["events"]
    d = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day")
    idx = d.select(
        "n", (F.row_number().over(w) - 1).alias("i")
    )
    m = d.agg(F.count(F.lit(1)).alias("m"))
    bs = spark.range(BOOT_B).select(F.col("id").alias("b"))
    h = hash60_spark("CAST(b * m + i AS STRING)")
    draws = (
        idx.crossJoin(F.broadcast(bs))
        .crossJoin(F.broadcast(m))
        .select("b", F.expr(f"{h} % m").alias("pick"))
    )
    means = (
        draws.join(idx.withColumnRenamed("i", "pick"), "pick")
        .crossJoin(F.broadcast(m))
        .groupBy("b")
        .agg(F.expr("(1000000 * sum(n)) div max(m)").alias("mm"))
    )
    wr = Window.orderBy("mm", "b")
    ranked = means.withColumn("r", F.row_number().over(wr))
    ends = ranked.agg(
        F.expr("min(CASE WHEN r = 5 THEN mm END)")
        .cast("long")
        .alias("boot_lo_micro"),
        F.expr(f"min(CASE WHEN r = {BOOT_B - 4} THEN mm END)")
        .cast("long")
        .alias("boot_hi_micro"),
    )
    obs = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_total"),
        F.expr("CAST((1000000 * sum(n)) div count(*) AS LONG)").alias(
            "obs_mean_micro"
        ),
    )
    return obs.crossJoin(ends)


# ---------------------------------------------------------------------------
# Kruskal-Wallis H: the k-group generalization of Mann-Whitney
# ---------------------------------------------------------------------------


#: below this Catalyst size estimate the direct single-window sort wins
#: (one task holds the whole frame either way); above it, range-
#: partitioned ranking. 4 MB ≈ a few hundred thousand pooled rows.
_RANK_SMALL_BYTES = 4 << 20


def _global_row_numbers(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int = 64,
    force_bucketed: bool = False,
) -> DataFrame:
    """``df`` + ``rn``: EXACT global row_number over
    ``(value_col, id_col)`` without the single-partition sort a bare
    ``Window.orderBy`` plans (ADVICE r12: that sort was the registry's
    worst 10x-probe entry). Range-partitioned ranking: sample B-1
    value splits, bucket each row by how many splits lie strictly
    below its value (equal values always share a bucket, so tie
    blocks never straddle a boundary), row_number within each bucket,
    then shift by the broadcast prefix-count of lower buckets. The
    rank values are bit-identical for ANY monotone split set, so the
    sketched splits (percentile_approx) affect only load balance,
    never results — which is also why the DuckDB oracles keep their
    one-line global sort. Driver traffic: one collect of <= B-1
    doubles (metadata-scale). Widest task state: ~n/B rows; B scales
    with the cluster (64 here, thousands on a real one).

    ADAPTIVE (the CBO discipline, zero extra actions): below
    ``_RANK_SMALL_BYTES`` by Catalyst's optimized-plan size estimate
    the single-window sort is strictly cheaper than an extra splits
    pass — a frame that fits one task is sorted in one task either
    way — so small inputs keep the direct plan. Both branches produce
    identical rn values; the estimate only picks the physical strategy
    (the 10x/30x probes exercise the bucketed branch, the sf<=0.1
    solo bench the direct one).

    Spark Connect caveat (ADVICE r13): the size estimate reads
    ``df._jdf.queryExecution()`` — private JVM internals a Connect
    client cannot reach — so under Connect the except clause routes
    EVERY input to the bucketed plan. Correctness is unaffected (both
    branches rank identically); only the small-input direct-plan
    shortcut silently disappears. Gate on a supported public size
    estimate API when Spark exposes one."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # estimate unavailable: assume large (safe path)
        est = _RANK_SMALL_BYTES
    if est < _RANK_SMALL_BYTES and not force_bucketed:
        w = Window.orderBy(value_col, id_col)
        return df.withColumn(
            "rn", F.row_number().over(w).cast("long")
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(value_col, qs, 1000).alias("s")
    ).first()
    splits = sorted(set(row["s"] or [])) if row is not None else []
    bkt = F.lit(0)
    for s in splits:
        bkt = bkt + F.when(F.col(value_col) > F.lit(s), 1).otherwise(0)
    b = df.withColumn("_bkt", bkt.cast("int"))
    counts = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    offsets = counts.select(
        "_bkt",
        (
            F.sum("_c").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_c")
        ).alias("_off"),
    )
    w = Window.partitionBy("_bkt").orderBy(value_col, id_col)
    return (
        b.withColumn("_brn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_bkt")
        .withColumn("rn", F.col("_off") + F.col("_brn"))
        .drop("_bkt", "_brn", "_off")
    )


@query(
    "stats_kruskal_wallis",
    """
    WITH pooled AS (
        SELECT event_type, value, event_id
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (ORDER BY value, event_id) AS rn
        FROM pooled
    ),
    tied AS (
        SELECT event_type,
               (CAST(min(rn) OVER (PARTITION BY value) AS DOUBLE)
                + CAST(max(rn) OVER (PARTITION BY value) AS DOUBLE)) / 2.0
                 AS avg_rank
        FROM ranked
    ),
    grp AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n_g,
               sum(avg_rank) AS r_g
        FROM tied GROUP BY event_type
    ),
    gtot AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS k_groups,
               sum(r_g * r_g / n_g) AS s
        FROM grp
    ),
    ties AS (
        SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie_sum
        FROM (SELECT CAST(count(*) AS DOUBLE) AS t
              FROM pooled GROUP BY value) g
        WHERE t > 1
    )
    SELECT n_total, k_groups,
           round(12.0 / (CAST(n_total AS DOUBLE) * (n_total + 1)) * s
                 - 3.0 * (n_total + 1), 4) AS h_stat,
           round((12.0 / (CAST(n_total AS DOUBLE) * (n_total + 1)) * s
                  - 3.0 * (n_total + 1))
                 / (1.0 - coalesce(tie_sum, 0.0)
                    / (CAST(n_total AS DOUBLE) * n_total * n_total
                       - n_total)), 4) AS h_adj
    FROM gtot, ties
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL event types' value distributions —
    the k-group nonparametric ANOVA (Mann-Whitney's big sibling; same
    metrics pipelines, more than two variants).

    Rank construction reuses the exact-rank trick from
    ``stats_mannwhitney_value``: row_number over (value, event_id) is
    deterministic, tie blocks hold consecutive row numbers, so the
    tie-averaged rank (min+max)/2 is an exact multiple of 0.5 and
    every group rank-sum is exact FP addition. H = 12/(N(N+1)) ·
    Σ R_g²/n_g − 3(N+1); the tie-corrected H divides by
    1 − Σ(t³−t)/(N³−N) with t the tie-group sizes (both sides compute
    the same fixed expression tree).

    Shape (ADVICE r12, closed in code): the global rank is
    RANGE-PARTITIONED via ``_global_row_numbers`` — sampled value
    splits bucket the pool, row_number runs per bucket, and a
    broadcast bucket-count prefix shifts each bucket to its global
    offset. The widest task state is n/B rows instead of the whole
    pooled fact table (the r12 10x probe's 3.6x worst case was this
    one single-partition sort); the rank VALUES are bit-identical for
    any monotone split set, so the oracle keeps its one global sort."""
    e = load_tables(spark, sf_dir)["events"]
    pooled = e.filter(F.col("value").isNotNull()).select(
        "event_type", "value", "event_id"
    )
    ranked = _global_row_numbers(pooled, "value", "event_id")
    wv = Window.partitionBy("value")
    tied = ranked.select(
        "event_type",
        (
            (
                F.min("rn").over(wv).cast("double")
                + F.max("rn").over(wv).cast("double")
            )
            / 2.0
        ).alias("avg_rank"),
    )
    grp = tied.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_g"),
        F.sum("avg_rank").alias("r_g"),
    )
    gtot = grp.agg(
        F.sum("n_g").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("s"),
    )
    ties = (
        pooled.groupBy("value")
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tie_sum")
        )
    )
    j = gtot.crossJoin(F.broadcast(ties))
    n = F.col("n_total").cast("double")
    h = 12.0 / (n * (n + 1)) * F.col("s") - 3.0 * (n + 1)
    corr = 1.0 - F.coalesce(F.col("tie_sum"), F.lit(0.0)) / (
        n * n * n - n
    )
    return j.select(
        "n_total",
        "k_groups",
        F.round(h, 4).alias("h_stat"),
        F.round(h / corr, 4).alias("h_adj"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b over the monthly revenue/volume series
# ---------------------------------------------------------------------------


@query(
    "stats_kendall_tau_monthly",
    """
    WITH monthly AS (
        SELECT date_trunc('month', l_shipdate) AS m,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS y
        FROM lineitem GROUP BY 1
    ),
    pairs AS (
        SELECT (a.x - b.x) * (a.y - b.y) AS prod,
               CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
               CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(count(*) FILTER (prod > 0) AS BIGINT) AS n_c,
               CAST(count(*) FILTER (prod < 0) AS BIGINT) AS n_d,
               CAST(sum(tx) AS BIGINT) AS n_tx,
               CAST(sum(ty) AS BIGINT) AS n_ty
        FROM pairs
    ),
    nper AS (SELECT CAST(count(*) AS BIGINT) AS n_periods FROM monthly)
    SELECT n_periods, n0 AS n_pairs, n_c AS n_concordant, n_d AS n_discordant,
           round((CAST(n_c AS DOUBLE) - n_d)
                 / sqrt(CAST(n0 - n_tx AS DOUBLE) * (n0 - n_ty)), 4) AS tau_b
    FROM agg, nper
    """,
)
def stats_kendall_tau_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between monthly line-item volume
    and monthly revenue — the outlier-robust trend-agreement gauge
    (Spearman's sibling, preferred when the series is short and ties
    matter).

    EXACT by construction: the two series are integers (a row count
    and a per-row-rounded integer-cents revenue sum), so concordance
    products, tie flags, and the pair counts are integer arithmetic —
    no FP ordering anywhere until the final tau division. tau_b =
    (C − D) / √((n₀−t_x)(n₀−t_y)) with n₀ = n(n−1)/2 and t_x/t_y the
    tied-pair counts. Shape: the fact table aggregates to ~n months
    FIRST (one scan, month-cardinality shuffle); the O(n²) pair-up
    then runs on the aggregated frame via a broadcast non-equi
    self-join — n months is calendar-bounded (~1200 pairs per century
    of data), so the quadratic stage is constant-size at any corpus
    scale."""
    li = load_tables(spark, sf_dir)["lineitem"]
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        )
        .cast("long")
        .alias("y"),
    )
    a = monthly.select(
        F.col("m").alias("am"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = monthly.select(
        F.col("m").alias("bm"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    pairs = a.join(F.broadcast(b), F.col("am") < F.col("bm")).select(
        ((F.col("ax") - F.col("bx")) * (F.col("ay") - F.col("by"))).alias(
            "prod"
        ),
        F.when(F.col("ax") == F.col("bx"), 1).otherwise(0).alias("tx"),
        F.when(F.col("ay") == F.col("by"), 1).otherwise(0).alias("ty"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.count(F.when(F.col("prod") > 0, 1)).cast("long").alias("n_c"),
        F.count(F.when(F.col("prod") < 0, 1)).cast("long").alias("n_d"),
        F.sum("tx").cast("long").alias("n_tx"),
        F.sum("ty").cast("long").alias("n_ty"),
    )
    nper = monthly.agg(F.count(F.lit(1)).cast("long").alias("n_periods"))
    return agg.crossJoin(F.broadcast(nper)).select(
        "n_periods",
        F.col("n0").alias("n_pairs"),
        F.col("n_c").alias("n_concordant"),
        F.col("n_d").alias("n_discordant"),
        F.round(
            (F.col("n_c").cast("double") - F.col("n_d"))
            / F.sqrt(
                (F.col("n0") - F.col("n_tx")).cast("double")
                * (F.col("n0") - F.col("n_ty"))
            ),
            4,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Multi-lag autocorrelation profile (extends events_autocorr_lag1)
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3, 7)


def _acf_arm_duck(lag: int) -> str:
    return f"""
        SELECT event_type, {lag} AS lag, y,
               lag(y, {lag}) OVER (PARTITION BY event_type ORDER BY x) AS py
        FROM daily
    """


def _acf_oracle() -> str:
    arms = " UNION ALL ".join(_acf_arm_duck(lag) for lag in ACF_LAGS)
    return f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS x,
               count(*) AS y
        FROM events
        GROUP BY 1, 2
    ),
    seq AS ({arms}),
    s AS (
        SELECT event_type, lag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(py) AS DOUBLE) AS sp,
               CAST(sum(y * py) AS DOUBLE) AS syp,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(py * py) AS DOUBLE) AS spp
        FROM seq WHERE py IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n * syy - sy * sy = 0 OR n * spp - sp * sp = 0 THEN NULL
                ELSE round((n * syp - sy * sp)
                           / sqrt((n * syy - sy * sy) * (n * spp - sp * sp)), 4)
           END AS acf
    FROM s
    """


@query("events_acf_profile", _acf_oracle())
def events_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile at lags (1, 2, 3, 7) of the per-type
    daily volume series — the correlogram a forecaster reads before
    picking model order (lag-7 exposes weekly seasonality the single
    lag-1 gauge can't see).

    Same conventions as ``events_autocorr_lag1``: observed-series lags
    (missing days skipped), textbook Pearson form over exact integer
    sums, every sum cast to double before products so nothing wraps at
    100 TB daily volumes, and an identical IEEE expression tree on
    both engines. The lag fan-out multiplies the TYPES-cardinality
    daily rollup by |lags| — four window passes over a calendar-sized
    frame, constant cost at any corpus scale."""
    daily = _daily_by_type(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("x")
    arms = [
        daily.select(
            "event_type",
            F.lit(lag).alias("lag"),
            "y",
            F.lag("y", lag).over(w).alias("py"),
        )
        for lag in ACF_LAGS
    ]
    seq = arms[0]
    for arm in arms[1:]:
        seq = seq.unionByName(arm)
    seq = seq.where(F.col("py").isNotNull())
    y, py = F.col("y"), F.col("py")
    s = seq.groupBy("event_type", "lag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(py).cast("double").alias("sp"),
        F.sum(y * py).cast("double").alias("syp"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(py * py).cast("double").alias("spp"),
    )
    n, sy, sp = F.col("n"), F.col("sy"), F.col("sp")
    syp, syy, spp = F.col("syp"), F.col("syy"), F.col("spp")
    vy = n * syy - sy * sy
    vp = n * spp - sp * sp
    return s.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        n.cast("long").alias("n_pairs"),
        F.when((vy == 0) | (vp == 0), F.lit(None).cast("double"))
        .otherwise(F.round((n * syp - sy * sp) / F.sqrt(vy * vp), 4))
        .alias("acf"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test: randomness screen on the daily delta signs
# ---------------------------------------------------------------------------


@query(
    "stats_runs_test",
    """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    delta AS (
        SELECT d, n - lag(n) OVER (ORDER BY d) AS dn FROM daily
    ),
    signs AS (
        SELECT d, CASE WHEN dn > 0 THEN 1 ELSE -1 END AS s
        FROM delta WHERE dn IS NOT NULL AND dn <> 0
    ),
    trans AS (
        SELECT s, CASE WHEN s <> lag(s) OVER (ORDER BY d) THEN 1 ELSE 0 END
                    AS flip
        FROM signs
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (s = 1) AS BIGINT) AS n_plus,
               CAST(count(*) FILTER (s = -1) AS BIGINT) AS n_minus,
               CAST(1 + sum(flip) AS BIGINT) AS n_runs
        FROM trans
    )
    SELECT n AS n_signs, n_plus, n_minus, n_runs,
           round((CAST(n_runs AS DOUBLE)
                  - (2.0 * n_plus * n_minus / n + 1.0))
                 / sqrt(2.0 * n_plus * n_minus
                        * (2.0 * n_plus * n_minus - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 4) AS z_runs
    FROM agg
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the SIGNS of day-over-day order
    volume deltas — the randomness screen that catches trending or
    oscillating series before anyone trusts an i.i.d. assumption
    (too few runs ⇒ trending; too many ⇒ alternating).

    The sequence is integer deltas of integer daily counts (zero
    deltas dropped, the standard convention), runs counted as
    1 + sign transitions via one lag window; E[R] = 2n₊n₋/n + 1 and
    Var[R] = 2n₊n₋(2n₊n₋−n)/(n²(n−1)) are fixed expressions over the
    exact integer counts, so z is identical cross-engine. Shape: one
    scan → day-cardinality agg → two lag windows over the calendar
    frame → one scalar row; calendar-bounded cost at any data size."""
    o = load_tables(spark, sf_dir)["orders"]
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("d")
    delta = daily.select(
        "d", (F.col("n") - F.lag("n").over(w)).alias("dn")
    )
    signs = delta.where(
        F.col("dn").isNotNull() & (F.col("dn") != 0)
    ).select("d", F.when(F.col("dn") > 0, 1).otherwise(-1).alias("s"))
    trans = signs.select(
        "s",
        F.when(F.col("s") != F.lag("s").over(w), 1).otherwise(0).alias(
            "flip"
        ),
    )
    agg = trans.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("s") == 1, 1)).cast("long").alias("n_plus"),
        F.count(F.when(F.col("s") == -1, 1)).cast("long").alias("n_minus"),
        (1 + F.sum("flip")).cast("long").alias("n_runs"),
    )
    n = F.col("n").cast("double")
    npl, nmi = F.col("n_plus").cast("double"), F.col("n_minus").cast("double")
    e_r = 2.0 * npl * nmi / n + 1.0
    var_r = (
        2.0 * npl * nmi * (2.0 * npl * nmi - n) / (n * n * (n - 1))
    )
    return agg.select(
        F.col("n").alias("n_signs"),
        "n_plus",
        "n_minus",
        "n_runs",
        F.round(
            (F.col("n_runs").cast("double") - e_r) / F.sqrt(var_r), 4
        ).alias("z_runs"),
    )


# ---------------------------------------------------------------------------
# Burstiness / Fano factor of daily event volume
# ---------------------------------------------------------------------------


@query(
    "events_burstiness_fano",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days,
           round(sy / n_days, 4) AS mean_daily,
           round((syy - sy * sy / n_days) / (n_days - 1), 4) AS var_daily,
           round((syy - sy * sy / n_days) / (n_days - 1)
                 / (sy / n_days), 4) AS fano,
           round((sqrt((syy - sy * sy / n_days) / (n_days - 1))
                  - sy / n_days)
                 / (sqrt((syy - sy * sy / n_days) / (n_days - 1))
                    + sy / n_days), 4) AS burstiness
    FROM s
    """,
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean, 1 under Poisson) and the
    Goh-Barabási burstiness index B = (σ−μ)/(σ+μ) (−1 periodic,
    0 Poisson, →1 bursty) of daily event volume per type — the
    dispersion screen that decides whether rate-based alerting
    (``events_anomaly_zscore``) can assume Poisson noise or needs the
    heavier MAD/CUSUM machinery next door.

    Sufficient-statistics pattern: exact integer (n, Σy, Σy²) per
    type, every derived value a fixed IEEE expression over them —
    same exactness story as ``events_trend_ols``. One scan, one
    (type, day) agg with map-side partials, one types-cardinality
    final agg."""
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    nd = F.col("n_days").cast("double")
    mean = F.col("sy") / nd
    var = (F.col("syy") - F.col("sy") * F.col("sy") / nd) / (nd - 1)
    sd = F.sqrt(var)
    return s.select(
        "event_type",
        "n_days",
        F.round(mean, 4).alias("mean_daily"),
        F.round(var, 4).alias("var_daily"),
        F.round(var / mean, 4).alias("fano"),
        F.round((sd - mean) / (sd + mean), 4).alias("burstiness"),
    )
