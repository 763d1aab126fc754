"""ML feature-engineering operators — the transforms a training-data
pipeline runs between the lakehouse and the trainer (SURVEY.md §2
north-star extension; no reference counterpart — the reference stops
at normalized silver tables, ref `jobs/normalize_stream.py` ends at
the sink).

Three classics, each oracle-certified end to end:

- ``ml_target_encoding`` — smoothed (m-estimate) target encoding of a
  categorical against a binary label, FIT as one aggregation and
  APPLIED back through a broadcast join.
- ``ml_woe_iv`` — weight-of-evidence / information-value scorecard of
  a categorical (the credit-scoring feature screen).
- ``ml_feature_hashing`` — the hashing trick over document tokens with
  a sign hash (Weinberger et al. 2009), on the portable 60-bit hash so
  DuckDB certifies every bucket and sign bit-identically.

Scale posture (100 TB): every pipeline is fact-scan → broadcast-dim
join → fixed-cardinality aggregation. The encoder/scorecard tables are
category-cardinality rows (tiny) and ride broadcast joins; the
hashing trick is map-side explode + one fixed-width (N_BUCKETS-bound)
shuffle — the same shape at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60_duck, hash60_spark
from ..tables import load_tables
from .relational import query

# Binary label: "large order" — o_totalprice above a fixed threshold.
# A literal (not a computed quantile) keeps the label definition
# engine-independent and the entry deterministic.
TE_THRESHOLD = 250_000.0
TE_SMOOTHING = 20.0  # m-estimate pseudo-count toward the global prior


@query(
    "ml_target_encoding",
    f"""
    WITH base AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CASE WHEN o.o_totalprice > {TE_THRESHOLD} THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    prior AS (
        SELECT CAST(sum(y) AS DOUBLE) / count(*) AS p FROM base
    ),
    enc AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(y) AS BIGINT) AS n_pos,
               (CAST(sum(y) AS DOUBLE) + {TE_SMOOTHING} * (SELECT p FROM prior))
                 / (CAST(count(*) AS DOUBLE) + {TE_SMOOTHING}) AS enc
        FROM base GROUP BY c_mktsegment
    )
    SELECT b.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(e.enc), 4) AS avg_target_enc,
           round(CAST(sum(b.y) AS DOUBLE) / count(*), 4) AS raw_rate
    FROM base b JOIN enc e ON b.c_mktsegment = e.c_mktsegment
    GROUP BY b.c_nationkey
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding, fit + transform in one plan.

    FIT: per-category smoothed positive rate with an m-estimate pull
    toward the global prior — enc = (pos + m·prior) / (n + m), m=20 —
    so rare categories shrink to the prior instead of memorizing their
    handful of labels. TRANSFORM: the category→enc table (5 rows)
    broadcasts back onto the fact rows; the entry then aggregates the
    encoded feature per customer nation next to the raw rate, so a
    wrong fit OR a wrong application changes the hash.

    All inputs to the encoder are exact integers (counts), so the
    division is deterministic across engines. Plan: one fact scan,
    customer dim broadcast, a 5-group fit agg, a broadcast apply join,
    a 25-group report agg — no fact-side shuffle beyond the two
    fixed-cardinality aggregations. At 100 TB the encoder table is
    still category-cardinality rows: the broadcast never grows."""
    t = load_tables(spark, sf_dir)
    base = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.when(F.col("o_totalprice") > TE_THRESHOLD, 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    prior_and_fit = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("y").alias("n_pos"),
    )
    # global prior from the per-category partials (exact integer sums)
    tot = prior_and_fit.agg(
        F.sum("n_orders").alias("n_tot"), F.sum("n_pos").alias("pos_tot")
    )
    enc = (
        prior_and_fit.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            (
                (
                    F.col("n_pos").cast("double")
                    + TE_SMOOTHING
                    * (F.col("pos_tot").cast("double") / F.col("n_tot"))
                )
                / (F.col("n_orders").cast("double") + TE_SMOOTHING)
            ).alias("enc"),
        )
    )
    return (
        base.join(F.broadcast(enc), "c_mktsegment")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.avg("enc"), 4).alias("avg_target_enc"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 4
            ).alias("raw_rate"),
        )
    )


WOE_LAPLACE = 0.5  # per-cell additive smoothing


@query(
    "ml_woe_iv",
    f"""
    WITH base AS (
        SELECT c.c_mktsegment,
               CASE WHEN o.o_totalprice > {TE_THRESHOLD} THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cat AS (
        SELECT c_mktsegment,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(count(*) - sum(y) AS BIGINT) AS n_neg
        FROM base GROUP BY c_mktsegment
    ),
    tot AS (
        SELECT CAST(sum(n_pos) AS DOUBLE) AS pos_tot,
               CAST(sum(n_neg) AS DOUBLE) AS neg_tot,
               CAST(count(*) AS DOUBLE) AS k
        FROM cat
    ),
    w AS (
        SELECT c_mktsegment, n_pos, n_neg,
               (CAST(n_pos AS DOUBLE) + {WOE_LAPLACE})
                 / (pos_tot + {WOE_LAPLACE} * k) AS pf,
               (CAST(n_neg AS DOUBLE) + {WOE_LAPLACE})
                 / (neg_tot + {WOE_LAPLACE} * k) AS nf
        FROM cat, tot
    )
    SELECT c_mktsegment, n_pos, n_neg,
           round(ln(pf / nf), 4) AS woe,
           round((pf - nf) * ln(pf / nf), 4) AS iv_contrib,
           round(sum((pf - nf) * ln(pf / nf)) OVER (), 4) AS iv_total
    FROM w
    """,
)
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value scorecard of a
    categorical feature against the binary label — the standard
    feature-screening gauge (IV < 0.02 ⇒ drop the feature).

    WOE_cat = ln(P(cat|pos) / P(cat|neg)) with Laplace 0.5 smoothing on
    every cell (so empty cells stay finite); IV = Σ (pf − nf)·WOE,
    stamped on every row via an unbounded window sum so the oracle
    certifies the total alongside each contribution. All inputs are
    exact integer counts — the only doubles are the final ratios.
    Plan: fact scan → broadcast dim join → category-cardinality agg →
    scalar broadcast of the totals row — nothing grows with data."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    base = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.when(F.col("o_totalprice") > TE_THRESHOLD, 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    cat = base.groupBy("c_mktsegment").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    tot = cat.agg(
        F.sum("n_pos").cast("double").alias("pos_tot"),
        F.sum("n_neg").cast("double").alias("neg_tot"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    w = cat.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "n_pos",
        "n_neg",
        (
            (F.col("n_pos").cast("double") + WOE_LAPLACE)
            / (F.col("pos_tot") + WOE_LAPLACE * F.col("k"))
        ).alias("pf"),
        (
            (F.col("n_neg").cast("double") + WOE_LAPLACE)
            / (F.col("neg_tot") + WOE_LAPLACE * F.col("k"))
        ).alias("nf"),
    )
    woe = F.log(F.col("pf") / F.col("nf"))
    contrib = (F.col("pf") - F.col("nf")) * woe
    return w.select(
        "c_mktsegment",
        "n_pos",
        "n_neg",
        F.round(woe, 4).alias("woe"),
        F.round(contrib, 4).alias("iv_contrib"),
        F.round(
            F.sum(contrib).over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            4,
        ).alias("iv_total"),
    )


FH_BUCKETS = 64


@query(
    "ml_feature_hashing",
    f"""
    WITH tok AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ),
    hashed AS (
        SELECT token,
               {hash60_duck("'fh:' || token")} % {FH_BUCKETS} AS bucket,
               CASE WHEN {hash60_duck("'fhs:' || token")} % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok WHERE token <> ''
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(sgn) AS BIGINT) AS signed_sum,
           CAST(count(DISTINCT token) AS BIGINT) AS n_distinct_tokens
    FROM hashed
    GROUP BY bucket
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): every token maps to
    one of FH_BUCKETS feature slots via a hash, with a second
    independent hash supplying a ±1 sign so collisions cancel in
    expectation instead of biasing upward.

    Both hashes ride the portable 60-bit md5 slice
    (``functions.hashing``), so DuckDB reproduces every bucket
    assignment and sign bit-identically — the oracle certifies the
    full signed-sum fixture per slot, not a summary. Plan: map-side
    explode of the token stream, then ONE aggregation whose group
    cardinality is the fixed FH_BUCKETS — the shuffle is bounded by
    vocabulary-independent constants at any corpus size (the property
    that makes hashed features the 100 TB featurizer of choice: no
    vocabulary build, no dictionary broadcast)."""
    t = load_tables(spark, sf_dir)
    tok = (
        t["documents"]
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
    )
    hashed = tok.select(
        "token",
        (F.expr(hash60_spark("concat('fh:', token)")) % FH_BUCKETS).alias(
            "bucket"
        ),
        F.when(
            F.expr(hash60_spark("concat('fhs:', token)")) % 2 == 0, 1
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    return hashed.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("sgn").cast("long").alias("signed_sum"),
        F.countDistinct("token").cast("long").alias("n_distinct_tokens"),
    )


@query(
    "ml_mutual_information",
    f"""
    WITH base AS (
        SELECT c.c_mktsegment,
               CASE WHEN o.o_totalprice > {TE_THRESHOLD} THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cat AS (
        SELECT c_mktsegment,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(count(*) - sum(y) AS BIGINT) AS n_neg
        FROM base GROUP BY c_mktsegment
    ),
    tot AS (
        SELECT CAST(sum(n_pos) AS DOUBLE) AS pos_tot,
               CAST(sum(n_neg) AS DOUBLE) AS neg_tot,
               CAST(sum(n_pos) + sum(n_neg) AS DOUBLE) AS n
        FROM cat
    ),
    mi AS (
        SELECT c_mktsegment, n_pos, n_neg,
               (CASE WHEN n_pos > 0 THEN (CAST(n_pos AS DOUBLE) / n)
                     * ln(CAST(n_pos AS DOUBLE) * n
                          / ((CAST(n_pos AS DOUBLE) + n_neg) * pos_tot))
                     ELSE 0.0 END
                + CASE WHEN n_neg > 0 THEN (CAST(n_neg AS DOUBLE) / n)
                       * ln(CAST(n_neg AS DOUBLE) * n
                            / ((CAST(n_pos AS DOUBLE) + n_neg) * neg_tot))
                       ELSE 0.0 END) AS contrib
        FROM cat, tot
    )
    SELECT c_mktsegment, n_pos, n_neg,
           round(contrib, 4) AS mi_contrib,
           round(sum(contrib) OVER (), 4) AS mi_total
    FROM mi
    """,
)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; label) in nats between the
    categorical and the binary label — the model-free dependence
    gauge next to ``ml_woe_iv`` (IV weights by distribution gap, MI by
    joint probability; both screens run over the same contingency
    table).

    I = Σ_{{x,y}} p(x,y)·ln(p(x,y)/(p(x)p(y))) over the category×label
    cells; empty cells contribute exactly 0 (the CASE guard — lim
    p→0 of p·ln p). Every input is an exact integer count, so both
    engines evaluate the same fixed expression tree; the total is
    stamped per row via an unbounded window sum. Shape identical to
    the WOE entry: one fact scan, broadcast dim join,
    category-cardinality agg, scalar totals broadcast."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    base = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.when(F.col("o_totalprice") > TE_THRESHOLD, 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    cat = base.groupBy("c_mktsegment").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    tot = cat.agg(
        F.sum("n_pos").cast("double").alias("pos_tot"),
        F.sum("n_neg").cast("double").alias("neg_tot"),
        (F.sum("n_pos") + F.sum("n_neg")).cast("double").alias("n"),
    )
    j = cat.crossJoin(F.broadcast(tot))
    npos = F.col("n_pos").cast("double")
    nneg = F.col("n_neg").cast("double")
    nx = npos + nneg
    n = F.col("n")
    c_pos = F.when(
        F.col("n_pos") > 0,
        (npos / n) * F.log(npos * n / (nx * F.col("pos_tot"))),
    ).otherwise(0.0)
    c_neg = F.when(
        F.col("n_neg") > 0,
        (nneg / n) * F.log(nneg * n / (nx * F.col("neg_tot"))),
    ).otherwise(0.0)
    mi = j.select(
        "c_mktsegment", "n_pos", "n_neg", (c_pos + c_neg).alias("contrib")
    )
    return mi.select(
        "c_mktsegment",
        "n_pos",
        "n_neg",
        F.round(F.col("contrib"), 4).alias("mi_contrib"),
        F.round(
            F.sum("contrib").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            4,
        ).alias("mi_total"),
    )


CAL_BIN_WIDTH = 50_000.0  # price-grid bins: IEEE-exact assignment
CAL_SCALE = 50_000.0  # logistic temperature


@query(
    "ml_calibration_bins",
    f"""
    WITH scored AS (
        SELECT CAST(floor(o_totalprice / {CAL_BIN_WIDTH}) AS BIGINT) AS bin,
               1.0 / (1.0 + exp(-(o_totalprice - {TE_THRESHOLD})
                                / {CAL_SCALE})) AS score,
               CASE WHEN o_totalprice > {TE_THRESHOLD} THEN 1 ELSE 0 END AS y
        FROM orders
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(score), 4) AS mean_score,
           round(CAST(sum(y) AS DOUBLE) / count(*), 4) AS frac_pos,
           round(abs(avg(score) - CAST(sum(y) AS DOUBLE) / count(*)), 4)
             AS calibration_gap
    FROM scored GROUP BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a scored binary outcome — the
    eval-side staple that checks whether a model's scores mean what
    they say (mean predicted probability vs observed positive rate
    per bin, plus the absolute gap the ECE sums).

    The score is a deterministic logistic of the price (a stand-in
    for a model column — swap in any probability column at no plan
    change); BINNING is deliberately on the raw price grid
    (floor(price/width)): IEEE division+floor of identical parquet
    doubles is exact on both engines, so bin assignment can never
    drift — only the transcendental exp() rides inside round(4)-
    absorbed averages. One scan, one bins-cardinality agg; at 100 TB
    the shuffle carries ~10 partial rows per task."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    scored = o.select(
        F.floor(F.col("o_totalprice") / CAL_BIN_WIDTH)
        .cast("long")
        .alias("bin"),
        (
            1.0
            / (
                1.0
                + F.exp(-(F.col("o_totalprice") - TE_THRESHOLD) / CAL_SCALE)
            )
        ).alias("score"),
        F.when(F.col("o_totalprice") > TE_THRESHOLD, 1)
        .otherwise(0)
        .alias("y"),
    )
    frac = F.sum("y").cast("double") / F.count(F.lit(1))
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.avg("score"), 4).alias("mean_score"),
        F.round(frac, 4).alias("frac_pos"),
        F.round(F.abs(F.avg("score") - frac), 4).alias("calibration_gap"),
    )


KFOLD_K = 5
KFOLD_SEED = "kfold-1"


@query(
    "ml_kfold_assignment",
    f"""
    WITH folds AS (
        SELECT c_custkey,
               {hash60_duck(f"'{KFOLD_SEED}:' || CAST(c_custkey AS VARCHAR)")}
                 % {KFOLD_K} AS fold
        FROM customer
    ),
    labeled AS (
        SELECT f.fold, o.o_orderkey,
               CASE WHEN o.o_totalprice > {TE_THRESHOLD} THEN 1 ELSE 0 END AS y
        FROM folds f JOIN orders o ON f.c_custkey = o.o_custkey
    ),
    per_cust AS (
        SELECT fold, CAST(count(*) AS BIGINT) AS n_customers
        FROM folds GROUP BY fold
    )
    SELECT l.fold,
           p.n_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(l.y) AS BIGINT) AS n_pos,
           round(CAST(sum(l.y) AS DOUBLE) / count(*), 4) AS pos_rate
    FROM labeled l JOIN per_cust p ON l.fold = p.fold
    GROUP BY l.fold, p.n_customers
    """,
)
def ml_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold split for cross-validation, assigned at
    the GROUP level (customer), so all of an entity's orders land in
    one fold — the grouped-CV discipline that prevents within-entity
    leakage across train/validation (the same reason
    ``corpus_leakage_safe_split`` splits by near-dup cluster).

    fold = portable_hash(seed, custkey) mod k: stable across runs and
    engines (no shuffle-order dependence, no RNG state), so adding
    data never reassigns an existing entity. The report carries per
    fold the entity count, row count, and label rate — the balance
    check a training pipeline runs before trusting the split. Shape:
    dim hash (map-side) → broadcast join onto the fact → k-cardinality
    agg; at 100 TB the fold table is a projection of the dim, never
    materialized wide."""
    t = load_tables(spark, sf_dir)
    folds = t["customer"].select(
        "c_custkey",
        (
            F.expr(
                hash60_spark(
                    f"concat('{KFOLD_SEED}:', CAST(c_custkey AS STRING))"
                )
            )
            % KFOLD_K
        ).alias("fold"),
    )
    labeled = t["orders"].join(
        F.broadcast(folds), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        "fold",
        F.when(F.col("o_totalprice") > TE_THRESHOLD, 1)
        .otherwise(0)
        .alias("y"),
    )
    per_cust = folds.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return (
        labeled.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 4
            ).alias("pos_rate"),
        )
        .join(F.broadcast(per_cust), "fold")
        .select("fold", "n_customers", "n_orders", "n_pos", "pos_rate")
    )


def target_encoder_from_state(state: DataFrame, m: float = TE_SMOOTHING) -> DataFrame:
    """Serve the smoothed encoding off the (category, n, n_pos) state
    table that ``streaming.jobs.target_encoder_stream`` maintains —
    the same m-estimate formula ``ml_target_encoding`` fits in batch,
    so a drained stream serves identical encodings (pytest-pinned)."""
    tot = state.agg(
        F.sum("n").alias("n_tot"), F.sum("n_pos").alias("pos_tot")
    )
    return state.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        (
            (
                F.col("n_pos").cast("double")
                + m * (F.col("pos_tot").cast("double") / F.col("n_tot"))
            )
            / (F.col("n").cast("double") + m)
        ).alias("enc"),
    )
