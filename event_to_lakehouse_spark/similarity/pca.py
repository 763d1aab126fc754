"""Distributed PCA (top principal component) by exact Gram matrix +
power iteration — the embedding-quality primitive a training pipeline
runs to find the dominant variance direction (anisotropy check,
whitening input, drift axis).

Why this decomposition fits Spark: the ONLY data-sized pass is the
covariance accumulation — (dim × dim) integer sufficient statistics
with map-side partial aggregation — after which the eigen-iteration
runs over a dim²-row frame (64² = 4096 rows here) that never grows
with the corpus. This is the textbook "sufficient statistics then
driver-scale solve" split, except the solve also stays declarative
(joins/aggs over the tiny frame) so the ENTIRE computation is one
Catalyst plan and one DuckDB oracle.

Exactness discipline: embeddings quantize to the 1e-6 integer grid
first (the ``pq_codebook_trained`` convention), so Σq_i and Σq_i·q_j
are exact BIGINTs — order-independent, bit-identical cross-engine.
The centered covariance C = (Σq_iq_j − Σq_i·Σq_j/n)/(n·10¹²) and the
power iterations are then fixed IEEE expression trees over those
exact integers; the one nondeterminism class left (64-term double
sums inside the iteration aggs) is ulp-scale and absorbed by
round(6)/round(4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import query
from ..tables import load_tables
from .ann import EMB_DIM

PCA_ITERS = 3  # normalized power-iteration rounds before the Rayleigh step
_Q = 1_000_000  # micro-grid
_V0 = 0.125  # 1/sqrt(64): uniform unit start vector


def _pca_oracle() -> str:
    it_prev = "it0"
    iter_ctes = []
    for t in range(1, PCA_ITERS + 1):
        iter_ctes.append(
            f"""
    w{t} AS (
        SELECT c.i, sum(c.c * v.v) AS w
        FROM cov c JOIN {it_prev} v ON c.j = v.i GROUP BY c.i
    ),
    n{t} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{t}),
    it{t} AS (SELECT i, w / nrm AS v FROM w{t}, n{t})"""
        )
        it_prev = f"it{t}"
    iters = ",".join(iter_ctes)
    return f"""
    WITH cells AS (
        SELECT vec_id, r.d - 1 AS i,
               CAST(round(CAST(embedding[r.d] AS DOUBLE) * {_Q}) AS BIGINT)
                 AS q
        FROM embeddings CROSS JOIN range(1, {EMB_DIM + 1}) r(d)
    ),
    sq AS (
        SELECT i, CAST(sum(q) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM cells GROUP BY i
    ),
    sqq AS (
        SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS ss
        FROM cells a JOIN cells b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ),
    cov AS (
        SELECT p.i, p.j,
               (CAST(p.ss AS DOUBLE)
                - CAST(si.s AS DOUBLE) * sj.s / si.n)
                 / (CAST(si.n AS DOUBLE) * {_Q}.0 * {_Q}.0) AS c
        FROM sqq p JOIN sq si ON p.i = si.i JOIN sq sj ON p.j = sj.i
    ),
    it0 AS (SELECT i, {_V0} AS v FROM sq),{iters},
    ray AS (
        SELECT c.i, sum(c.c * v.v) AS w
        FROM cov c JOIN it{PCA_ITERS} v ON c.j = v.i GROUP BY c.i
    ),
    lam AS (
        SELECT sum(r.w * v.v) AS eigval
        FROM ray r JOIN it{PCA_ITERS} v ON r.i = v.i
    )
    SELECT CAST(v.i AS BIGINT) AS dim,
           round(v.v, 6) AS loading,
           round(lam.eigval, 4) AS eigval,
           (SELECT CAST(max(n) AS BIGINT) FROM sq) AS n_vecs
    FROM it{PCA_ITERS} v, lam
    """


@query("emb_pca_power_iteration", _pca_oracle())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table: exact integer
    Gram/covariance accumulation, then {PCA_ITERS} normalized power
    iterations and a Rayleigh-quotient eigenvalue, all inside one
    declarative plan (module docstring has the full exactness story).

    Start vector is the uniform unit vector (deterministic, so the
    converged SIGN is identical cross-engine — no sign-fixing rule
    needed). Scale: the corpus is touched exactly twice (dim-sums and
    the vec_id-local pair products — both map-side partial aggs whose
    shuffle is dim²-bounded); every iteration joins the dim²-row
    covariance frame against a dim-row vector, constant work at any
    corpus size. At 10⁹ vectors the same plan holds; only the two
    integer accumulations see the data."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    qvec = emb.select(
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>),"
            f" x -> CAST(round(x * {_Q}) AS BIGINT))"
        ).alias("q")
    )
    cells = qvec.select(F.posexplode("q").alias("i", "q"))
    sq = cells.groupBy("i").agg(
        F.sum("q").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # pair products expand ROW-LOCALLY (nested HOF, no join, no shuffle
    # of the corpus by vec_id) — the dim²-cell stream then collapses in
    # the map-side partial agg, so only dim² rows per task ever shuffle
    pairs = qvec.select(
        F.explode(
            F.expr(
                "flatten(transform(q, (qi, i) ->"
                " transform(q, (qj, j) ->"
                " struct(i AS i, j AS j, qi * qj AS p))))"
            )
        ).alias("c")
    )
    sqq = (
        pairs.select("c.i", "c.j", "c.p")
        .groupBy("i", "j")
        .agg(F.sum("p").cast("long").alias("ss"))
    )
    si = sq.select(F.col("i").alias("ci"), F.col("s").alias("si"), "n")
    sj = sq.select(F.col("i").alias("cj"), F.col("s").alias("sj"))
    cov = (
        sqq.join(F.broadcast(si), sqq.i == si.ci)
        .join(F.broadcast(sj), sqq.j == sj.cj)
        .select(
            "i",
            "j",
            (
                (
                    F.col("ss").cast("double")
                    - F.col("si").cast("double") * F.col("sj") / F.col("n")
                )
                / (F.col("n").cast("double") * float(_Q) * float(_Q))
            ).alias("c"),
        )
    )
    v = sq.select("i", F.lit(_V0).alias("v"))
    for _ in range(PCA_ITERS):
        w = (
            cov.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("w") / F.col("nrm")).alias("v")
        )
    ray = (
        cov.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
    )
    lam = (
        ray.join(F.broadcast(v), "i")
        .agg(F.sum(F.col("w") * F.col("v")).alias("eigval"))
    )
    n_vecs = sq.agg(F.max("n").cast("long").alias("n_vecs"))
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(n_vecs))
        .select(
            F.col("i").cast("long").alias("dim"),
            F.round("v", 6).alias("loading"),
            F.round("eigval", 4).alias("eigval"),
            "n_vecs",
        )
    )
