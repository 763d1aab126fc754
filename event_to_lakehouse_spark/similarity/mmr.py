"""Maximal Marginal Relevance (MMR) diversified top-k — the re-rank a
retrieval pipeline runs between ANN shortlist and consumer so the k
results are not k near-duplicates (Carbonell & Goldstein 1998; the
standard diversity pass in RAG retrieval and training-example
selection, where near-dup results waste the candidate budget).

MMR is greedy: pick the most relevant candidate, then repeatedly pick

    argmax_c  λ·rel(q, c) − (1−λ)·max_{s∈selected} sim(c, s)

Relational shape: ONE relevance pass builds the per-query candidate
pool (exact cosine top-``MMR_POOL`` — in production the pool comes
from the certified ANN stack, ``ann_ivfpq_topk``; pool construction is
swappable, the re-rank is this module's operator), ONE self-join
builds the pool×pool similarity table (pool is per-query bounded, so
pairs are k²-scale — never corpus-scale), and each greedy step is a
join + groupBy-max + window-argmax over those two POOL-SCALE tables.
The corpus is touched exactly once, in the relevance pass; the k−1
greedy rounds move only O(queries × pool) rows, so the whole re-rank
is metadata-scale at 100 TB and the chained plan is oracle-checkable
(the PageRank/k-hop fixed-round discipline).

Cross-engine exactness: cosines snap to the integer MICRO grid
(``round(cos × 1e6)`` AS BIGINT — the ``similarity/pq.py`` pattern)
the moment they are computed, and λ = 0.7 enters as the integer
weights 7/3 on the ×10 grid, so every argmax ordering downstream is
exact integer arithmetic with a vec_id tiebreak — no
round(4)-of-double-divide boundary anywhere.

Reference parity: the reference (2-script event ETL) has no retrieval
tier; SURVEY §2's LLM-pipeline mandate ("similarity search …
diversification of retrieved sets") is the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from ..operators.relational import query
from ..tables import load_tables
from .ann import _COS_SQL

MMR_NQ = 2  # fixed query set: vec_id < 2
MMR_POOL = 15  # relevance shortlist per query
MMR_K = 5  # diversified picks per query
MMR_REL_W = 7  # λ = 0.7 as integer weights on the ×10 grid
MMR_DIV_W = 3  # 1 − λ


def _cos_micro(a_emb, b_emb, a_norm, b_norm) -> F.Column:
    """Cosine on the integer micro grid. Norm product order mirrors
    the oracle's sqrt(a·a)·sqrt(b·b) (IEEE multiply is commutative,
    divide rides the proven dot ↔ list_dot_product parity pair)."""
    denom = a_norm * b_norm
    cos = F.when(denom > 0, dot(a_emb, b_emb) / denom)
    return F.round(cos * F.lit(1_000_000.0)).cast("long")


def mmr_pool(corpus: DataFrame, queries_df: DataFrame, pool: int = MMR_POOL) -> DataFrame:
    """(query_id, vec_id, embedding, _norm, rel_micro): the per-query
    exact-cosine shortlist — the one corpus-scale pass."""
    q = queries_df.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
    )
    c = corpus.filter(F.col("vec_id").isNotNull()).withColumn(
        "_norm", l2_norm("embedding")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "_norm",
            _cos_micro(
                F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("_norm")
            ).alias("rel_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel_micro").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= pool)
        .drop("rk")
    )


def mmr_rerank(pool: DataFrame, k: int = MMR_K) -> DataFrame:
    """Greedy MMR over a (query_id, vec_id, embedding, _norm,
    rel_micro) pool: returns (query_id, pick, vec_id, rel_micro,
    mmr_score). ``pool`` and the pool×pool similarity table are
    localCheckpoint-ed once so the k−1 rounds chain over materialized
    pool-scale frames (the ``pagerank`` links pattern), and the
    selected set rides each round's join as a broadcast."""
    pool = pool.localCheckpoint(eager=False)
    a = pool.select(
        "query_id",
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("_norm").alias("a_norm"),
    )
    b = pool.select(
        "query_id",
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("_norm").alias("b_norm"),
    )
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "query_id",
            "a_id",
            "b_id",
            _cos_micro(
                F.col("a_emb"), F.col("b_emb"), F.col("a_norm"), F.col("b_norm")
            ).alias("sim_micro"),
        )
        .localCheckpoint(eager=False)
    )
    slim = pool.select("query_id", "vec_id", "rel_micro")
    w_rel = Window.partitionBy("query_id").orderBy(
        F.col("rel_micro").desc(), "vec_id"
    )
    picks = (
        slim.withColumn("rk", F.row_number().over(w_rel))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.lit(1).alias("pick"),
            "vec_id",
            "rel_micro",
            (F.lit(MMR_REL_W) * F.col("rel_micro")).alias("mmr_score"),
        )
    )
    selected = picks.select("query_id", "vec_id")
    for i in range(2, k + 1):
        pen = (
            pairs.join(
                F.broadcast(
                    selected.select("query_id", F.col("vec_id").alias("b_id"))
                ),
                ["query_id", "b_id"],
            )
            .groupBy("query_id", F.col("a_id").alias("vec_id"))
            .agg(F.max("sim_micro").alias("pen_micro"))
        )
        cand = (
            slim.join(selected, ["query_id", "vec_id"], "left_anti")
            .join(pen, ["query_id", "vec_id"])
            .select(
                "query_id",
                "vec_id",
                "rel_micro",
                (
                    F.lit(MMR_REL_W) * F.col("rel_micro")
                    - F.lit(MMR_DIV_W) * F.col("pen_micro")
                ).alias("mmr_score"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("mmr_score").desc(), "vec_id"
        )
        pick = (
            cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("query_id", F.lit(i).alias("pick"), "vec_id", "rel_micro", "mmr_score")
        )
        picks = picks.unionByName(pick)
        selected = selected.unionByName(pick.select("query_id", "vec_id"))
    return picks


def _mmr_round_sql(i: int) -> str:
    prev = f"sel{i - 1}"
    return f"""
    cand{i} AS (
        SELECT p.query_id, p.vec_id, p.rel_micro,
               {MMR_REL_W} * p.rel_micro - {MMR_DIV_W} * max(pr.sim_micro)
                   AS mmr_score
        FROM pool p
        JOIN pairs pr ON pr.query_id = p.query_id AND pr.a_id = p.vec_id
        JOIN {prev} s ON s.query_id = pr.query_id AND s.vec_id = pr.b_id
        WHERE NOT EXISTS (
            SELECT 1 FROM {prev} x
            WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id
        )
        GROUP BY p.query_id, p.vec_id, p.rel_micro
    ),
    s{i} AS (
        SELECT query_id, {i} AS pick, vec_id, rel_micro, mmr_score FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY mmr_score DESC, vec_id
            ) AS rk FROM cand{i}
        ) WHERE rk = 1
    ),
    sel{i} AS (
        SELECT query_id, vec_id FROM {prev}
        UNION ALL SELECT query_id, vec_id FROM s{i}
    )"""


def _mmr_oracle() -> str:
    rounds = ",".join(_mmr_round_sql(i) for i in range(2, MMR_K + 1))
    union = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, MMR_K + 1)
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb
        FROM embeddings WHERE vec_id < {MMR_NQ}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id, e.embedding,
               CAST(round(({_COS_SQL.format(a="q.q_emb", b="e.embedding")})
                          * 1000000) AS BIGINT) AS rel_micro
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    ),
    pool AS (
        SELECT query_id, vec_id, embedding, rel_micro FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel_micro DESC, vec_id
            ) AS rk FROM scored
        ) WHERE rk <= {MMR_POOL}
    ),
    pairs AS (
        SELECT a.query_id, a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(round(({_COS_SQL.format(a="a.embedding", b="b.embedding")})
                          * 1000000) AS BIGINT) AS sim_micro
        FROM pool a JOIN pool b
          ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
    ),
    s1 AS (
        SELECT query_id, 1 AS pick, vec_id, rel_micro,
               {MMR_REL_W} * rel_micro AS mmr_score FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel_micro DESC, vec_id
            ) AS rk FROM pool
        ) WHERE rk = 1
    ),
    sel1 AS (SELECT query_id, vec_id FROM s1),
    {rounds}
    SELECT * FROM ({union}) ORDER BY query_id, pick
    """


@query("ann_mmr_diversified", _mmr_oracle())
def ann_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{MMR_K} per query: exact-cosine pool of
    {MMR_POOL}, then {MMR_K} greedy picks at λ=0.7. Every greedy round
    is hash-verified by the chained-CTE oracle (fixed-round
    discipline); all ordering is integer micro-grid + vec_id tiebreak.
    ``pick`` 1 is pure relevance (no penalty term by definition);
    later picks trade relevance against max similarity to the already
    selected set — the diversity guarantee the pytest invariants pin."""
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    pool = mmr_pool(emb, emb.filter(F.col("vec_id") < MMR_NQ))
    return mmr_rerank(pool).orderBy("query_id", "pick")
