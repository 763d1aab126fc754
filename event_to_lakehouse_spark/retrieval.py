"""Hybrid retrieval: sparse BM25 + dense cosine fused by Reciprocal
Rank Fusion (RRF, Cormack 2009) — the standard modern retrieval stack
(every production RAG/search system fuses a lexical and a vector
ranker; RRF is the fusion that needs no score calibration because it
consumes only RANKS).

Composition, not new machinery: the sparse side IS the certified
``text_bm25_search`` and the dense side IS the certified
``brute_force_topk`` (swap in the IVFPQ serving stack at scale — the
fusion consumes (doc_id, rank) and does not care who produced it).
The fusion itself is a full outer join of two k-row rank lists plus
integer arithmetic: ``Σ 1e6 div (RRF_K + rank)`` per side — k-scale
work regardless of corpus size, so hybrid serving costs exactly what
its two retrievers cost.

The DuckDB oracle embeds both certified oracles verbatim as
subqueries (the ``corpus_scorecard`` composition pattern) and fuses
with the identical integer expressions, so the whole hybrid stack —
both rankers AND the fusion — is hash-verified end to end.

The synthetic corpus aligns ``doc_id`` ≡ ``vec_id`` by construction
(both 0..N-1), standing in for the doc-to-embedding mapping a real
pipeline carries. The dense ranker excludes the query vector itself
(vec_id = query id), so the query document can enter the fused list
only through the sparse side — documented asymmetry, same both
engines.

Reference parity: the reference ETL has no retrieval tier; SURVEY §2's
LLM-pipeline mandate (similarity search + text search) is the spec —
this entry is their composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.relational import ORACLES, query
from .similarity.ann import brute_force_topk
from .tables import load_tables
from .textops import BM25_QUERY, text_bm25_search

RRF_K = 60  # the canonical RRF constant
FUSED_K = 10
DENSE_QUERY_ID = 0  # dense query: the embedding of doc 0


def rrf_fuse(
    sparse: DataFrame, dense: DataFrame, k: int = FUSED_K
) -> DataFrame:
    """Fuse two (doc_id, rank) lists: full outer join + per-side
    ``1e6 div (RRF_K + rank)`` contributions (integer — no float
    calibration, the whole point of RRF), top-k by fused score with
    doc_id tiebreak. Input lists are k-scale, so this is metadata
    work."""
    s = sparse.select("doc_id", F.col("rank").alias("bm25_rank"))
    d = dense.select("doc_id", F.col("rank").alias("dense_rank"))
    fused = (
        s.join(d, "doc_id", "full_outer")
        .withColumn(
            "rrf_micro",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({RRF_K} + bm25_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 div ({RRF_K} + dense_rank)"), F.lit(0)
                )
            ).cast("long"),
        )
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= k)
        .orderBy("fused_rank")
    )


def _hybrid_oracle() -> str:
    # both certified oracles verbatim, fused with identical integers
    bm25 = ORACLES["text_bm25_search"]
    dense = ORACLES["ann_bruteforce_topk"]
    return f"""
    WITH sparse AS (
        SELECT doc_id, rank AS bm25_rank FROM ({bm25})
    ),
    dense AS (
        SELECT vec_id AS doc_id, rank AS dense_rank FROM ({dense})
        WHERE query_id = {DENSE_QUERY_ID}
    ),
    fused AS (
        SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
               s.bm25_rank, d.dense_rank,
               CAST(coalesce(1000000 // ({RRF_K} + s.bm25_rank), 0)
                    + coalesce(1000000 // ({RRF_K} + d.dense_rank), 0)
                    AS BIGINT) AS rrf_micro
        FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, bm25_rank, dense_rank, rrf_micro,
           CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
                AS INTEGER) AS fused_rank
    FROM fused ORDER BY fused_rank LIMIT {FUSED_K}
    """


def _hybrid_persisted_oracle() -> str:
    """The DURABLE hybrid stack (VERDICT r11 #3): the same RRF fusion
    SQL, but the dense subquery is the FULL composed
    ``ann_ivfpq_index_persisted`` oracle (both Lloyd training chains +
    cell probe + ADC + refine replayed in SQL) instead of brute force —
    the served IVFPQ list is approximate, so fusing it under the
    brute-force oracle would hash-fail whenever cell probing diverges;
    this oracle replays exactly what the durable index serves. The
    sparse subquery is the whole-corpus BM25 oracle, which is also
    ``text_bm25_index_persisted``'s oracle — both retrievers therefore
    enter the fusion under their own certified SQL."""
    bm25 = ORACLES["text_bm25_search"]
    dense = ORACLES["ann_ivfpq_index_persisted"]
    return f"""
    WITH sparse AS (
        SELECT doc_id, rank AS bm25_rank FROM ({bm25})
    ),
    dense AS (
        SELECT vec_id AS doc_id, rank AS dense_rank FROM ({dense})
        WHERE query_id = {DENSE_QUERY_ID}
    ),
    fused AS (
        SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
               s.bm25_rank, d.dense_rank,
               CAST(coalesce(1000000 // ({RRF_K} + s.bm25_rank), 0)
                    + coalesce(1000000 // ({RRF_K} + d.dense_rank), 0)
                    AS BIGINT) AS rrf_micro
        FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, bm25_rank, dense_rank, rrf_micro,
           CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
                AS INTEGER) AS fused_rank
    FROM fused ORDER BY fused_rank LIMIT {FUSED_K}
    """


@query("retrieval_hybrid_index_persisted", _hybrid_persisted_oracle())
def retrieval_hybrid_index_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hybrid serving from the DURABLE indexes end-to-end (VERDICT r11
    #3): build + two-batch-fill the inverted index and the
    Lloyd-trained IVFPQ index (the exact recipe their own certified
    entries use), serve the pinned lexical query from stored postings
    and the pinned dense query from stored centroids/codebook/codes,
    and fuse the two rank lists with ``rrf_fuse``. Green means the
    PERSISTED serving path for BOTH retrievers — plus the integer
    fusion — reproduces the composed oracle; a real deployment serves
    every query this way (index once, fuse per query; fusion cost is
    k-scale regardless of corpus size)."""
    import tempfile

    from .similarity.ivfpq import COARSE_TRAIN_ITERS, IVFPQIndex
    from .similarity.pq import PQ_TRAIN_ITERS
    from .textindex import InvertedIndex

    t = load_tables(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="hybrid_idx_")
    docs = t["documents"].select("doc_id", "text")
    inv = InvertedIndex(spark, f"{root}/inv")
    inv.add_batch(docs.filter(F.col("doc_id") % 2 == 0), batch_token="even")
    inv.add_batch(docs.filter(F.col("doc_id") % 2 == 1), batch_token="odd")

    emb = t["embeddings"].select("vec_id", "embedding")
    ivf = IVFPQIndex.build(
        spark,
        f"{root}/ivfpq",
        train=emb,
        train_iters=PQ_TRAIN_ITERS,
        coarse_iters=COARSE_TRAIN_ITERS,
    )
    ivf.add_batch(emb.filter(F.col("vec_id") % 2 == 0), batch_token="even")
    ivf.add_batch(emb.filter(F.col("vec_id") % 2 == 1), batch_token="odd")

    sparse = inv.topk(BM25_QUERY)
    dense = ivf.topk(
        emb, emb.filter(F.col("vec_id") == DENSE_QUERY_ID)
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse(sparse, dense)


@query("retrieval_hybrid_rrf", _hybrid_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-{FUSED_K}: BM25 over the pinned query terms fused
    with dense cosine for query vector {DENSE_QUERY_ID} via RRF.
    Every stage — the lexical ranker, the vector ranker, and the
    integer fusion — is the certified machinery; the oracle replays
    all three, so hybrid results are hash-verified end to end."""
    t = load_tables(spark, sf_dir)
    sparse = text_bm25_search(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", "embedding")
    dense = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == DENSE_QUERY_ID))
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(sparse, dense)
