"""Durable hybrid serving (VERDICT r11 #3): the sparse (InvertedIndex)
and dense (IVFPQIndex) retrievers compose through rrf_fuse, and the
fused list is durable — a reopen-from-disk serve reproduces it."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_to_lakehouse_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


def test_hybrid_durable_serve_and_reopen(spark, tmp_dir):
    from event_to_lakehouse_spark.retrieval import DENSE_QUERY_ID, rrf_fuse
    from event_to_lakehouse_spark.similarity.ivfpq import IVFPQIndex
    from event_to_lakehouse_spark.textindex import InvertedIndex
    from event_to_lakehouse_spark.textops import BM25_QUERY

    t = load_tables(spark, SF)
    docs = t["documents"].select("doc_id", "text")
    emb = t["embeddings"].select("vec_id", "embedding")

    inv = InvertedIndex(spark, f"{tmp_dir}/inv")
    inv.add_batch(docs, batch_token="all")
    ivf = IVFPQIndex.build(spark, f"{tmp_dir}/ivfpq", train=emb)
    ivf.add_batch(emb, batch_token="all")

    def fused(inv_idx, ivf_idx):
        sparse = inv_idx.topk(BM25_QUERY)
        dense = ivf_idx.topk(
            emb, emb.filter(F.col("vec_id") == DENSE_QUERY_ID)
        ).select(F.col("vec_id").alias("doc_id"), "rank")
        return [tuple(r) for r in rrf_fuse(sparse, dense).collect()]

    first = fused(inv, ivf)
    assert len(first) > 0
    # the fused list carries contributions from BOTH retrievers
    assert any(r[1] is not None for r in first)  # bm25_rank present
    assert any(r[2] is not None for r in first)  # dense_rank present

    # durability: fresh objects, same roots, nothing rebuilt
    again = fused(
        InvertedIndex(spark, f"{tmp_dir}/inv"),
        IVFPQIndex(spark, f"{tmp_dir}/ivfpq"),
    )
    assert first == again
