"""Exact n-gram Jaccard near-duplicate detection (prefix-blocked).

Unlike MinHash (``minhash.py``, an estimate), this computes the TRUE
word-3-gram Jaccard similarity for candidate pairs, using a blocking
key to avoid the O(n²) all-pairs:

1. shingle sets: distinct word 3-grams per document, built once per doc
   with a single higher-order ``transform`` over token offsets (all
   JVM-side Catalyst expressions).
2. blocking: candidate pairs are documents sharing a normalized text
   prefix — an equi self-join on the block key, so the pair space
   hash-partitions on the key and never cross-products.
3. exact Jaccard: |intersect| / |union| via ``array_intersect`` /
   ``array_union`` sizes (set semantics on the distinct shingles).

At 100 TB: shingle arrays shuffle only within a block bucket; skewed
blocks (boilerplate prefixes) are AQE-skew-split, and ``MAX_BLOCK``
drops non-discriminative buckets (same guard as minhash.MAX_BUCKET).
Fully oracle-checkable (DuckDB list functions express the same set
algebra) — this is the exactness gauge for the MinHash estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import _r4, query
from ..tables import load_tables

BLOCK_PREFIX = 30  # chars of raw-text prefix forming the candidate block
NGRAM = 3
THRESHOLD = 0.6
MAX_BLOCK = 200  # drop degenerate (non-discriminative) blocks


def shingle_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, block, shingles) with shingles = distinct word 3-grams.

    Tokenization is projected first so the lambda references a plain
    attribute (a lambda over a computed column would re-evaluate its
    subtree per element — see minhash.py). Documents with < 3 tokens
    use the whole token array as one shingle."""
    toks = docs.select(
        "doc_id",
        F.substring(F.col(text_col), 1, BLOCK_PREFIX).alias("block"),
        F.split(F.lower(F.col(text_col)), " ").alias("w"),
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.size("w") - (NGRAM - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at("w", i),
            F.element_at("w", i + 1),
            F.element_at("w", i + 2),
        ),
    )
    return toks.filter(F.size("w") >= NGRAM).select(
        "doc_id", "block", F.array_distinct(gram).alias("shingles")
    )


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH t AS (
      SELECT doc_id, substr(text, 1, {BLOCK_PREFIX}) AS block,
             string_split(lower(text), ' ') AS w
      FROM documents
    ),
    s AS (
      SELECT doc_id, block,
             list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM t WHERE len(w) >= {NGRAM}
    ),
    ok AS (
      SELECT block FROM s GROUP BY block HAVING count(*) <= {MAX_BLOCK}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM s a
    JOIN s b ON a.block = b.block AND a.doc_id < b.doc_id
    JOIN ok ON a.block = ok.block
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= {THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard near-dup pairs over ``documents`` (threshold 0.6)."""
    t = load_tables(spark, sf_dir)
    return jaccard_pairs(t["documents"])


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = THRESHOLD,
    max_block: int = MAX_BLOCK,
) -> DataFrame:
    """Prefix-blocked exact-Jaccard pairs over any (doc_id, text)
    corpus; degenerate blocks (> ``max_block`` docs — boilerplate
    prefixes) are dropped before the self-join so the pair space stays
    bounded by block occupancy."""
    s = shingle_sets(docs)

    ok = (
        s.groupBy("block")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_block)
        .select("block")
    )
    a = s.alias("a")
    b = s.select(
        F.col("doc_id").alias("doc_b"),
        F.col("block").alias("block_b"),
        F.col("shingles").alias("sh_b"),
    )
    pairs = (
        a.join(ok, "block", "left_semi")
        .join(b, (F.col("block") == F.col("block_b")) & (F.col("doc_id") < F.col("doc_b")))
    )
    jac = F.size(F.array_intersect("shingles", "sh_b")).cast("double") / F.size(
        F.array_union("shingles", "sh_b")
    )
    return (
        pairs.withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= threshold)
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            _r4(F.col("jaccard_raw")).alias("jaccard"),
        )
    )
