"""Exact deduplication over the ``documents`` table.

Strategy (100 TB posture): never compare full text across the cluster —
compute a 256-bit fingerprint per document (JVM-side sha2 over
canonicalized text), then a hash-partitioned groupBy on the fingerprint.
The shuffle carries 32-byte keys instead of documents; survivors are
selected with min(doc_id) so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from ..operators.relational import query
from ..tables import load_tables

# DuckDB mirror of functions.text.normalize_text / fingerprint.
FINGERPRINT_SQL = (
    "sha256(regexp_replace(regexp_replace(lower(trim(text)), "
    "'[\\.,;:!\\?''\"()\\[\\]{}-]', '', 'g'), '\\s+', ' ', 'g'))"
)


@query(
    "dedup_exact_groups",
    f"""
    SELECT {FINGERPRINT_SQL} AS fp,
           min(doc_id) AS keep_id,
           count(*)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint → group: one row per distinct content, with the
    surviving doc_id and the duplicate count."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_exact_survivors",
    f"""
    WITH fp AS (
        SELECT doc_id, lang, source, n_chars, {FINGERPRINT_SQL} AS fp
        FROM documents
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp)
    SELECT f.doc_id, f.lang, f.source, f.n_chars
    FROM fp f JOIN keep k ON f.doc_id = k.doc_id
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself (metadata projection). Window-free
    formulation: groupBy + semi-join back, which scales better than a
    row_number window when one fingerprint is hot (skew → AQE splits
    the join, while a window partition cannot be split)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", "lang", "source", "n_chars", fingerprint("text").alias("fp")
    )
    keep = docs.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Exact-dedup combo: groups + survivors in one result.
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    f"""
    WITH fp AS (
        SELECT doc_id, lang, source, n_chars, {FINGERPRINT_SQL} AS fp
        FROM documents
    ),
    keep AS (SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             FROM fp GROUP BY fp)
    SELECT f.doc_id, f.lang, f.source, f.n_chars, k.n_copies
    FROM fp f JOIN keep k ON f.doc_id = k.keep_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup end-to-end: fingerprint → hash-partitioned groupBy
    (32-byte keys shuffle, never documents) → survivor join-back. Each
    surviving row carries its duplicate-group size, so this one result
    checks both the grouping and the survivor selection."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", "lang", "source", "n_chars", fingerprint("text").alias("fp")
    )
    keep = docs.groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return docs.join(keep, docs.doc_id == keep.keep_id).select(
        "doc_id", "lang", "source", "n_chars", "n_copies"
    )
