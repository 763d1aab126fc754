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


#: synthetic re-crawl doc_id namespace starts at max(doc_id)+1
#: (ADVICE r12, closed in code: a fixed 10M constant silently aliased
#: organic doc_ids >= 10M on a bigger corpus, corrupting min-doc_id
#: survivor accounting; deriving from the corpus maximum can never
#: collide). Both engines compute it as the same scalar subquery.
RECRAWL_OFFSET_SQL = "(SELECT max(doc_id) + 1 FROM documents)"
RECRAWL_MOD = 10  # every 10th doc arrives twice


@query(
    "corpus_dedup_impact",
    f"""
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + {RECRAWL_OFFSET_SQL} AS doc_id, source, text
        FROM documents WHERE doc_id % {RECRAWL_MOD} = 0
    ),
    fp AS (
        SELECT doc_id, source, {FINGERPRINT_SQL} AS fp,
               CAST(len(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), t -> t <> '')) AS BIGINT) AS n_words
        FROM corpus
    ),
    keep AS (SELECT min(doc_id) AS keep_id FROM fp GROUP BY fp)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (k.keep_id IS NOT NULL) AS BIGINT)
             AS n_kept,
           round(1.0 - CAST(count(*) FILTER (k.keep_id IS NOT NULL)
                            AS DOUBLE) / count(*), 4) AS doc_dup_rate,
           CAST(sum(f.n_words) AS BIGINT) AS tokens_total,
           CAST(sum(f.n_words) FILTER (k.keep_id IS NOT NULL) AS BIGINT)
             AS tokens_kept,
           round(1.0 - CAST(sum(f.n_words) FILTER (k.keep_id IS NOT NULL)
                            AS DOUBLE) / sum(f.n_words), 4)
             AS token_savings_rate
    FROM fp f LEFT JOIN keep k ON f.doc_id = k.keep_id
    GROUP BY f.source
    """,
)
def corpus_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup would SAVE, per source — the before/after
    accounting a curation dashboard shows next to the dedup run
    itself: document dup rate and the token mass removed when only
    first-arrival (min doc_id) survivors are kept.

    The synthetic corpus has no exact duplicates, so the entry unions
    in a deterministic RE-CRAWL slice (every RECRAWL_MOD-th doc again
    under a shifted doc_id namespace starting at max(doc_id)+1, a
    broadcast scalar both engines derive from the corpus itself — see
    RECRAWL_OFFSET_SQL) — the arrival pattern dedup exists for —
    making both the dup-rate and the survivorship accounting
    non-trivial and hash-checked. Composes the certified
    fingerprint (normalize→sha256, identical to ``dedup_exact_groups``)
    with the token counter the text tier uses, so the report is
    consistent with both families by construction. Survivor membership
    is a LEFT join against the min-doc_id-per-fingerprint set — the
    same window-free skew-safe shape as ``dedup_exact_survivors``. One
    scan, one fingerprint-cardinality agg, one source-cardinality agg;
    at 100 TB the token counting is map-side and the only wide state
    is the fingerprint group-by the dedup itself already pays for."""
    t = load_tables(spark, sf_dir)
    base = t["documents"].select("doc_id", "source", "text")
    off = base.agg((F.max("doc_id") + 1).alias("_recrawl_off"))
    corpus = base.unionByName(
        base.filter(F.col("doc_id") % RECRAWL_MOD == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("_recrawl_off")).alias("doc_id"),
            "source",
            "text",
        )
    )
    docs = corpus.select(
        "doc_id",
        "source",
        fingerprint("text").alias("fp"),
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        )
        .cast("long")
        .alias("n_words"),
    )
    keep = docs.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    j = docs.join(
        keep.select("keep_id"),
        docs.doc_id == F.col("keep_id"),
        "left",
    )
    kept = F.col("keep_id").isNotNull()
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.round(
            1.0 - F.count(F.when(kept, 1)).cast("double") / F.count(F.lit(1)),
            4,
        ).alias("doc_dup_rate"),
        F.sum("n_words").cast("long").alias("tokens_total"),
        F.sum(F.when(kept, F.col("n_words"))).cast("long").alias(
            "tokens_kept"
        ),
        F.round(
            1.0
            - F.sum(F.when(kept, F.col("n_words"))).cast("double")
            / F.sum("n_words"),
            4,
        ).alias("token_savings_rate"),
    )
