"""Exact SUBSTRING-level dedup: repeated k-gram span detection.

Document-level dedup (exact / MinHash / SimHash) misses the common
web-corpus failure where DISTINCT documents share long verbatim
passages — boilerplate, licenses, quoted articles. The remedy
popularized for LLM training data ("deduplicating training data makes
language models better") is substring-level: find every ≥k-token run
that occurs more than once across the corpus, and report/trim those
spans per document.

Relational formulation — no suffix array needed, everything stays in
whole-stage codegen and hash shuffles:

1. tokens with positions per doc (posexplode of the normalized split —
   same canonicalization as the other dedup flavors),
2. k-gram at each position via window ``lead`` (evaluated once per
   token, not once per gram character),
3. grams occurring >1 time corpus-wide — ONE groupBy(gram) with a
   window count — mark their start positions "duplicated",
4. gaps-and-islands per doc (pos − row_number() run key) merges
   overlapping/adjacent duplicated gram starts into maximal SPANS:
   start..start+k−1 of the last gram in the run,
5. per-doc rollup: span count, duplicated-token fraction, longest
   span, and a keep/trim verdict.

The gram GROUP key here is the gram text itself, which both engines
render identically — that's what makes the whole pipeline
DuckDB-oracle-checkable. At 100 TB you'd group on ``xxhash64(gram)``
instead (8-byte shuffle rows instead of ~50-byte strings; collisions
are 2⁻⁶⁴-rare and only ever cause over-marking); the shuffle SHAPE is
identical, so the oracle-checked flavor certifies the production one.

Scale shape: the wide ops are one window over (doc_id, pos) — reused
by steps 2 and 4 (same partitioning) — and one corpus-wide
groupBy(gram) whose partial aggregation collapses each gram to a count
before the exchange. Text rides the shuffle only as k-gram fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import normalize_text
from ..operators.relational import query
from ..tables import load_tables

K_TOKENS = 8  # minimum duplicated run, in tokens (k-gram width)


def duplicated_spans(
    docs: DataFrame, text_col: str = "text", k: int = K_TOKENS
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) maximal duplicated
    spans — token positions, 0-based inclusive."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        "pos",
        F.concat_ws(
            " ", "tok", *[F.lead("tok", j).over(w) for j in range(1, k)]
        ).alias("gram"),
        F.lead("tok", k - 1).over(w).alias("_tail"),
    ).filter(F.col("_tail").isNotNull())
    # corpus-wide repetition mark: window count over the gram value —
    # its (gram) partitioning is the one corpus-wide exchange
    wg = Window.partitionBy("gram")
    dup_starts = (
        grams.withColumn("n", F.count(F.lit(1)).over(wg))
        .filter(F.col("n") > 1)
        .select("doc_id", "pos")
    )
    # gaps-and-islands: consecutive (or overlapping — any gap < k)
    # duplicated starts merge into one maximal span. Start positions
    # p and q (p<q) overlap/abut when q ≤ p + k, so a run breaks when
    # the jump exceeds k; pos − k·row_number() is not constant across
    # variable jumps, so use an explicit new-run flag + running sum.
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dup_starts.withColumn("prev", F.lag("pos").over(wd))
        .withColumn(
            "new_run",
            (F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k))
            .cast("int"),
        )
        .withColumn("run_id", F.sum("new_run").over(wd))
    )
    return runs.groupBy("doc_id", "run_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        (F.max("pos") - F.min("pos") + F.lit(k)).alias("span_tokens"),
    ).select("doc_id", "span_start", "span_end", "span_tokens")


DUP_FRAC_DROP = 0.5  # drop a doc when most of it is duplicated text


def _oracle() -> str:
    from .portable import _NORM_DUCK

    k = K_TOKENS
    gram_cat = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_DUCK}, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(range(1, len(w) - {k - 1} + 1)) - 1 AS pos,
             unnest(list_transform(range(1, len(w) - {k - 1} + 1),
                    i -> {gram_cat})) AS gram
      FROM norm WHERE len(w) >= {k}
    ),
    marked AS (
      SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n FROM grams
    ),
    dup AS (SELECT doc_id, pos FROM marked WHERE n > 1),
    runs AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       IS NULL
                  OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       > {k}
                  THEN 1 ELSE 0 END AS new_run
      FROM dup
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
      FROM runs
    ),
    spans AS (
      SELECT doc_id,
             min(pos) AS span_start,
             max(pos) - min(pos) + {k} AS span_tokens
      FROM islands GROUP BY doc_id, run_id
    ),
    lens AS (SELECT doc_id, len(w) AS n_tokens FROM norm),
    per_doc AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_dup_spans,
             CAST(max(s.span_tokens) AS BIGINT) AS longest_span,
             round(least(CAST(sum(s.span_tokens) AS DOUBLE) / l.n_tokens,
                         1.0), 4) AS dup_frac
      FROM spans s JOIN lens l ON s.doc_id = l.doc_id
      GROUP BY s.doc_id, l.n_tokens
    )
    SELECT doc_id, n_dup_spans, longest_span, dup_frac,
           dup_frac < {DUP_FRAC_DROP} AS keep
    FROM per_doc
    ORDER BY doc_id
    """


@query("text_substring_dedup", _oracle())
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring report over the corpus: span
    count, longest span, duplicated-token fraction (capped at 1.0 —
    overlapping gram spans can overcount), keep/trim verdict. Docs with
    no duplicated span are absent (their report is all-zeros)."""
    docs = load_tables(spark, sf_dir)["documents"]
    spans = duplicated_spans(docs)
    lens = docs.select(
        "doc_id", F.size(F.split(normalize_text("text"), " ")).alias("n_tokens")
    )
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        # positions are int32; BIGINT to match the oracle's types
        F.max("span_tokens").cast("long").alias("longest_span"),
        F.sum("span_tokens").alias("_dup_toks"),
    )
    # broadcast the SPAN side: docs with duplicated spans ≪ corpus, so
    # the token-length scan probes a small hash instead of shuffling
    return (
        F.broadcast(agg)
        .join(lens, "doc_id")
        .select(
            "doc_id",
            "n_dup_spans",
            "longest_span",
            F.round(
                F.least(F.col("_dup_toks") / F.col("n_tokens"), F.lit(1.0)), 4
            ).alias("dup_frac"),
        )
        .withColumn("keep", F.col("dup_frac") < DUP_FRAC_DROP)
        .orderBy("doc_id")
    )
