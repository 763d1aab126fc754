"""Text-analysis queries over ``documents`` (language-ID, quality
scoring, token counting, fingerprinting — the LLM-pipeline text layer).

All metrics are the pure-expression column functions from
``functions.text``; queries here register them with DuckDB oracles.
Everything is a narrow scan→project (or one hash-agg), so throughput is
scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import (
    BPE_TOKEN_RE,
    STOPWORDS,
    bpe_token_count,
    char_count,
    fingerprint,
    lang_guess,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from .dedup.exact import FINGERPRINT_SQL
from .functions.hashing import hash60_duck, hash60_spark
from .operators.relational import _r4, query
from .tables import load_tables

_PUNCT_CLASS = "[\\.,;:!\\?''\"()\\[\\]{}-]"
_STOP_RE = "\\b(?:" + "|".join(STOPWORDS) + ")\\b"

_TOKENS_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)
_PUNCT_SQL = (
    f"(length(text) - length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g')))"
    " / CAST(greatest(length(text), 1) AS DOUBLE)"
)
_STOP_SQL = (
    f"len(regexp_extract_all(lower(text), '{_STOP_RE}'))"
    f" / CAST(greatest({_TOKENS_SQL}, 1) AS DOUBLE)"
)


@query(
    "text_metrics",
    f"""
    SELECT doc_id,
           CAST({_TOKENS_SQL} AS INTEGER)      AS n_tokens,
           CAST(length(text) AS INTEGER)       AS n_chars,
           round({_PUNCT_SQL}, 4)              AS punct_ratio,
           round({_STOP_SQL}, 4)               AS stopword_ratio
    FROM documents
    """,
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        char_count("text").alias("n_chars"),
        _r4(punct_ratio("text")).alias("punct_ratio"),
        _r4(stopword_ratio("text")).alias("stopword_ratio"),
    )


_BPE_SQL_RE = BPE_TOKEN_RE.replace("'", "''")  # SQL-literal quote escape


@query(
    "text_bpe_tokens",
    f"""
    SELECT source,
           CAST(sum(len(regexp_extract_all(lower(text),
                '{_BPE_SQL_RE}'))) AS BIGINT) AS total_bpe_tokens,
           round(avg(len(regexp_extract_all(lower(text),
                '{_BPE_SQL_RE}'))), 4) AS avg_bpe_tokens,
           round(avg(CAST({_TOKENS_SQL} AS DOUBLE)), 4) AS avg_ws_tokens
    FROM documents
    GROUP BY source
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token-cost estimation per corpus source: BPE-ish regex
    pre-tokenizer count next to the whitespace count (the two
    estimators the pipeline budget uses)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("source", bpe_token_count("text").alias("bpe"), token_count("text").alias("ws"))
        .groupBy("source")
        .agg(
            F.sum("bpe").cast("long").alias("total_bpe_tokens"),
            _r4(F.avg("bpe")).alias("avg_bpe_tokens"),
            _r4(F.avg(F.col("ws").cast("double"))).alias("avg_ws_tokens"),
        )
    )


@query(
    "text_quality_by_source",
    f"""
    WITH scored AS (
        SELECT source,
               round(
                   (CASE WHEN length(text) BETWEEN 50 AND 20000
                         THEN 0.5 ELSE 0.0 END)
                 + least({_STOP_SQL} * 2.0, 0.3)
                 - least({_PUNCT_SQL}, 0.2)
                 + 0.2, 4) AS q
        FROM documents
    )
    SELECT source, count(*) AS n_docs,
           round(avg(q), 4) AS avg_quality,
           round(min(q), 4) AS min_quality,
           round(max(q), 4) AS max_quality
    FROM scored
    GROUP BY source
    """,
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    scored = t["documents"].select(
        "source", quality_score("text").alias("q")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _r4(F.avg("q")).alias("avg_quality"),
        _r4(F.min("q")).alias("min_quality"),
        _r4(F.max("q")).alias("max_quality"),
    )


@query(
    "text_langid",
    """
    WITH g AS (
        SELECT doc_id, lang,
               CASE
                 WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
                      / CAST(greatest(length(text), 1) AS DOUBLE) > 0.05
                   THEN 'zh'
                 WHEN length(regexp_replace(text, '[^ñ¿¡áéíóúü]', '', 'g')) >
                      length(regexp_replace(text, '[^àâçèêëîïôùûœ]', '', 'g'))
                  AND length(regexp_replace(text, '[^ñ¿¡áéíóúü]', '', 'g')) >
                      length(regexp_replace(text, '[^äöüß]', '', 'g'))
                  AND length(regexp_replace(text, '[^ñ¿¡áéíóúü]', '', 'g')) > 0
                   THEN 'es'
                 WHEN length(regexp_replace(text, '[^àâçèêëîïôùûœ]', '', 'g')) >
                      length(regexp_replace(text, '[^äöüß]', '', 'g'))
                  AND length(regexp_replace(text, '[^àâçèêëîïôùûœ]', '', 'g')) > 0
                   THEN 'fr'
                 WHEN length(regexp_replace(text, '[^äöüß]', '', 'g')) > 0
                   THEN 'de'
                 ELSE 'en'
               END AS guessed_lang
        FROM documents
    )
    SELECT lang, guessed_lang, count(*) AS n_docs
    FROM g GROUP BY lang, guessed_lang
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("lang", lang_guess("text").alias("guessed_lang"))
        .groupBy("lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           sha256(regexp_replace(regexp_replace(lower(trim(text)),
               '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g'), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select("doc_id", fingerprint("text").alias("fp"))


@query(
    "text_token_topk",
    """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    )
    SELECT token, count(*) AS n
    FROM toks
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram top-k: explode → hash-agg → top-k. The
    explode is the only row-multiplying step; partial aggregation keeps
    the shuffle at vocabulary size, not token count."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


# Entity-redaction pattern. The synthetic corpus has no emails/phones,
# so the demo pattern targets entity words that DO occur; a production
# deployment swaps in PII regexes (email, phone, SSN) — the operator
# (global regexp_replace + match count + content hash) is unchanged.
REDACT_RE = r"\b(customer|supplier|order)\b"
REDACT_TOKEN = "[REDACTED]"


@query(
    "text_redact",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{REDACT_RE.replace("'", "''")}'))
                AS INTEGER) AS n_redacted,
           sha256(regexp_replace(text, '{REDACT_RE.replace("'", "''")}',
                                 '{REDACT_TOKEN}', 'g')) AS redacted_sha
    FROM documents
    WHERE regexp_matches(text, '{REDACT_RE.replace("'", "''")}')
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-span redaction: global regex replace + audit count,
    content-hashed so the oracle proves byte-identical scrubbing. Pure
    codegen expressions — scrubbing 100 TB is scan-bound."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("text").rlike(REDACT_RE))
        .select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(REDACT_RE), F.lit(0))).alias(
                "n_redacted"
            ),
            F.sha2(F.regexp_replace("text", REDACT_RE, REDACT_TOKEN), 256).alias(
                "redacted_sha"
            ),
        )
    )


# Deterministic sampling: first hex byte of a salted sha256 of the key.
# '32' keeps 0x00..0x32 = 51/256 ≈ 20%. Unlike rand()-based sampleBy,
# this is reproducible across engines, retries, and cluster sizes —
# the property a training-data pipeline needs for holdout splits.
SAMPLE_SALT = "split-v1|"
SAMPLE_MAX_BUCKET = "32"


@query(
    "text_sample_deterministic",
    f"""
    SELECT source, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE substr(sha256('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
          <= '{SAMPLE_MAX_BUCKET}'
    GROUP BY source
    """,
)
def text_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket sampling (~20%) keyed on a salted content key: the
    split is a pure function of (salt, doc_id), so re-runs, engines,
    and partitionings all agree on membership."""
    t = load_tables(spark, sf_dir)
    bucket = F.substring(
        F.sha2(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")), 256), 1, 2
    )
    return (
        t["documents"]
        .filter(bucket <= SAMPLE_MAX_BUCKET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
    )


DECON_NGRAM = 5  # word n-gram width (3-grams collide on generic phrases)
DECON_MIN_SHARED = 3  # shared distinct n-grams to flag contamination
DECON_EVAL_MOD = 20  # eval split: doc_id % 20 == 0 (a held-out benchmark)


@query(
    "text_decontaminate",
    f"""
    WITH t AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, len(string_split(lower(text),' ')) - {DECON_NGRAM - 2}),
               i -> array_to_string(string_split(lower(text),' ')[i:i+{DECON_NGRAM - 1}], ' ')))
             AS grams
      FROM documents
      WHERE len(string_split(lower(text),' ')) >= {DECON_NGRAM}
    ),
    e AS (SELECT doc_id AS eval_doc_id, unnest(grams) AS g
          FROM t WHERE doc_id % {DECON_EVAL_MOD} = 0),
    tr AS (SELECT doc_id, unnest(grams) AS g
           FROM t WHERE doc_id % {DECON_EVAL_MOD} <> 0)
    SELECT tr.doc_id, e.eval_doc_id,
           CAST(count(*) AS BIGINT) AS shared_ngrams
    FROM tr JOIN e USING (g)
    GROUP BY tr.doc_id, e.eval_doc_id
    HAVING count(*) >= {DECON_MIN_SHARED}
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥K
    distinct word n-grams with a held-out eval split (here doc_id %
    20 == 0 stands in for the benchmark corpus).

    Plan shape: distinct n-grams per doc (one ``transform`` HOF over
    the token array, evaluated once per doc), explode both sides, then
    an equi-join on the n-gram — the eval side is BROADCAST because
    eval corpora are benchmark-sized (thousands of docs), so at 100 TB
    the training corpus streams partition-local with zero shuffle until
    the tiny (train, eval) pair aggregation. Grams stay strings here
    for the DuckDB oracle; at scale hash them to longs (xxhash64) to
    shrink the broadcast.
    """
    t = load_tables(spark, sf_dir)
    # the composable form, exact-string flavor (oracle-mirrorable);
    # production uses hashed=True (xxhash64 keys) and, for large eval
    # splits, broadcast_eval=False — see decontaminate_pairs.
    return decontaminate_pairs(
        t["documents"], F.col("doc_id") % DECON_EVAL_MOD == 0, hashed=False
    )


# Per-stratum mix fractions (2-hex-char bucket ceilings, frac ≈ ceil/256):
# high-quality sources oversampled, the long tail thinned — the data-mix
# shaping step of an LLM training pipeline.
STRATA_BUCKETS = {
    "src0": "9a", "src1": "9a", "src2": "9a", "src3": "9a", "src4": "9a",  # ~60%
    "src5": "4d", "src6": "4d", "src7": "4d", "src8": "4d", "src9": "4d",  # ~30%
}
STRATA_DEFAULT_BUCKET = "1a"  # ~10% for every other source

_STRATA_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN source = '{s}' THEN '{b}'" for s, b in STRATA_BUCKETS.items())
    + f" ELSE '{STRATA_DEFAULT_BUCKET}' END"
)


@query(
    "text_sample_stratified",
    f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE substr(sha256('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
          < ({_STRATA_CASE_SQL})
    GROUP BY source
    """,
)
def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified data-mix sampling: each source keeps a configured
    fraction, decided by the same salted content-hash bucket as
    ``text_sample_deterministic`` — membership is a pure function of
    (salt, doc_id, source fraction), so re-runs, engines, and
    partitionings agree exactly. The per-stratum fraction is one CASE
    expression (broadcast-free, partition-local); scan→filter→hash-agg
    is the whole plan at any scale."""
    t = load_tables(spark, sf_dir)
    bucket = F.substring(
        F.sha2(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")), 256), 1, 2
    )
    ceiling = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(b))
            for s, b in STRATA_BUCKETS.items()
        ],
        F.lit(STRATA_DEFAULT_BUCKET),
    )
    return (
        t["documents"]
        .filter(bucket < ceiling)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
    )


def decontaminate_pairs(
    docs,
    eval_pred,
    ngram: int = DECON_NGRAM,
    min_shared: int = DECON_MIN_SHARED,
    hashed: bool = True,
    broadcast_eval: bool = True,
):
    """Composable decontamination: flag training docs sharing >=
    ``min_shared`` distinct word n-grams with the eval split selected by
    ``eval_pred`` (a boolean Column over the doc frame).

    ``hashed=True`` is the 100 TB path the registered query's docstring
    promises: n-grams are xxhash64'd to longs BEFORE the explode, so
    the broadcast eval side carries 8-byte keys instead of strings
    (~10× smaller for 5-gram text) and the equi-join compares longs.
    Collisions are a ~2^-64 false-flag risk — acceptable for a
    contamination screen; set ``hashed=False`` for the exact string
    form the DuckDB oracle mirrors.

    ``broadcast_eval=True`` fits the common case (benchmark-sized eval
    corpora); for a LARGE eval split pass ``False`` so Catalyst plans a
    shuffled hash/sort-merge join on the gram key instead of forcing a
    broadcast that would not fit executor memory."""
    w = F.split(F.lower(F.col("text")), " ")
    toks = docs.select("doc_id", eval_pred.alias("_is_eval"), w.alias("w")).filter(
        F.size("w") >= ngram
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.size("w") - (ngram - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("w", i + j) for j in range(ngram)]
        ),
    )
    grams = toks.select(
        "doc_id", "_is_eval", F.explode(F.array_distinct(gram)).alias("g")
    )
    if hashed:
        grams = grams.select("doc_id", "_is_eval", F.xxhash64("g").alias("g"))
    ev = grams.filter(F.col("_is_eval")).select(
        F.col("doc_id").alias("eval_doc_id"), "g"
    )
    tr = grams.filter(~F.col("_is_eval")).select("doc_id", "g")
    ev_side = F.broadcast(ev) if broadcast_eval else ev
    return (
        tr.join(ev_side, "g")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


# --- Chunking + packing (training-sequence preparation) --------------------

CHUNK_TOKENS = 64  # tokens per chunk window
CHUNK_OVERLAP = 8  # tokens shared between consecutive chunks
PACK_SHARDS = 16  # packing parallelism (per-shard ordering, see below)
PACK_MAX_TOKENS = 256  # target tokens per packed training sequence


@query(
    "text_chunks",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE trim(text) <> ''
    ),
    c AS (
        SELECT doc_id, w,
               unnest(range(0, greatest(
                 CAST(ceil((len(w) - {CHUNK_OVERLAP})
                      / CAST({CHUNK_TOKENS - CHUNK_OVERLAP} AS DOUBLE)) AS BIGINT),
                 1))) AS chunk_idx
        FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(w[chunk_idx * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 :
                     chunk_idx * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}])
                AS INTEGER) AS chunk_tokens,
           sha256(array_to_string(
               w[chunk_idx * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 :
                 chunk_idx * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}], ' '))
               AS chunk_sha
    FROM c
    """,
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for training-sequence prep:
    each doc explodes into ``CHUNK_TOKENS``-token windows overlapping by
    ``CHUNK_OVERLAP`` (context continuity across chunk boundaries).

    Fully relational 1:N fan-out — tokenization once per doc, then
    ``explode(sequence(...))`` + ``slice`` per window, all codegen; no
    Python, no shuffle (chunking is partition-local at any scale). The
    chunk content hash makes the oracle byte-exact."""
    t = load_tables(spark, sf_dir)
    step = CHUNK_TOKENS - CHUNK_OVERLAP
    toks = t["documents"].filter(F.trim("text") != "").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("w")
    )
    n_chunks = F.greatest(
        F.ceil((F.size("w") - F.lit(CHUNK_OVERLAP)) / F.lit(float(step))).cast("long"),
        F.lit(1).cast("long"),
    )
    chunks = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    window = F.slice("w", (F.col("chunk_idx") * step + 1).cast("int"), CHUNK_TOKENS)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(window).alias("chunk_tokens"),
        F.sha2(F.array_join(window, " "), 256).alias("chunk_sha"),
    )


@query(
    "text_pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
               CAST({_TOKENS_SQL} AS BIGINT) AS toks
        FROM documents
    ),
    c AS (
        SELECT shard, doc_id, toks,
               sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - toks AS start_tok
        FROM t
    )
    SELECT shard, CAST(start_tok // {PACK_MAX_TOKENS} AS BIGINT) AS seq_bin,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM c GROUP BY 1, 2
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: documents are assigned to
    ~``PACK_MAX_TOKENS``-token training bins by cumulative token offset
    (a doc belongs to the bin where its tokens START — contiguous
    best-effort packing with bounded overflow, the relational form of
    greedy packing).

    Scale shape: packing is per-shard (``doc_id % PACK_SHARDS``), so the
    running-sum window partitions by shard instead of one global
    ordering — at 100 TB raise PACK_SHARDS to executor parallelism and
    each shard packs independently and deterministically."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql.window import Window as W

    toks = t["documents"].select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        token_count("text").cast("long").alias("toks"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.withColumn("start_tok", F.sum("toks").over(w) - F.col("toks"))
    return (
        packed.groupBy(
            "shard",
            (F.col("start_tok") / PACK_MAX_TOKENS)
            .cast("long")
            .alias("seq_bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
        )
    )


# Weighted sampling: keep probability proportional to the quality score
# (p = q * WEIGHTED_BASE_RATE), decided by the same salted content-hash
# bucket as the other samplers — deterministic, engine-portable.
WEIGHTED_BASE_RATE = 0.5  # a quality-1.0 doc keeps with p=0.5

_QUALITY_SQL = (
    "round((CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 0.5 ELSE 0.0 END)"
    f" + least({_STOP_SQL} * 2.0, 0.3)"
    f" - least({_PUNCT_SQL}, 0.2) + 0.2, 4)"
)


@query(
    "text_sample_weighted",
    f"""
    WITH s AS (
        SELECT doc_id, source, n_chars,
               {_QUALITY_SQL} AS q,
               substr(sha256('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                   AS bucket
        FROM documents
    )
    SELECT source, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
           round(sum(q), 4) AS sum_quality
    FROM s
    WHERE bucket < printf('%02x',
          CAST(floor(greatest(least(q, 1.0), 0.0) * {WEIGHTED_BASE_RATE} * 256)
               AS INTEGER))
    GROUP BY source
    """,
)
def text_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling: each document keeps with probability
    proportional to its quality score (p = q × base_rate) — the
    up-weight-good-data step of LLM data mixing — decided by comparing
    the salted hash bucket against a per-doc hex threshold, so
    membership stays a pure function of (salt, doc_id, q):
    reproducible across engines, retries, and partitionings."""
    from .functions.text import quality_score

    t = load_tables(spark, sf_dir)
    q = quality_score("text")
    bucket = F.substring(
        F.sha2(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")), 256), 1, 2
    )
    threshold = F.format_string(
        "%02x",
        F.floor(
            F.greatest(F.least(q, F.lit(1.0)), F.lit(0.0))
            * WEIGHTED_BASE_RATE
            * 256
        ).cast("int"),
    )
    return (
        t["documents"]
        .withColumn("_q", q)
        .filter(bucket < threshold)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
            _r4(F.sum("_q")).alias("sum_quality"),
        )
    )


# ---------------------------------------------------------------------------
# Text enrichment combo: metrics + quality + BPE + langid + fingerprint +
# redaction in ONE per-document projection (the realistic pipeline shape —
# every per-doc enrichment in a single scan).
# ---------------------------------------------------------------------------

_LANG_SQL = """
    CASE
      WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
           / CAST(greatest(length(text), 1) AS DOUBLE) > 0.05
        THEN 'zh'
      WHEN length(regexp_replace(text, '[^ñ¿¡áéíóúü]', '', 'g')) >
           length(regexp_replace(text, '[^àâçèêëîïôùûœ]', '', 'g'))
       AND length(regexp_replace(text, '[^ñ¿¡áéíóúü]', '', 'g')) >
           length(regexp_replace(text, '[^äöüß]', '', 'g'))
       AND length(regexp_replace(text, '[^ñ¿¡áéíóúü]', '', 'g')) > 0
        THEN 'es'
      WHEN length(regexp_replace(text, '[^àâçèêëîïôùûœ]', '', 'g')) >
           length(regexp_replace(text, '[^äöüß]', '', 'g'))
       AND length(regexp_replace(text, '[^àâçèêëîïôùûœ]', '', 'g')) > 0
        THEN 'fr'
      WHEN length(regexp_replace(text, '[^äöüß]', '', 'g')) > 0
        THEN 'de'
      ELSE 'en'
    END
"""

_REDACT_SQL_RE = REDACT_RE.replace("'", "''")


@query(
    "text_enrich",
    f"""
    SELECT doc_id,
           CAST({_TOKENS_SQL} AS INTEGER)      AS n_tokens,
           CAST(length(text) AS INTEGER)       AS n_chars_text,
           round({_PUNCT_SQL}, 4)              AS punct_ratio,
           round({_STOP_SQL}, 4)               AS stopword_ratio,
           {_QUALITY_SQL}                      AS quality,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_SQL_RE}'))
                AS INTEGER)                    AS bpe_tokens,
           {_LANG_SQL}                         AS guessed_lang,
           sha256(regexp_replace(regexp_replace(lower(trim(text)),
               '[\\.,;:!\\?''"()\\[\\]{{}}-]', '', 'g'), '\\s+', ' ', 'g')) AS fp,
           CAST(len(regexp_extract_all(text, '{_REDACT_SQL_RE}'))
                AS INTEGER)                    AS n_redacted,
           sha256(regexp_replace(text, '{_REDACT_SQL_RE}',
                                 '{REDACT_TOKEN}', 'g')) AS redacted_sha
    FROM documents
    """,
)
def text_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every per-document text enrichment in one scan: counts and
    ratios, heuristic quality, BPE-ish token estimate, language guess,
    content fingerprint, and PII-style redaction (count + hash of the
    scrubbed text). Staged projection: the raw-ratio columns are
    computed once and the quality score derives from THEM (not from
    re-running the regexes), so the expensive regex passes run exactly
    once per document regardless of codegen subexpression elimination.
    Pure codegen expressions — 100 TB of this is scan-bound."""
    t = load_tables(spark, sf_dir)
    base = t["documents"].select(
        "doc_id",
        "text",
        token_count("text").alias("n_tokens"),
        char_count("text").alias("n_chars_text"),
        punct_ratio("text").alias("_punct"),
        stopword_ratio("text").alias("_stop"),
        bpe_token_count("text").alias("bpe_tokens"),
        lang_guess("text").alias("guessed_lang"),
        fingerprint("text").alias("fp"),
        F.size(F.regexp_extract_all("text", F.lit(REDACT_RE), F.lit(0))).alias(
            "n_redacted"
        ),
        F.sha2(F.regexp_replace("text", REDACT_RE, REDACT_TOKEN), 256).alias(
            "redacted_sha"
        ),
    )
    # quality_score's formula over the already-computed ratio columns —
    # identical arithmetic to functions.text.quality_score / the oracle.
    ln = F.col("n_chars_text").cast("double")
    quality = F.round(
        F.when((ln >= 50) & (ln <= 20000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.least(F.col("_stop") * 2.0, F.lit(0.3))
        - F.least(F.col("_punct"), F.lit(0.2))
        + F.lit(0.2),
        4,
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_chars_text",
        _r4(F.col("_punct")).alias("punct_ratio"),
        _r4(F.col("_stop")).alias("stopword_ratio"),
        quality.alias("quality"),
        "bpe_tokens",
        "guessed_lang",
        "fp",
        "n_redacted",
        "redacted_sha",
    )


# ---------------------------------------------------------------------------
# Sampling combo: deterministic + stratified splits, tagged union.
# ---------------------------------------------------------------------------


@query(
    "text_samples",
    f"""
    SELECT 'deterministic' AS mode, source, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE substr(sha256('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
          <= '{SAMPLE_MAX_BUCKET}'
    GROUP BY source
    UNION ALL
    SELECT 'stratified', source, count(*),
           CAST(sum(n_chars) AS BIGINT)
    FROM documents
    WHERE substr(sha256('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
          < ({_STRATA_CASE_SQL})
    GROUP BY source
    """,
)
def text_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (~20% salted-hash) and stratified (per-source
    fraction) sampling in one tagged union — split membership is a pure
    function of (salt, doc_id[, source]), reproducible across engines,
    retries, and partitionings."""
    from .textops import STRATA_BUCKETS, STRATA_DEFAULT_BUCKET

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    bucket = F.substring(
        F.sha2(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")), 256),
        1,
        2,
    )
    det = (
        docs.filter(bucket <= SAMPLE_MAX_BUCKET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
        .select(F.lit("deterministic").alias("mode"), "source", "n_sampled", "sampled_chars")
    )
    ceiling = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(b)) for s, b in STRATA_BUCKETS.items()],
        F.lit(STRATA_DEFAULT_BUCKET),
    )
    strat = (
        docs.filter(bucket < ceiling)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
        .select(F.lit("stratified").alias("mode"), "source", "n_sampled", "sampled_chars")
    )
    return det.unionByName(strat)

# ---------------------------------------------------------------------------
# End-to-end corpus curation: the LLM-training-data pipeline composed —
# enrich → quality/length filter → exact-dedup survivors → deterministic
# sample → mix stats. Registry entry (driver catalog is at its 50-entry
# cap); oracle-checked by the full-registry pytest + parity --full.
# ---------------------------------------------------------------------------

CURATE_MIN_QUALITY = 0.55
CURATE_MIN_TOKENS = 10


@query(
    "corpus_curation",
    f"""
    WITH enriched AS (
        SELECT doc_id, source, lang, n_chars,
               {_QUALITY_SQL} AS q,
               CAST({_TOKENS_SQL} AS INTEGER) AS toks,
               {FINGERPRINT_SQL} AS fp
        FROM documents
    ),
    filtered AS (
        SELECT * FROM enriched
        WHERE q >= {CURATE_MIN_QUALITY} AND toks >= {CURATE_MIN_TOKENS}
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY fp),
    deduped AS (SELECT f.* FROM filtered f JOIN keep k USING (doc_id)),
    sampled AS (
        SELECT * FROM deduped
        WHERE substr(sha256('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
              <= '{SAMPLE_MAX_BUCKET}'
    )
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(q), 4) AS sum_quality
    FROM sampled GROUP BY source, lang
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end-to-end in one plan: per-doc
    enrichment (quality score, token count, fingerprint — one scan),
    quality/length filtering, exact-dedup survivor selection
    (fingerprint groupBy + join-back), deterministic salted-hash
    sampling, and final data-mix stats per (source, lang).

    Plan shape at 100 TB: scan → project (all codegen) → filter → one
    32-byte-key shuffle for the dedup groupBy → broadcast join-back →
    partition-local sample filter → small final agg. Exactly the
    composition a user of the individual operators would write, so the
    whole chain — not just each stage — is value-checked."""
    t = load_tables(spark, sf_dir)
    enriched = t["documents"].select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        quality_score("text").alias("q"),
        token_count("text").alias("toks"),
        fingerprint("text").alias("fp"),
    )
    filtered = enriched.filter(
        (F.col("q") >= CURATE_MIN_QUALITY) & (F.col("toks") >= CURATE_MIN_TOKENS)
    )
    keep = filtered.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = filtered.join(keep, "doc_id", "left_semi")
    bucket = F.substring(
        F.sha2(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")), 256),
        1,
        2,
    )
    sampled = deduped.filter(bucket <= SAMPLE_MAX_BUCKET)
    return sampled.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        # sum, not avg: q values are 4-decimal-rounded, so their sums
        # stay on the 1e-4 grid while averages land exactly on rounding
        # half-boundaries (observed 0.8261 vs 0.8262 engine splits)
        _r4(F.sum("q")).alias("sum_quality"),
    )


# ---------------------------------------------------------------------------
# Gold-layer marts (pipeline.gold) over the events table: latest-wins
# current state + posture rollup (the reference's promised-but-unbuilt
# gold layer, driver-checked).
# ---------------------------------------------------------------------------


# --- TF-IDF characteristic terms per source --------------------------------
TFIDF_TOPK = 5
TFIDF_MIN_LEN = 2


@query(
    "text_tfidf_topterms",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, term, count(*) AS tf
      FROM tok WHERE length(term) >= {TFIDF_MIN_LEN}
      GROUP BY source, term
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, df.df,
             round(tf.tf * (ln((1.0 + n.n_sources) / (1.0 + df.df)) + 1.0), 4)
               AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
      SELECT source, term, tf, CAST(df AS BIGINT) AS df, tfidf,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY tfidf DESC, term) AS INTEGER) AS rank
      FROM scored
    )
    SELECT source, term, tf, df, tfidf, rank
    FROM ranked WHERE rank <= {TFIDF_TOPK}
    ORDER BY source, rank
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic vocabulary per source: smoothed TF-IDF
    (tf · (ln((1+N)/(1+df)) + 1), sklearn's smooth-idf) with top-k
    terms per source — the corpus-exploration query behind domain
    tagging and mixture design.

    Scale shape: explode → (source, term) partial-aggregated groupBy is
    the only fact-sized shuffle; the document-frequency table and the
    scalar source count are term/1-row-scale and BROADCAST back; the
    per-source top-k is a bounded-partition window over the tiny scored
    table. Token text never rides a shuffle wider than (source, term)."""
    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.length("term") >= TFIDF_MIN_LEN)
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_sources = docs.agg(
        F.countDistinct("source").alias("n_sources")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_sources))
        .select(
            "source",
            "term",
            "tf",
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf")
                * (
                    F.log((1.0 + F.col("n_sources")) / (1.0 + F.col("df")))
                    + F.lit(1.0)
                ),
                4,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("source", "term", "tf", "df", "tfidf", "rank")
        .orderBy("source", "rank")
    )


# --- BM25 lexical search ---------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_QUERY = ["merge", "window", "stream"]  # fixed query for the oracle


@query(
    "text_bm25_search",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    dl AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf
      WHERE term IN ({", ".join(f"'{t}'" for t in BM25_QUERY)})
      GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
             ) AS score,
             count(*) AS n_terms_hit
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score,
           CAST(n_terms_hit AS INTEGER) AS n_terms_hit,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                AS INTEGER) AS rank
    FROM scored
    ORDER BY rank
    LIMIT {BM25_TOPK}
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson-Sparck Jones idf, k1/b length
    normalization) for a fixed query term set — the sparse complement
    of the ANN dense retrievers; production parameterizes the query and
    materializes the (doc_id, term, tf) posting table once.

    Scale shape: the posting build is the familiar explode + partial-
    aggregated (doc_id, term) shuffle; doc lengths reuse that table
    keyed on doc_id; the query-term df table and the 1-row corpus
    stats BROADCAST into the scoring join, so scoring scans only the
    postings of the query's terms (Catalyst pushes `term IN (...)`
    into the posting scan). Top-k is TakeOrderedAndProject — no global
    sort."""
    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df = (
        tf.filter(F.col("term").isin(BM25_QUERY))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (BM25_K1 + 1.0) / norm
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        )
    )
    from pyspark.sql.window import Window

    # top-k FIRST via orderBy().limit() — TakeOrderedAndProject keeps
    # per-partition heaps of k rows (no global sort); the ranking
    # window then runs over the <= k survivors only (ADVICE r12
    # follow-through: the old window-then-filter planned a
    # single-partition sort of every matching doc). Deterministic
    # tiebreak (score desc, doc_id asc) makes the k-set and ranks
    # bit-identical to the old plan.
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(
        BM25_TOPK
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        top.select(
            "doc_id",
            F.round("score", 6).alias("score"),
            "n_terms_hit",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .orderBy("rank")
    )


# --- exact-k weighted sampling without replacement (A-ES keys) -------------
AES_K = 20


@query(
    "text_sample_weighted_topk",
    f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             pow({hash60_duck("'aes|' || CAST(doc_id AS VARCHAR)")} / 1152921504606846976.0,
                 1.0 / n_chars) AS aes_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars, round(aes_key, 6) AS aes_key,
           CAST(row_number() OVER (ORDER BY aes_key DESC, doc_id)
                AS INTEGER) AS rank
    FROM keyed
    ORDER BY aes_key DESC, doc_id
    LIMIT {AES_K}
    """,
)
def text_sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each doc draws u = portable-hash uniform in (0,1)
    and competes with key u^(1/w), w = its weight (n_chars here; any
    positive quality score works). The top-k keys ARE a weighted
    sample without replacement — unlike the Bernoulli keep-probability
    sampler (text_sample_weighted), the output size is exactly k.

    Scale shape: the key is a scan-local projection (deterministic
    hash, no RNG state), and top-k is TakeOrderedAndProject — per-
    partition heaps of k rows, then a k-row merge on the driver side
    of the exchange; nothing global ever sorts. Deterministic and
    shard-parallel by construction: re-partitioning cannot change the
    sample (same property pinned for the deterministic sampler in
    test_properties)."""
    docs = load_tables(spark, sf_dir)["documents"]
    u = F.expr(hash60_spark("concat('aes|', CAST(doc_id AS STRING))")) / F.lit(
        float(2**60)
    )
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "source",
        "n_chars",
        F.pow(u, 1.0 / F.col("n_chars")).alias("aes_key"),
    )
    top = keyed.orderBy(F.desc("aes_key"), "doc_id").limit(AES_K)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("aes_key"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "source",
        "n_chars",
        F.round("aes_key", 6).alias("aes_key"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


ZIPF_TOP = 200


@query(
    "text_zipf_fit",
    f"""
    WITH toks AS (
        SELECT source,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ),
    counts AS (
        SELECT source, token, count(*) AS c
        FROM toks WHERE token <> '' GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c DESC, token
               ) AS r
        FROM counts
    ),
    top AS (SELECT * FROM ranked WHERE r <= {ZIPF_TOP}),
    s AS (
        SELECT source,
               CAST(count(*) AS DOUBLE) AS n,
               sum(ln(CAST(r AS DOUBLE))) AS sx,
               sum(ln(CAST(c AS DOUBLE))) AS sy,
               sum(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy,
               sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx,
               sum(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS syy
        FROM top GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
             AS log_intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS of ln(freq) on ln(rank) over the
    top-``ZIPF_TOP`` tokens — the corpus-health gauge a curation pass
    reads before training (natural text sits near slope −1; template/
    spam corpora flatten, deduplicated boilerplate steepens).

    The rank is deterministic (count desc, token asc) so the top-200
    set — and therefore every ln() input — is identical cross-engine;
    the regression is the same closed form as ``events_trend_ols`` but
    over doubles from the start (ln values), which is safe because the
    sums have ≤ {ZIPF_TOP} terms evaluated in groupBy order… both
    engines sum per-group in a single partition here (source
    cardinality is tiny) — and round(4) absorbs any last-ulp libm
    drift. Shape: explode → (source, token) hash-agg (the one
    vocabulary-scale shuffle) → per-source top-k window → 200-row
    regression. At 100 TB the token count shuffle dominates and is
    exactly the TF-IDF posting shuffle — same scaling row.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    counts = (
        t["documents"]
        .select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "token")
    top = counts.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= ZIPF_TOP
    )
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("c").cast("double"))
    s = top.groupBy("source").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(ly * ly).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "source",
        n.cast("long").alias("n_ranks"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 4).alias("log_intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            4,
        ).alias("r2"),
    )


PMI_TOP_K = 30


@query(
    "text_bigram_pmi",
    f"""
    WITH w AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents WHERE trim(text) <> ''
    ),
    uni AS (
        SELECT unnest(toks) AS tok FROM w
    ),
    ucnt AS (SELECT tok, count(*) AS c FROM uni WHERE tok <> '' GROUP BY 1),
    utot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ucnt),
    bi AS (
        SELECT unnest(list_transform(
                   range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM w WHERE len(toks) >= 2
    ),
    bcnt AS (SELECT bg, count(*) AS c FROM bi GROUP BY 1),
    btot AS (SELECT CAST(sum(c) AS BIGINT) AS m FROM bcnt),
    top AS (
        SELECT bg, c FROM bcnt
        ORDER BY c DESC, bg
        LIMIT {PMI_TOP_K}
    )
    SELECT t.bg AS bigram, CAST(t.c AS BIGINT) AS pair_count,
           CAST(a.c AS BIGINT) AS left_count, CAST(b.c AS BIGINT) AS right_count,
           round(ln((CAST(t.c AS DOUBLE) / CAST(btot.m AS DOUBLE))
                    / ((CAST(a.c AS DOUBLE) / CAST(utot.n AS DOUBLE))
                       * (CAST(b.c AS DOUBLE) / CAST(utot.n AS DOUBLE)))), 4)
             AS pmi
    FROM top t
    JOIN ucnt a ON a.tok = split_part(t.bg, ' ', 1)
    JOIN ucnt b ON b.tok = split_part(t.bg, ' ', 2)
    CROSS JOIN utot CROSS JOIN btot
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of the corpus
    top-``PMI_TOP_K`` bigrams — PMI = ln(p(ab) / (p(a)·p(b))), the
    standard phrase-detection signal (tokenizer vocab induction,
    stop-phrase lists, quality heuristics all start here).

    The top-k set is ranked by the EXACT bigram count with a
    lexicographic tiebreak, so the selected bigrams — and every count
    feeding the PMI expression — are identical cross-engine; PMI
    itself is one fixed ln() over ratios of exact BIGINTs, stable to
    round(4). Adjacent pairs come from ``zip_with`` over the token
    array and its 1-shifted self (no posexplode self-join, no HOF
    outer-column re-evaluation). Shape: explode → two
    vocabulary-cardinality hash-aggs (unigrams, bigrams) → top-k →
    broadcast joins of two single-row totals and the unigram counts.
    The bigram agg is the one fact-sized shuffle — same class as the
    TF-IDF posting shuffle.
    """
    t = load_tables(spark, sf_dir)
    w = (
        t["documents"]
        .where(F.trim("text") != "")
        .select(
            "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
        )
    )
    uni = w.select(F.explode("toks").alias("tok")).where(F.col("tok") != "")
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    utot = ucnt.agg(F.sum("c").cast("long").alias("n"))
    sz = F.size("toks")
    bi = (
        w.where(sz >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, sz - 1),
                    F.slice("toks", 2, sz - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bg")
        )
    )
    bcnt = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    btot = bcnt.agg(F.sum("c").cast("long").alias("m"))
    top = bcnt.orderBy(F.col("c").desc(), "bg").limit(PMI_TOP_K)
    a = ucnt.select(F.col("tok").alias("ltok"), F.col("c").alias("lc"))
    b = ucnt.select(F.col("tok").alias("rtok"), F.col("c").alias("rc"))
    joined = (
        top.withColumn("ltok", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("rtok", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
        .join(a, "ltok")
        .join(b, "rtok")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
    )
    p_ab = F.col("c").cast("double") / F.col("m").cast("double")
    p_a = F.col("lc").cast("double") / F.col("n").cast("double")
    p_b = F.col("rc").cast("double") / F.col("n").cast("double")
    return joined.select(
        F.col("bg").alias("bigram"),
        F.col("c").cast("long").alias("pair_count"),
        F.col("lc").cast("long").alias("left_count"),
        F.col("rc").cast("long").alias("right_count"),
        F.round(F.log(p_ab / (p_a * p_b)), 4).alias("pmi"),
    )


# --- TextRank keyword extraction ---------------------------------------------

TEXTRANK_VOCAB = 200  # graph nodes: the top-V corpus tokens (freq, token)
TEXTRANK_MIN_LEN = 4  # content-word heuristic: drop short function words
TEXTRANK_TOPK = 20


def _textrank_sql() -> str:
    """The word-adjacency graph as CTEs feeding the EXACT PageRank
    round chain ``graph_pagerank_parts`` certifies (same ``pairs`` /
    ``deg`` / ``n`` names, same literal 0.15/0.85 arithmetic), then the
    top-k selection on the 4-dp grid with a token tiebreak."""
    from .operators.graph import _pr_round_sql

    return f"""
    WITH toks AS (
        SELECT doc_id, CAST(u[1] AS VARCHAR) AS w, CAST(u[2] AS BIGINT) AS pos
        FROM (
            SELECT doc_id,
                   unnest(list_zip(arr, range(1, len(arr) + 1))) AS u
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS arr
                  FROM documents)
        )
        WHERE length(CAST(u[1] AS VARCHAR)) >= {TEXTRANK_MIN_LEN}
    ),
    voc AS (
        SELECT w FROM (
            SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
            FROM toks GROUP BY w)
        WHERE rk <= {TEXTRANK_VOCAB}
    ),
    halfp AS (
        SELECT DISTINCT a.w AS src, b.w AS dst
        FROM toks a
        JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.w <> b.w
          AND a.w IN (SELECT w FROM voc) AND b.w IN (SELECT w FROM voc)
    ),
    pairs AS (
        SELECT src, dst FROM halfp UNION SELECT dst, src FROM halfp
    ),
    deg AS (SELECT src, count(*) AS deg FROM pairs GROUP BY src),
    n AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT deg.src AS node, 1.0 / n.n AS pr FROM deg CROSS JOIN n),
    {_pr_round_sql('r0', 'r1')},
    {_pr_round_sql('r1', 'r2')},
    {_pr_round_sql('r2', 'r3')},
    scored AS (
        SELECT r3.node AS token,
               round(r3.pr * n.n, 4) AS pr_scaled,
               deg.deg AS degree
        FROM r3 JOIN deg ON deg.src = r3.node CROSS JOIN n
    )
    SELECT token, pr_scaled, degree,
           CAST(row_number() OVER (ORDER BY pr_scaled DESC, token)
                AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {TEXTRANK_TOPK}
    ORDER BY rank
    """


@query("text_textrank_keywords", _textrank_sql())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word-adjacency graph — nodes are the corpus's top
    {TEXTRANK_VOCAB} content tokens (length >= {TEXTRANK_MIN_LEN},
    ranked by frequency with a token tiebreak), undirected edges link
    tokens adjacent in any document — then the top-{TEXTRANK_TOPK}
    tokens by damped rank. Reuses the CERTIFIED ``pagerank`` core
    verbatim (same chained-iteration oracle discipline as
    ``graph_pagerank_parts``: every round's join/sum is the identical
    IEEE arithmetic in both engines), so the only new surface is the
    graph construction: one tokenize scan, a per-doc adjacency
    self-join on (doc_id, pos+1), vocabulary pruning scan-side.

    Scale shape: the corpus is touched twice (vocab count + adjacency)
    with map-side partials; the graph itself is vocabulary-bounded
    (<= V^2/2 edges, V = {TEXTRANK_VOCAB}), so the PageRank rounds run
    on a dimension-scale frame whatever the corpus size — the same
    posture as the co-purchase graph family."""
    from pyspark.sql.window import Window

    from .operators.graph import pagerank

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w"),
    ).filter(F.length("w") >= TEXTRANK_MIN_LEN)
    wv = Window.orderBy(F.col("f").desc(), "w")
    voc = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= TEXTRANK_VOCAB)
        .select("w")
    )
    tv = toks.join(F.broadcast(voc), "w").select("doc_id", "pos", "w")
    a = tv.select("doc_id", F.col("pos").alias("p"), F.col("w").alias("src"))
    b = tv.select(
        "doc_id", (F.col("pos") - 1).alias("p"), F.col("w").alias("dst")
    )
    half = (
        a.join(b, ["doc_id", "p"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = half.union(half.select(F.col("dst"), F.col("src"))).distinct()
    ranked = pagerank(edges, broadcast_ranks=True).select(
        F.col("p_partkey").alias("token"), "pr_scaled", "degree"
    )
    w = Window.orderBy(F.col("pr_scaled").desc(), "token")
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TEXTRANK_TOPK)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Gopher/Dolma-style rule filter: the classic pretraining quality gate
# ---------------------------------------------------------------------------

GQ_MIN_WORDS = 30
GQ_MIN_MEAN_WL = 3.9
GQ_MAX_MEAN_WL = 4.9
GQ_MIN_STOP_HITS = 2
GQ_STOPWORDS = ("the", "a", "and", "of", "to")


def _gq_stop_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in GQ_STOPWORDS)


@query(
    "text_gopher_quality_rules",
    f"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ),
    doc AS (
        SELECT doc_id, source,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(token)) AS DOUBLE) / count(*) AS mean_wl,
               CAST(sum(CASE WHEN token IN ({_gq_stop_list_sql()})
                             THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
        FROM tok WHERE token <> '' GROUP BY doc_id, source
    ),
    flagged AS (
        SELECT source,
               CASE WHEN n_words >= {GQ_MIN_WORDS} THEN 0 ELSE 1 END AS f_words,
               CASE WHEN mean_wl >= {GQ_MIN_MEAN_WL}
                     AND mean_wl <= {GQ_MAX_MEAN_WL} THEN 0 ELSE 1 END AS f_wl,
               CASE WHEN stop_hits >= {GQ_MIN_STOP_HITS} THEN 0 ELSE 1 END
                 AS f_stop,
               mean_wl
        FROM doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN f_words + f_wl + f_stop = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass,
           round(CAST(sum(CASE WHEN f_words + f_wl + f_stop = 0
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS pass_rate,
           CAST(sum(f_words) AS BIGINT) AS n_fail_words,
           CAST(sum(f_wl) AS BIGINT) AS n_fail_wordlen,
           CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
           round(avg(mean_wl), 4) AS avg_mean_wl
    FROM flagged GROUP BY source
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021) repetition-free quality rules —
    the rule-based gate every pretraining corpus passes before any
    model-based scoring: minimum document length, mean-word-length
    band, and a stopword-presence check (documents with no function
    words are usually boilerplate, tables, or tag soup). Thresholds
    here are tuned to the synthetic corpus so each rule actually
    fires; a production run swaps the constants, not the plan.

    Per-rule failure counts are reported next to the pass rate per
    source, the way corpus dashboards slice it. Exactness: words and
    stop hits are integers; mean word length is an integer-sum ratio —
    both engines divide the same exact values, and the per-rule flags
    compare against literal thresholds (a mean_wl landing EXACTLY on a
    threshold is a ratio of small integers, identically computed both
    sides, so the comparison agrees). Shape: map-side explode → one
    doc-cardinality agg → one source-cardinality agg; the token stream
    never shuffles (partial aggregation collapses it per task), so the
    gate is scan-bound at 100 TB exactly like ``text_enrich``."""
    t = load_tables(spark, sf_dir)
    tok = (
        t["documents"]
        .select(
            "doc_id",
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    doc = tok.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        (
            F.sum(F.length("token")).cast("double") / F.count(F.lit(1))
        ).alias("mean_wl"),
        F.sum(
            F.when(F.col("token").isin(*GQ_STOPWORDS), 1).otherwise(0)
        )
        .cast("long")
        .alias("stop_hits"),
    )
    flagged = doc.select(
        "source",
        F.when(F.col("n_words") >= GQ_MIN_WORDS, 0).otherwise(1).alias(
            "f_words"
        ),
        F.when(
            (F.col("mean_wl") >= GQ_MIN_MEAN_WL)
            & (F.col("mean_wl") <= GQ_MAX_MEAN_WL),
            0,
        )
        .otherwise(1)
        .alias("f_wl"),
        F.when(F.col("stop_hits") >= GQ_MIN_STOP_HITS, 0)
        .otherwise(1)
        .alias("f_stop"),
        "mean_wl",
    )
    all_pass = (
        F.col("f_words") + F.col("f_wl") + F.col("f_stop") == 0
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(all_pass, 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
        F.round(
            F.sum(F.when(all_pass, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("pass_rate"),
        F.sum("f_words").cast("long").alias("n_fail_words"),
        F.sum("f_wl").cast("long").alias("n_fail_wordlen"),
        F.sum("f_stop").cast("long").alias("n_fail_stopwords"),
        F.round(F.avg("mean_wl"), 4).alias("avg_mean_wl"),
    )
