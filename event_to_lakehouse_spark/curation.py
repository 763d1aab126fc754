"""Corpus-curation operators beyond per-document enrichment: Gopher-
style repetition filtering and domain-mix resampling — the two knobs a
training-data pipeline turns AFTER cleaning individual documents
(filter the degenerate ones, then rebalance what domains remain).

Both are pure built-in-expression pipelines with DuckDB oracles; the
resampler uses the portable 60-bit hash (``dedup.portable``) so the
deterministic keep/drop decision is bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import hash60_duck, hash60_spark
from .operators.relational import _r4, query
from .tables import load_tables

# Gopher-rule thresholds (scaled to the synthetic corpus; production
# values are corpus-tuned the same way).
REP_NGRAM = 5  # word n-gram width for the duplicate-fraction signal
DUP_NGRAM_MAX = 0.30  # keep docs with <= 30% duplicate 5-grams
TOP_WORD_MAX = 0.20  # keep docs whose top word is <= 20% of tokens


@query(
    "text_repetition_filter",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, len(w) AS n_words,
             CASE WHEN len(w) >= {REP_NGRAM}
                  THEN list_transform(range(1, len(w) - {REP_NGRAM - 2}),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                            || w[i+3] || ' ' || w[i+4])
                  ELSE [] END AS grams
      FROM t
    ),
    rep AS (
      SELECT doc_id, n_words,
             CASE WHEN len(grams) > 0
                  THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                             / len(grams), 4)
                  ELSE 0.0 END AS dup_ngram_frac
      FROM g
    ),
    wc AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(w) AS tok FROM t)
      WHERE tok <> '' GROUP BY doc_id, tok
    ),
    tw AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_word_frac
      FROM wc GROUP BY doc_id
    )
    SELECT rep.doc_id, CAST(rep.n_words AS INTEGER) AS n_words,
           rep.dup_ngram_frac,
           coalesce(tw.top_word_frac, 0.0) AS top_word_frac,
           (rep.dup_ngram_frac <= {DUP_NGRAM_MAX}
            AND coalesce(tw.top_word_frac, 0.0) <= {TOP_WORD_MAX}) AS keep
    FROM rep LEFT JOIN tw ON rep.doc_id = tw.doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb repetition signals per document: the fraction
    of duplicated word 5-grams and the most-frequent-word share, with
    the keep/drop verdict. The n-gram fraction is a single projection
    (HOF over the token array — no explode, no shuffle); the top-word
    share is one explode + two-level agg hash-partitioned on doc_id.
    At 100 TB both are scan-bound; the only shuffle carries (doc_id,
    token) pairs with map-side combine."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.size("w") - (REP_NGRAM - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("w", i + j) for j in range(REP_NGRAM)]
        ),
    )
    rep = toks.select(
        "doc_id",
        F.size("w").cast("int").alias("n_words"),
        F.when(
            F.size("w") >= REP_NGRAM,
            _r4(
                F.lit(1.0)
                - F.size(F.array_distinct(gram)).cast("double") / F.size(gram)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
    )
    wc = (
        toks.select("doc_id", F.explode("w").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tw = wc.groupBy("doc_id").agg(
        _r4(F.max("c").cast("double") / F.sum("c")).alias("top_word_frac")
    )
    joined = rep.join(tw, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "dup_ngram_frac",
        F.coalesce("top_word_frac", F.lit(0.0)).alias("top_word_frac"),
    )
    return joined.withColumn(
        "keep",
        (F.col("dup_ngram_frac") <= DUP_NGRAM_MAX)
        & (F.col("top_word_frac") <= TOP_WORD_MAX),
    )


# Deterministic domain rebalancing toward TARGET WEIGHTS: the mix a
# training run wants (upweight curated domains, downsample the rest).
# Per-source keep rate r_d = C·w_d / cnt_d with C maximal subject to
# r_d ≤ 1 (C = min_d cnt_d/w_d) — all in integer arithmetic so both
# engines compute identical thresholds. The keep decision hashes the
# doc id with the portable hash: the SAME documents are kept on every
# engine and every rerun.
MIX_SALT = "mix-v1|"
MIX_DENOM = 1_000_000
MIX_WEIGHTS = {"src0": 3, "src1": 2}  # every other source weight 1
_W_SQL = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items())
    + " ELSE 1 END"
)


@query(
    "corpus_domain_mix",
    f"""
    WITH counts AS (
      SELECT source, count(*) AS cnt, {_W_SQL} AS w
      FROM documents GROUP BY source
    ),
    m AS (SELECT min((cnt * {MIX_DENOM}) // w) AS c0 FROM counts)
    SELECT d.doc_id, d.source,
           round(CAST((m.c0 * c.w) // c.cnt AS DOUBLE)
                 / {MIX_DENOM}, 6) AS keep_rate
    FROM documents d
    JOIN counts c ON d.source = c.source
    CROSS JOIN m
    WHERE {hash60_duck(f"'{MIX_SALT}' || CAST(d.doc_id AS VARCHAR)")}
          % {MIX_DENOM} < (m.c0 * c.w) // c.cnt
    """,
)
def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix resampling toward target weights, deterministic via
    the portable hash (bit-identical keep set cross-engine). 100 TB
    shape: one metadata-scale groupBy for the counts (broadcast back),
    then a scan-local filter — the corpus itself never shuffles."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt"), F.expr(_W_SQL).alias("w")
    )
    m = counts.agg(F.min(F.expr(f"(cnt * {MIX_DENOM}) div w")).alias("c0"))
    rated = counts.crossJoin(F.broadcast(m)).select(
        "source", F.expr("(c0 * w) div cnt").alias("thresh")
    )
    h = F.expr(
        hash60_spark(f"concat('{MIX_SALT}', CAST(doc_id AS STRING))")
    )
    return (
        docs.join(F.broadcast(rated), "source")
        .filter(h % MIX_DENOM < F.col("thresh"))
        .select(
            "doc_id",
            "source",
            F.round(F.col("thresh").cast("double") / MIX_DENOM, 6).alias(
                "keep_rate"
            ),
        )
    )


# --- BPE merge step (tokenizer induction primitive) ------------------------

BPE_TOPK = 20


@query(
    "text_bpe_pair_counts",
    f"""
    WITH w AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n
      FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
      )
      WHERE tok <> '' GROUP BY tok
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(tok)),
                    i -> substr(tok, CAST(i AS INTEGER), 2))) AS pair, n
      FROM w WHERE length(tok) >= 2
    ),
    agg AS (SELECT pair, CAST(sum(n) AS BIGINT) AS n_pair FROM pairs GROUP BY pair)
    SELECT pair, n_pair FROM agg
    ORDER BY n_pair DESC, pair LIMIT {BPE_TOPK}
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE merge step of BPE tokenizer training: corpus-wide counts of
    adjacent symbol pairs (here: character bigrams within words),
    weighted by word frequency — the argmax pair is the next merge a
    BPE trainer would apply. 100 TB shape: the expensive text pass
    collapses to a word-frequency table first (the classic BPE-training
    trick — pair counting then runs over DISTINCT words x their
    counts, usually 5-6 orders smaller than the corpus); both groupBys
    are map-side-combinable, and the pair fan-out is an in-row HOF, not
    a shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        words.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("tok") - 1),
                    lambda i: F.col("tok").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "n",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_pair"))
        .orderBy(F.desc("n_pair"), "pair")
        .limit(BPE_TOPK)
    )


# --- leakage-safe train/val/test split --------------------------------------

SPLIT_TRAIN = 80  # buckets 0-79 -> train
SPLIT_VAL = 90    # 80-89 -> val, 90-99 -> test


def _split_oracle() -> str:
    """The whole chain in one oracle: near-dup clusters (recursive-CTE
    transitive closure, reused from the cluster-labels oracle) → one
    split decision PER CLUSTER via the portable hash."""
    from .dedup import cluster  # noqa: F401 — registers the label oracle
    from .operators.relational import ORACLES

    labels = ORACLES["dedup_cluster_labels"]
    bucket = hash60_duck("'split|' || CAST(split_key AS VARCHAR)") + " % 100"
    return f"""
    WITH labels AS ({labels}),
    keyed AS (
      SELECT d.doc_id,
             CAST(coalesce(l.cluster_id, d.doc_id) AS BIGINT) AS split_key
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ),
    b AS (SELECT doc_id, split_key, {bucket} AS bucket FROM keyed)
    SELECT doc_id, split_key,
           CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train'
                WHEN bucket < {SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id
    """


@query("corpus_leakage_safe_split", _split_oracle())
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment that CANNOT leak
    near-duplicates across splits: the split key is the doc's near-dup
    CLUSTER id (its own id when unpaired), so an entire duplicate
    cluster hashes to one split — the guard naive per-doc hash splits
    silently violate (a test doc's near-twin lands in train and the
    eval is contaminated). 80/10/10 by portable hash: stable under
    re-runs, corpus growth, and engine choice.

    Scale shape: reuses the near-dup pair pipeline + size-adaptive
    clustering; the split itself is one broadcast join (labeled docs ≪
    corpus) and a scan-local hash — no extra corpus shuffle."""
    from .dedup.cluster import cluster_labels
    from .dedup.jaccard import dedup_ngram_jaccard

    docs = load_tables(spark, sf_dir)["documents"]
    labels = cluster_labels(dedup_ngram_jaccard(spark, sf_dir))
    keyed = (
        docs.select("doc_id")
        .join(F.broadcast(labels), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").cast("long").alias("split_key"),
        )
    )
    bucket = hash60_spark(
        "concat('split|', CAST(split_key AS STRING))"
    ) + " % 100"
    return (
        keyed.selectExpr("doc_id", "split_key", f"{bucket} AS bucket")
        .selectExpr(
            "doc_id",
            "split_key",
            f"CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train' "
            f"WHEN bucket < {SPLIT_VAL} THEN 'val' ELSE 'test' END AS split",
        )
        .orderBy("doc_id")
    )


# --- unigram LM perplexity (CCNet-style quality signal) ----------------------

PPL_KEEP_MAX = 600.0  # corpus-tuned cut; production uses a held-out LM


@query(
    "text_unigram_perplexity",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(regexp_replace(regexp_replace(
               lower(trim(text)),
               '[\\.,,;:!\\?''"()\\[\\]{{}}-]', '', 'g'), '\\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents
    ),
    toks2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks2 GROUP BY tok
    ),
    consts AS (
      SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
      FROM vocab
    ),
    scored AS (
      SELECT t.doc_id, ln((vocab.c + 1) / (consts.n + consts.v)) AS lp
      FROM toks2 t JOIN vocab ON t.tok = vocab.tok CROSS JOIN consts
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             -avg(lp) AS h
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(h, 4) AS cross_entropy,
           round(exp(h), 4) AS perplexity,
           exp(h) <= {PPL_KEEP_MAX} AS keep
    FROM per_doc ORDER BY doc_id
    """,
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering, degenerate-LM edition: score
    every document's cross-entropy under an add-one-smoothed UNIGRAM
    model fit on the corpus itself — gibberish/byte-noise docs (rare
    tokens throughout) score high and fail the keep gate, natural text
    scores low. Production swaps in a held-out KenLM; the relational
    shape is identical: token table → count table → probability join →
    per-doc aggregate.

    Scale shape: the vocab groupBy is partial-aggregated (zipfian keys
    combine hard map-side); the probability lookup is a hash join on
    the token — at 100 TB the vocab side is the small one (vocabulary
    grows ~log of corpus), so AQE broadcasts it and the token stream
    never shuffles; the per-doc aggregate reuses the token table's
    layout. The two scalar constants (N, V) ride a broadcast-scalar
    cross join."""
    from .functions.text import normalize_text

    docs = load_tables(spark, sf_dir)["documents"]
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalize_text("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    consts = vocab.agg(
        F.sum("c").cast("double").alias("n"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("lp")).alias("h"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round("h", 4).alias("cross_entropy"),
        F.round(F.exp("h"), 4).alias("perplexity"),
        (F.exp("h") <= PPL_KEEP_MAX).alias("keep"),
    ).orderBy("doc_id")


# --- per-document curation scorecard -----------------------------------------


def _scorecard_oracle() -> str:
    """Composed oracle: each signal's REGISTERED SQL becomes a CTE and
    the joins mirror the Spark side exactly — the scorecard is
    value-checked as one unit, not assembled from assumed-green parts."""
    from .dedup import substring  # noqa: F401 — registers its oracle
    from .operators.relational import ORACLES

    rep = ORACLES["text_repetition_filter"]
    ppl = ORACLES["text_unigram_perplexity"]
    sub = ORACLES["text_substring_dedup"]
    split = ORACLES["corpus_leakage_safe_split"]
    return f"""
    WITH rep AS ({rep}), ppl AS ({ppl}), sub AS ({sub}), sp AS ({split})
    SELECT rep.doc_id,
           rep.dup_ngram_frac, rep.top_word_frac,
           ppl.perplexity,
           coalesce(sub.dup_frac, 0.0) AS substr_dup_frac,
           sp.split,
           (rep.keep AND ppl.keep AND coalesce(sub.keep, TRUE)) AS keep
    FROM rep
    JOIN ppl ON rep.doc_id = ppl.doc_id
    LEFT JOIN sub ON rep.doc_id = sub.doc_id
    JOIN sp ON rep.doc_id = sp.doc_id
    ORDER BY rep.doc_id
    """


@query("corpus_scorecard", _scorecard_oracle())
def corpus_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE row per document with every curation verdict a training-data
    pipeline needs to act: repetition signals (Gopher), unigram
    perplexity (CCNet), duplicated-substring fraction, the leakage-safe
    split assignment, and the combined keep gate. Each signal is its
    own oracle-checked operator; this composes their RESULTS (a
    three-way join on doc_id — docs without duplicated substrings
    left-join as clean), so the scorecard inherits each signal's plan
    shape instead of recomputing anything differently."""
    from .dedup.substring import text_substring_dedup

    rep = text_repetition_filter(spark, sf_dir).select(
        "doc_id", "dup_ngram_frac", "top_word_frac",
        F.col("keep").alias("rep_keep"),
    )
    ppl = text_unigram_perplexity(spark, sf_dir).select(
        "doc_id", "perplexity", F.col("keep").alias("ppl_keep")
    )
    sub = text_substring_dedup(spark, sf_dir).select(
        "doc_id", F.col("dup_frac").alias("substr_dup_frac"),
        F.col("keep").alias("sub_keep"),
    )
    sp = corpus_leakage_safe_split(spark, sf_dir).select("doc_id", "split")
    return (
        rep.join(ppl, "doc_id")
        .join(F.broadcast(sub), "doc_id", "left")
        .join(sp, "doc_id")
        .select(
            "doc_id",
            "dup_ngram_frac",
            "top_word_frac",
            "perplexity",
            F.coalesce("substr_dup_frac", F.lit(0.0)).alias("substr_dup_frac"),
            "split",
            (
                F.col("rep_keep")
                & F.col("ppl_keep")
                & F.coalesce("sub_keep", F.lit(True))
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --- cross-source shingle overlap matrix -----------------------------------
#
# Which sources share content? Distinct (source, word-3-gram) sets
# compared pairwise via an equi self-join on the shingle — the corpus-
# composition diagnostic run before mixing sources into a training
# blend (high containment ⇒ one source is a subset/mirror of another
# and double-counts under naive mixture weights).
OVL_NGRAM = 3
OVL_MIN_COMMON = 5


@query(
    "corpus_source_overlap",
    f"""
    WITH t AS (
      SELECT source, string_split(lower(text), ' ') AS w FROM documents
    ),
    grams AS (
      SELECT DISTINCT source,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
      FROM t, unnest(range(1, len(w) - {OVL_NGRAM - 2})) AS r(i)
      WHERE len(w) >= {OVL_NGRAM}
    ),
    sizes AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b, p.n_common,
           round(p.n_common / least(sa.n, sb.n), 4) AS containment,
           round(p.n_common / (sa.n + sb.n - p.n_common), 4) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    WHERE p.n_common >= {OVL_MIN_COMMON}
    ORDER BY source_a, source_b
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source overlap on distinct word-3-gram sets:
    containment (|A∩B| / min size — catches subset mirrors) and
    Jaccard, for every source pair sharing ≥ OVL_MIN_COMMON shingles.

    Scale shape: the distinct (source, gram) set is ONE partial-
    aggregated shuffle off the token stream; the pair join is an EQUI
    join on the gram (hash-partitioned, never all-pairs) whose output
    is source-pair-bounded — at 20 sources that is ≤190 rows out of the
    final rollup no matter the corpus size. Per-source set sizes are a
    source-cardinality table, broadcast into the final projection. A
    million-source corpus would swap the gram join for minhash
    signatures per source (dedup/minhash.py) — same shape, sketch-
    sized."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select("source", F.split(F.lower("text"), " ").alias("w")).filter(
        F.size("w") >= OVL_NGRAM
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.size("w") - (OVL_NGRAM - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at("w", i),
            F.element_at("w", i + 1),
            F.element_at("w", i + 2),
        ),
    )
    grams = (
        toks.select("source", F.explode(gram).alias("gram")).distinct()
    )
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= OVL_MIN_COMMON)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(F.broadcast(sa), F.col("source_a") == F.col("sa.source"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb.source"))
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common") / F.least(F.col("sa.n"), F.col("sb.n")), 4
            ).alias("containment"),
            F.round(
                F.col("n_common")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# --- full BPE tokenizer training loop --------------------------------------
#
# ``text_bpe_pair_counts`` is ONE step; this is the whole Sennrich
# training loop. All heavy work stays distributed: per iteration the
# pair-count aggregate runs over the word-frequency table and exactly
# ONE row (the argmax pair) is collected; the chosen merge is then
# applied to every word's symbol array as a Catalyst fold expression.
# At 100 TB the word table (distinct words × counts) is orders of
# magnitude smaller than the corpus and the per-iteration cost is two
# small shuffles — the corpus itself is scanned exactly once, to build
# the word table.


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, n) word-frequency table — the single corpus pass BPE
    training runs on."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b) to a symbol
    array, as a pure Catalyst fold: the accumulator is the partially
    rebuilt array; a step either fuses the incoming symbol with the
    accumulator's tail (tail == a AND incoming == b) or appends it.
    Matching is on EXACT symbol strings, so a freshly fused "ab" can
    never spuriously re-match an "a" rule — the same greedy semantics
    as the reference BPE implementation."""
    return F.aggregate(
        symbols,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(words: DataFrame, n_merges: int) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges on a (tok, n) word-frequency
    table. Returns (ordered merge list, final segmented words
    DataFrame with a ``symbols`` array column).

    Ties on pair count break by pair string ascending — deterministic
    and mirrored by the pure-Python reference in the pytest. Only the
    argmax pair row crosses the driver per iteration; the symbol table
    is localCheckpointed every few merges to keep the fold lineage
    shallow (same discipline as dedup.cluster's iterate loop)."""
    seg = words.select(
        "tok", "n", F.split("tok", "").alias("symbols")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pair_counts = (
            seg.filter(F.size("symbols") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("symbols") - 1),
                        lambda j: F.struct(
                            F.element_at("symbols", j).alias("a"),
                            F.element_at("symbols", j + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("n_pair"))
        )
        top = pair_counts.orderBy(F.desc("n_pair"), "a", "b").limit(1).collect()
        if not top or top[0]["n_pair"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        seg = seg.withColumn("symbols", _apply_merge(F.col("symbols"), a, b))
        if (i + 1) % 4 == 0:
            seg = seg.localCheckpoint()
    return merges, seg


def bpe_encode(words: DataFrame, merges: list[tuple[str, str]], tok_col: str = "tok") -> DataFrame:
    """Segment words with an already-trained merge list (the inference
    side): apply each merge in training order — the standard BPE
    encode. Adds a ``symbols`` array column."""
    seg = words.withColumn("symbols", F.split(F.col(tok_col), ""))
    for i, (a, b) in enumerate(merges):
        seg = seg.withColumn("symbols", _apply_merge(F.col("symbols"), a, b))
        if (i + 1) % 4 == 0:
            seg = seg.localCheckpoint()
    return seg


# --- pretraining mixture planner -------------------------------------------

MIXP_EPOCH_CAP = 4.0  # max repetitions of any source (the up-sampling bound)
_MIXP_TOKENS_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


@query(
    "corpus_mixture_plan",
    f"""
    WITH a AS (
      SELECT source,
             CAST(sum({_MIXP_TOKENS_SQL}) AS BIGINT) AS avail,
             CAST({_W_SQL} AS BIGINT) AS w
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(avail) AS BIGINT) AS t, CAST(sum(w) AS BIGINT) AS sw
      FROM a
    ),
    b AS (SELECT t // 2 AS budget FROM tot),
    r1 AS (
      SELECT a.source, a.avail, a.w,
             CAST(b.budget AS DOUBLE) * CAST(a.w AS DOUBLE)
               / CAST(tot.sw AS DOUBLE) AS target,
             least(CAST(b.budget AS DOUBLE) * CAST(a.w AS DOUBLE)
                     / CAST(tot.sw AS DOUBLE),
                   {MIXP_EPOCH_CAP} * CAST(a.avail AS DOUBLE)) AS p1
      FROM a CROSS JOIN tot CROSS JOIN b
    ),
    l AS (
      SELECT CAST(max(b.budget) AS DOUBLE) - sum(r1.p1) AS leftover,
             CAST(sum(CASE WHEN r1.p1 < {MIXP_EPOCH_CAP}
                                       * CAST(r1.avail AS DOUBLE)
                           THEN r1.w ELSE 0 END) AS DOUBLE) AS swu
      FROM r1 CROSS JOIN b
    ),
    r2 AS (
      SELECT r1.source, r1.avail, r1.w, r1.target,
             CASE WHEN r1.p1 < {MIXP_EPOCH_CAP} * CAST(r1.avail AS DOUBLE)
                       AND l.swu > 0
                  THEN least(r1.p1 + l.leftover * CAST(r1.w AS DOUBLE) / l.swu,
                             {MIXP_EPOCH_CAP} * CAST(r1.avail AS DOUBLE))
                  ELSE r1.p1 END AS p2
      FROM r1 CROSS JOIN l
    )
    SELECT source, w AS weight, avail AS available_tokens,
           round(target, 4) AS target_tokens,
           round(p2, 4) AS planned_tokens,
           round(p2 / CAST(avail AS DOUBLE), 4) AS epochs
    FROM r2
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture planner: given per-source target weights
    (the ``corpus_domain_mix`` weight map), a token budget (half the
    available corpus here; a literal in production), and an epoch cap
    (no source repeats more than ``MIXP_EPOCH_CAP`` = 4×), compute each
    source's planned token allocation — the budgeting pass that
    decides sampling rates BEFORE any data moves.

    Allocation is waterfilling with ONE fixed redistribution round
    (the chained-CTE-oracle-friendly prefix of the iterative
    algorithm): round 1 allocates budget ∝ weight capped at
    epoch_cap × available; round 2 redistributes the leftover over the
    uncapped sources ∝ weight, capped again. All inputs are exact
    BIGINTs (token counts, weights, integer-division budget); the
    allocations are fixed IEEE expressions over them, so round(4)
    parity is exact. Shape: one scan → source-cardinality aggregate →
    scalar cross-joins (broadcast one-row frames) — the plan costs one
    pass regardless of corpus size, and the output feeds
    ``corpus_domain_mix``/``text_sample_weighted_topk`` as keep-rates.
    """
    from .functions.text import token_count

    docs = load_tables(spark, sf_dir)["documents"]
    # localCheckpoint the source-cardinality aggregate: every later
    # stage (totals, budget, leftover, both rounds) branches from it,
    # and without the checkpoint Catalyst re-derives each branch from
    # the SCAN (column pruning defeats ReuseExchange) — 14 scans of
    # documents for a 20-row plan (the N-scan trap, see memory of r5).
    a = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("avail"),
        F.expr(_W_SQL).cast("long").alias("w"),
    ).localCheckpoint(eager=False)
    tot = a.agg(
        F.sum("avail").cast("long").alias("t"), F.sum("w").cast("long").alias("sw")
    )
    b = tot.select(F.expr("t div 2").alias("budget"))
    cap = F.lit(MIXP_EPOCH_CAP)
    r1 = (
        a.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(b))
        .select(
            "source",
            "avail",
            "w",
            (
                F.col("budget").cast("double")
                * F.col("w").cast("double")
                / F.col("sw").cast("double")
            ).alias("target"),
            F.least(
                F.col("budget").cast("double")
                * F.col("w").cast("double")
                / F.col("sw").cast("double"),
                cap * F.col("avail").cast("double"),
            ).alias("p1"),
        )
    )
    l = r1.crossJoin(F.broadcast(b)).agg(
        (F.max("budget").cast("double") - F.sum("p1")).alias("leftover"),
        F.sum(
            F.when(F.col("p1") < cap * F.col("avail").cast("double"), F.col("w"))
            .otherwise(F.lit(0))
        )
        .cast("double")
        .alias("swu"),
    )
    uncapped = F.col("p1") < cap * F.col("avail").cast("double")
    r2 = r1.crossJoin(F.broadcast(l)).select(
        "source",
        "avail",
        "w",
        "target",
        F.when(
            uncapped & (F.col("swu") > 0),
            F.least(
                F.col("p1")
                + F.col("leftover") * F.col("w").cast("double") / F.col("swu"),
                cap * F.col("avail").cast("double"),
            ),
        )
        .otherwise(F.col("p1"))
        .alias("p2"),
    )
    return r2.select(
        "source",
        F.col("w").alias("weight"),
        F.col("avail").alias("available_tokens"),
        F.round("target", 4).alias("target_tokens"),
        F.round("p2", 4).alias("planned_tokens"),
        F.round(F.col("p2") / F.col("avail").cast("double"), 4).alias("epochs"),
    )
