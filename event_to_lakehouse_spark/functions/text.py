"""Text-analysis column functions for LLM-data pipelines.

All pure built-in JVM expressions (regex / string / higher-order
functions) — no Python in the hot path, so every metric runs inside
whole-stage codegen and scales linearly with partitions at 100 TB.

Functions return Columns so they compose into any pipeline; the
registered queries over ``documents`` live in
``..operators``-adjacent modules (see ``dedup`` / ``textops``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "bpe_token_count",
    "char_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "normalize_text",
]

# Small English stopword list used by the heuristic quality metrics.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
_STOPWORD_RE = r"\b(?:" + "|".join(STOPWORDS) + r")\b"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(c: Column | str) -> Column:
    """Whitespace tokenization count; empty/blank text counts 0."""
    t = F.trim(_c(c))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


# GPT-2-style pre-tokenizer pattern (contractions, letter runs, digit
# runs, punctuation runs, each with optional leading space). Kept to
# syntax shared by Java regex (Spark) and RE2 (DuckDB) so the oracle
# can mirror it; applied to lowercased text.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def bpe_token_count(c: Column | str) -> Column:
    """BPE-ish subword-boundary token count — the cheap estimator of
    LLM token cost (a real BPE merges within these pre-token spans, so
    this upper-bounds merged-token count with the right shape)."""
    return F.size(
        F.regexp_extract_all(F.lower(_c(c)), F.lit(BPE_TOKEN_RE), F.lit(0))
    ).cast("int")


def char_count(c: Column | str) -> Column:
    return F.length(_c(c)).cast("int")


def punct_ratio(c: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    s = _c(c)
    n_punct = F.length(s) - F.length(F.regexp_replace(s, r"[\.,;:!\?'\"()\[\]{}-]", ""))
    return n_punct.cast("double") / F.greatest(F.length(s), F.lit(1)).cast("double")


def stopword_ratio(c: Column | str) -> Column:
    """Stopword hits / token count — a classic fluency signal."""
    s = F.lower(_c(c))
    hits = F.size(F.regexp_extract_all(s, F.lit(_STOPWORD_RE), F.lit(0)))
    return hits.cast("double") / F.greatest(token_count(s), F.lit(1)).cast("double")


def quality_score(c: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length band + stopword
    presence - punctuation excess. Deterministic, SQL-mirrorable."""
    ln = char_count(c).cast("double")
    length_band = F.when((ln >= 50) & (ln <= 20000), F.lit(0.5)).otherwise(F.lit(0.0))
    sw = F.least(stopword_ratio(c) * 2.0, F.lit(0.3))
    punct_penalty = F.least(punct_ratio(c), F.lit(0.2))
    return F.round(length_band + sw - punct_penalty + F.lit(0.2), 4)


def lang_guess(c: Column | str) -> Column:
    """n-gram/char-class language heuristic: CJK ratio → 'zh';
    else diacritic classes → es/fr/de; else 'en'. A stub-grade
    heuristic by design (real langid is a model call), but the Spark
    plumbing — pure column expression — is the production shape."""
    s = _c(c)
    total = F.greatest(F.length(s), F.lit(1)).cast("double")
    cjk = F.length(F.regexp_replace(s, r"[^一-鿿]", "")).cast("double") / total
    es = F.length(F.regexp_replace(s, r"[^ñ¿¡áéíóúü]", "")).cast("double")
    fr = F.length(F.regexp_replace(s, r"[^àâçèêëîïôùûœ]", "")).cast("double")
    de = F.length(F.regexp_replace(s, r"[^äöüß]", "")).cast("double")
    return (
        F.when(cjk > 0.05, "zh")
        .when((es > fr) & (es > de) & (es > 0), "es")
        .when((fr > de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("en")
    )


def normalize_text(c: Column | str) -> Column:
    """Dedup canonicalization: lowercase, collapse whitespace, strip
    punctuation — the text analogue of the reference's key
    canonicalization (bronze_assets_to_silver_assets.py:143-144)."""
    s = F.lower(F.trim(_c(c)))
    s = F.regexp_replace(s, r"[\.,;:!\?'\"()\[\]{}-]", "")
    return F.regexp_replace(s, r"\s+", " ")


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: sha2 over normalized text."""
    return F.sha2(normalize_text(c), 256)
