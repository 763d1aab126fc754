"""Portable-hash MinHash / SimHash flavors — DuckDB-verifiable.

The production flavors (``minhash.py``, ``simhash.py``) hash with
``xxhash64``, which has no DuckDB twin, so the driver's correctness
gate could only record rows-only for them. This module registers the
SAME pipelines with a portable 60-bit hash that both engines compute
bit-identically:

    h(s) = int(first 15 hex chars of md5(utf8(s)), 16)

- Spark:  ``CAST(conv(substr(md5(CAST(s AS BINARY)), 1, 15), 16, 10)
  AS BIGINT)`` — md5 of the UTF-8 bytes, hex slice, base-16 parse.
- DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT`` — identical hex
  prefix, identical value (md5 is a byte-level standard; 15 hex chars
  = 60 bits, safely inside BIGINT in both engines, no overflow under
  Spark ANSI mode).

Seeding prepends ``'{seed}:'`` to the input, giving the k independent
hash functions MinHash needs. Band keys use the raw signature slice
concatenated as a string (renders identically in any engine) instead
of an engine hash.

The xxhash64 flavors remain the production default (one 64-bit mix vs
an md5 per hash — md5 costs ~4× in microbench but both stay inside
whole-stage codegen and shuffle identical shapes); the portable
flavors exist so the WHOLE pipeline — normalization, shingling,
signatures, banding, bucket guard, pair join, estimate — is
value-hash-checked against an independent engine, not just pinned by
planted-pair tests. Recall/semantics tests run against BOTH flavors
(``tests/test_dedup_similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.relational import query
from ..tables import load_tables
from .minhash import BANDS, MAX_BUCKET, N_HASHES, ROWS_PER_BAND, candidate_pairs
from .simhash import MAX_BAND, near_pairs

# Portable SimHash geometry: a 15-hex-char md5 slice carries 60 bits,
# banded as 4 × 15 bits (the production flavor is 64 = 4 × 16).
P_BITS = 60
P_BAND_BITS = 15
P_MAX_HAMMING = 8


# The hash builders live in the LEAF module functions.hashing (shared
# with operators.events/sketches and curation without creating an
# import cycle through this package); re-exported here because this is
# their documented home in the dedup story.
from ..functions.hashing import (  # noqa: F401
    hash60_duck,
    hash60_spark,
    seeded_hash_duck,
    seeded_hash_spark,
)


# DuckDB mirror of functions.text.normalize_text (lower, trim, strip
# punctuation, collapse whitespace). DuckDB regexp_replace needs the
# 'g' flag for global replace; standard SQL strings pass backslashes
# through literally, so the patterns match the Spark (Java-regex) ones.
_PUNCT = r"[\.,;:!\?''" + '"' + r"()\[\]{}-]"  # '' = SQL-escaped quote
_NORM_DUCK = (
    "regexp_replace(regexp_replace(lower(trim(text)), "
    f"'{_PUNCT}', '', 'g'), '\\s+', ' ', 'g')"
)

# Shared shingle CTEs (word 3-grams over normalized text; docs shorter
# than 3 tokens contribute their whole normalized text) — mirrors
# minhash.shingle_rows exactly, duplicates retained (min-insensitive).
_SHINGLE_CTES = f"""
    norm AS (
      SELECT doc_id, {_NORM_DUCK} AS nt FROM documents
    ),
    tok AS (
      SELECT doc_id, nt, string_split(nt, ' ') AS w FROM norm
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM tok WHERE len(w) >= 3
      UNION ALL
      SELECT doc_id, nt AS shingle FROM tok WHERE len(w) < 3
    )"""


def _minhash_oracle() -> str:
    mins = ",\n             ".join(
        f"min({seeded_hash_duck(i, 'shingle')}) AS mh_{i}" for i in range(N_HASHES)
    )
    band_rows = "\n      UNION ALL\n      ".join(
        "SELECT doc_id, {b} AS band_idx, concat_ws('|', {cols}) AS band_val FROM sig".format(
            b=b,
            cols=", ".join(
                f"mh_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(N_HASHES)
    )
    return f"""
    WITH {_SHINGLE_CTES},
    sig AS (
      SELECT doc_id,
             {mins}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {band_rows}
    ),
    ok AS (
      SELECT band_idx, band_val FROM bands
      GROUP BY band_idx, band_val HAVING count(*) <= {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM bands a
      JOIN ok ON a.band_idx = ok.band_idx AND a.band_val = ok.band_val
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    )
    SELECT c.doc_id_a, c.doc_id_b,
           round(({matches}) / {float(N_HASHES)}, 4) AS jaccard_est
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_id_a
    JOIN sig sb ON sb.doc_id = c.doc_id_b
    """


def _simhash_oracle() -> str:
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(P_BITS)
    )
    fp = " + ".join(
        f"((CASE WHEN v_{i} > 0 THEN 1 ELSE 0 END)::BIGINT << {i})"
        for i in range(P_BITS)
    )
    mask = (1 << P_BAND_BITS) - 1
    band_rows = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx,"
        f" (simhash >> {b * P_BAND_BITS}) & {mask} AS band_val FROM fp"
        for b in range(P_BITS // P_BAND_BITS)
    )
    return f"""
    WITH {_SHINGLE_CTES},
    toks AS (
      SELECT doc_id, {hash60_duck('shingle')} AS h
      FROM (SELECT doc_id, unnest(string_split(nt, ' ')) AS shingle FROM norm)
      WHERE shingle <> ''
    ),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM toks GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id, {fp} AS simhash FROM votes
    ),
    bands AS (
      {band_rows}
    ),
    ok AS (
      SELECT band_idx, band_val FROM bands
      GROUP BY band_idx, band_val HAVING count(*) <= {MAX_BAND}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             a.simhash AS h_a, b.simhash AS h_b
      FROM bands a
      JOIN ok ON a.band_idx = ok.band_idx AND a.band_val = ok.band_val
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b,
           CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h_a, h_b)) <= {P_MAX_HAMMING}
    """


@query("dedup_minhash_lsh_portable", _minhash_oracle())
def dedup_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs, portable-hash flavor — the full
    shingle→signature→band→bucket-join pipeline value-checked against
    DuckDB (VERDICT r3 item #1)."""
    t = load_tables(spark, sf_dir)
    return candidate_pairs(
        t["documents"], hash_sql=seeded_hash_spark, band_concat=True
    )


@query("dedup_simhash_pairs_portable", _simhash_oracle())
def dedup_simhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, portable 60-bit flavor, DuckDB-checked."""
    t = load_tables(spark, sf_dir)
    return near_pairs(
        t["documents"],
        max_hamming=P_MAX_HAMMING,
        token_hash_sql=hash60_spark("tok"),
        n_bits=P_BITS,
        band_bits=P_BAND_BITS,
    )
