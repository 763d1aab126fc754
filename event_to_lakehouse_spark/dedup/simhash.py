"""SimHash (64-bit) near-duplicate fingerprinting.

Per document: hash each token (xxhash64); for each of 64 bit positions
take the sign of sum(±1) across tokens; assemble the sign bits into one
BIGINT fingerprint. Near-dup candidates are pairs within a small
Hamming distance.

Implementation: explode tokens → one codegen pass computing 64
``sum(case bit set +1 else -1)`` aggregates per doc (map-side combined,
so the shuffle is 64 ints per doc) → assemble bits with
shiftleft/bitwiseOR. Pair search reuses the LSH band shape: 4 × 16-bit
bands of the fingerprint; equal band → candidate; verification =
``bit_count(xor) <= max_hamming``.

(The earlier formulation — 64 ``aggregate`` HOF lambdas over a token
array — ran interpreted and re-evaluated tokenization per bit; the
explode+agg form stays in whole-stage codegen.)

No DuckDB oracle (xxhash64); pytest pins the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from ..operators.relational import query
from ..tables import load_tables

N_BITS = 64
BAND_BITS = 16
N_BANDS = N_BITS // BAND_BITS


def fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    token_hash_sql: str = "xxhash64(tok)",
    n_bits: int = N_BITS,
) -> DataFrame:
    """(doc_id, simhash: bigint) — one codegen'd explode+agg pass.

    The 64 vote aggregates and the 64-term bit assembly are built as
    SQL expression strings (one JVM-side parse) rather than nested
    Column objects: the Column form costs ~600 py4j round-trips plus a
    64-deep analyzer tree, which dominated the query at ~2s of pure
    driver overhead (measured 2.8s → 0.9s at sf0.1). The assembly OR
    is a balanced tree, keeping the optimizer's expression-tree depth
    at 6 instead of 64.

    ``token_hash_sql`` (SQL expr over column ``tok``) selects the hash
    family: xxhash64 default; the md5-slice portable flavor
    (``portable.py``) is DuckDB-mirrorable, paired with ``n_bits=60``
    (an md5 slice of 15 hex chars)."""
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        # hash once per token; the 64 bit-vote aggregates below then
        # read this column instead of each re-evaluating the hash.
        .selectExpr("doc_id", f"{token_hash_sql} AS h")
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v_{i}"
            )
            for i in range(n_bits)
        ]
    )
    terms = [f"shiftleft(CAST(v_{i} > 0 AS BIGINT), {i})" for i in range(n_bits)]
    while len(terms) > 1:
        terms = [
            f"({terms[j]} | {terms[j + 1]})" if j + 1 < len(terms) else terms[j]
            for j in range(0, len(terms), 2)
        ]
    return votes.selectExpr("doc_id", f"{terms[0]} AS simhash")


MAX_BAND = 200  # drop degenerate band buckets (same guard as minhash)


def near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 8,
    token_hash_sql: str = "xxhash64(tok)",
    n_bits: int = N_BITS,
    band_bits: int = BAND_BITS,
) -> DataFrame:
    """Banded candidate generation + Hamming verification.

    The band table is persisted: both sides of the candidate self-join
    reference it, and without materialization Catalyst re-executes the
    whole explode+64-aggregate fingerprint pipeline per side (the
    minhash.candidate_pairs lesson). Hot-band guard: a band value
    shared by ~everyone (boilerplate / byte-identical corpora) is
    non-discriminative and would pair quadratically — those buckets are
    dropped (``MAX_BAND``); byte-identical duplicates belong to the
    cheaper exact-dedup pass anyway. The window's (band_idx, band_val)
    partitioning is exactly the self-join key, so the count reuses the
    join's shuffle."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    assert n_bits % band_bits == 0, "n_bits must be divisible by band_bits"
    n_bands = n_bits // band_bits
    fps = fingerprints(docs, text_col, token_hash_sql, n_bits).select(
        "doc_id", "simhash"
    )
    mask = (1 << band_bits) - 1
    w = Window.partitionBy("band_idx", "band_val")
    bands = (
        fps.select(
            "doc_id",
            "simhash",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask))
                        for b in range(n_bands)
                    ]
                )
            ).alias("band_idx", "band_val"),
        )
        .withColumn("band_n", F.count(F.lit(1)).over(w))
        .filter(F.col("band_n") <= MAX_BAND)
        .drop("band_n")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select("doc_id_a", "doc_id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


@query("dedup_simhash_fingerprints")  # rows-only: xxhash64 engine-specific
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return fingerprints(t["documents"]).select("doc_id", "simhash")


@query("dedup_simhash_pairs")  # rows-only
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return near_pairs(t["documents"])
