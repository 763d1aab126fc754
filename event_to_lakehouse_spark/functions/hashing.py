"""Portable 60-bit cross-engine hash — LEAF module.

    h(s) = int(first 15 hex chars of md5(utf8(s)), 16)

Spark and DuckDB compute it bit-identically (md5 is a byte-level
standard; 15 hex chars = 60 bits, safely inside BIGINT in both
engines, no overflow under Spark ANSI mode). Seeding prepends
``'{seed}:'``, giving k independent hash functions.

Lives under ``functions`` (imports nothing from this package) because
it is shared by ``dedup.portable``, ``operators.events``,
``operators.sketches``, and ``curation`` — importing it from
``dedup.portable`` created an import cycle (ann → operators → events →
dedup → cluster → ann) that broke whenever ``similarity.ann`` was the
import root.
"""

from __future__ import annotations

__all__ = [
    "hash60_spark",
    "hash60_duck",
    "seeded_hash_spark",
    "seeded_hash_duck",
]


def hash60_spark(expr: str) -> str:
    """Spark SQL: portable 60-bit hash of a string expression."""
    return (
        f"CAST(conv(substr(md5(CAST({expr} AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
    )


def hash60_duck(expr: str) -> str:
    """DuckDB SQL: the same 60-bit hash, bit-identical."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded_hash_spark(seed: int, col: str) -> str:
    return hash60_spark(f"concat('{seed}:', {col})")


def seeded_hash_duck(seed: int, col: str) -> str:
    return hash60_duck(f"'{seed}:' || {col}")
