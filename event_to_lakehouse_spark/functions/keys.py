"""Deterministic surrogate-key functions.

Re-expresses the reference's asset-uid idiom — null-safe composite key
assembly then SHA-256 — as a reusable column function. Reference parity:
``sha2(concat_ws("|", lower(trim(col)), ...), 256)`` at
``scripts/bronze_assets_to_silver_assets.py:139-149`` (rapid7) and
``:244-255`` (fortisiem).

All built-in JVM expressions: stays inside whole-stage codegen, no
Python at runtime, fully partition-parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize", "composite_key", "surrogate_uid"]


def canonicalize(c: Column | str) -> Column:
    """lower(trim(x)) — the reference's key canonicalization
    (bronze_assets_to_silver_assets.py:143-144)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(col.cast("string")))


def composite_key(*cols: Column | str, sep: str = "|") -> Column:
    """Null-safe composite key: concat_ws skips NULLs, so a missing
    component collapses rather than nulling the whole key — same
    semantics the reference relies on (:141-147)."""
    return F.concat_ws(sep, *[canonicalize(c) for c in cols])


def surrogate_uid(*cols: Column | str, bits: int = 256) -> Column:
    """Deterministic sha2 surrogate key over canonicalized components
    (bronze_assets_to_silver_assets.py:139-149)."""
    return F.sha2(composite_key(*cols), bits)
