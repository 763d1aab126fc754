"""Schema evolution: diff, safety classification, and application.

The reference *declares* this capability ("Safe, intentional schema
changes using Iceberg's evolution model", "human-in-the-loop
normalization" — README.md:12,27-31) but implements no code for it; the
registry only detects change via hash (schema_inferer.py:229-234). This
module supplies the missing mechanics on top of the registry's
versioned schemas:

- ``diff_schemas``: field-level diff of two schema versions (added /
  removed / type-changed), recursing into nested structs the way the
  silver contract extracts them (dot paths).
- ``classify``: a diff is SAFE when it only adds nullable fields or
  widens types along Spark's implicit-cast lattice (int→long→double);
  anything else (drop, narrow, rename) is BREAKING and needs the
  human approval the reference's governance posture calls for.
- ``conform``: evolve a DataFrame to a target schema — missing fields
  become typed NULLs (the reference's own union-compat idiom, :96-110),
  widenable fields are cast, extra fields are dropped; output column
  order is the target's. This is what makes old-version bronze
  readable under a new-version contract (and vice versa) without
  rewriting data — the file-format-level analog of Iceberg evolution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Safe widenings along Spark's implicit cast lattice (loss-free),
# keyed by DataType.simpleString() names.
_WIDENINGS: set[tuple[str, str]] = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"), ("int", "double"),
    ("bigint", "double"),  # documented: lossy >2^53, accepted by Spark
    ("float", "double"),
    ("date", "timestamp"),
}


@dataclass
class SchemaDiff:
    added: list[tuple[str, str]] = field(default_factory=list)      # (path, type)
    removed: list[tuple[str, str]] = field(default_factory=list)    # (path, type)
    changed: list[tuple[str, str, str]] = field(default_factory=list)  # (path, old, new)

    @property
    def empty(self) -> bool:
        return not (self.added or self.removed or self.changed)


def _flatten(schema: T.StructType, prefix: str = "") -> dict[str, T.DataType]:
    out: dict[str, T.DataType] = {}
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.update(_flatten(f.dataType, f"{path}."))
        else:
            out[path] = f.dataType
    return out


def diff_schemas(old: T.StructType, new: T.StructType) -> SchemaDiff:
    """Field-level diff on dot-path-flattened schemas (nested structs
    compare per leaf, matching how contracts extract them)."""
    o, n = _flatten(old), _flatten(new)
    d = SchemaDiff()
    for path in sorted(n.keys() - o.keys()):
        d.added.append((path, n[path].simpleString()))
    for path in sorted(o.keys() - n.keys()):
        d.removed.append((path, o[path].simpleString()))
    for path in sorted(o.keys() & n.keys()):
        if o[path] != n[path]:
            d.changed.append((path, o[path].simpleString(), n[path].simpleString()))
    return d


def classify(diff: SchemaDiff) -> str:
    """'none' | 'safe' (auto-appliable) | 'breaking' (needs approval —
    the reference's human-in-the-loop gate, README.md:12)."""
    if diff.empty:
        return "none"
    if diff.removed:
        return "breaking"
    for _path, old_t, new_t in diff.changed:
        if (old_t, new_t) not in _WIDENINGS:
            return "breaking"
    return "safe"


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Evolve ``df`` to ``target``: add missing top-level fields as
    typed NULLs, cast type mismatches (Catalyst validates the cast),
    drop extras, and order columns per target. One narrow projection —
    no shuffle, safe to run inside a streaming micro-batch."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
