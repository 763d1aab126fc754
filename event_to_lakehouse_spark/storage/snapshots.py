"""Snapshot-versioned parquet tables: the reference's Iceberg sink
semantics (``writeTo(...).append()`` on ``iceberg.silver.assets`` —
``bronze_assets_to_silver_assets.py:275-277``, catalog conf
``docker-compose.yml:336-339``) re-expressed without table-format jars.

What Iceberg gives that sandbox has no jars for — and what this module
supplies on plain parquet:

- **Atomic commits / snapshot isolation**: data files land under
  ``data/<commit-uuid>/`` first; a manifest (``meta/v{N}.json``) lists
  exactly the files of that version; the ``meta/_latest`` pointer is
  swapped by rename. Readers resolve the pointer once and only ever see
  a fully-committed file set — never a half-written append.
- **Time travel**: ``read(version=K)`` reads any retained snapshot.
- **Exactly-once appends**: ``append(df, batch_token=...)`` refuses a
  token that is already in the manifest chain — the ``foreachBatch``
  replay dedup the reference's blind-append writer lacks (it receives
  ``batch_id`` and ignores it).
- **File skipping**: each commit records per-file min/max for a chosen
  stats column (one column-pruned pass over the new files only);
  ``read(between=(lo, hi))`` opens only overlapping files — the zone-map
  pruning Iceberg manifests provide.

Object stores: construct with ``posix_rename=False`` — the ``_latest``
pointer (whose rename/flock are posix-only) is skipped entirely and
"latest" is resolved by listing the manifest chain, the same resolution
``snapshot()`` always performs; commit atomicity rests solely on the
exclusive manifest create (hard-link locally, conditional PUT on a real
store). Concurrent writers are serialized optimistically by that
exclusive create, and a loser must retry its commit (its data files are
orphaned, swept by ``vacuum``).
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["SnapshotTable", "Snapshot", "token_consistent_versions"]


def _stat_safe(v):
    """Serialize a stats value EXACTLY as the manifest stores it.

    Manifest min/max keep their native JSON type (ints/floats compare
    numerically, strings lexicographically); non-JSON temporals become
    ``isoformat()`` strings. Every comparison against stored stats
    (read-pruning, merge, delete_where) must pass its bounds through
    this same function — ``str(datetime)`` yields ``'... 06:00'`` while
    ``isoformat()`` yields ``'...T06:00'``, and ``' ' < 'T'`` silently
    breaks overlap tests for same-date boundaries."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


def _latest_batch_wins(
    base: DataFrame,
    batch: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str | None,
) -> DataFrame:
    """Latest-wins survivor per key with a DETERMINISTIC full-identity
    tie rule (ADVICE r11, closed in code): at equal
    ``(order_col, tiebreak)`` the BATCH row beats the base row —
    last-writer-wins at equal version — instead of row_number's
    arbitrary pick. Shared by ``merge`` and ``apply_changes`` so a
    payload rewrite under a reused identity APPLIES deterministically
    everywhere (and the CDC feed can be truthful about it)."""
    from pyspark.sql import Window

    pool = base.withColumn("_pref", F.lit(0)).unionByName(
        batch.withColumn("_pref", F.lit(1)),
        allowMissingColumns=True,
    )
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(),
        F.col(tiebreak or key).desc(),
        F.col("_pref").desc(),
    )
    return (
        pool.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pref")
    )


def _contains_map(dt) -> bool:
    """True when a dataType holds a MapType anywhere (top level or
    nested in struct/array) — such columns can't feed xxhash64 (maps
    are unordered, Spark refuses a canonical hash) and go through
    to_json in the change-feed row fingerprint instead."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


@dataclass
class Snapshot:
    version: int
    files: list[dict]  # {"path": str, "rows": int, "min": str|None, "max": str|None}
    batch_tokens: list[str] = field(default_factory=list)
    stats_col: str | None = None
    #: per-snapshot logical schema (StructType.jsonValue() dict) — the
    #: Iceberg evolution model: each snapshot pins the schema current
    #: at its commit, so time travel returns the OLD shape and the
    #: latest read returns the evolved union. None on pre-evolution
    #: manifests (reads fall back to the files' own schema).
    schema: dict | None = None

    @property
    def paths(self) -> list[str]:
        return [f["path"] for f in self.files]

    def struct(self):
        """The pinned schema as a StructType (None if unrecorded)."""
        from pyspark.sql.types import StructType

        return StructType.fromJson(self.schema) if self.schema else None


class SnapshotTable:
    """A parquet directory with Iceberg-style snapshot semantics."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        stats_col: str | None = None,
        stats_cols: list[str] | None = None,
        bloom_col: str | None = None,
        bloom_bits: int = 8192,
        bloom_k: int = 4,
        posix_rename: bool = True,
    ):
        """``stats_col`` keeps the original single-column zone-map API
        (merge/delete/`between` pruning key). ``stats_cols`` widens the
        manifest to min/max for SEVERAL columns — the Iceberg manifest
        shape — so ``read(where={...})`` can prune on a multi-column
        box; pair it with ``layout.cluster_by_zorder`` to make those
        boxes actually selective (without clustering, secondary-column
        ranges span every file and prune nothing). ``bloom_col`` adds a
        per-file Bloom filter (``bloom_bits`` bits, ``bloom_k`` probes,
        xxhash64 salted per probe) to each manifest entry for
        ``read_point`` lookups: equality on a high-cardinality key
        skips files min/max can't — at 100 TB a point lookup opens a
        handful of footers instead of every file whose range happens to
        straddle the key. Bits are built in the SAME one-pass,
        column-pruned aggregation as the min/max stats (collect_set of
        probe positions, bounded by bloom_bits per file — metadata, not
        data, crosses to the driver).

        SIZE bloom_bits to ~10 bits per expected distinct key per file
        (the standard ~1% fpp operating point for k=4): the 8192-bit
        default suits ≤1k keys/file; a 128 MB parquet file of narrow
        rows wants 2^20+. An undersized filter degrades gracefully —
        fill rate rises, false-positive files stop being excluded — but
        never drops a true match (no false negatives by construction)."""
        self.spark = spark
        self.root = Path(root)
        # posix_rename=False is the OBJECT-STORE protocol: no ``_latest``
        # pointer (rename/flock aren't atomic there) — "latest" is
        # resolved ONLY by listing the manifest chain, which snapshot()
        # does anyway. Commits stay atomic via the exclusive manifest
        # create (conditional PUT on a real store). The pointer mode is
        # a pure O(1)-hint optimization for posix/HDFS deployments.
        self.posix_rename = posix_rename
        # injectable clock (tests pin it); production uses wall time
        import time as _time

        self._clock = lambda: int(_time.time())
        self.stats_cols = list(stats_cols) if stats_cols else (
            [stats_col] if stats_col else []
        )
        self.bloom_col = bloom_col
        self.bloom_bits = bloom_bits
        self.bloom_k = bloom_k
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        (self.root / "meta").mkdir(parents=True, exist_ok=True)
        if not self.stats_cols or bloom_col is None:
            # Self-configure from the newest manifest: readers shouldn't
            # need to know the writer's stats/bloom config — the
            # manifest records it (like a real table format's metadata).
            # Explicit arguments always win (reconfiguration on the next
            # commit); the probe is one small JSON read.
            try:
                doc = json.loads(
                    (self.root / "meta" / f"v{self._latest_version()}.json")
                    .read_text()
                )
                if not self.stats_cols:
                    self.stats_cols = list(
                        doc.get("stats_cols")
                        or ([doc["stats_col"]] if doc.get("stats_col") else [])
                    )
                if bloom_col is None and doc.get("bloom_col"):
                    self.bloom_col = doc["bloom_col"]
                    self.bloom_bits = int(doc.get("bloom_bits", bloom_bits))
                    self.bloom_k = int(doc.get("bloom_k", bloom_k))
            except (FileNotFoundError, json.JSONDecodeError):
                pass  # empty table: keep constructor args
        self.stats_col = self.stats_cols[0] if self.stats_cols else None

    # -- manifest chain -----------------------------------------------------

    def _latest_version(self) -> int:
        """The exclusive manifest create in ``_commit`` IS the commit,
        so latest = max existing manifest — NOT the ``_latest`` pointer,
        which the winner advances a beat later. Resolving via the
        pointer let a racing writer spin on a stale parent and collide
        with the same already-created manifest until its retries ran
        out; the manifest listing has no such window (its creation
        happened-before the loser's EEXIST). The pointer stays
        maintained as a cheap O(1) hint for external readers; on an
        object store this listing is one LIST of the meta/ prefix —
        the same resolution Iceberg does against its catalog."""
        versions = [
            int(p.stem[1:]) for p in (self.root / "meta").glob("v*.json")
        ]
        return max(versions, default=0)

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        v = self._latest_version() if version is None else version
        if v == 0:
            return None
        doc = json.loads((self.root / "meta" / f"v{v}.json").read_text())
        return Snapshot(
            version=v,
            files=doc["files"],
            batch_tokens=doc.get("batch_tokens", []),
            stats_col=doc.get("stats_col"),
            schema=doc.get("schema"),
        )

    def history(self) -> list[int]:
        return sorted(
            int(p.stem[1:]) for p in (self.root / "meta").glob("v*.json")
        )

    def row_count(self, version: int | None = None) -> int:
        """Rows in the snapshot, from manifest per-file stats — a pure
        metadata read (no data files touched). This is the count a
        100 TB consumer (e.g. Bloom-bitmap sizing) must use instead of
        a fresh ``read().count()`` scan; Iceberg serves the same number
        from its manifest ``record_count`` fields."""
        snap = self.snapshot(version)
        return 0 if snap is None else sum(f["rows"] for f in snap.files)

    def _commit(
        self,
        files: list[dict],
        batch_tokens: list[str],
        parent_version: int | None = None,
        schema: dict | None = None,
    ) -> Snapshot:
        # The new version is anchored on the PARENT the files were
        # derived from — not on the live pointer — so a writer holding
        # a stale parent collides (FileExistsError) instead of silently
        # committing a lineage that drops a racer's files (lost update).
        base = self._latest_version() if parent_version is None else parent_version
        v = base + 1
        manifest = self.root / "meta" / f"v{v}.json"
        payload = json.dumps(
            {
                "files": files,
                "batch_tokens": batch_tokens,
                "stats_col": self.stats_col,
                "stats_cols": self.stats_cols,
                "bloom_col": self.bloom_col,
                "bloom_bits": self.bloom_bits,
                "bloom_k": self.bloom_k,
                "schema": schema,
                # wall-clock commit time (epoch seconds) — the basis
                # for time-based retention (expire_snapshots); advisory
                # only, never used for ordering (versions order).
                "committed_at": self._clock(),
            }
        )
        # Exclusive AND atomic manifest creation: the payload is staged
        # to a hidden temp file, then hard-linked into place. link(2)
        # fails with EEXIST on a racing writer (optimistic concurrency —
        # the loser re-resolves latest and retries; its data dir is
        # orphaned until vacuum()) and publishes the COMPLETE document
        # in one metadata op, so a concurrent reader can never parse a
        # half-written manifest. (An O_EXCL create followed by write()
        # had exactly that window.) On an object store the equivalent is
        # a conditional full-object PUT (If-None-Match), which is also
        # exclusive-and-atomic — same protocol, different primitive.
        tmp = self.root / "meta" / f".commit.tmp.{uuid.uuid4().hex[:8]}"
        tmp.write_text(payload)
        try:
            os.link(tmp, manifest)
        finally:
            tmp.unlink()
        if self.posix_rename:
            self._advance_pointer(v)
        return self.snapshot(v)  # type: ignore[return-value]

    def _pointer_version(self) -> int:
        """The ``_latest`` hint file's value — 0 when absent (fresh
        table, object-store mode, or a crash before the first
        advance). Advisory only: authoritative resolution is always
        ``_latest_version()``'s manifest listing."""
        try:
            return int((self.root / "meta" / "_latest").read_text())
        except (FileNotFoundError, ValueError):
            return 0

    def _advance_pointer(self, v: int) -> None:
        """Move ``_latest`` forward to ``v`` unless it already points at
        something newer. Check-then-rename alone races: concurrent
        commits of v2 and v3 can both pass the check and the v2 writer
        can rename LAST, regressing the pointer while v3.json exists —
        after which every append resolves parent v2, collides with the
        existing v3 manifest, and the table wedges. An advisory flock
        around the check+swap makes the pair atomic among cooperating
        writers (posix/NFSv4; on object stores resolve latest by
        listing the manifest chain instead).

        The monotonic check compares against the POINTER's own value —
        not ``_latest_version()``, whose manifest listing already
        contains the just-committed v and would make the guard
        always-false (r14: that bug left ``_latest`` never written;
        internal resolution never noticed because every reader goes
        through the manifest listing). Because the pointer trails the
        manifest create, a crash in the gap leaves it STALE — readers
        are unaffected (manifest listing is authoritative), and the
        next successful commit's advance heals it, both pinned by
        ``test_commit_crash_between_link_and_pointer_advance``."""
        lock = self.root / "meta" / "_latest.lock"
        lock_fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
            if v > self._pointer_version():  # never move it backwards
                tmp = self.root / "meta" / f"_latest.tmp.{uuid.uuid4().hex[:8]}"
                tmp.write_text(str(v))
                tmp.rename(self.root / "meta" / "_latest")  # atomic swap
        finally:
            os.close(lock_fd)  # releases the flock

    # -- schema evolution ---------------------------------------------------

    # Safe numeric widening chains (Iceberg's promotion set): Spark 4's
    # parquet reader natively reads a file written at any earlier stage
    # of a chain under the wider pinned type (probed: int32 file under
    # LongType schema, float under double — both read clean).
    # keys are DataType.typeName() values (byte/short, NOT the SQL
    # names tinyint/smallint — a property test caught that mismatch)
    _WIDEN = {"byte": 0, "short": 1, "integer": 2, "long": 3}
    _WIDEN_F = {"float": 0, "double": 1}

    @classmethod
    def _wider(cls, a, b):
        """The wider of two types along a promotion chain, or None if
        they are not chain-compatible."""
        if a == b:
            return a
        for chain in (cls._WIDEN, cls._WIDEN_F):
            an, bn = a.typeName(), b.typeName()
            if an in chain and bn in chain:
                return a if chain[an] >= chain[bn] else b
        return None

    @classmethod
    def _evolve(cls, parent_schema: dict | None, df: DataFrame) -> dict:
        """ADDITIVE schema evolution plus safe numeric type promotion
        (the core of Iceberg's model): the child schema is the parent's
        fields, in order — each widened if the incoming frame demands
        it — plus any new ``df`` columns appended as nullable. A
        same-name column whose types are NOT promotion-compatible is
        rejected: silent coercion is how lakehouse tables corrupt."""
        from pyspark.sql.types import StructField, StructType

        if not parent_schema:
            return df.schema.jsonValue()
        parent = StructType.fromJson(parent_schema)
        incoming = {f.name: f for f in df.schema.fields}
        fields = []
        for old in parent.fields:
            new = incoming.get(old.name)
            if new is None or new.dataType == old.dataType:
                fields.append(old)
                continue
            wider = cls._wider(old.dataType, new.dataType)
            if wider is None:
                raise ValueError(
                    f"incompatible schema change for column '{old.name}': "
                    f"{old.dataType.simpleString()} -> "
                    f"{new.dataType.simpleString()} (only additive evolution "
                    "and numeric widening are supported)"
                )
            fields.append(StructField(old.name, wider, True))
        seen = {f.name for f in fields}
        fields += [
            StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name not in seen
        ]
        return StructType(fields).jsonValue()

    def alter_schema(
        self,
        add: dict[str, str] | None = None,
        drop: list[str] | None = None,
    ) -> Snapshot:
        """METADATA-ONLY schema change — the Iceberg ``ALTER TABLE``
        shape: a new manifest with the SAME file set and an edited
        pinned schema. ``add`` maps column name → Spark type string
        (simpleString, e.g. ``"long"``, ``"array<double>"``); added
        columns read as NULL until a writer fills them. ``drop``
        removes columns from the pinned schema — the bytes stay in the
        files (and in older snapshots, which still time-travel to the
        pre-drop shape) but every read of this and later snapshots
        projects them away. Zero data files touched either way."""
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        if snap.schema is None:
            raise ValueError(
                "table has no pinned schema yet (pre-evolution manifests); "
                "run one append first"
            )
        schema = StructType.fromJson(snap.schema)
        names = {f.name for f in schema.fields}
        for c in drop or []:
            if c not in names:
                raise ValueError(f"cannot drop unknown column '{c}'")
            if c in self.stats_cols or c == self.bloom_col:
                raise ValueError(
                    f"column '{c}' backs the table's stats/bloom pruning; "
                    "reconfigure those before dropping it"
                )
        fields = [f for f in schema.fields if f.name not in set(drop or [])]
        for name, typ in (add or {}).items():
            if name in names:
                raise ValueError(f"column '{name}' already exists")
            fields.append(StructField(name, _parse_datatype_string(typ), True))
        return self._commit(
            snap.files,
            list(snap.batch_tokens),
            snap.version,
            schema=StructType(fields).jsonValue(),
        )

    def _read_files(self, paths: list[str], schema: dict | None) -> DataFrame:
        """Read a file set under a pinned snapshot schema: files written
        before a column existed surface it as NULL, files with columns
        the snapshot doesn't know are projected away. Passing the
        explicit schema (instead of ``mergeSchema``) keeps planning
        manifest-only — no footer merge over the whole file set, which
        is what makes this viable at 100 TB file counts."""
        if schema is None:
            return self.spark.read.parquet(*paths)
        from pyspark.sql.types import StructType

        return self.spark.read.schema(StructType.fromJson(schema)).parquet(*paths)

    # -- writes -------------------------------------------------------------

    def _string_stats_exact(self) -> bool:
        """Can this table's OWN writer have truncated binary min/max?
        ``_footer_entries`` only ever reads files the commit paths just
        wrote through ``self.spark``, so the writer config is in hand:
        parquet-mr truncates stats only when
        ``parquet.statistics.truncate.length`` is set below its
        Integer.MAX_VALUE default (oversized stats are DROPPED, not
        truncated, at the default — the exact-or-absent contract the
        footer path relies on). Unknown/unreadable conf counts as
        "may truncate" → Spark path (ADVICE r15)."""
        try:
            v = (
                self.spark.sparkContext._jsc.hadoopConfiguration()
                .get("parquet.statistics.truncate.length")
            )
            return v is None or int(v) >= 2**31 - 1
        except Exception:
            return False

    def _footer_entries(self, paths: list[str]) -> list[dict] | None:
        """Manifest entries from the parquet FOOTERS — no Spark job
        (r15, guide §1.2 step 1: every commit used to launch a second
        read-back job just to aggregate rows + min/max over the files
        it had just written; footers already hold both). Row counts
        are exact by the parquet spec. Min/max are taken ONLY for
        integer/string stats columns whose every non-empty row group
        carries exact statistics — the types every stats/bloom column
        in this repo uses except the streaming ``ingest_ts`` — and the
        values equal the Spark aggregate's by the parquet statistics
        contract (exact or absent; parquet-mr drops oversized stats
        rather than truncating them, and ``is_*_value_exact`` is
        honored where pyarrow exposes it). ANY other case — temporal/
        float/bool/decimal stats column, missing or inexact footer
        stats, unreadable footer — returns None and the caller falls
        back to the Spark aggregation path, so pruning semantics can
        never degrade silently. Equivalence is pinned by
        ``test_snapshots.py::test_footer_entries_match_spark_stats``."""
        try:
            import pyarrow.parquet as _pq
        except Exception:  # pragma: no cover - pyarrow ships with pyspark
            return None
        str_exact: bool | None = None  # lazy: one writer-conf read/call
        out = []
        for p in paths:
            try:
                md = _pq.ParquetFile(p).metadata
            except Exception:
                return None
            schema = md.schema.to_arrow_schema()
            names = set(schema.names)
            # parquet row groups index PHYSICAL leaves; a stats column
            # must be a flat top-level leaf (path == name) or we fall
            # back — nested leaves reorder the physical index space
            leaf_idx = {
                md.schema.column(i).path: i for i in range(md.num_columns)
            }
            entry: dict = {"path": p, "rows": int(md.num_rows)}
            if md.num_rows == 0:
                # mirror the Spark path: an empty file gets no stats
                # block (its groupBy produced no row)
                entry["min"] = entry["max"] = None
                out.append(entry)
                continue
            stats: dict[str, list] = {}
            for c in self.stats_cols:
                if c not in names:
                    stats[c] = [None, None]  # absent column: no pruning
                    continue
                import pyarrow as _pa

                typ = schema.field(c).type
                if not (
                    _pa.types.is_integer(typ)
                    or _pa.types.is_string(typ)
                    or _pa.types.is_large_string(typ)
                ):
                    return None  # unsupported type: Spark path
                ci = leaf_idx.get(c)
                if ci is None:
                    return None  # not a flat leaf: Spark path
                mn = mx = None
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    if g.num_rows == 0:
                        continue
                    col = g.column(ci)
                    st = col.statistics
                    if (
                        st is not None
                        and getattr(st, "has_null_count", True)
                        and st.null_count == g.num_rows
                    ):
                        continue  # all-null group contributes nothing
                    if st is None or not st.has_min_max:
                        return None
                    # Exactness (ADVICE r15): False means the writer
                    # truncated the value (parquet.statistics.truncate.
                    # length on a long string) — bounds stay
                    # conservative for pruning but would diverge from
                    # the Spark aggregate, so fall back. On pyarrow
                    # builds that don't expose the flags (<17, incl.
                    # the one pyspark ships) they read as None: an
                    # integer's stats are fixed-width (never truncated,
                    # exact by spec), but a STRING's exactness is then
                    # UNKNOWN from the footer alone — prove it from the
                    # WRITER instead (these files were just written by
                    # self.spark; see _string_stats_exact) or take the
                    # Spark path.
                    mn_exact = getattr(st, "is_min_value_exact", None)
                    mx_exact = getattr(st, "is_max_value_exact", None)
                    if mn_exact is False or mx_exact is False:
                        return None
                    if not _pa.types.is_integer(typ) and (
                        mn_exact is None or mx_exact is None
                    ):
                        if str_exact is None:
                            str_exact = self._string_stats_exact()
                        if not str_exact:
                            return None
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
                stats[c] = [_stat_safe(mn), _stat_safe(mx)]
            mn0, mx0 = (
                stats[self.stats_cols[0]] if self.stats_cols else (None, None)
            )
            entry["min"], entry["max"] = mn0, mx0
            if self.stats_cols:
                entry["stats"] = stats
            out.append(entry)
        return out

    def _file_entries(self, commit_dir: Path) -> list[dict]:
        """Per-file manifest entries with rows + stats-column min/max —
        from the parquet footers when possible (no Spark job; see
        ``_footer_entries``), else ONE column-pruned read over the new
        files only."""
        paths = sorted(str(p) for p in commit_dir.glob("*.parquet"))
        if not paths:
            return []
        if self.bloom_col is None:  # bloom bits need a real value scan
            entries = self._footer_entries(paths)
            if entries is not None:
                return entries
        df = self.spark.read.parquet(*paths).withColumn(
            "_file", F.input_file_name()
        )
        # A frame may legitimately lack some stats/bloom columns (e.g.
        # write_silver's non-contract bare-table path sharing a root):
        # aggregate only what is present and record null stats for the
        # rest — readers already treat missing stats/bloom as
        # "cannot exclude", so skipping degrades pruning, not results.
        present = [c for c in self.stats_cols if c in df.columns]
        bloom_ok = self.bloom_col is not None and self.bloom_col in df.columns
        aggs = [F.count(F.lit(1)).alias("rows")]
        for j, c in enumerate(self.stats_cols):
            if c in present:
                aggs += [F.min(c).alias(f"mn{j}"), F.max(c).alias(f"mx{j}")]
        if bloom_ok:
            for i in range(self.bloom_k):
                aggs.append(
                    F.collect_set(
                        F.pmod(
                            F.xxhash64(
                                F.col(self.bloom_col).cast("string"), F.lit(i)
                            ),
                            F.lit(self.bloom_bits),
                        )
                    ).alias(f"bl{i}")
                )
        stats = {
            r["_file"].replace("file://", "").replace("file:", ""): r
            for r in df.groupBy("_file").agg(*aggs).collect()
        }

        def _mn_mx(r, j: int, c: str):
            if r is None or c not in present:
                return None, None
            return _stat_safe(r[f"mn{j}"]), _stat_safe(r[f"mx{j}"])

        out = []
        for p in paths:
            r = stats.get(p)
            mn0, mx0 = (
                _mn_mx(r, 0, self.stats_cols[0]) if self.stats_cols else (None, None)
            )
            entry = {"path": p, "rows": int(r["rows"]) if r else 0, "min": mn0, "max": mx0}
            if r and self.stats_cols:
                entry["stats"] = {
                    c: list(_mn_mx(r, j, c))
                    for j, c in enumerate(self.stats_cols)
                }
            if r and bloom_ok:
                bits = 0
                for i in range(self.bloom_k):
                    for pos in r[f"bl{i}"]:
                        bits |= 1 << pos
                entry["bloom"] = f"{bits:x}"
            out.append(entry)
        return out

    # -- bloom helpers ------------------------------------------------------

    def _bloom_positions(self, value) -> list[int]:
        """Probe positions for ``value`` — computed by the SAME Spark
        expression used at write time (xxhash64 over ``CAST(x AS
        STRING)``, salted per probe), via a 1-row local-relation job: a
        driver-side metadata op, no table data touched. The probe must
        let SPARK render the value (``lit(value).cast('string')``), not
        Python ``str()`` — the two disagree on e.g. 1e20 ('1e+20' vs
        '1.0E20') and timestamps, and a divergent rendering would probe
        wrong positions and return a silent false negative."""
        row = (
            self.spark.range(1)
            .select(
                *[
                    F.pmod(
                        F.xxhash64(F.lit(value).cast("string"), F.lit(i)),
                        F.lit(self.bloom_bits),
                    ).alias(f"p{i}")
                    for i in range(self.bloom_k)
                ]
            )
            .first()
        )
        return [row[f"p{i}"] for i in range(self.bloom_k)]

    @staticmethod
    def _bloom_may_contain(entry: dict, positions: list[int]) -> bool:
        hexbits = entry.get("bloom")
        if hexbits is None:
            return True  # no filter recorded -> cannot exclude
        bits = int(hexbits, 16)
        return all((bits >> p) & 1 for p in positions)

    def append(
        self,
        df: DataFrame,
        batch_token: str | None = None,
        max_retries: int = 5,
        keep_tokens: bool | int = True,
    ) -> Snapshot:
        """Commit ``df`` as a new snapshot = parent files + new files.
        ``batch_token`` makes replays idempotent: a token already in the
        chain is a no-op returning the current snapshot. ``keep_tokens``
        as an INT carries only the newest that many parent tokens — the
        same bounded-commit-metadata valve as ``overwrite`` (sound when
        the source's replay window is bounded, e.g. a Structured
        Streaming checkpoint); the replay check runs against the FULL
        parent chain before trimming.

        Concurrency: appends are commutative (new files + whatever the
        latest parent holds), so losing the optimistic manifest race is
        handled by re-resolving the parent and retrying the (cheap)
        manifest write — the data files written once are reused."""
        new_entries: list[dict] | None = None
        for _ in range(max_retries):
            parent = self.snapshot()
            tokens = list(parent.batch_tokens) if parent else []
            if batch_token is not None and batch_token in tokens:
                return parent  # replayed micro-batch: exactly-once, no-op
            if keep_tokens is not True:
                tokens = tokens[-int(keep_tokens):] if keep_tokens else []
            if new_entries is None:
                commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
                df.write.mode("overwrite").parquet(str(commit_dir))
                new_entries = self._file_entries(commit_dir)
            files = (parent.files if parent else []) + new_entries
            if batch_token is not None:
                tokens.append(batch_token)
            try:
                return self._commit(
                    files,
                    tokens,
                    parent.version if parent else 0,
                    schema=self._evolve(parent.schema if parent else None, df),
                )
            except FileExistsError:
                continue  # another writer took this version; re-resolve
        raise RuntimeError(
            f"append lost the commit race {max_retries} times at {self.root}"
        )

    def overwrite(
        self,
        df: DataFrame,
        keep_tokens: bool | int = True,
        batch_token: str | None = None,
        parent_version: int | None = None,
    ) -> Snapshot:
        """Commit a snapshot containing ONLY ``df`` (logical truncate +
        load). Old files stay on disk for time travel until vacuum.

        ``keep_tokens=True`` (default) carries the parent's exactly-once
        batch-token chain forward — a content rewrite (compaction) does
        not un-apply the micro-batches whose rows it now holds, so a
        ``foreachBatch`` replay straddling a compaction must still be a
        no-op. Pass ``keep_tokens=False`` only for a true truncate+load
        that starts a new ingestion lineage. An INT carries only the
        NEWEST that many parent tokens — the compaction valve for
        overwrite-per-micro-batch state tables (ADVICE r5: with
        unbounded carry, every manifest grows O(#micro-batches) over a
        long-running stream). Sound whenever the source's replay window
        is bounded: a Structured Streaming checkpoint only ever
        re-delivers batches at-or-after its last committed offset, so a
        token older than the horizon can never be presented again.
        ``batch_token`` joins the carried chain (replay of an
        already-applied token is a no-op, as in ``append``).

        ``parent_version`` anchors the commit: unlike appends (which
        commute), an overwrite whose CONTENT was derived from a read of
        the table — a read-merge-overwrite like ``BloomIndex.add_batch``
        or ``RollupView.refresh`` — silently drops a racer's merge if
        it resolves the parent at commit time. Passing the version the
        content was derived from makes the racing loser collide
        (``FileExistsError``) so it can re-read, re-merge and retry
        instead of manufacturing a lost update."""
        parent = self.snapshot()
        if parent and keep_tokens:
            tokens = list(parent.batch_tokens)
            if keep_tokens is not True:
                tokens = tokens[-int(keep_tokens):]
        else:
            tokens = []
        if batch_token is not None:
            if parent and batch_token in parent.batch_tokens:
                return parent
            tokens.append(batch_token)
        commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
        df.write.mode("overwrite").parquet(str(commit_dir))
        # truncate+load pins the NEW frame's schema (dropping columns is
        # allowed here — the snapshot holds only df's rows); prior
        # snapshots keep their own pinned schema for time travel.
        return self._commit(
            self._file_entries(commit_dir),
            tokens,
            parent_version,
            schema=df.schema.jsonValue(),
        )

    # -- write-audit-publish (staged commits) --------------------------------

    def stage(self, df: DataFrame, batch_token: str | None = None) -> str:
        """WRITE step of write-audit-publish: land ``df``'s data files
        and a STAGED manifest OUTSIDE the snapshot chain — no reader
        sees a staged row. Returns the stage id for ``read_staged``
        (audit), ``publish`` (append it atomically), or ``discard``."""
        stage_id = uuid.uuid4().hex[:12]
        commit_dir = self.root / "data" / stage_id
        df.write.mode("overwrite").parquet(str(commit_dir))
        doc = {
            "files": self._file_entries(commit_dir),
            "batch_token": batch_token,
            "schema": df.schema.jsonValue(),
            "staged_at": self._clock(),
        }
        path = self.root / "meta" / f"staged_{stage_id}.json"
        tmp = path.with_name(f".{path.name}.tmp.{uuid.uuid4().hex[:8]}")
        tmp.write_text(json.dumps(doc))
        tmp.rename(path)
        return stage_id

    def _staged_doc(self, stage_id: str) -> dict:
        try:
            return json.loads(
                (self.root / "meta" / f"staged_{stage_id}.json").read_text()
            )
        except FileNotFoundError:
            raise KeyError(f"no staged commit {stage_id}") from None

    def staged(self) -> list[str]:
        """Pending stage ids (oldest path order)."""
        return sorted(
            p.stem[len("staged_"):]
            for p in (self.root / "meta").glob("staged_*.json")
        )

    def read_staged(self, stage_id: str) -> DataFrame:
        """AUDIT step: the staged rows, readable in isolation — run
        quality gates here before anything is published."""
        doc = self._staged_doc(stage_id)
        return self._read_files([f["path"] for f in doc["files"]], doc["schema"])

    def publish(self, stage_id: str, max_retries: int = 5) -> Snapshot:
        """PUBLISH step: append the staged files to the live chain —
        same optimistic retry, token dedup, and schema evolution as
        ``append`` (the staged schema evolves the pinned one; an
        incompatible stage is rejected HERE, with nothing published).
        The staged manifest is consumed; replaying publish on a
        consumed id raises KeyError, and a staged batch_token already
        in the chain is a no-op that still consumes the stage."""
        from pyspark.sql.types import StructType

        doc = self._staged_doc(stage_id)
        token = doc.get("batch_token")

        class _Shim:  # _evolve only touches .schema
            schema = StructType.fromJson(doc["schema"])

        path = self.root / "meta" / f"staged_{stage_id}.json"
        for _ in range(max_retries):
            parent = self.snapshot()
            tokens = list(parent.batch_tokens) if parent else []
            if token is not None and token in tokens:
                path.unlink()
                return parent  # replayed batch: exactly-once, no-op
            if token is not None:
                tokens.append(token)
            try:
                snap = self._commit(
                    (parent.files if parent else []) + doc["files"],
                    tokens,
                    parent.version if parent else 0,
                    schema=self._evolve(
                        parent.schema if parent else None, _Shim()
                    ),
                )
            except FileExistsError:
                continue  # racing writer took the version; re-resolve
            path.unlink()
            return snap
        raise RuntimeError(
            f"publish lost the commit race {max_retries} times at {self.root}"
        )

    def discard(self, stage_id: str) -> None:
        """Drop a staged commit: the manifest goes now; its data files
        are orphans until ``vacuum`` sweeps them."""
        (self.root / "meta" / f"staged_{stage_id}.json").unlink()

    # -- tags (named refs) --------------------------------------------------

    _TAG_RE = r"[A-Za-z0-9._-]+"

    def _tag_path(self, name: str) -> Path:
        import re

        if not re.fullmatch(self._TAG_RE, name):
            raise ValueError(f"tag name must match {self._TAG_RE}: {name!r}")
        return self.root / "meta" / f"tag_{name}.json"

    def tag(self, name: str, version: int | None = None) -> int:
        """Name a snapshot (Iceberg's tag ref): ``read(tag=name)`` time-
        travels to it and ``vacuum``/``expire_snapshots`` RETAIN it
        until ``drop_tag`` — how a training run pins the exact corpus
        snapshot it consumed. Re-tagging moves the name (atomic
        replace: temp + rename locally, a full-object PUT on a store).
        Defaults to the latest version; tagging a version with no
        manifest raises."""
        v = self._latest_version() if version is None else version
        if not (self.root / "meta" / f"v{v}.json").exists():
            raise FileNotFoundError(f"no snapshot v{v} to tag")
        path = self._tag_path(name)
        tmp = path.with_name(f".{path.name}.tmp.{uuid.uuid4().hex[:8]}")
        tmp.write_text(json.dumps({"version": v, "tagged_at": self._clock()}))
        tmp.rename(path)
        return v

    def tags(self) -> dict[str, int]:
        """name → version for every live tag."""
        out = {}
        for p in (self.root / "meta").glob("tag_*.json"):
            out[p.stem[len("tag_"):]] = json.loads(p.read_text())["version"]
        return out

    def drop_tag(self, name: str) -> None:
        self._tag_path(name).unlink()

    def _tag_version(self, name: str) -> int:
        try:
            return json.loads(self._tag_path(name).read_text())["version"]
        except FileNotFoundError:
            raise KeyError(f"no such tag: {name}") from None

    # -- reads --------------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        between: tuple | None = None,
        where: dict | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """DataFrame over one snapshot's file set. ``between=(lo, hi)``
        skips files whose [min, max] of the primary stats column cannot
        overlap — manifest-level pruning before any footer is opened.
        ``where={col: (lo, hi), ...}`` generalizes to a box over any
        subset of ``stats_cols``: a file is kept only when EVERY bound
        overlaps its per-column range. The residual filters still apply
        row-level, so pruning is a pure optimization — results are
        identical with or without it. ``tag`` resolves a named ref to
        its pinned version (exclusive with ``version``)."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            version = self._tag_version(tag)
        snap = self.snapshot(version)
        if snap is None or not snap.files:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        files = snap.files
        if between is not None and self.stats_col:
            where = dict(where or {})
            where.setdefault(self.stats_col, between)
        if where:
            files = self._prune_box(files, where)
            if not files:
                return self._read_files([snap.paths[0]], snap.schema).limit(
                    0
                ).filter(F.lit(False))
        df = self._read_files([f["path"] for f in files], snap.schema)
        if where:
            for c, (lo, hi) in where.items():
                df = df.filter(F.col(c).between(lo, hi))
        return df

    def _prune_box(self, files: list[dict], where: dict) -> list[dict]:
        """Zone-map overlap test per column. Bounds pass through the
        SAME serializer as the manifest stats so temporal types compare
        correctly (isoformat, not str()). A column with no recorded
        stats cannot exclude a file."""
        kept = []
        for f in files:
            ok = True
            for c, (lo, hi) in where.items():
                if c == self.stats_col and "stats" not in f:
                    mn, mx = f.get("min"), f.get("max")  # pre-widening entry
                else:
                    mn, mx = f.get("stats", {}).get(c, (None, None))
                slo, shi = _stat_safe(lo), _stat_safe(hi)
                if mn is not None and (mx < slo or mn > shi):
                    ok = False
                    break
            if ok:
                kept.append(f)
        return kept

    def read_point(self, value, version: int | None = None) -> DataFrame:
        """Point lookup ``bloom_col = value``: manifest Bloom filters
        exclude every file that provably does not contain the key (no
        false negatives); the equality filter handles the residual
        false-positive files row-level. Without the bloom this is a
        full-table scan whenever the key column isn't the clustering
        order — the common 100 TB "fetch one document by id" case."""
        if not self.bloom_col:
            raise ValueError("read_point requires bloom_col")
        snap = self.snapshot(version)
        if snap is None or not snap.files:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        positions = self._bloom_positions(value)
        files = [
            f for f in snap.files if self._bloom_may_contain(f, positions)
        ]
        if not files:
            return self._read_files([snap.paths[0]], snap.schema).limit(
                0
            ).filter(F.lit(False))
        return self._read_files([f["path"] for f in files], snap.schema).filter(
            F.col(self.bloom_col) == value
        )

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        include_rewrites: bool = False,
    ) -> DataFrame:
        """Incremental scan: rows ADDED strictly after ``from_version``
        up to ``to_version`` (default: latest) — the Iceberg
        ``incremental append scan`` shape, the primitive that lets a
        downstream job process only the delta instead of re-reading a
        100 TB table.

        Walks the manifest chain version by version and unions the
        files each commit added (present in child, absent in parent —
        manifest-only work, no data files opened for the diff). A
        commit that also REMOVED parent files is a rewrite (COW
        merge/delete/compaction): its "added" files re-emit rows that
        are updates or survivors, not pure inserts, so by default it
        raises ValueError — the caller must either full-refresh across
        it or opt in with ``include_rewrites=True`` (accepting
        re-emitted rows, e.g. for an idempotent latest-wins consumer).
        Compaction commits (rewrites that change no row content) are
        indistinguishable at the manifest layer and are treated the
        same way."""
        latest = self._latest_version()
        if latest == 0:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        to_v = latest if to_version is None else to_version
        if not 0 <= from_version <= to_v <= latest:
            raise ValueError(
                f"bad version range [{from_version}, {to_v}] (latest {latest})"
            )
        added: list[str] = []
        prev = self.snapshot(from_version) if from_version > 0 else None
        prev_paths = set(prev.paths) if prev else set()
        for v in range(from_version + 1, to_v + 1):
            snap = self.snapshot(v)
            cur_paths = set(snap.paths)
            if (prev_paths - cur_paths) and not include_rewrites:
                raise ValueError(
                    f"v{v} is a rewrite commit (COW merge/delete/compaction); "
                    "incremental append scan cannot express it — full-refresh "
                    "across it or pass include_rewrites=True"
                )
            added.extend(p for p in snap.paths if p not in prev_paths)
            prev_paths = cur_paths
        # Conform the delta to the TO-version's pinned schema so an
        # incremental scan spanning an evolution boundary yields one
        # uniform shape (older files' new columns read as NULL).
        to_snap = self.snapshot(to_v)
        schema = to_snap.schema if to_snap else None
        if not added:
            ref = to_snap or self.snapshot()
            return self._read_files([ref.paths[0]], schema).limit(0)
        return self._read_files(added, schema)

    def change_feed(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """CHANGE DATA FEED scan: the net ``(+/-)`` row stream between
        two versions — rows carry the table schema plus ``_change``
        (``'+'`` applied row, ``'-'`` retracted pre-image) and
        ``_commit_version`` (r15: the commit each row belongs to, so
        order-sensitive consumers can fold multi-commit windows in
        commit order — see ``InvertedIndex.sync_from_changelog``).
        Append
        commits contribute their added rows as ``'+'`` (manifest-only,
        no sidecar needed); ``apply_changes(changelog=True)`` commits
        contribute their recorded retraction sidecar; any other rewrite
        in the range (compaction, plain ``merge``, a CDC commit without
        its sidecar) raises ValueError — the consumer must full-refresh
        across it, exactly like ``changes``. This is the primitive that
        lets a delete-aware incremental consumer (``RollupView``) fold
        U/D commits as retractions instead of rebuilding."""
        latest = self._latest_version()
        if latest == 0:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        to_v = latest if to_version is None else to_version
        if not 0 <= from_version <= to_v <= latest:
            raise ValueError(
                f"bad version range [{from_version}, {to_v}] (latest {latest})"
            )
        prev = self.snapshot(from_version) if from_version > 0 else None
        prev_paths = set(prev.paths) if prev else set()
        frames: list[DataFrame] = []
        # Every frame carries ``_commit_version`` (r15): signed
        # count/sum folds commute across commits, but ORDER-sensitive
        # consumers (an inverted index folding delete-then-reinsert)
        # cannot recover commit order from the unioned rows alone —
        # a '-' pre-image carries the OLD row's order_col, which can
        # out-rank a later commit's re-insert at a lower version.
        for v in range(from_version + 1, to_v + 1):
            snap = self.snapshot(v)
            cur_paths = set(snap.paths)
            clog = self.root / "changelog" / f"v{v}"
            if clog.exists():
                frames.append(
                    self.spark.read.parquet(str(clog)).withColumn(
                        "_commit_version", F.lit(v)
                    )
                )
            elif prev_paths - cur_paths:
                raise ValueError(
                    f"v{v} is a rewrite commit with no changelog sidecar; "
                    "the feed cannot express it — full-refresh across it "
                    "or commit via apply_changes(changelog=True)"
                )
            else:
                added = [p for p in snap.paths if p not in prev_paths]
                if added:
                    frames.append(
                        self._read_files(added, snap.schema)
                        .withColumn("_change", F.lit("+"))
                        .withColumn("_commit_version", F.lit(v))
                    )
            prev_paths = cur_paths
        if not frames:
            ref = self.snapshot(to_v) or self.snapshot()
            return (
                self._read_files([ref.paths[0]], ref.schema)
                .withColumn("_change", F.lit("+"))
                .withColumn("_commit_version", F.lit(to_v))
                .limit(0)
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def merge(
        self,
        updates: DataFrame,
        key: str,
        order_col: str,
        tiebreak: str | None = None,
        batch_token: str | None = None,
        keep_tokens: bool | int = True,
    ) -> Snapshot:
        """Copy-on-write MERGE (latest row per ``key`` wins — the
        Iceberg/Delta ``MERGE INTO`` shape on the manifest layer):

        1. prune: if ``key`` is the stats column, only files whose
           [min, max] overlaps the update keys are candidates — the
           file-level pruning a real MERGE gets from manifests;
        2. rewrite: candidates ∪ updates → latest-per-key survivors,
           written as new files;
        3. commit: new manifest = untouched files + rewritten files.

        Untouched files are carried by reference (zero bytes moved);
        the previous snapshot remains readable (time travel).
        ``batch_token`` makes the merge replay-idempotent exactly like
        ``append``: an already-applied token returns the current
        snapshot untouched; ``keep_tokens`` as an INT bounds the
        carried chain the same way (see ``append``)."""
        snap = self.snapshot()
        if snap is None:
            return self.append(updates, batch_token=batch_token)
        if batch_token is not None and batch_token in snap.batch_tokens:
            return snap
        if updates.isEmpty():
            # An empty update batch changes no rows; still record its
            # token (the replay contract) as a files-unchanged commit.
            # The keep_tokens horizon applies here too: a stream whose
            # micro-batches are often empty (e.g. all rows late-dropped)
            # would otherwise grow the carried chain unboundedly.
            if batch_token is None:
                return snap
            # One horizon rule for every commit path (ADVICE r7): trim
            # the PARENT chain to the newest keep_tokens entries, then
            # append the new token — same as the non-empty merge and
            # append paths, so an empty batch never shrinks the
            # replay-dedup window relative to a non-empty one.
            tokens = list(snap.batch_tokens)
            if keep_tokens is not True:
                tokens = tokens[-int(keep_tokens):] if keep_tokens else []
            tokens.append(batch_token)
            return self._commit(
                snap.files,
                tokens,
                snap.version,
                schema=snap.schema,
            )
        touched, untouched = snap.files, []
        if self.stats_col == key:
            bounds = updates.agg(
                F.min(key).alias("lo"), F.max(key).alias("hi")
            ).first()
            # serialize with the manifest's own writer so temporal
            # bounds match stored isoformat stats bit-for-bit
            ser, ser_hi = _stat_safe(bounds["lo"]), _stat_safe(bounds["hi"])
            touched = [
                f
                for f in snap.files
                if f["min"] is None or not (f["max"] < ser or f["min"] > ser_hi)
            ]
            untouched = [f for f in snap.files if f not in touched]
        evolved = self._evolve(snap.schema, updates)
        if touched:
            base = self._read_files([f["path"] for f in touched], snap.schema)
            # deterministic batch-wins tie rule, same as apply_changes
            merged = _latest_batch_wins(
                base, updates, key, order_col, tiebreak
            )
        else:
            merged = updates
        commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
        merged.write.mode("overwrite").parquet(str(commit_dir))
        tokens = list(snap.batch_tokens)
        if keep_tokens is not True:
            tokens = tokens[-int(keep_tokens):] if keep_tokens else []
        if batch_token is not None:
            tokens.append(batch_token)
        return self._commit(
            untouched + self._file_entries(commit_dir),
            tokens,
            snap.version,
            schema=evolved,
        )

    def apply_changes(
        self,
        changes: DataFrame,
        key: str,
        order_col: str,
        op_col: str = "_op",
        tiebreak: str | None = None,
        batch_token: str | None = None,
        keep_tokens: bool | int = True,
        changelog: bool = False,
    ) -> Snapshot:
        """CDC APPLY: one commit applying a change-log batch — rows
        tagged ``'I'``/``'U'`` in ``op_col`` upsert latest-wins, rows
        tagged ``'D'`` delete their key (the Delta Live Tables
        ``APPLY CHANGES INTO`` / Iceberg ``MERGE`` shape; the
        reference's blind-append sink has no delete path at all —
        ``bronze_assets_to_silver_assets.py:277``).

        ``changelog=True`` additionally records the commit's net
        retraction stream (the Delta CHANGE DATA FEED shape, opt-in
        exactly as Delta's ``enableChangeDataFeed``): one ``'-'`` row
        per ACTUALLY replaced-or-deleted pre-image and one ``'+'`` row
        per ACTUALLY applied upsert, under ``changelog/v{N}/``. A stale
        upsert — the base row is newer by ``order_col``, so
        latest-wins keeps the base — emits NOTHING: the feed records
        applied effect, not batch intent, so folding it can never
        diverge from the fact table. ``change_feed``
        replays it, which is what lets an incremental consumer (e.g.
        ``RollupView``) fold a delete-bearing commit as retractions
        instead of a full rebuild. Volume is changed-keys-sized; the
        pre-images come from the touched files the merge already read.
        The sidecar is written AFTER the manifest commit — a crash
        between the two leaves a feed gap, which ``change_feed``
        surfaces as ValueError (consumers fall back to a rebuild, never
        to silently wrong deltas).

        FEED-IDENTITY CONTRACT (ADVICE r11, closed in code): row
        identity for the feed is ``(key, order_col[, tiebreak])`` PLUS
        a full-row fingerprint, and the merge's tie rule is
        deterministic — at equal ``(order_col, tiebreak)`` the batch
        row beats the base row (last-writer-wins at equal version). An
        upsert that alters payload while REUSING the base row's
        order_col therefore APPLIES, and the feed emits '-' for the
        old payload and '+' for the new one; a byte-identical reapply
        emits nothing. A silent-divergence feed (table changed, feed
        empty) is impossible by construction. Well-behaved CDC sources
        should still strictly increase ``order_col`` on payload change;
        the fingerprint is the safety net, not the contract.

        Semantics: the per-key verdict is the NEWEST change in the
        batch by ``order_col`` (ties broken by ``tiebreak``, falling
        back to the key) — a key whose last change is D is deleted
        even if earlier rows in the same batch upsert it, and vice
        versa. The net batch is therefore one row per changed key
        BEFORE any base file is read, so the rewrite cost tracks the
        CHANGED-key file footprint, not the change-log volume.

        Scale design mirrors ``merge``: when the table's ``stats_col``
        is the merge key, only files whose min/max range may contain a
        changed key are rewritten — everything else is carried by
        reference (manifest-only). ``batch_token`` gives exactly-once
        replay and ``keep_tokens`` bounds the carried chain under the
        single horizon rule (trim parents to N, then append).

        PRECONDITION (key-unique base — r15, surfaced by the
        feed-soundness property soak): the base table must hold at
        most ONE row per ``key``, the invariant every commit through
        this method or ``merge`` maintains (``delete_keys`` documents
        the contrast for intentionally non-unique tables). If raw
        appends put duplicate rows of a key into the table and a later
        CDC commit rewrites their file (even for OTHER keys), the
        latest-wins rewrite collapses the duplicates silently — and a
        ``changelog=True`` sidecar cannot express that collapse, so
        feed folds would diverge from the table. Keep keyed ingest on
        ``apply_changes``/``merge``, or dedup before appending.
        """
        from ..pipeline.upsert import latest_per_key

        snap = self.snapshot()
        if batch_token is not None and snap is not None and (
            batch_token in snap.batch_tokens
        ):
            return snap
        # Net effect per key: newest change wins across the batch.
        net = latest_per_key(changes, key, order_col, tiebreak)
        upserts = net.where(F.col(op_col) != F.lit("D")).drop(op_col)
        del_keys = net.where(F.col(op_col) == F.lit("D")).select(key)
        if snap is None:
            return self.append(upserts, batch_token=batch_token)
        if changes.isEmpty():
            if batch_token is None:
                return snap
            tokens = list(snap.batch_tokens)
            if keep_tokens is not True:
                tokens = tokens[-int(keep_tokens):] if keep_tokens else []
            tokens.append(batch_token)
            return self._commit(
                snap.files, tokens, snap.version, schema=snap.schema
            )
        touched, untouched = snap.files, []
        if self.stats_col == key:
            bounds = net.agg(
                F.min(key).alias("lo"), F.max(key).alias("hi")
            ).first()
            ser, ser_hi = _stat_safe(bounds["lo"]), _stat_safe(bounds["hi"])
            touched = [
                f
                for f in snap.files
                if f["min"] is None or not (f["max"] < ser or f["min"] > ser_hi)
            ]
            untouched = [f for f in snap.files if f not in touched]
        evolved = self._evolve(snap.schema, upserts)
        pre_images = None
        if touched:
            base = self._read_files([f["path"] for f in touched], snap.schema)
            kept = base.join(del_keys, key, "left_anti")
            # deterministic batch-wins tie rule (see _latest_batch_wins:
            # without it, an upsert that rewrites payload under a reused
            # identity applied or vanished at random, and no feed could
            # be truthful about it)
            merged = _latest_batch_wins(
                kept, upserts, key, order_col, tiebreak
            )
            if changelog:
                # pre-images: every base row whose key the batch touched
                # (replaced by an upsert or removed by a delete) — read
                # from the SAME touched files the merge rewrites.
                pre_images = base.join(
                    net.select(key).distinct(), key, "semi"
                )
        else:
            merged = upserts
        commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
        merged.write.mode("overwrite").parquet(str(commit_dir))
        tokens = list(snap.batch_tokens)
        if keep_tokens is not True:
            tokens = tokens[-int(keep_tokens):] if keep_tokens else []
        if batch_token is not None:
            tokens.append(batch_token)
        committed = self._commit(
            untouched + self._file_entries(commit_dir),
            tokens,
            snap.version,
            schema=evolved,
        )
        if changelog:
            # ADVICE r10 (high): the feed derives from the APPLIED
            # outcome, never from batch intent. latest_per_key lets a
            # NEWER base row survive a stale upsert (the out-of-order
            # CDC case order_col exists for); emitting '-' for that
            # surviving pre-image and '+' for the never-applied upsert
            # would silently diverge change_feed consumers
            # (RollupView._fold_feed) from the fact table. Row identity
            # is (key, order_col[, tiebreak]) PLUS a full-row
            # fingerprint (ADVICE r11, closed in code): an upsert that
            # REUSES a base row's (key, order_col) with a different
            # payload previously matched on ident alone and emitted
            # nothing — a silent-divergence feed (table changed, feed
            # empty). The xxhash64 over every evolved column makes such
            # a rewrite emit '-' old / '+' new; a byte-identical
            # reapply still nets to no emission. Pre-images are lifted
            # to the evolved schema (missing columns null, shared
            # columns cast) so the compare never differs on dtype alone.
            ident = [key, order_col] + ([tiebreak] if tiebreak else [])
            # Read the APPLIED rows back from the files the commit just
            # wrote instead of recomputing the merge plan: the feed's
            # two sides then scan independent parquet (no shared
            # window/union lineage to re-execute), which is both
            # cheaper and immune to exchange-reuse planner quirks.
            applied_rows = self._read_files(
                [f["path"] for f in self._file_entries(commit_dir)],
                evolved,
            )
            applied = applied_rows.join(
                net.select(key).distinct(), key, "semi"
            )
            plus = applied
            feed = None
            if pre_images is not None:
                # '+' only for net-key rows actually present in merged
                # that are NOT a surviving base row (same ident AND
                # same payload); '-' only for base rows actually
                # replaced, rewritten in place, or deleted.
                cols = applied.columns
                lifted = pre_images
                for fld in merged.schema.fields:
                    src = (
                        F.col(fld.name)
                        if fld.name in lifted.columns
                        else F.lit(None)
                    )
                    lifted = lifted.withColumn(
                        fld.name, src.cast(fld.dataType)
                    )
                lifted = lifted.select(*cols)
                # xxhash64 rejects MapType (unordered — no canonical
                # hash); fingerprint such columns through to_json
                # instead. Both sides serialize the same stored
                # entry order, so equal stored rows hash equal; a
                # rewrite that only reorders map entries registers as
                # a change (spurious but CONSISTENT -/+ pair — the
                # fold still reproduces the table).
                fp_in = [
                    F.to_json(F.col(fld.name))
                    if _contains_map(fld.dataType)
                    else F.col(fld.name)
                    for fld in merged.schema.fields
                ]
                app_fp = applied.withColumn("_row_fp", F.xxhash64(*fp_in))
                pre_fp = lifted.withColumn("_row_fp", F.xxhash64(*fp_in))
                on = ident + ["_row_fp"]
                plus = app_fp.join(
                    pre_fp.select(*on), on, "left_anti"
                ).drop("_row_fp")
                feed = (
                    pre_fp.join(app_fp.select(*on), on, "left_anti")
                    .drop("_row_fp")
                    .withColumn("_change", F.lit("-"))
                )
            plus = plus.withColumn("_change", F.lit("+"))
            feed = (
                plus
                if feed is None
                else feed.unionByName(plus, allowMissingColumns=True)
            )
            clog = self.root / "changelog" / f"v{committed.version}"
            feed.write.mode("overwrite").parquet(str(clog))
        return committed

    def delete_where(self, predicate) -> Snapshot:
        """Copy-on-write row-level DELETE: files whose stats range
        cannot contain a matching row are carried by reference; the
        rest are rewritten without the matching rows. ``predicate`` is
        a boolean Column; when a ``(lo, hi)`` tuple over the stats
        column is passed instead, manifest pruning applies first."""
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        touched, untouched = snap.files, []
        cond = predicate
        if isinstance(predicate, tuple) and self.stats_col:
            lo, hi = predicate
            slo, shi = _stat_safe(lo), _stat_safe(hi)
            touched = [
                f
                for f in snap.files
                if f["min"] is None or not (f["max"] < slo or f["min"] > shi)
            ]
            untouched = [f for f in snap.files if f not in touched]
            cond = F.col(self.stats_col).between(lo, hi)
        if not touched:
            return snap
        # rewrite under the pinned schema: an old file rewritten after
        # an evolution must not silently drop the newer columns
        kept = self._read_files([f["path"] for f in touched], snap.schema).filter(
            ~cond
        )
        commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
        kept.write.mode("overwrite").parquet(str(commit_dir))
        return self._commit(
            untouched + self._file_entries(commit_dir),
            list(snap.batch_tokens),
            snap.version,
            schema=snap.schema,
        )

    def delete_keys(
        self,
        keys: DataFrame,
        key: str,
        batch_token: str | None = None,
        keep_tokens: bool | int = True,
    ) -> Snapshot:
        """Copy-on-write DELETE by key SET — the primitive the durable
        indexes use to consume forget requests / CDC delete batches
        (VERDICT r11 #1). Unlike ``apply_changes`` (whose latest-wins
        merge assumes ONE row per key), this is safe for tables where
        ``key`` is NOT unique — a posting table with many (term,
        doc_id) rows per doc, an LSH band table with ``bands`` rows per
        doc, a PQ code table with ``PQ_M`` rows per vector: every row
        whose ``key`` appears in ``keys`` is removed, all others are
        kept byte-identical.

        Scale shape: when ``key`` is the table's stats column, files
        whose [min, max] cannot contain any deleted key are carried by
        reference (one metadata-scale min/max agg over ``keys`` prunes
        the manifest); the touched files are rewritten through a
        LEFT ANTI join against ``keys`` — AQE broadcasts the key set
        when it is small (the forget-request case), so the rewrite is
        one pass over the touched files with no corpus shuffle.

        ``batch_token`` gives the same exactly-once replay contract as
        ``append``/``merge``: a token already in the chain returns the
        current snapshot untouched, so a crash-retry of a multi-table
        index delete (postings then doclens) self-heals. An EMPTY key
        set still records its token (files-unchanged commit) so the
        replay ledger stays append-monotone."""
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        if batch_token is not None and batch_token in snap.batch_tokens:
            return snap
        kset = keys.select(key).distinct()
        tokens = list(snap.batch_tokens)
        if keep_tokens is not True:
            tokens = tokens[-int(keep_tokens):] if keep_tokens else []
        if batch_token is not None:
            tokens.append(batch_token)
        if kset.isEmpty():  # nothing to delete: files-unchanged commit
            if batch_token is None:
                return snap
            return self._commit(
                snap.files, tokens, snap.version, schema=snap.schema
            )
        touched, untouched = snap.files, []
        if self.stats_col == key:
            bounds = kset.agg(
                F.min(key).alias("lo"), F.max(key).alias("hi")
            ).first()
            slo, shi = _stat_safe(bounds["lo"]), _stat_safe(bounds["hi"])
            touched = [
                f
                for f in snap.files
                if f["min"] is None or not (f["max"] < slo or f["min"] > shi)
            ]
            untouched = [f for f in snap.files if f not in touched]
        if not touched:
            if batch_token is None:
                return snap
            return self._commit(
                snap.files, tokens, snap.version, schema=snap.schema
            )
        kept = self._read_files(
            [f["path"] for f in touched], snap.schema
        ).join(kset, key, "left_anti")
        commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
        kept.write.mode("overwrite").parquet(str(commit_dir))
        return self._commit(
            untouched + self._file_entries(commit_dir),
            tokens,
            snap.version,
            schema=snap.schema,
        )

    # -- maintenance --------------------------------------------------------

    def compaction_plan(
        self, target_rows: int, min_group: int = 2
    ) -> list[list[dict]]:
        """Groups of small files (rows < ``target_rows``) to rewrite,
        packed by the SAME streaming cumulative rule as the
        oracle-certified ``operators.skew.compaction_bins`` twin:
        walking the manifest's small files in path order, a file joins
        bin ``cum_rows_of_prior_small_files // target_rows``. Groups
        under ``min_group`` files are dropped (rewriting one file buys
        nothing). Driver-side on purpose — a manifest is metadata-scale
        (one dict per file), the same scale every other manifest walk
        here runs at."""
        snap = self.snapshot()
        if snap is None:
            return []
        bins: dict[int, list[dict]] = {}
        cum = 0
        for f in sorted(snap.files, key=lambda f: f["path"]):
            if f["rows"] >= target_rows:
                continue
            bins.setdefault(cum // target_rows, []).append(f)
            cum += f["rows"]
        return [g for g in bins.values() if len(g) >= min_group]

    def compact_small_files(
        self, target_rows: int, min_group: int = 2
    ) -> Snapshot:
        """Rewrite each ``compaction_plan`` group as one
        ≈``target_rows``-row file (Iceberg ``rewrite_data_files`` with
        a small-file filter — the INCREMENTAL complement to
        ``storage.compaction.compact_snapshot``, which rewrites the
        whole table for global re-clustering): untouched files carry
        by REFERENCE into the new snapshot — on a 100 TB table the
        rewrite cost tracks the small-file backlog, not table size.
        Batch tokens and the pinned schema are preserved
        (compaction moves bytes, not state), and time travel to the
        parent still reads the original small files — they are only
        unlinked by ``vacuum`` once no retained snapshot references
        them. No-op (same snapshot back) when nothing qualifies."""
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        groups = self.compaction_plan(target_rows, min_group)
        if not groups:
            return snap
        replaced = {f["path"] for g in groups for f in g}
        new_entries: list[dict] = []
        for g in groups:
            commit_dir = self.root / "data" / uuid.uuid4().hex[:12]
            df = self._read_files([f["path"] for f in g], snap.schema)
            # one output file per group: the group was sized to the
            # target by construction
            df.coalesce(1).write.mode("overwrite").parquet(str(commit_dir))
            new_entries += self._file_entries(commit_dir)
        untouched = [f for f in snap.files if f["path"] not in replaced]
        return self._commit(
            untouched + new_entries,
            list(snap.batch_tokens),
            snap.version,
            schema=snap.schema,
        )

    def expire_snapshots(self, older_than_s: int) -> int:
        """Time-based retention (the Iceberg ``expire_snapshots``
        shape): drop snapshots whose ``committed_at`` is more than
        ``older_than_s`` seconds ago — except the LATEST, which is
        always retained no matter its age — then sweep unreferenced
        data files. Returns files deleted. Manifests without a
        ``committed_at`` (pre-retention versions) count as expired."""
        versions = self.history()
        if not versions:
            return 0
        cutoff = self._clock() - older_than_s
        keep = {
            v
            for v in versions
            if (
                json.loads(
                    (self.root / "meta" / f"v{v}.json").read_text()
                ).get("committed_at")
                or 0
            )
            >= cutoff
        }
        keep.add(versions[-1])
        keep |= set(self.tags().values())  # tagged snapshots never expire
        return self._sweep(versions, keep)

    def vacuum(self, keep_versions: int = 1) -> int:
        """Drop manifests older than the newest ``keep_versions`` and
        delete data files referenced by NO retained manifest (orphans
        from aborted commits included). Returns files deleted."""
        versions = self.history()
        keep = set(versions[-keep_versions:])
        keep |= set(self.tags().values())  # tagged snapshots survive vacuum
        return self._sweep(versions, keep)

    #: grace period before _sweep deletes stale commit/pointer temp
    #: files — long enough that no LIVE commit attempt can still own one
    tmp_grace_s: int = 3600

    def _sweep(self, versions: list[int], keep: set[int]) -> int:
        """Delete manifests outside ``keep`` and any data file no
        retained manifest references (aborted-commit orphans included).
        Also unlinks ``meta/.commit.tmp.*`` / ``meta/_latest.tmp.*``
        left by writers that crashed between staging and publish —
        without this they accumulate forever (the happy path unlinks
        its own temp; only a crash mid-commit orphans one). Temps
        younger than ``tmp_grace_s`` are spared: they may belong to an
        in-flight commit."""
        cutoff = self._clock() - self.tmp_grace_s
        for pat in (".commit.tmp.*", "_latest.tmp.*", ".tag_*.tmp.*",
                    ".staged_*.tmp.*"):
            for tmp in (self.root / "meta").glob(pat):
                try:
                    if tmp.stat().st_mtime < cutoff:
                        tmp.unlink()
                except FileNotFoundError:
                    pass  # concurrent sweeper/committer got there first
        retained: set[str] = set()
        for v in keep:
            retained |= set(self.snapshot(v).paths)  # type: ignore[union-attr]
        # PENDING staged commits are outside the chain but not orphans:
        # their files must survive until publish/discard decides.
        for sid in self.staged():
            retained |= {f["path"] for f in self._staged_doc(sid)["files"]}
        removed = 0
        for d in (self.root / "data").iterdir():
            live = any(str(p).startswith(str(d)) for p in retained)
            if not live:
                removed += sum(1 for _ in d.glob("*.parquet"))
                shutil.rmtree(d)
        for v in versions:
            if v not in keep:
                (self.root / "meta" / f"v{v}.json").unlink()
                # ADVICE r10 (low): CDC sidecars follow their version —
                # without this a changelog-heavy table leaks
                # changelog/v{N} parquet directories forever (and keeps
                # feeds for versions whose manifests are gone, which
                # change_feed could never reach anyway).
                clog = self.root / "changelog" / f"v{v}"
                if clog.exists():
                    removed += sum(1 for _ in clog.glob("*.parquet"))
                    shutil.rmtree(clog)
        return removed


def token_consistent_versions(*tables: "SnapshotTable") -> list[int | None]:
    """Pin a MULTI-table artifact to a token-consistent read frontier
    (ADVICE r10, medium): a writer that commits the same batch token to
    several SnapshotTables in sequence (``InvertedIndex.add_batch``:
    postings then doclens; ``StatsCatalog.analyze``: counts then
    sketches) has a window — crash between the two commits, or a
    reader racing mid-stream — where one table already holds the batch
    the other lacks. Reading both at "latest" then serves statistics
    derived from MISMATCHED corpora (BM25 df from postings that include
    the batch against n_docs/avgdl that exclude it).

    Returns one version per table such that every pinned snapshot
    carries the SAME batch-token set — the intersection of the latest
    chains. Tables whose latest chain already equals the common set pin
    to latest; a table that is ahead rewinds to the newest retained
    version matching the common set. Fallbacks are explicit and safe:

    - a table with no snapshot yet pins to ``None`` (read-latest —
      the caller's empty-table handling applies unchanged);
    - if the matching version was vacuumed away, the table serves
      latest (the window only exists between two commits of one batch;
      vacuum horizons are far longer than a crash-retry).

    The guarantee covers TOKENED writes — exactly the streaming /
    incremental path where mid-stream readers exist. Untokened ad-hoc
    appends don't move any chain and are invisible to pinning.

    Matching is by NEWEST COMMON TOKEN (ADVICE r11, closed in code):
    the frontier is the newest token every latest chain still carries
    (paired writers append batch tokens in the same order, so position
    in any one chain orders the candidates), and each table pins to the
    newest version whose chain ENDS in that token — i.e. the last
    commit before the table moved past the frontier. Because only the
    chain TAIL is compared, a writer that bounds its chain
    (``keep_tokens`` as an int, the ``cdc_apply_stream`` / ``BloomIndex``
    discipline) still gets exact consistent reads: trimming rewrites
    history's prefix, never the tail. The only requirement is that the
    retained window still overlaps across tables — disjoint windows
    have no common token and serve latest (explicit, safe: the race
    window is one batch wide; trim horizons are many batches).
    """
    snaps = [t.snapshot() for t in tables]
    if any(s is None for s in snaps):
        return [None] * len(tables)
    chains = [list(s.batch_tokens) for s in snaps]
    others = [set(c) for c in chains[1:]]
    target = next(
        (
            tok
            for tok in reversed(chains[0])
            if all(tok in o for o in others)
        ),
        None,
    )
    if target is None:
        return [None] * len(tables)  # no common token: serve latest
    pinned: list[int | None] = []
    for t, s, chain in zip(tables, snaps, chains):
        if chain and chain[-1] == target:
            pinned.append(s.version)
            continue
        choice: int | None = s.version
        for v in range(s.version - 1, 0, -1):
            try:
                sv = t.snapshot(v)
            except FileNotFoundError:
                break  # vacuumed past the frontier: serve latest
            if sv is not None and (
                list(sv.batch_tokens)[-1:] == [target]
            ):
                choice = v
                break
        pinned.append(choice)
    return pinned
