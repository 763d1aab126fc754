"""SnapshotTable as a Structured Streaming SOURCE (Spark 4 Python
streaming DataSource API): ``spark.readStream.format("snapshot_changes")``.

This is the "Delta/Iceberg table as a stream" capability: a downstream
job tails the table's commit log and processes ONLY the rows each new
snapshot appended — offsets are manifest versions, so restarts resume
exactly where the checkpoint left off and a 100 TB table costs one
manifest-chain listing per micro-batch, never a data-file scan. It
closes the loop with ``SnapshotTable.changes()`` (the batch incremental
scan): same manifest-diff semantics, now drivable by triggers,
watermarks, and checkpoints.

Options:

- ``path`` (required): the SnapshotTable root.
- ``startingVersion`` (default 0): first offset; rows of versions ≤
  this are never emitted (0 = from the table's beginning).
- ``ignoreRewrites`` (default false): a commit that REMOVED parent
  files is a rewrite (COW merge/delete/compaction) — its added files
  re-emit surviving rows, not pure inserts. By default the stream
  FAILS on one (same contract as ``changes()``); opt in to emit the
  rewrite's files anyway for idempotent latest-wins consumers.
- ``withVersionColumn`` (default false): append a ``_commit_version``
  int column recording which snapshot added each row — the CDC
  metadata a downstream merge needs for ordering/lineage.

The reader is pure Python (manifest JSON + pyarrow parquet) and runs
where Spark schedules it; per-batch data is whatever the new commits
added — bounded by ingestion rate, not table size.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

__all__ = ["SnapshotChangesDataSource", "register"]


def _versions(root: str) -> list[int]:
    return sorted(int(p.stem[1:]) for p in (Path(root) / "meta").glob("v*.json"))


def _files(root: str, v: int) -> list[str]:
    doc = json.loads((Path(root) / "meta" / f"v{v}.json").read_text())
    return [f["path"] for f in doc["files"]]


def _added_paths(
    root: str, from_v: int, to_v: int, ignore_rewrites: bool
) -> list[tuple[str, int]]:
    """(path, adding_version) for commits (from_v, to_v] — the same
    manifest-only diff as ``SnapshotTable.changes`` (no data file is
    opened)."""
    added: list[tuple[str, int]] = []
    prev = set(_files(root, from_v)) if from_v > 0 else set()
    for v in range(from_v + 1, to_v + 1):
        cur = set(_files(root, v))
        if (prev - cur) and not ignore_rewrites:
            raise ValueError(
                f"v{v} is a rewrite commit (COW merge/delete/compaction); "
                "restart past it with startingVersion or set "
                "ignoreRewrites=true (accepting re-emitted rows)"
            )
        added.extend((p, v) for p in sorted(cur) if p not in prev)
        prev = cur
    return added


class SnapshotChangesReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.root = options["path"]
        self.start_v = int(options.get("startingversion", 0))
        self.ignore_rewrites = (
            str(options.get("ignorerewrites", "false")).lower() == "true"
        )
        self.with_version = (
            str(options.get("withversioncolumn", "false")).lower() == "true"
        )
        self.names = [
            n for n in schema.fieldNames() if n != "_commit_version"
        ]

    def initialOffset(self) -> dict:
        return {"version": self.start_v}

    def _rows(self, from_v: int, to_v: int) -> list[tuple]:
        # materialized list, returned as iter(list): the runner caches
        # each (rows, offset) entry and replays it via copy.copy() —
        # list iterators pickle/copy, generators do not. Per-batch
        # volume is what the NEW commits added — bounded by ingestion
        # rate between triggers, never by table size.
        import pyarrow.parquet as pq

        rows: list[tuple] = []
        for path, v in _added_paths(
            self.root, from_v, to_v, self.ignore_rewrites
        ):
            table = pq.read_table(path, columns=self.names)
            for batch in table.to_batches():
                cols = [
                    batch.column(i).to_pylist()
                    for i in range(batch.num_columns)
                ]
                if self.with_version:
                    cols.append([v] * batch.num_rows)
                rows.extend(zip(*cols))
        return rows

    def read(self, start: dict):
        from_v = int(start["version"])
        vs = _versions(self.root)
        to_v = max(vs) if vs else from_v
        if to_v <= from_v:
            return iter([]), {"version": from_v}
        return iter(self._rows(from_v, to_v)), {"version": to_v}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["version"]), int(end["version"])))


class SnapshotChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def schema(self) -> StructType:
        # planning-time schema from the newest committed file's parquet
        # footer (one footer read — metadata, not data)
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options["path"]
        vs = _versions(root)
        if not vs:
            raise FileNotFoundError(f"no snapshot at {root}")
        paths = _files(root, max(vs))
        schema = from_arrow_schema(pq.read_schema(paths[-1]))
        if str(self.options.get("withversioncolumn", "false")).lower() == "true":
            from pyspark.sql.types import IntegerType, StructField

            schema = StructType(
                schema.fields + [StructField("_commit_version", IntegerType())]
            )
        return schema

    def simpleStreamReader(self, schema: StructType) -> SnapshotChangesReader:
        return SnapshotChangesReader(schema, self.options)


def register(spark) -> None:
    """Register for ``spark.readStream.format("snapshot_changes")``."""
    spark.dataSource.register(SnapshotChangesDataSource)
