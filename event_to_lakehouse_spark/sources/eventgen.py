"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-event generator — ``spark.read.format("eventgen")``.

Why it exists: load/perf testing and pipeline bring-up need unbounded
cheap input without landing files; Spark 4's pure-Python DataSource API
is the supported way to add such a connector (the first Spark version
where a source needs no JVM code). This is also the §2.1 extension
point a user would copy to wrap a REST/paginated API as a table.

Scale shape: generation is partitioned (``numPartitions`` input splits,
one seeded RNG stream per partition) so it parallelizes like any scan;
rows are deterministic functions of (seed, partition, row index) — two
reads with the same options are byte-identical, which makes the source
usable in golden tests.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
_SCHEMA_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


class _GenPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int, seed: int):
        self.index = index
        self.start = start
        self.end = end
        self.seed = seed


class EventGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        parts = []
        start = 0
        for i in range(self.n_parts):
            end = self.n_rows if i == self.n_parts - 1 else min(start + per, self.n_rows)
            parts.append(_GenPartition(i, start, end, self.seed))
            start = end
            if start >= self.n_rows:
                break
        return parts

    def read(self, partition: _GenPartition):
        # stdlib-only inside the task (workers need no extra deps);
        # Random(seed, partition) gives a deterministic per-split stream.
        import datetime as dt
        import json
        import random

        rng = random.Random((partition.seed << 20) ^ partition.index)
        base = dt.datetime(2024, 1, 1)
        for i in range(partition.start, partition.end):
            yield (
                i,
                base + dt.timedelta(seconds=i % 86400),
                rng.randrange(1, 1500),
                EVENT_TYPES[rng.randrange(len(EVENT_TYPES))],
                round(rng.random() * 500, 4) if rng.random() > 0.05 else None,
                json.dumps({"k": rng.randrange(100)}),
            )


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> EventGenReader:
        return EventGenReader(self.options)


def register(spark) -> None:
    """Register the source for ``spark.read.format("eventgen")``."""
    spark.dataSource.register(EventGenDataSource)
