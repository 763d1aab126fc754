"""Bronze → silver normalization engine (SURVEY §7.2 step 3).

Semantics re-expressed from the reference
(``scripts/bronze_assets_to_silver_assets.py``):

- PERMISSIVE multiLine JSON read with ``_corrupt_record`` capture — the
  corrupt column MUST be declared in the schema (:24-32, :41).
- corrupt-row rejection filter (:87-89).
- contract normalization: here one compiled ``select`` from a
  ``SourceMapping`` instead of 30 hand-written withColumns (:91-162).
- ``raw_json`` audit payload = to_json(struct(all non-corrupt source
  columns)) (:133-136).
- cross-source integration as an explicit ``unionByName`` into one
  silver table (the reference appends both streams to the same Iceberg
  table — a deferred union; SURVEY §2.7).

Batch and streaming share the same transform functions; the streaming
writer's ``foreachBatch`` reuses the batch path exactly as the
reference does (:275-277), with an optional idempotence fix for its
known blind-append replay gap (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .contracts import SILVER_ASSETS_CONTRACT, SourceMapping

# Reference JSON reader hardening (:28-32).
JSON_OPTIONS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
}

CORRUPT_COL = "_corrupt_record"


def with_corrupt_column(schema: T.StructType) -> T.StructType:
    """PERMISSIVE corrupt-record capture requires the column declared in
    the schema (reference :24-27, :41)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        [T.StructField(CORRUPT_COL, T.StringType(), True)] + list(schema.fields)
    )


def read_bronze(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    streaming: bool = False,
    multiline: bool = True,
) -> DataFrame:
    """Bronze JSON topic scan, batch or unbounded (reference :80-85).

    Implemented as text scan + ``from_json`` rather than the raw JSON
    file source: identical PERMISSIVE/corrupt-capture semantics, but the
    file relation always references a real column (``value``), so
    downstream count-only plans never trip Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN analysis restriction (SURVEY §7.4),
    and batch/streaming share one code path. ``multiline=True`` maps to
    one-JSON-document-per-file bronze layout (wholetext)."""
    schema = with_corrupt_column(schema)
    reader = spark.readStream if streaming else spark.read
    text = (
        reader.format("text")
        .option("wholetext", "true" if multiline else "false")
        .load(path)
    )
    return text.select(
        F.from_json(F.col("value"), schema, JSON_OPTIONS).alias("_r")
    ).select("_r.*")


def drop_corrupt(df: DataFrame) -> DataFrame:
    """Reject malformed rows (reference :89). Filter references other
    columns downstream, so the PERMISSIVE version-sensitivity noted in
    SURVEY §7.4 does not bite."""
    return df.filter(F.col(CORRUPT_COL).isNull())


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) split of a PERMISSIVE-read frame. The reference
    silently discards corrupt rows (:87-89); a production pipeline
    keeps them replayable — pair with ``write_quarantine``."""
    return drop_corrupt(df), df.filter(F.col(CORRUPT_COL).isNotNull())


def write_quarantine(
    corrupt: DataFrame, path: str, source_system: str = "unknown"
) -> None:
    """Quarantine sink for rejected rows: the raw corrupt payload plus
    audit columns (source, quarantine timestamp), appended as parquet
    partitioned by source_system so replays prune per source. Fixes the
    reference's silent-drop gap — a malformed batch can be inspected
    and re-ingested after the producer is fixed."""
    (
        corrupt.select(
            F.col(CORRUPT_COL).alias("raw_payload"),
            F.lit(source_system).alias("source_system"),
            F.current_timestamp().alias("quarantined_ts"),
        )
        .write.mode("append")
        .partitionBy("source_system")
        .parquet(path)
    )


def _uid_expr(mapping: SourceMapping) -> Column:
    """Surrogate key built from the SOURCE expressions of its target
    components (so no target aliases need to exist yet, and source
    columns sharing a target's name can't collide)."""

    def src(target: str) -> Column:
        if target in mapping.exprs:
            return F.expr(mapping.exprs[target]).cast("string")
        return F.lit(None).cast("string")

    parts = [F.lower(F.trim(src(c))) for c in mapping.uid.canonicalized]
    parts += [src(c) for c in mapping.uid.raw]
    return F.sha2(F.concat_ws("|", *parts), 256)


def apply_mapping(
    df: DataFrame,
    mapping: SourceMapping,
    contract: list[tuple[str, str]] = SILVER_ASSETS_CONTRACT,
) -> DataFrame:
    """Compile a SourceMapping into one ordered projection.

    Single narrow ``select`` — Catalyst gets the whole contract at once
    (no 30-deep Project chain to collapse), pushdown/pruning reach the
    scan, and the same function serves batch and micro-batch."""
    clean = drop_corrupt(df)
    source_cols = [c for c in clean.columns if c != CORRUPT_COL]

    derived: dict[str, Column] = {}
    for target, dtype in contract:
        if target == mapping.uid_target:
            derived[target] = _uid_expr(mapping)
        elif target == "source_system":
            derived[target] = F.lit(mapping.source_system).cast(dtype)
        elif target == "ingest_ts":
            derived[target] = F.current_timestamp()
        elif target == "raw_json":
            derived[target] = F.to_json(
                F.struct(*[F.col(f"`{c}`") for c in source_cols])
            )
        elif target in mapping.exprs:
            derived[target] = F.expr(mapping.exprs[target]).cast(dtype)
        else:
            derived[target] = F.lit(None).cast(dtype)  # typed NULL (:96-110)

    # ONE ordered projection over raw source columns only — no staged
    # aliases, so a source column named like a target can't collide.
    return clean.select(*[derived[name].alias(name) for name, _ in contract])


def silver_union(*normalized: DataFrame) -> DataFrame:
    """Schema-aligned union of normalized sources — the explicit form of
    the reference's append-to-shared-table integration (SURVEY §2.7)."""
    out = normalized[0]
    for df in normalized[1:]:
        out = out.unionByName(df, allowMissingColumns=False)
    return out


def write_silver_batch(df: DataFrame, path: str, mode: str = "append") -> None:
    """Batch silver write, parquet flavor. Partitioned by source_system —
    at 100 TB the partition column gives pruning for per-source reads.
    ``write_silver`` adds the writer-v2 branch for Iceberg/Delta
    deployments (reference :277)."""
    df.write.mode(mode).partitionBy("source_system").parquet(path)


def v2_catalog_available(spark: SparkSession, table: str | None) -> bool:
    """True when ``table`` names a configured DataSource-V2 catalog —
    Iceberg/Delta register themselves as ``spark.sql.catalog.<name>``
    (reference ``docker-compose.yml:336-339`` sets
    ``spark.sql.catalog.iceberg`` + warehouse confs). The sandbox has
    no such jars, so here this is the honest runtime probe that decides
    which sink branch runs."""
    if not table or "." not in table:
        return False
    cat = table.split(".", 1)[0]
    try:
        return spark.conf.get(f"spark.sql.catalog.{cat}", None) is not None
    except Exception:
        return False


def write_silver(
    df: DataFrame,
    spark: SparkSession,
    path: str | None = None,
    table: str | None = None,
    mode: str = "append",
    snapshot_root: str | None = None,
    batch_token: str | None = None,
) -> str:
    """S5 table-append sink, three branches in preference order:

    1. ``table`` names a configured V2 catalog →
       ``df.writeTo(table).append()`` — the reference's actual sink
       (``bronze_assets_to_silver_assets.py:275-277``:
       ``writeTo("iceberg.silver.assets").append()``).
    2. ``snapshot_root`` given → ``storage.snapshots.SnapshotTable``
       append: the same semantics (atomic commit, snapshot isolation,
       time travel, ``batch_token`` replay dedup) without table-format
       jars.
    3. otherwise partitioned-parquet append.

    Returns the branch taken (``"writer_v2"`` | ``"snapshot"`` |
    ``"parquet"``) so callers/tests can assert selection."""
    if v2_catalog_available(spark, table):
        df.writeTo(table).append()
        return "writer_v2"
    if snapshot_root is not None:
        from ..storage.snapshots import SnapshotTable

        # Manifest stats on the contract's time column (time-range
        # reads prune at the manifest layer) + a per-file bloom on the
        # surrogate key ("fetch one asset by uid" opens a few footers,
        # not the table) — both only when the columns exist, so
        # non-contract frames keep the bare-table behavior.
        cols = set(df.columns)
        t = SnapshotTable(
            spark,
            snapshot_root,
            stats_cols=["ingest_ts"] if "ingest_ts" in cols else None,
            bloom_col="asset_uid" if "asset_uid" in cols else None,
        )
        t.append(df, batch_token=batch_token)
        return "snapshot"
    if path is None:
        raise ValueError("no V2 catalog configured and no parquet path given")
    write_silver_batch(df, path, mode)
    return "parquet"


def foreach_batch_writer(path: str, idempotent: bool = True, writer_id: str = ""):
    """foreachBatch sink factory (reference :275-277 blind-appends and
    ignores batch_id — replayed micro-batches double-append; SURVEY
    §7.4). With ``idempotent=True`` each batch writes to a
    batch_id-derived subdirectory overwrite-mode, so replays rewrite
    the same files instead of duplicating.

    ``writer_id`` namespaces the batch directory per streaming query.
    Without it, two queries appending to the same table (the
    reference's own topology: rapid7 + fortisiem into one silver,
    :280-296) both write ``batch_id=0`` and clobber each other. It
    must be stable across restarts of the same query (replay
    idempotence keys on it) and unique per query —
    ``start_silver_stream`` passes a hash of the FULL checkpoint path
    (two checkpoints sharing a leaf name, e.g. ``/a/checkpoint`` and
    ``/b/checkpoint``, must not collide)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if idempotent:
            prefix = f"{writer_id}-" if writer_id else ""
            (
                batch_df.write.mode("overwrite")
                .partitionBy("source_system")
                .parquet(f"{path}/batch_id={prefix}{batch_id}")
            )
        else:
            batch_df.write.mode("append").partitionBy("source_system").parquet(path)

    return _write


def start_silver_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
    idempotent: bool = True,
    writer_id: str | None = None,
):
    """Streaming silver writer (reference :280-296): append mode,
    checkpointed, foreachBatch. ``trigger`` defaults to availableNow
    for testable runs; pass {"processingTime": "30 seconds"} for the
    reference's cadence. ``writer_id`` defaults to a hash of the full
    checkpoint path — stable across restarts, collision-free for
    checkpoints that share a basename."""
    import hashlib

    trigger = trigger or {"availableNow": True}
    if writer_id is None:
        writer_id = hashlib.sha256(
            checkpoint.rstrip("/").encode("utf-8")
        ).hexdigest()[:12]
    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .foreachBatch(
            foreach_batch_writer(path, idempotent=idempotent, writer_id=writer_id)
        )
        .start()
    )
