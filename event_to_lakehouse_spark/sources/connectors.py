"""Source / sink connectors (SURVEY §2.1).

The reference's I/O surface is JSON bronze (S1/S2), text registry blobs
(S3/S4), an Iceberg append sink (S5), and Kafka landing upstream (S8).
This module generalizes that into one format-agnostic connector layer
over Spark's DataSource V2 readers, adding the columnar formats the
reference lacks (parquet/ORC/CSV) behind the same call shape:

- every batch reader is also a streaming reader (``streaming=True``) —
  Structured Streaming file sources share options with batch, the
  declared-schema requirement (reference :81-84) enforced here.
- Kafka (S8): the reference ingests via Kafka Connect outside Spark;
  here ``read_kafka`` is a direct ``format("kafka")`` source with the
  same JSON-payload → declared-schema normalization path. Gated: the
  kafka connector jar isn't in this container, so it raises a clear
  error at call time (plumbing is real and unit-tested by schema).
- sinks: parquet/ORC/CSV/JSON writers with partitioning; the
  Iceberg/Delta ``writeTo`` append (S5) is in ``pipeline.normalize``.

Scale notes: file listing for huge paths is driver-side in Spark's
InMemoryFileIndex — at 100 TB prefer fewer, larger files (set
``maxFilesPerTrigger``/``maxPartitionBytes``), partition directories by
a pruning column, and let the vectorized readers (parquet/ORC) handle
column pruning + predicate pushdown (verify via PushedFilters in
.explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BATCH_FORMATS = {"parquet", "orc", "json", "csv", "text"}

# Formats whose files are self-describing (schema optional in batch).
SELF_DESCRIBING = {"parquet", "orc"}


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | None = None,
    streaming: bool = False,
    **options: str,
) -> DataFrame:
    """Uniform file scan over any supported format, batch or unbounded.

    Streaming file sources cannot infer schemas (reference :81-84), so
    ``schema`` is mandatory there except for self-describing formats.
    """
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(BATCH_FORMATS)}")
    if streaming and schema is None and fmt not in SELF_DESCRIBING:
        raise ValueError(f"streaming {fmt} source requires a declared schema")
    reader = spark.readStream if streaming else spark.read
    reader = reader.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    streaming: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan with the same PERMISSIVE + corrupt-record hardening as
    the bronze JSON path (reference :28-32): malformed lines land in
    ``_corrupt_record`` instead of failing the job."""
    opts = {
        "header": "true" if header else "false",
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt_record",
        **options,
    }
    if schema is not None and "_corrupt_record" not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return read_files(spark, path, "csv", schema, streaming, **opts)


# The record schema the kafka data source produces (fixed by Spark's
# connector contract) — also the shape any broker-free test double must
# emit to exercise the exact downstream wiring.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_source_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The option set ``read_kafka`` hands the kafka source — pure, so
    the wiring is assertable without a broker."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    payload_schema: T.StructType,
    streaming: bool = True,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Direct Kafka source (S8 without the Kafka Connect hop): value is
    JSON parsed against the declared schema — the same contract as the
    bronze file path, minus the object-store landing.

    Requires the spark-sql-kafka connector on the classpath; in
    environments without it this raises Spark's missing-data-source
    error at ``load()``. Everything downstream of the raw record frame
    (``parse_kafka_payload``, over ``KAFKA_RECORD_SCHEMA``) is broker-
    free and tested end-to-end on a streamed record double."""
    reader = spark.readStream if streaming else spark.read
    raw = (
        reader.format("kafka")
        .options(**kafka_source_options(bootstrap_servers, topic, starting_offsets))
        .load()
    )
    return parse_kafka_payload(raw, payload_schema)


def parse_kafka_payload(raw: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """Kafka record → typed columns: JSON value parsed with the same
    PERMISSIVE corrupt-capture contract as ``pipeline.read_bronze``.
    Split out from ``read_kafka`` so the payload normalization is
    testable without a broker (plumbing-real, transport-gated)."""
    from pyspark.sql import functions as F

    from ..pipeline.normalize import JSON_OPTIONS, with_corrupt_column

    schema = with_corrupt_column(payload_schema)
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema, JSON_OPTIONS).alias("_r"),
    ).select("kafka_key", "topic", "partition", "offset", "kafka_ts", "_r.*")


def write_files(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Uniform batch sink. Partition columns give directory-level
    pruning for downstream scans (the 100 TB default: partition by the
    column your readers filter on)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(BATCH_FORMATS)}")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
