"""Kafka source/sink surface (SURVEY.md §2.1/§2.2).

The reference's most-used connector (``Source.scala:116-155`` JSON
consumer, ``Sink.scala`` producer, ``CreateTest.scala:141-160``
METADATA VIRTUAL columns). This container ships no Kafka broker and no
spark-sql-kafka jar, so the design splits the surface into pieces that
are each independently verifiable without one:

- **option builders** (pure dicts) — the exact reader/writer options a
  real deployment passes; contract-tested.
- **wire codec** — ``encode_events_as_kafka`` / ``decode_events_from_
  kafka`` project the events table to and from Kafka's fixed wire
  schema (key/value binary + metadata columns). These are real Spark
  plans (to_json/from_json, binary casts) and round-trip-tested
  against a file-backed stand-in; against a real broker the SAME
  functions run unchanged on the connector's output.
- **connector wrappers** — ``kafka_stream`` / ``write_stream_to_kafka``
  attach format+options lazily and raise a clear error when the
  spark-sql-kafka package is absent.

At 100 TB scale the decode path is pure JVM (from_json inside
whole-stage codegen); partition parallelism comes from Kafka topic
partitions, and ``minPartitions`` can split them further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the fixed schema Spark's kafka source emits (Structured Streaming
# + Kafka Integration Guide); timestampType: 0=CreateTime 1=LogAppendTime
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)

# events-table JSON payload schema (reference Source.scala:116-155
# consumes JSON click/events records)
EVENTS_JSON_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def kafka_reader_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool | None = None,
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Reader options for ``readStream.format('kafka')`` (reference
    Source.scala:116-131 consumer config)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = str(fail_on_data_loss).lower()
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def kafka_writer_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Writer options for ``writeStream.format('kafka')`` (reference
    Sink.scala producer config)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    **extra: str,
) -> DataFrame:
    """Kafka source; exposes key/value plus the metadata columns the
    reference declares via METADATA VIRTUAL (CreateTest.scala:141-160):
    topic, partition, offset, timestamp come built-in."""
    reader = spark.readStream.format("kafka")
    for k, v in {
        **kafka_reader_options(bootstrap_servers, topics, starting_offsets),
        **extra,
    }.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - depends on deployment
        if "Failed to find data source: kafka" in str(e):
            raise RuntimeError(
                "the spark-sql-kafka package is not on the classpath; "
                "submit with --packages org.apache.spark:spark-sql-kafka-"
                "0-10_2.13:<spark-version> (no broker/jar in this "
                "container — use kafka_stand_in for the wire-shape path)"
            ) from e
        raise


def write_stream_to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
):
    """Producer-side wrapper: df must already carry key/value binary
    (use ``encode_events_as_kafka``)."""
    writer = df.writeStream.format("kafka").option(
        "checkpointLocation", checkpoint_location
    )
    for k, v in kafka_writer_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    return writer


def encode_events_as_kafka(events: DataFrame, topic: str = "events") -> DataFrame:
    """Project typed events into Kafka wire shape: key = user_id bytes
    (keeps per-user ordering within a partition, like the reference's
    keyed producer), value = JSON payload bytes.

    The timestamp serializes at full microsecond precision so the
    round-trip is lossless (to_json's default format truncates to
    millis)."""
    payload = F.to_json(
        F.struct(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ),
        {"timestampFormat": _TS_FMT},
    )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


def decode_events_from_kafka(kafka_df: DataFrame) -> DataFrame:
    """Parse the JSON value back into typed events columns, carrying
    the Kafka metadata columns (reference CreateTest.scala:141-160
    declares topic/partition/offset/ts as METADATA VIRTUAL)."""
    parsed = F.from_json(
        F.col("__raw").cast("string"),
        EVENTS_JSON_SCHEMA,
        {"timestampFormat": _TS_FMT},
    )
    cols = [F.col(f"payload.{c}").alias(c) for c in (
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )]
    meta = [
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_timestamp"),
    ]
    # the wire column is also called `value`; rename before the payload
    # struct (whose own `value` field is the event amount) is flattened
    return kafka_df.withColumnRenamed("value", "__raw").select(
        parsed.alias("payload"), "topic", "partition", "offset", "timestamp"
    ).select(*cols, *meta)


def kafka_stand_in(
    spark: SparkSession,
    sf_dir: str,
    topic: str = "events",
    num_partitions: int = 3,
) -> DataFrame:
    """File-backed stand-in producing EXACTLY the kafka source wire
    schema from the events table: deterministic partition assignment
    (murmur-style hash of the key, like Kafka's default partitioner is
    hash-based), per-partition offsets, CreateTime timestamps. Lets
    every downstream consumer (decode, metadata projection, windowed
    aggs) be tested byte-for-byte without a broker."""
    from pyspark.sql import Window

    from ..catalog import load_table

    wire = encode_events_as_kafka(load_table(spark, sf_dir, "events"), topic)
    part = F.pmod(F.hash(F.col("key")), F.lit(num_partitions)).cast("int")
    w = Window.partitionBy("partition").orderBy("offset_seed")
    return (
        wire.withColumn("partition", part)
        .withColumn(
            "offset_seed",
            F.xxhash64(F.col("value")),  # deterministic within-partition order
        )
        .withColumn("offset", F.row_number().over(w).cast("bigint") - 1)
        .withColumn(
            "timestamp",
            F.to_timestamp(
                F.get_json_object(F.col("value").cast("string"), "$.ts"),
                _TS_FMT,
            ),
        )
        .withColumn("timestampType", F.lit(0).cast("int"))
        .select(
            "key", "value", "topic", "partition", "offset", "timestamp",
            "timestampType",
        )
    )
