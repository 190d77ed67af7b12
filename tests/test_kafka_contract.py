"""Kafka surface contract tests — no broker, no spark-sql-kafka jar.

What CAN be verified in this container is verified for real: the
option dictionaries a deployment passes, the wire codec (encode →
decode round-trips the events table bit-for-bit through real
to_json/from_json plans), the stand-in's schema parity with the
connector's documented output, and the wrapper's failure mode when
the connector package is absent (reference Source.scala:116-155,
CreateTest.scala:141-160)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_demo_spark.catalog import load_table
from flink_demo_spark.sources import kafka as K


def test_reader_options_contract():
    opts = K.kafka_reader_options(
        "broker1:9092,broker2:9092",
        "events,clicks",
        starting_offsets="latest",
        fail_on_data_loss=False,
        min_partitions=64,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events,clicks",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "minPartitions": "64",
    }


def test_writer_options_contract():
    assert K.kafka_writer_options("b:9092", "out") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out",
    }


def test_stand_in_matches_connector_schema(spark, sf_dir):
    wire = K.kafka_stand_in(spark, sf_dir)
    got = [(f.name, f.dataType.simpleString()) for f in wire.schema.fields]
    assert got == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]


def test_stand_in_offsets_are_per_partition_and_dense(spark, sf_dir):
    wire = K.kafka_stand_in(spark, sf_dir).select("partition", "offset")
    per_part = {
        r["partition"]: r["n"]
        for r in wire.groupBy("partition")
        .agg({"offset": "max"})
        .withColumnRenamed("max(offset)", "n")
        .collect()
    }
    counts = {
        r["partition"]: r["count"]
        for r in wire.groupBy("partition").count().collect()
    }
    assert set(per_part) <= {0, 1, 2}
    for p, mx in per_part.items():
        assert counts[p] == mx + 1  # offsets 0..max dense per partition


def test_wire_codec_round_trips_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    decoded = K.decode_events_from_kafka(K.kafka_stand_in(spark, sf_dir))
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    a = events.select(cols).orderBy("event_id").collect()
    b = decoded.select(cols).orderBy("event_id").collect()
    assert len(a) == len(b) > 0
    assert a == b, "JSON wire codec must round-trip the events table exactly"


def test_decode_carries_metadata_columns(spark, sf_dir):
    decoded = K.decode_events_from_kafka(K.kafka_stand_in(spark, sf_dir))
    names = [f.name for f in decoded.schema.fields]
    for c in ("kafka_topic", "kafka_partition", "kafka_offset", "kafka_timestamp"):
        assert c in names
    row = decoded.where(decoded.kafka_topic == "events").limit(1).collect()
    assert row and row[0]["kafka_offset"] >= 0


def test_kafka_stream_raises_actionable_error_without_package(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        K.kafka_stream(spark, "localhost:9092", "events")


def test_streaming_decode_plan_builds(spark, sf_dir):
    """The decode path must compose with a streaming source (the real
    connector emits the same wire schema): encode the replayed events
    stream and decode it back, checking the streaming plan resolves."""
    from flink_demo_spark.sources.streams import events_stream
    from flink_demo_spark.streaming.runner import run_available_now

    wire = K.encode_events_as_kafka(
        events_stream(spark, sf_dir, watermark=None)
    )
    # stand-in metadata for the streaming path
    from pyspark.sql import functions as F

    wire = (
        wire.withColumn("partition", F.lit(0).cast("int"))
        .withColumn("offset", F.lit(0).cast("bigint"))
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0).cast("int"))
    )
    decoded = K.decode_events_from_kafka(wire)
    assert decoded.isStreaming
    out = run_available_now(decoded.groupBy("event_type").count())
    assert out.count() > 0


# ---------------------------------------------------------------------------
# Wire-protocol end-to-end (sources/kafka_wire.py vs tests/kafka_broker.py):
# executors speak the public Kafka binary protocol (v0) over sockets —
# same live-server pattern as the RESP and bulk-HTTP sink tests.
# ---------------------------------------------------------------------------


def test_kafka_wire_murmur2_matches_java_vectors():
    """The default-partitioner hash must be bit-identical to Java
    Kafka's Utils.murmur2 (public compatibility vectors), so a
    migrating app's key→partition routing is preserved."""
    from flink_demo_spark.sources.kafka_wire import murmur2

    def s32(x):
        return x - (1 << 32) if x >= (1 << 31) else x

    assert s32(murmur2(b"")) == 275646681
    assert s32(murmur2(b"21")) == -973932308
    assert s32(murmur2(b"foobar")) == -790332482
    assert s32(murmur2(b"a-little-bit-long-string")) == -985981536


def test_kafka_wire_produce_fetch_round_trip_from_executors(spark, sf_dir):
    """events -> JSON wire codec -> executor-side ProduceRequests ->
    one-task-per-partition Fetch -> decode: typed rows round-trip
    exactly, and every key's rows land in murmur2(key) % n."""
    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker

    from flink_demo_spark.catalog import load_table
    from flink_demo_spark.sources.kafka import (
        decode_events_from_kafka,
        encode_events_as_kafka,
    )
    from flink_demo_spark.sources.kafka_wire import (
        kafka_wire_read,
        kafka_wire_sink,
        partition_for_key,
    )

    events = load_table(spark, sf_dir, "events").limit(200).cache()
    n_events = events.count()
    with KafkaTestBroker(num_partitions=3) as b:
        wire = encode_events_as_kafka(events, "events")
        kafka_wire_sink((b.host, b.port), "events")(wire, batch_id=0)

        got = kafka_wire_read(spark, (b.host, b.port), "events").cache()
        assert got.count() == n_events
        # connector schema contract
        assert [f.name for f in got.schema.fields] == [
            "key", "value", "topic", "partition", "offset",
            "timestamp", "timestampType",
        ]
        # key -> partition routing is Kafka's default partitioner
        for r in got.select("key", "partition").collect():
            assert r.partition == partition_for_key(bytes(r.key), 3)
        # offsets dense per partition
        for pid, offs in (
            got.groupBy("partition")
            .agg(F.sort_array(F.collect_list("offset")).alias("o"))
            .collect()
        ):
            assert list(offs) == list(range(len(offs)))
        # full typed round-trip through the shared codec
        back = decode_events_from_kafka(got).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        orig = events.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        assert back.exceptAll(orig).count() == 0
        assert orig.exceptAll(back).count() == 0
        got.unpersist()
    events.unpersist()


def test_kafka_wire_streaming_producer(spark, sf_dir):
    """Streaming pipeline -> foreachBatch(kafka_wire_sink): micro-batch
    records arrive on the broker exactly once per batch."""
    import tempfile

    from flink_demo_spark.catalog import load_table
    from flink_demo_spark.sources.kafka import encode_events_as_kafka
    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker
    from flink_demo_spark.sources.kafka_wire import fetch_all, kafka_wire_sink

    events = load_table(spark, sf_dir, "events").limit(50)
    src = tempfile.mkdtemp(prefix="kafka_wire_src_")
    events.write.mode("overwrite").parquet(src)
    with KafkaTestBroker(num_partitions=2) as b:
        stream = spark.readStream.schema(events.schema).parquet(src)
        sink = kafka_wire_sink((b.host, b.port), "events")
        q = (
            encode_events_as_kafka(stream, "events")
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="kafka_wire_ck_")
            )
            .start()
        )
        q.awaitTermination(120)
        total = sum(
            len(fetch_all((b.host, b.port), "events", pid)) for pid in range(2)
        )
        assert total == events.count()


def test_kafka_wire_python_datasource_batch_and_streaming(spark, sf_dir, tmp_path):
    """spark.read/.readStream.format('kafka_wire'): the Python Data
    Source wraps the wire protocol as a REAL Spark source. Streaming
    offsets ride Spark's checkpoint: a restarted query (same
    checkpoint) reads ONLY records produced after the first pass —
    the jar connector's exactly-once offsets contract."""
    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker

    from flink_demo_spark.sources.kafka_wire import (
        produce,
        register_kafka_wire,
    )

    register_kafka_wire(spark)
    with KafkaTestBroker(num_partitions=3) as b:
        boot = f"{b.host}:{b.port}"
        produce(
            (b.host, b.port),
            "t1",
            {0: [(b"a", b"v1"), (b"a", b"v2")], 1: [(b"b", b"v3")]},
        )
        # batch: full topic, connector schema
        df = (
            spark.read.format("kafka_wire")
            .option("bootstrap", boot)
            .option("topic", "t1")
            .load()
        )
        assert df.count() == 3
        assert [f.name for f in df.schema.fields] == [
            "key", "value", "topic", "partition", "offset",
            "timestamp", "timestampType",
        ]

        ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

        def run():
            sdf = (
                spark.readStream.format("kafka_wire")
                .option("bootstrap", boot)
                .option("topic", "t1")
                .load()
            )
            q = (
                sdf.writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", ck)
                .start()
            )
            q.awaitTermination(120)

        run()
        assert spark.read.parquet(out).count() == 3
        produce((b.host, b.port), "t1", {2: [(b"c", b"v4")]})
        run()
        rows = sorted(
            (r.partition, r.offset, bytes(r.value))
            for r in spark.read.parquet(out).collect()
        )
        assert rows == [
            (0, 0, b"v1"), (0, 1, b"v2"), (1, 0, b"v3"), (2, 0, b"v4"),
        ]


def test_kafka_wire_failure_paths():
    """Produce errors surface (so foreachBatch fails and retries) and
    CRC corruption is detected, not silently accepted."""
    import pytest

    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker
    from flink_demo_spark.sources.kafka_wire import (
        decode_message_set,
        encode_message_set,
        fetch_all,
        produce,
    )

    # CRC: flip one payload bit -> decode raises
    mset = encode_message_set([(b"k", b"hello")])
    corrupted = mset[:-1] + bytes([mset[-1] ^ 0x01])
    with pytest.raises(IOError, match="CRC"):
        decode_message_set(corrupted)

    # broker-side produce error propagates as an exception
    with KafkaTestBroker(num_partitions=1) as b:
        orig = b._produce

        def failing(r):
            out = orig(r)
            # rewrite error code 0 -> 7 (REQUEST_TIMED_OUT) in the
            # single-partition response: topic-count, str, part-count,
            # pid(4) then the int16 error at a fixed offset
            import struct

            name_len = len("t_err")
            off = 4 + 2 + name_len + 4 + 4
            return out[:off] + struct.pack(">h", 7) + out[off + 2 :]

        b._produce = failing
        with pytest.raises(IOError, match="produce error 7"):
            produce((b.host, b.port), "t_err", {0: [(b"k", b"v")]})
        b._produce = orig
        # after the injected failure clears, produce + fetch succeed
        produce((b.host, b.port), "t_err", {0: [(b"k", b"v")]})
        msgs = fetch_all((b.host, b.port), "t_err", 0)
        assert [(k, v) for _, k, v in msgs][-1] == (b"k", b"v")


def test_murmur2_batch_matches_scalar():
    """The numpy-vectorized partitioner hash must be bit-identical to
    the scalar reference (itself pinned to the Java vectors) for every
    key length class: empty, sub-word tails 1-3, exact words, long."""
    import random

    from flink_demo_spark.sources.kafka_wire import murmur2, murmur2_batch

    rng = random.Random(42)
    keys = [b"", b"21", b"foobar", b"a-little-bit-long-string"]
    keys += [bytes(rng.randrange(256) for _ in range(n)) for n in range(0, 35)]
    keys += [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
             for _ in range(50)]
    got = murmur2_batch(keys)
    assert [int(h) for h in got] == [murmur2(k) for k in keys]


def test_encode_message_set_batch_matches_scalar():
    """The numpy batch assembler (n >= 8) must produce byte-identical
    message sets to the scalar packer, including null/empty keys and
    values, and decode must round-trip them."""
    import struct

    from flink_demo_spark.sources.kafka_wire import (
        _message,
        decode_message_set,
        encode_message_set,
    )

    msgs = [
        (b"k1", b"hello"),
        (None, b"null-key"),
        (b"null-value", None),
        (b"", b""),  # empty (not null) payloads
        (None, None),
        (b"k" * 100, b"v" * 1000),
        (b"x", b"y"),
        (b"tail3", b"odd-len-payload!"),
        (b"k9", b"v9"),
    ]
    assert len(msgs) >= 8  # exercises the numpy path
    scalar = b"".join(
        struct.pack(">qi", 0, len(m)) + m for m in (_message(k, v) for k, v in msgs)
    )
    batch = encode_message_set(msgs)
    assert batch == scalar
    assert [(k, v) for _, k, v in decode_message_set(batch)] == msgs


def test_fetch_range_record_too_large():
    """A record bigger than max_bytes makes the real broker return a
    partial message; the client must retry with a doubled fetch size
    (never silently skip committed-range records) and raise
    record-too-large once the cap is hit."""
    import pytest

    from flink_demo_spark.sources import kafka_wire as kw
    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker

    big = b"x" * 8192
    with KafkaTestBroker(num_partitions=1) as b:
        kw.produce((b.host, b.port), "big", {0: [(b"k0", b"small"), (b"k1", big), (b"k2", b"tail")]})
        # pinned range with a tiny initial fetch size: must double until
        # the 8 KiB record fits and deliver ALL records of the range
        got = kw.fetch_range((b.host, b.port), "big", 0, 0, 3, max_bytes=64)
        assert [(o, k) for o, k, _ in got] == [(0, b"k0"), (1, b"k1"), (2, b"k2")]
        assert got[1][2] == big
        # with the doubling cap below the record size, raise instead of
        # committing offsets whose records were never delivered
        old_cap = kw.MAX_FETCH_BYTES
        kw.MAX_FETCH_BYTES = 1024
        try:
            with pytest.raises(IOError, match="record-too-large"):
                kw.fetch_range((b.host, b.port), "big", 0, 0, 3, max_bytes=64)
        finally:
            kw.MAX_FETCH_BYTES = old_cap


def test_fetch_metadata_rejects_missing_topic():
    """A metadata response without the requested topic must raise a
    clear protocol error, not NameError; extra topics are skipped."""
    import struct as st

    import pytest

    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker
    from flink_demo_spark.sources.kafka_wire import _str, fetch_metadata

    with KafkaTestBroker(num_partitions=1) as b:
        def other_topic_only(r):
            [r.string() for _ in range(r.i32())]
            out = st.pack(">i", 1)
            out += st.pack(">i", 0) + _str(b.host) + st.pack(">i", b.port)
            out += st.pack(">i", 1)  # one topic, but not the requested one
            out += st.pack(">h", 0) + _str("unrelated")
            out += st.pack(">i", 1)
            out += st.pack(">hiii", 0, 0, 0, 1) + st.pack(">i", 0)
            out += st.pack(">i", 1) + st.pack(">i", 0)
            return out

        b._metadata = other_topic_only
        with pytest.raises(IOError, match="absent from metadata"):
            fetch_metadata((b.host, b.port), "wanted")


def test_kafka_wire_sink_rotates_null_keys(spark):
    """Null-keyed records must spread across partitions (Kafka's
    round-robin/sticky spirit), not pile onto partition 0."""
    from pyspark.sql import functions as F

    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker
    from flink_demo_spark.sources.kafka_wire import fetch_all, kafka_wire_sink

    df = (
        spark.range(6)
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.col("id").cast("string").cast("binary").alias("value"),
        )
        .coalesce(1)  # one Arrow batch -> deterministic rotation
    )
    with KafkaTestBroker(num_partitions=3) as b:
        kafka_wire_sink((b.host, b.port), "nulls")(df, batch_id=0)
        per_pid = {
            pid: len(fetch_all((b.host, b.port), "nulls", pid))
            for pid in range(3)
        }
        assert sum(per_pid.values()) == 6
        assert all(n == 2 for n in per_pid.values()), per_pid


def test_kafka_wire_sink_null_key_rotation_carries_across_batches(spark):
    """The rotation offset must carry ACROSS Arrow batches: a task
    seeing many small batches would otherwise restart at the same
    partition per batch and skew every null-keyed record onto it."""
    from pyspark.sql import functions as F

    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker
    from flink_demo_spark.sources.kafka_wire import fetch_all, kafka_wire_sink

    df = (
        spark.range(9)
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.col("id").cast("string").cast("binary").alias("value"),
        )
        .coalesce(1)
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        with KafkaTestBroker(num_partitions=3) as b:
            # 9 single-row Arrow batches -> without the carried offset
            # every record lands on ONE partition
            kafka_wire_sink((b.host, b.port), "nulls_rr")(df, batch_id=0)
            per_pid = {
                pid: len(fetch_all((b.host, b.port), "nulls_rr", pid))
                for pid in range(3)
            }
        assert sum(per_pid.values()) == 9
        assert all(n == 3 for n in per_pid.values()), per_pid
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_kafka_wire_two_broker_layout_parallelism_and_recovery(spark, tmp_path):
    """Topic leadership split across TWO live brokers: the data source
    plans one Spark task per Kafka partition, each task fetches from
    that partition's own leader, and a checkpoint restart resumes from
    the committed per-partition offsets on both leaders."""
    import struct as st

    from flink_demo_spark.sources.kafka_broker import KafkaTestBroker
    from flink_demo_spark.sources.kafka_wire import (
        _str,
        produce,
        register_kafka_wire,
    )

    register_kafka_wire(spark)
    with KafkaTestBroker(num_partitions=2) as b0, KafkaTestBroker(
        num_partitions=2
    ) as b1:
        def split_metadata(r):
            topics = [r.string() for _ in range(r.i32())]
            out = st.pack(">i", 2)
            for node, br in enumerate((b0, b1)):
                out += st.pack(">i", node) + _str(br.host) + st.pack(">i", br.port)
            out += st.pack(">i", len(topics))
            for t in topics:
                out += st.pack(">h", 0) + _str(t)
                out += st.pack(">i", 2)
                for pid in range(2):  # partition pid led by node pid
                    out += st.pack(">hiii", 0, pid, pid, 1)
                    out += st.pack(">i", pid)
                    out += st.pack(">i", 1) + st.pack(">i", pid)
            return out

        b0._metadata = split_metadata
        b1._metadata = split_metadata
        # records live ONLY on their leader: p0 -> b0, p1 -> b1
        produce((b0.host, b0.port), "t2", {0: [(b"a", b"v0a"), (b"a", b"v0b")]})
        produce((b1.host, b1.port), "t2", {1: [(b"b", b"v1a")]})

        df = (
            spark.read.format("kafka_wire")
            .option("bootstrap", f"{b0.host}:{b0.port}")
            .option("topic", "t2")
            .load()
        )
        # one task per Kafka partition (the jar connector's contract)
        assert df.rdd.getNumPartitions() == 2
        rows = sorted((r.partition, r.offset, bytes(r.value)) for r in df.collect())
        assert rows == [(0, 0, b"v0a"), (0, 1, b"v0b"), (1, 0, b"v1a")]

        ck, out_dir = str(tmp_path / "ck2"), str(tmp_path / "out2")

        def run():
            q = (
                spark.readStream.format("kafka_wire")
                .option("bootstrap", f"{b0.host}:{b0.port}")
                .option("topic", "t2")
                .load()
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", ck)
                .start()
            )
            q.awaitTermination(120)

        run()
        assert spark.read.parquet(out_dir).count() == 3
        # new records on BOTH leaders; restart reads only those
        produce((b0.host, b0.port), "t2", {0: [(b"a", b"v0c")]})
        produce((b1.host, b1.port), "t2", {1: [(b"b", b"v1b")]})
        run()
        rows = sorted((r.partition, r.offset, bytes(r.value))
                      for r in spark.read.parquet(out_dir).collect())
        assert rows == [
            (0, 0, b"v0a"), (0, 1, b"v0b"), (0, 2, b"v0c"),
            (1, 0, b"v1a"), (1, 1, b"v1b"),
        ]


def test_encode_message_set_property_fuzz():
    """Property fuzz: for random mixes of null/empty/binary keys and
    values (all sizes straddling the scalar/numpy path cutoff), the
    batch assembler must stay byte-identical to the scalar packer and
    decode must round-trip."""
    import random
    import struct

    from flink_demo_spark.sources.kafka_wire import (
        _message,
        decode_message_set,
        encode_message_set,
    )

    rng = random.Random(99)

    def rand_payload():
        kind = rng.randrange(4)
        if kind == 0:
            return None
        if kind == 1:
            return b""
        n = rng.randrange(1, 50) if kind == 2 else rng.randrange(50, 3000)
        return bytes(rng.randrange(256) for _ in range(n))

    for trial in range(30):
        n = rng.choice([1, 2, 7, 8, 9, 40])
        msgs = [(rand_payload(), rand_payload()) for _ in range(n)]
        scalar = b"".join(
            struct.pack(">qi", 0, len(m)) + m
            for m in (_message(k, v) for k, v in msgs)
        )
        batch = encode_message_set(msgs)
        assert batch == scalar, (trial, n)
        assert [(k, v) for _, k, v in decode_message_set(batch)] == msgs
