"""Round-14 optimization tests: replay-runner hardening (size-gated
/dev/shm scratch, restore-on-start-failure, malformed staged bytes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _hourly(ev):
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def test_runner_scratch_size_gate(spark, sf_dir, monkeypatch):
    """The /dev/shm ephemeral-checkpoint default is size-gated (round-13
    verdict What's-wrong #1): staged input over
    SPARK_GRAFT_STREAM_SCRATCH_MAX_BYTES (default 1 GiB) falls back to
    Spark's disk default; an explicit SPARK_GRAFT_STREAM_SCRATCH root is
    honored unconditionally; results are identical on both sides."""
    import tempfile as _tempfile

    from flink_demo_spark.sources import streams
    from flink_demo_spark.streaming.runner import run_available_now

    calls: list[str] = []
    real_mkdtemp = _tempfile.mkdtemp

    def spy_mkdtemp(*a, **kw):
        calls.append(kw.get("dir") or (a[2] if len(a) > 2 else None))
        return real_mkdtemp(*a, **kw)

    monkeypatch.setattr(_tempfile, "mkdtemp", spy_mkdtemp)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH", raising=False)

    # 1. small staged input (the real sf file) -> memory-backed scratch
    ev = streams.events_stream(spark, sf_dir, watermark="10 minutes")
    small_rows = run_available_now(_hourly(ev), output_mode="complete").collect()
    assert calls and calls[-1] == "/dev/shm"

    # 2. staged input over the gate -> NO scratch dir (disk default)
    n_before = len(calls)
    ev = streams.events_stream(spark, sf_dir, watermark="10 minutes")
    spark.conf.set(streams.STAGED_BYTES_CONF, str(2 << 30))
    big_rows = run_available_now(_hourly(ev), output_mode="complete").collect()
    assert len(calls) == n_before  # gate tripped: no mkdtemp call
    assert sorted(map(tuple, big_rows)) == sorted(map(tuple, small_rows))
    assert len(big_rows) > 0

    # 3. gate threshold is an env knob
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SCRATCH_MAX_BYTES", str(4 << 30))
    ev = streams.events_stream(spark, sf_dir, watermark="10 minutes")
    spark.conf.set(streams.STAGED_BYTES_CONF, str(2 << 30))
    run_available_now(_hourly(ev), output_mode="complete").collect()
    assert calls[-1] == "/dev/shm"  # 2 GiB under a 4 GiB gate
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH_MAX_BYTES")

    # 4. an explicit scratch root bypasses the gate entirely
    root = real_mkdtemp(prefix="fds_gate_root_")
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SCRATCH", root)
    ev = streams.events_stream(spark, sf_dir, watermark="10 minutes")
    spark.conf.set(streams.STAGED_BYTES_CONF, str(2 << 30))
    run_available_now(_hourly(ev), output_mode="complete").collect()
    assert calls[-1] == root


def test_runner_restores_partitions_on_start_failure(spark, sf_dir):
    """A start-time AnalysisException (e.g. complete mode without an
    aggregation) must not leave the session clamped (round-13 ADVICE,
    medium): the finally that restores spark.sql.shuffle.partitions now
    wraps writer.start()."""
    from flink_demo_spark.sources import streams
    from flink_demo_spark.streaming.runner import run_available_now

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        ev = streams.events_stream(spark, sf_dir, watermark="10 minutes")
        assert spark.conf.get(streams.STAGED_BYTES_CONF, None) is not None
        # no aggregation -> complete mode is rejected at start()
        with pytest.raises(Exception):
            run_available_now(ev.select("event_id"), output_mode="complete")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
        assert spark.conf.get(streams.STAGED_BYTES_CONF, None) is None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_runner_malformed_staged_bytes(spark, sf_dir):
    """A malformed staged-bytes conf value skips the clamp instead of
    failing the replay (round-13 ADVICE, low)."""
    from flink_demo_spark.sources import streams
    from flink_demo_spark.streaming.runner import run_available_now

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        ev = streams.events_stream(spark, sf_dir, watermark="10 minutes")
        spark.conf.set(streams.STAGED_BYTES_CONF, "not-a-number")
        rows = run_available_now(_hourly(ev), output_mode="complete").collect()
        assert len(rows) > 0
        assert spark.conf.get(streams.STAGED_BYTES_CONF, None) is None
        assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
