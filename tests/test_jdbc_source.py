"""JDBC source/sink end-to-end against embedded Derby (the JDBC
engine already on Spark's classpath) — a real database with real
cursors, covering the reference's MysqlSource/Sink/lookup patterns
without any container service."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from flink_demo_spark.catalog import load_table
from flink_demo_spark.sources import jdbc as J


@pytest.fixture(scope="module")
def derby_url(spark):
    d = tempfile.mkdtemp(prefix="derby_")
    url = f"jdbc:derby:{d}/db;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(J.DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    conn.close()
    return f"jdbc:derby:{d}/db"


def test_jdbc_roundtrip(spark, sf_dir, derby_url):
    src = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    J.jdbc_write(src, derby_url, "nation_rt", mode="overwrite",
                 driver=J.DERBY_DRIVER)
    back = J.jdbc_read(spark, derby_url, "nation_rt", driver=J.DERBY_DRIVER)
    a = sorted((r[0], r[1], r[2]) for r in src.collect())
    b = sorted((r[0], r[1], r[2]) for r in back.collect())
    assert a == b and len(a) == 25


def test_jdbc_partitioned_parallel_read(spark, sf_dir, derby_url):
    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    n = src.count()
    J.jdbc_write(src, derby_url, "cust_part", mode="overwrite",
                 driver=J.DERBY_DRIVER)
    par = J.jdbc_read(
        spark,
        derby_url,
        "cust_part",
        driver=J.DERBY_DRIVER,
        partition_column="c_custkey",
        lower_bound=0,
        upper_bound=n + 1,
        num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4, "scan must split into ranges"
    assert par.count() == n, "range partitions must cover every row"


def test_jdbc_filter_pushdown(spark, sf_dir, derby_url):
    import io
    from contextlib import redirect_stdout

    df = J.jdbc_read(spark, derby_url, "nation_rt", driver=J.DERBY_DRIVER)
    q = df.where(F.col("n_regionkey") == 2).select("n_name")
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "n_regionkey" in plan, (
        "the JDBC relation must push the filter into the remote query"
    )
    assert q.count() == 5


def test_jdbc_lookup_join_broadcasts(spark, sf_dir, derby_url):
    import io
    from contextlib import redirect_stdout

    dim = J.jdbc_lookup(spark, derby_url, "nation_rt", driver=J.DERBY_DRIVER)
    fact = load_table(spark, sf_dir, "customer")
    joined = fact.join(
        dim, fact.c_nationkey == dim.n_nationkey
    ).select("c_custkey", "n_name")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain()
    assert "BroadcastHashJoin" in buf.getvalue(), (
        "JDBC lookup dimension must broadcast (fact side never shuffles)"
    )
    assert joined.count() == fact.count()


def test_jdbc_merge_upsert_idempotent(spark, derby_url):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url)
    st = conn.createStatement()
    try:
        st.executeUpdate("DROP TABLE daily_uv")
    except Exception:
        pass
    st.executeUpdate(
        "CREATE TABLE daily_uv (day VARCHAR(10) PRIMARY KEY, uv BIGINT)"
    )
    conn.close()

    v1 = spark.createDataFrame(
        [("2024-01-01", 10), ("2024-01-02", 20)], "day string, uv long"
    )
    J.jdbc_merge_upsert(spark, v1, derby_url, "daily_uv", ["day"])
    # second run updates one key, inserts another — and re-running the
    # same batch must converge (idempotent result publishing)
    v2 = spark.createDataFrame(
        [("2024-01-02", 25), ("2024-01-03", 7)], "day string, uv long"
    )
    for _ in range(2):
        J.jdbc_merge_upsert(spark, v2, derby_url, "daily_uv", ["day"])
    back = J.jdbc_read(spark, derby_url, "daily_uv", driver=J.DERBY_DRIVER)
    got = sorted((r[0], r[1]) for r in back.collect())
    assert got == [("2024-01-01", 10), ("2024-01-02", 25), ("2024-01-03", 7)]


def test_jdbc_merge_upsert_rejects_fact_sized_frame(spark, derby_url):
    """The upsert collects to the driver; a frame above max_rows must
    fail fast BEFORE collecting (ADVICE: misuse should raise, not OOM
    the driver)."""
    import pytest

    big = spark.range(500).select(
        F.col("id").alias("day"), F.col("id").alias("uv")
    )
    with pytest.raises(ValueError, match="fact-sized"):
        J.jdbc_merge_upsert(
            spark, big, derby_url, "daily_uv", ["day"], max_rows=100
        )


def test_jdbc_streaming_foreach_batch_publish(spark, sf_dir, derby_url):
    """Streaming result publishing: windowed counts land in a JDBC
    table via foreachBatch + MERGE (the reference's Kafka->MySQL
    result sink, Sink.scala:145)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url)
    st = conn.createStatement()
    try:
        st.executeUpdate("DROP TABLE type_counts")
    except Exception:
        pass
    st.executeUpdate(
        "CREATE TABLE type_counts (event_type VARCHAR(20) PRIMARY KEY, "
        "n BIGINT)"
    )
    conn.close()

    from flink_demo_spark.sources.streams import events_stream

    sdf = (
        events_stream(spark, sf_dir, watermark=None)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
    )

    def publish(batch_df, _batch_id):
        J.jdbc_merge_upsert(
            batch_df.sparkSession, batch_df, derby_url, "type_counts",
            ["event_type"],
        )

    q = (
        sdf.writeStream.outputMode("complete")
        .foreachBatch(publish)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    back = J.jdbc_read(spark, derby_url, "type_counts", driver=J.DERBY_DRIVER)
    exact = {
        (r[0], r[1])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert {(r[0], r[1]) for r in back.collect()} == exact
