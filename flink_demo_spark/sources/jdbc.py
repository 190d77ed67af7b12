"""JDBC source/sink surface (SURVEY.md §2.1/§2.2).

Reference: ``MysqlSource.scala:10-50`` (bounded JDBC scan),
``Sink.scala:145`` (JDBC upsert), ``QueryTest.scala:822-824`` (JDBC
lookup cache). Spark's native ``spark.read.jdbc`` is the direct
mapping; these wrappers add the reference's usage patterns:

- ``jdbc_read``: bounded scan, optionally split into parallel
  partitions on a numeric column (at scale each executor opens its
  own cursor over a range — the 1000-executor read path).
- ``jdbc_lookup``: small dimension read marked for broadcast — the
  lookup-join pattern (stream/fact side never shuffles).
- ``jdbc_write``: batch append/overwrite through the JDBC writer.
- ``jdbc_merge_upsert``: keyed MERGE for idempotent result publishing
  (the reference's INSERT .. ON DUPLICATE KEY UPDATE); executes on
  the driver connection since upsert targets are result/dimension
  tables, not fact volume.

Tested end-to-end against the embedded Derby engine that ships on
Spark's classpath (``tests/test_jdbc_source.py``) — a real database,
real cursors, no container services needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounded JDBC scan (reference MysqlSource.scala:10-50). With a
    ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-predicated queries in parallel — the scan scales with
    executors instead of a single cursor."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def jdbc_lookup(
    spark: SparkSession, url: str, table: str, driver: str | None = None
) -> DataFrame:
    """Dimension-table read for lookup joins (QueryTest.scala:822-824
    lookup cache): small side, explicitly broadcast."""
    return F.broadcast(jdbc_read(spark, url, table, driver))


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
) -> None:
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        writer = writer.option("driver", driver)
    writer.mode(mode).save()


def jdbc_merge_upsert(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    max_rows: int = 1_000_000,
) -> None:
    """Idempotent keyed upsert on the driver connection (reference
    Sink.scala:145 INSERT .. ON DUPLICATE KEY UPDATE).

    Upsert targets in the reference are result/dimension tables
    (bounded by key domain, not fact volume), so a driver-side MERGE
    over the collected result is the honest shape; for fact-sized
    sinks use the partitioned ``jdbc_write`` append path plus a
    server-side dedup view. ``max_rows`` makes that contract fail
    FAST: a frame larger than the bound raises before anything is
    collected, instead of OOMing the driver."""
    over = df.limit(max_rows + 1).count()
    if over > max_rows:
        raise ValueError(
            f"jdbc_merge_upsert collects to the driver and {table!r} "
            f"would receive more than max_rows={max_rows} rows — this "
            "is a fact-sized frame; use jdbc_write (partitioned "
            "append) with a server-side dedup view instead"
        )
    rows = df.collect()
    cols = df.columns
    non_keys = [c for c in cols if c not in key_cols]
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        # portable upsert: UPDATE first, INSERT when no row matched
        # (Derby's MERGE rejects a VALUES source; MySQL would use
        # INSERT .. ON DUPLICATE KEY UPDATE — same semantics)
        set_ = ", ".join(f"{c} = ?" for c in non_keys)
        where = " AND ".join(f"{k} = ?" for k in key_cols)
        upd = conn.prepareStatement(
            f"UPDATE {table} SET {set_} WHERE {where}"
        )
        ins = conn.prepareStatement(
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"VALUES ({', '.join('?' for _ in cols)})"
        )
        for r in rows:
            for i, c in enumerate(non_keys):
                upd.setObject(i + 1, r[c])
            for i, k in enumerate(key_cols):
                upd.setObject(len(non_keys) + i + 1, r[k])
            if upd.executeUpdate() == 0:
                for i, c in enumerate(cols):
                    ins.setObject(i + 1, r[c])
                ins.executeUpdate()
        conn.commit()
    finally:
        conn.close()
