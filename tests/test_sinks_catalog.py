"""Sinks (SURVEY §2.2) and DDL/catalog (§2.13) coverage."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from flink_demo_spark.catalog import load_table, register_views
from flink_demo_spark.sinks import merge_upsert, write_partitioned


def test_partitioned_write_dynamic_and_static(spark, sf_dir):
    """Reference CreateTest.scala:711-739: dynamic + static partition
    insert; partition dirs must appear and round-trip."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    d = tempfile.mkdtemp(prefix="sink_part_")
    write_partitioned(
        orders, d, ["yr"], static_partitions={"source": "batch1"}
    )
    dirs = sorted(x for x in os.listdir(d) if x.startswith("yr="))
    assert len(dirs) >= 3  # several order years
    back = spark.read.parquet(d)
    assert back.count() == orders.count()
    assert set(back.select("source").distinct().toPandas()["source"]) == {"batch1"}
    # partition pruning: a yr filter must prune the scan to one dir
    one_year = back.where(F.col("yr") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert one_year.count() > 0


def test_merge_upsert_idempotent(spark):
    d = os.path.join(tempfile.mkdtemp(prefix="sink_upsert_"), "target")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    merge_upsert(spark, b1, d, ["k"])
    b2 = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k long, v string"
    )
    merge_upsert(spark, b2, d, ["k"])
    got = {(r.k, r.v) for r in spark.read.parquet(d).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # re-applying the same batch is a no-op (idempotence)
    merge_upsert(spark, b2, d, ["k"])
    got2 = {(r.k, r.v) for r in spark.read.parquet(d).collect()}
    assert got2 == got


def test_ddl_catalog_surface(spark, sf_dir):
    """Reference CreateTest.scala DDL surface: views, DESCRIBE, SHOW,
    EXPLAIN, temp function registration."""
    register_views(spark, sf_dir, "nation", "region")
    assert {"nation", "region"} <= {
        t.name for t in spark.catalog.listTables()
    }
    # CREATE [TEMPORARY] VIEW via SQL (CreateTest.scala:502)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW big_nations AS "
              "SELECT * FROM nation WHERE n_nationkey > 10")
    assert spark.table("big_nations").count() > 0
    # DESCRIBE (CreateTest.scala:926-948)
    cols = {r.col_name for r in spark.sql("DESCRIBE nation").collect()}
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols
    # EXPLAIN (CreateTest.scala:952-997)
    plan = spark.sql("EXPLAIN SELECT count(*) FROM nation").collect()[0][0]
    assert "Aggregate" in plan or "Scan" in plan
    # CREATE FUNCTION (CreateTest.scala:619-621) -> spark.udf.register
    spark.udf.register("hash_name", lambda s: s.upper())
    got = spark.sql("SELECT hash_name(n_name) AS h FROM nation LIMIT 1").collect()
    assert got[0].h.isupper()
    # SHOW TABLES / SHOW FUNCTIONS (CreateTest.scala:1000-1055)
    shown = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert "big_nations" in shown


def test_accumulator_observe(spark, sf_dir):
    """Reference accumulators (RideTest.scala:378-429) -> observe()."""
    from pyspark.sql import Observation

    obs = Observation("metrics")
    orders = load_table(spark, sf_dir, "orders").observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total")
    )
    n = orders.count()
    assert obs.get["n"] == n
    assert obs.get["total"] > 0


def test_ddl_databases_and_alter(spark, sf_dir):
    """Reference CREATE DATABASE (CreateTest.scala:480), USE/SHOW
    (1000-1055), ALTER TABLE RENAME/SET (650-690)."""
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS eng_scratch")
    assert "eng_scratch" in {
        r.namespace for r in spark.sql("SHOW DATABASES").collect()
    }
    orders = load_table(spark, sf_dir, "orders").limit(100)
    spark.sql("DROP TABLE IF EXISTS eng_scratch.t_orders")
    spark.sql("DROP TABLE IF EXISTS eng_scratch.t_orders_renamed")
    # stale locations from interrupted prior sessions block re-creation
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders", "t_orders_renamed"):
        shutil.rmtree(f"{warehouse}/eng_scratch.db/{t}", ignore_errors=True)
    orders.write.mode("overwrite").saveAsTable("eng_scratch.t_orders")
    # ALTER TABLE ... SET TBLPROPERTIES + RENAME TO
    spark.sql("ALTER TABLE eng_scratch.t_orders SET TBLPROPERTIES ('team'='engine')")
    props = spark.sql("SHOW TBLPROPERTIES eng_scratch.t_orders").collect()
    assert any(r.key == "team" and r.value == "engine" for r in props)
    spark.sql("ALTER TABLE eng_scratch.t_orders RENAME TO eng_scratch.t_orders_renamed")
    tables = {r.tableName for r in spark.sql("SHOW TABLES IN eng_scratch").collect()}
    assert "t_orders_renamed" in tables and "t_orders" not in tables
    assert spark.table("eng_scratch.t_orders_renamed").count() == 100
    spark.sql("DROP TABLE eng_scratch.t_orders_renamed")
    spark.sql("DROP DATABASE eng_scratch")


def test_ddl_create_table_like(spark, sf_dir):
    """Reference CREATE TABLE ... LIKE (CreateTest.scala:337-418):
    clone a table's schema without its data; the reference's derived
    computed-column variant (sensor3/sensor4) maps to a view over the
    clone, since Spark DDL has no generated columns."""
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS eng_like")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("sensor1", "sensor2", "sensor3"):
        spark.sql(f"DROP TABLE IF EXISTS eng_like.{t}")
        shutil.rmtree(f"{warehouse}/eng_like.db/{t}", ignore_errors=True)
    spark.sql(
        "CREATE TABLE eng_like.sensor1 (id STRING, tmstp BIGINT, amount INT) "
        "USING parquet"
    )
    spark.sql("INSERT INTO eng_like.sensor1 VALUES ('a', 1700000000, 5)")
    # bare LIKE: schema clone, no rows (CreateTest sensor2)
    spark.sql("CREATE TABLE eng_like.sensor2 LIKE eng_like.sensor1")
    assert (
        spark.table("eng_like.sensor2").schema
        == spark.table("eng_like.sensor1").schema
    )
    assert spark.table("eng_like.sensor2").count() == 0
    # derived computed column (CreateTest sensor3 `rowtime AS
    # to_timestamp(from_unixtime(tmstp))`) -> view over the clone
    spark.sql(
        "CREATE OR REPLACE VIEW eng_like.sensor3 AS "
        "SELECT *, to_timestamp(from_unixtime(tmstp)) AS rowtime "
        "FROM eng_like.sensor1"
    )
    row = spark.table("eng_like.sensor3").collect()[0]
    assert row.rowtime is not None and row.amount == 5
    # ALTER TABLE ADD COLUMNS on the clone (schema evolution surface)
    spark.sql("ALTER TABLE eng_like.sensor2 ADD COLUMNS (site STRING)")
    assert "site" in spark.table("eng_like.sensor2").columns
    spark.sql("DROP VIEW eng_like.sensor3")
    spark.sql("DROP TABLE eng_like.sensor2")
    spark.sql("DROP TABLE eng_like.sensor1")
    spark.sql("DROP DATABASE eng_like")


def test_ddl_show_create_table_roundtrip(spark, sf_dir):
    """SHOW CREATE TABLE emits DDL that recreates an equivalent table
    (CreateTest.scala catalog surface)."""
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS eng_sct")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("src", "clone"):
        spark.sql(f"DROP TABLE IF EXISTS eng_sct.{t}")
        shutil.rmtree(f"{warehouse}/eng_sct.db/{t}", ignore_errors=True)
    spark.sql(
        "CREATE TABLE eng_sct.src (k BIGINT, v STRING) USING parquet"
    )
    ddl = spark.sql("SHOW CREATE TABLE eng_sct.src").collect()[0][0]
    assert "CREATE TABLE" in ddl and "k BIGINT" in ddl
    spark.sql(ddl.replace("eng_sct.src", "eng_sct.clone", 1))
    assert (
        spark.table("eng_sct.clone").schema == spark.table("eng_sct.src").schema
    )
    spark.sql("DROP TABLE eng_sct.clone")
    spark.sql("DROP TABLE eng_sct.src")
    spark.sql("DROP DATABASE eng_sct")


def test_http_bulk_sink_indexes_from_executors(spark, sf_dir):
    """Bulk-HTTP indexing against a live localhost endpoint: every
    nation row arrives as an NDJSON bulk action pair, idempotently
    keyed — the Elasticsearch transport pattern without the service."""
    import http.server
    import json
    import threading

    from flink_demo_spark.sinks import http_bulk_sink

    received: list[bytes] = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(self.rfile.read(n))
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"errors":false}')

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        nations = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        sink = http_bulk_sink(
            f"http://127.0.0.1:{srv.server_address[1]}",
            index="nations",
            id_col="n_nationkey",
            batch_size=10,
        )
        sink(nations, 0)
        lines = b"".join(received).decode().strip().splitlines()
        actions = [json.loads(x) for x in lines[0::2]]
        docs = [json.loads(x) for x in lines[1::2]]
        assert len(docs) == 25
        assert {a["index"]["_index"] for a in actions} == {"nations"}
        assert sorted(int(a["index"]["_id"]) for a in actions) == list(range(25))
        assert {d["n_name"] for d in docs} == {
            r.n_name for r in nations.collect()
        }
    finally:
        srv.shutdown()


def test_redis_hset_sink_speaks_resp(spark, sf_dir):
    """RESP-over-socket HSET publishing (Sink.scala:63-92 RedisSink
    HSET): a live localhost server parses the wire protocol; every
    per-type count lands exactly once under its field."""
    import socket
    import threading

    from flink_demo_spark.sinks import redis_hset_sink

    store: dict[tuple[str, str], str] = {}
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)

    def parse_loop(conn):
        buf = b""
        while True:
            try:
                chunk = conn.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while True:
                if not buf.startswith(b"*"):
                    break
                try:
                    head, rest = buf.split(b"\r\n", 1)
                    argc = int(head[1:])
                    args = []
                    for _ in range(argc):
                        ln, rest = rest.split(b"\r\n", 1)
                        size = int(ln[1:])
                        args.append(rest[:size].decode())
                        rest = rest[size + 2 :]
                except (ValueError, IndexError):
                    break  # incomplete command: wait for more bytes
                buf = rest
                assert args[0] == "HSET"
                store[(args[1], args[2])] = args[3]
                conn.sendall(b":1\r\n")
        conn.close()

    def accept_loop():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=parse_loop, args=(conn,), daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()
    try:
        counts = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .count()
        )
        sink = redis_hset_sink(
            "127.0.0.1", srv.getsockname()[1], "uv", "event_type", "count"
        )
        sink(counts, 0)
        sink(counts, 1)  # replay must be idempotent (HSET overwrites)
        expected = {
            ("uv", r.event_type): str(r["count"]) for r in counts.collect()
        }
        assert store == expected
    finally:
        srv.close()


def test_http_bulk_sink_raises_on_item_errors(spark, sf_dir):
    """ES answers HTTP 200 with per-item errors — the sink must fail
    the micro-batch instead of silently losing writes (ADVICE r3)."""
    import http.server
    import threading

    import pytest

    from flink_demo_spark.sinks import http_bulk_sink

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(
                b'{"errors":true,"items":[{"index":{"_id":"0","error":'
                b'{"type":"mapper_parsing_exception"}}}]}'
            )

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        nations = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        sink = http_bulk_sink(
            f"http://127.0.0.1:{srv.server_address[1]}",
            index="nations",
            id_col="n_nationkey",
        )
        with pytest.raises(Exception, match="failed item"):
            sink(nations, 0)
    finally:
        srv.shutdown()


def test_redis_hset_sink_raises_on_err_reply(spark, sf_dir):
    """A -ERR RESP reply must fail the batch, not count as success
    (ADVICE r3)."""
    import socket
    import threading

    import pytest

    from flink_demo_spark.sinks import redis_hset_sink

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)

    def reject_loop():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return

            def serve(c):
                while True:
                    try:
                        chunk = c.recv(65536)
                    except OSError:
                        break
                    if not chunk:
                        break
                    # one -ERR per command seen (commands start with *4)
                    for _ in range(chunk.count(b"*4\r\n")):
                        c.sendall(b"-ERR wrong number of arguments\r\n")
                c.close()

            threading.Thread(target=serve, args=(conn,), daemon=True).start()

    threading.Thread(target=reject_loop, daemon=True).start()
    try:
        counts = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .count()
        )
        sink = redis_hset_sink(
            "127.0.0.1", srv.getsockname()[1], "uv", "event_type", "count"
        )
        with pytest.raises(Exception, match="rejected"):
            sink(counts, 0)
    finally:
        srv.close()


def test_orc_partitioned_round_trip(spark, sf_dir):
    """ORC storage round-trip with dynamic partitions (reference
    CreateTest.scala:743-837 hiveInsert: fs_table stored as ORC,
    PARTITIONED BY dt/h): write ORC partitioned by day, read it back
    byte-exact, and verify partition pruning reaches the scan."""
    import shutil

    d = tempfile.mkdtemp() + "/orders_orc"
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM").alias("dt"),
        )
        orders.write.partitionBy("dt").orc(d)
        back = spark.read.orc(d)
        assert back.count() == orders.count()
        # value parity on an aggregate (ORC preserves types/values)
        a = orders.agg(
            F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        b = back.agg(
            F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        assert abs(a.s - b.s) < 1e-6 and a.n == b.n
        # partition pruning: a dt filter must prune directories, not
        # scan all partitions
        one = back.where(F.col("dt") == "1995-01")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(dt" in plan, plan
        assert one.count() > 0
    finally:
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)


def test_catalog_orc_table_partitioned_insert(spark):
    """Persistent-catalog ORC table with partition metadata ops
    (CreateTest.scala:743-837: CREATE EXTERNAL TABLE ... PARTITIONED
    BY ... STORED AS ORC + partitioned INSERT; :461-476 hiveCatalog
    metadata operations): CREATE TABLE USING ORC, partitioned INSERT,
    SHOW PARTITIONS, per-partition reads, DROP PARTITION."""
    import shutil

    d = tempfile.mkdtemp() + "/fs_table"
    spark.sql("DROP TABLE IF EXISTS fs_table")
    try:
        spark.sql(
            f"""CREATE TABLE fs_table (
                  user_id STRING,
                  order_amount BIGINT
                ) USING ORC
                PARTITIONED BY (dt STRING, h STRING)
                LOCATION '{d}'"""
        )
        spark.sql(
            "INSERT INTO fs_table PARTITION (dt='2021-05-11', h='10') "
            "VALUES ('u1', 10), ('u2', 20)"
        )
        spark.sql(
            "INSERT INTO fs_table PARTITION (dt='2021-05-11', h='11') "
            "VALUES ('u3', 30)"
        )
        # dynamic partition insert (the reference's DATE_FORMAT path)
        spark.sql(
            "INSERT INTO fs_table PARTITION (dt, h) "
            "VALUES ('u4', 40, '2021-05-12', '09')"
        )
        parts = {r.partition for r in spark.sql(
            "SHOW PARTITIONS fs_table").collect()}
        assert parts == {
            "dt=2021-05-11/h=10",
            "dt=2021-05-11/h=11",
            "dt=2021-05-12/h=09",
        }, parts
        got = spark.sql(
            "SELECT sum(order_amount) AS s FROM fs_table "
            "WHERE dt = '2021-05-11'"
        ).collect()[0].s
        assert got == 60
        # the files on disk really are ORC
        back = spark.read.orc(d)
        assert back.count() == 4
        # partition metadata op (hiveCatalog's 新建分区/改表 surface)
        spark.sql(
            "ALTER TABLE fs_table DROP PARTITION (dt='2021-05-11', h='11')"
        )
        assert spark.table("fs_table").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS fs_table")
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)


# ---------------------------------------------------------------------------
# TwoPhaseCommitSink (Flink TwoPhaseCommitSinkFunction /
# FlinkKafkaProducer EXACTLY_ONCE; ClickEventCount.java:114,
# StateBackendDemo.scala:23)
# ---------------------------------------------------------------------------


def _committed_rows(spark, root):
    from flink_demo_spark.sinks import read_committed

    return sorted(
        (r.k, r.v) for r in read_committed(spark, root).collect()
    )


def test_two_phase_commit_exactly_once_under_replay(spark):
    """A replayed micro-batch (same batchId — Spark's checkpointed-source
    contract) must not duplicate rows: replay-after-commit is skipped
    via the ledger, replay-after-partial-staging overwrites staging."""
    import tempfile

    from flink_demo_spark.sinks import TwoPhaseCommitSink

    root = tempfile.mkdtemp(prefix="sink_2pc_")
    sink = TwoPhaseCommitSink(root)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b1 = spark.createDataFrame([(3, "c")], "k long, v string")
    sink(b0, 0)
    sink(b1, 1)
    sink(b0, 0)  # replay after commit: must be a no-op
    assert _committed_rows(spark, root) == [(1, "a"), (2, "b"), (3, "c")]

    # replay after a crash mid-pre-commit: half-staged epoch overwritten
    sink.precommit(b1, 2)  # staged but never committed (crash)
    sink2 = TwoPhaseCommitSink(root)  # restarted job
    sink2(b1, 2)  # engine replays batch 2
    assert _committed_rows(spark, root) == [
        (1, "a"), (2, "b"), (3, "c"), (3, "c"),
    ]


def test_two_phase_commit_isolation_and_recovery(spark):
    """Readers never see staged (uncommitted) epochs; recoverAndCommit
    re-commits durably pre-committed epochs and aborts torn ones —
    Flink's recoverAndCommit/abort split."""
    import os
    import tempfile

    from flink_demo_spark.sinks import TwoPhaseCommitSink

    root = tempfile.mkdtemp(prefix="sink_2pc_rec_")
    sink = TwoPhaseCommitSink(root)
    b0 = spark.createDataFrame([(1, "a")], "k long, v string")
    b1 = spark.createDataFrame([(2, "b")], "k long, v string")
    sink(b0, 0)
    # epoch 1: durably pre-committed (has _SUCCESS), crash before commit
    sink.precommit(b1, 1)
    # epoch 2: torn staging (no _SUCCESS marker)
    torn = os.path.join(root, "staging", "epoch=2")
    os.makedirs(torn)
    open(os.path.join(torn, "part-00000.parquet"), "w").close()

    # isolation: only epoch 0 is visible before recovery
    assert _committed_rows(spark, root) == [(1, "a")]

    out = TwoPhaseCommitSink(root).recover_and_commit()
    assert out == {"committed": [1], "aborted": [2]}
    assert _committed_rows(spark, root) == [(1, "a"), (2, "b")]
    assert not os.path.exists(torn)
    # recovery is idempotent
    assert TwoPhaseCommitSink(root).recover_and_commit() == {
        "committed": [], "aborted": [],
    }


def test_two_phase_commit_streaming_end_to_end(spark, sf_dir):
    """Streaming file source -> foreachBatch(TwoPhaseCommitSink) over
    MULTIPLE epochs (maxFilesPerTrigger=1), then a restart from the
    same checkpoint after more input arrives: committed output equals
    the input exactly once, already-committed epochs are skipped via
    the ledger, and the restart continues from the next batchId."""
    import os
    import tempfile

    from flink_demo_spark.catalog import load_table
    from flink_demo_spark.sinks import TwoPhaseCommitSink, read_committed

    nation = load_table(spark, sf_dir, "nation")
    src = tempfile.mkdtemp(prefix="sink_2pc_src_")
    nation.repartition(3).write.mode("overwrite").parquet(src)
    root = tempfile.mkdtemp(prefix="sink_2pc_e2e_")
    ck = tempfile.mkdtemp(prefix="sink_2pc_ck_")

    def run_once():
        stream = (
            spark.readStream.schema(nation.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(TwoPhaseCommitSink(root))
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    epochs = {
        d for d in os.listdir(os.path.join(root, "committed"))
        if d.startswith("epoch=")
    }
    assert len(epochs) >= 3  # one epoch per input file
    got = read_committed(spark, root)
    assert sorted(r.n_nationkey for r in got.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )

    # new input lands; a restarted job (same checkpoint) must process
    # ONLY the new file and leave prior epochs untouched
    extra = nation.limit(2).withColumn(
        "n_nationkey", F.col("n_nationkey") + 1000
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = read_committed(spark, root)
    assert got2.count() == nation.count() + 2
    assert sorted(r.n_nationkey for r in got2.collect()) == sorted(
        [r.n_nationkey for r in nation.collect()]
        + [r.n_nationkey + 1000 for r in nation.limit(2).collect()]
    )


def test_compact_partition_small_files(spark):
    """Streaming appends leave many small files; compaction rewrites
    them into fewer files atomically, preserves rows exactly and the
    _SUCCESS commit marker, and re-running is a no-op."""
    import tempfile

    from flink_demo_spark.sinks import compact_partition

    root = tempfile.mkdtemp(prefix="sink_compact_")
    pdir = os.path.join(root, "dt=0")
    for batch in range(6):  # 6 micro-batch appends -> >= 6 files
        spark.createDataFrame(
            [(batch * 10 + i, f"v{batch}_{i}") for i in range(5)],
            "k long, v string",
        ).coalesce(1).write.mode("append").parquet(pdir)
    open(os.path.join(pdir, "_SUCCESS"), "w").close()
    before = spark.read.parquet(pdir).collect()
    n_before = len(
        [f for f in os.listdir(pdir) if not f.startswith(("_", "."))]
    )
    assert n_before >= 6

    out = compact_partition(spark, root, "dt=0", target_bytes=1 << 30)
    assert out["files_before"] == n_before and out["files_after"] == 1
    assert os.path.exists(os.path.join(pdir, "_SUCCESS"))
    after = spark.read.parquet(pdir).collect()
    assert sorted(r.k for r in after) == sorted(r.k for r in before)
    # idempotent: nothing left to compact
    again = compact_partition(spark, root, "dt=0", target_bytes=1 << 30)
    assert again["files_after"] == again["files_before"] == 1


def test_two_phase_commit_crash_between_rename_and_ledger(spark):
    """A crash AFTER the epoch rename but BEFORE the ledger marker must
    not wedge recovery: the replayed batch re-stages, and commit()
    finishes the interrupted second half (marker write) instead of
    renaming onto the already-published dir and crash-looping."""
    import os
    import tempfile

    from flink_demo_spark.sinks import TwoPhaseCommitSink

    root = tempfile.mkdtemp(prefix="sink_2pc_torn_")
    sink = TwoPhaseCommitSink(root)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    # simulate the torn commit: stage + rename done, ledger marker missing
    sink.precommit(b0, 0)
    os.rename(
        os.path.join(root, "staging", "epoch=0"),
        os.path.join(root, "committed", "epoch=0"),
    )
    assert not sink.is_committed(0)

    # engine replays batch 0 into a restarted sink
    sink2 = TwoPhaseCommitSink(root)
    sink2(b0, 0)
    assert sink2.is_committed(0)
    assert _committed_rows(spark, root) == [(1, "a"), (2, "b")]
    assert not os.path.exists(os.path.join(root, "staging", "epoch=0"))
    # and a second replay is the usual ledger-skip no-op
    sink2(b0, 0)
    assert _committed_rows(spark, root) == [(1, "a"), (2, "b")]


def test_two_phase_commit_incomplete_dst_replaced_by_staged(spark):
    """A committed/epoch=N dir WITHOUT _SUCCESS (torn copy, manual
    restore gone wrong) is NOT trusted as the published epoch: the
    staged replay replaces it instead of being silently discarded."""
    import os
    import shutil
    import tempfile

    from flink_demo_spark.sinks import TwoPhaseCommitSink

    root = tempfile.mkdtemp(prefix="sink_2pc_torn_dst_")
    sink = TwoPhaseCommitSink(root)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink.precommit(b0, 0)
    # simulate a torn dst: copy staged files but strip _SUCCESS
    src = os.path.join(root, "staging", "epoch=0")
    dst = os.path.join(root, "committed", "epoch=0")
    shutil.copytree(src, dst)
    os.remove(os.path.join(dst, "_SUCCESS"))
    # also drop one data file so trusting dst would lose rows
    for f in os.listdir(dst):
        if f.endswith(".parquet"):
            os.remove(os.path.join(dst, f))
            break

    sink.commit(0)
    assert sink.is_committed(0)
    assert os.path.exists(os.path.join(dst, "_SUCCESS"))
    assert _committed_rows(spark, root) == [(1, "a"), (2, "b")]


def test_compact_partition_flip_is_atomic_and_crash_safe(spark):
    """The compaction flip must never expose a mixed old+new file set:
    the replacement dir is exchanged in, and a crash-leftover staging
    sibling is invisible to partitioned reads (dot-prefixed)."""
    import tempfile

    from flink_demo_spark.sinks import _exchange_dirs, compact_partition

    root = tempfile.mkdtemp(prefix="sink_compact_atomic_")
    pdir = os.path.join(root, "dt=1")
    for batch in range(4):
        spark.createDataFrame(
            [(batch * 10 + i, "x") for i in range(4)], "k long, v string"
        ).coalesce(1).write.mode("append").parquet(pdir)
    open(os.path.join(pdir, "_SUCCESS"), "w").close()
    before = sorted(r.k for r in spark.read.parquet(pdir).collect())

    # crash leftovers from a hypothetical earlier attempt must be
    # ignored by partition discovery and cleaned up by the next run
    stale = os.path.join(root, ".dt=1.compact_staging")
    os.makedirs(stale)
    open(os.path.join(stale, "junk.parquet"), "w").close()
    assert [r[0] for r in spark.read.parquet(root).select("dt").distinct().collect()] == [1]

    out = compact_partition(spark, root, "dt=1", target_bytes=1 << 30)
    assert out["files_after"] == 1
    assert sorted(r.k for r in spark.read.parquet(pdir).collect()) == before
    assert os.path.exists(os.path.join(pdir, "_SUCCESS"))
    # no stale siblings survive a successful compaction
    assert not os.path.exists(stale)
    assert not os.path.exists(os.path.join(root, ".dt=1.compact_retired"))

    # the atomic primitive itself: RENAME_EXCHANGE swaps both dirs
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    os.makedirs(a), os.makedirs(b)
    open(os.path.join(a, "fa"), "w").close()
    open(os.path.join(b, "fb"), "w").close()
    if _exchange_dirs(a, b):
        assert os.path.exists(os.path.join(a, "fb"))
        assert os.path.exists(os.path.join(b, "fa"))
