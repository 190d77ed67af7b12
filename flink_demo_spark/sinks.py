"""Sink connectors (SURVEY.md §2.2).

- console/print         -> ``df.show`` / streaming ``format("console")``
- partitioned filesystem (reference CreateTest.scala:310-333, 711-739:
  ``PARTITIONED BY (dt)``, dynamic + static partition insert)
  -> ``write.partitionBy``; static partition = literal column
- memory/test sink       (reference TestSink.java:156-165)
  -> streaming memory sink (see streaming/runner.py)
- multi-insert StatementSet (reference TableSQLFunc.scala:532-573:
  one DAG, shared sub-plan) -> ``foreach_batch_fanout``: persist the
  batch once, write N sinks — the Spark equivalent of Blink's
  cross-sink sub-plan reuse (Catalyst does not reuse across actions)
- JDBC upsert            (reference Sink.scala:145, MysqlSink.scala:12-45:
  ``ON DUPLICATE KEY UPDATE``) -> ``merge_upsert`` over a keyed parquet
  target (same merge semantics; swap the writer for spark.write.jdbc
  against a real database)
- Kafka                  -> thin wrapper (not testable in this container)
- exactly-once 2PC sink  (reference ClickEventCount.java:114 semantic
  option + StateBackendDemo.scala:23 EXACTLY_ONCE checkpointing)
  -> ``TwoPhaseCommitSink``: Flink's TwoPhaseCommitSinkFunction
  lifecycle over staged epoch dirs + an atomic commit ledger
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    static_partitions: dict[str, str] | None = None,
) -> None:
    """Dynamic partitioned write; ``static_partitions`` adds constant
    partition columns (the reference's static partition insert,
    CreateTest.scala:727-739)."""
    for k, v in (static_partitions or {}).items():
        df = df.withColumn(k, F.lit(v))
        partition_cols = [*partition_cols, k]
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def partition_commit_sink(
    path: str,
    partition_col: str,
    ts_col: str,
    partition_duration_ms: int,
    commit_delay_ms: int = 0,
    fmt: str = "orc",
    table: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Streaming filesystem/Hive sink with PARTITION COMMIT (reference
    CreateTest.scala:796-812: ``stored as ORC`` with
    ``sink.partition-commit.trigger='partition-time'``,
    ``sink.partition-commit.delay``, and policy ``metastore`` /
    success-file).

    Returns a ``foreachBatch`` function that appends each micro-batch
    partitioned by ``partition_col`` and then COMMITS every partition
    whose time range has passed the watermark (``max event time seen -
    commit_delay``): a ``_SUCCESS`` marker lands in the partition dir
    (the success-file policy), and when ``table`` is given the
    partition is added to the session catalog with ``ALTER TABLE ..
    ADD PARTITION`` (the metastore policy). Downstream batch readers
    that filter on committed partitions see only complete ones — the
    reference's exactly-once handoff contract.

    ``partition_col`` must hold the epoch-ms start of the partition's
    time range (the reference's partition.time-extractor maps dt/h/m
    strings to the same instant); watermark tracking is driver-side in
    the returned closure, mirroring Flink's per-job commit state.
    Re-delivered batches re-append (at-least-once files) but commits
    are idempotent — readers keyed on _SUCCESS see each partition
    exactly once.
    """
    committed: set[int] = set()
    state = {"max_ts": None}

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            (
                batch_df.write.mode("append")
                .partitionBy(partition_col)
                .format(fmt)
                .save(path)
            )
            mx = batch_df.agg(F.max(ts_col)).collect()[0][0]
        finally:
            batch_df.unpersist()
        if mx is None:
            return
        mx_ms = int(mx) if isinstance(mx, int) else int(mx.timestamp() * 1000)
        if state["max_ts"] is None or mx_ms > state["max_ts"]:
            state["max_ts"] = mx_ms
        wm = state["max_ts"] - commit_delay_ms
        for d in os.listdir(path):
            if not d.startswith(f"{partition_col}="):
                continue
            start = int(d.split("=", 1)[1])
            if start in committed or start + partition_duration_ms > wm:
                continue
            open(os.path.join(path, d, "_SUCCESS"), "w").close()
            if table is not None:
                spark.sql(
                    f"ALTER TABLE {table} ADD IF NOT EXISTS "
                    f"PARTITION ({partition_col}={start}) "
                    f"LOCATION '{os.path.join(path, d)}'"
                )
            committed.add(start)

    return fn


class TwoPhaseCommitSink:
    """Exactly-once two-phase-commit sink: the Spark re-expression of
    Flink's ``TwoPhaseCommitSinkFunction`` (the machinery behind
    ``FlinkKafkaProducer.Semantic.EXACTLY_ONCE``; the reference wires
    the semantic option at ClickEventCount.java:114 and pins
    ``CheckpointingMode.EXACTLY_ONCE`` at StateBackendDemo.scala:23).

    Flink's lifecycle maps onto ``foreachBatch`` epochs:

    - beginTransaction  -> a fresh ``staging/epoch=<batchId>`` dir
    - preCommit         -> write the micro-batch there (durable once
                           the writer drops ``_SUCCESS``)
    - commit            -> atomic ``rename`` into ``committed/`` plus
                           a ledger marker (itself written tmp+rename,
                           so the marker is atomic too)
    - abort             -> delete the staging dir
    - recoverAndCommit  -> on restart, staged epochs WITH ``_SUCCESS``
                           are re-committed (they were durably
                           pre-committed — Flink's recover-and-commit
                           of transactions in a completed checkpoint);
                           incomplete staging dirs are aborted

    Exactly-once holds because Spark replays a failed micro-batch with
    the SAME ``batchId`` and the same data (checkpointed-source
    contract): a replay of an already-committed epoch is skipped via
    the ledger, a replay of a half-staged epoch overwrites the staging
    dir, and readers go through :func:`read_committed`, which only
    ever sees renamed-in (committed) epochs — the isolation half of
    2PC. On a real cluster the rename-based commit assumes an atomic
    rename (HDFS / single-filesystem); on S3-like stores swap the
    commit step for a manifest write, the lifecycle is unchanged.
    """

    def __init__(self, path: str, fmt: str = "parquet") -> None:
        import os

        self.path = path
        self.fmt = fmt
        self._staging = os.path.join(path, "staging")
        self._committed = os.path.join(path, "committed")
        self._ledger = os.path.join(path, "_ledger")
        for d in (self._staging, self._committed, self._ledger):
            os.makedirs(d, exist_ok=True)

    # -- lifecycle ------------------------------------------------------
    def _epoch_dir(self, root: str, batch_id: int) -> str:
        import os

        return os.path.join(root, f"epoch={batch_id}")

    def is_committed(self, batch_id: int) -> bool:
        import os

        return os.path.exists(os.path.join(self._ledger, str(batch_id)))

    def precommit(self, batch_df: DataFrame, batch_id: int) -> None:
        """Stage the batch durably (Flink preCommit): overwrite-mode so
        a replay of a half-staged epoch starts clean."""
        (
            batch_df.write.mode("overwrite")
            .format(self.fmt)
            .save(self._epoch_dir(self._staging, batch_id))
        )

    def commit(self, batch_id: int) -> None:
        """Atomically publish a staged epoch (Flink commit). Idempotent:
        committing an already-committed epoch is a no-op."""
        import os

        if self.is_committed(batch_id):
            return
        src = self._epoch_dir(self._staging, batch_id)
        dst = self._epoch_dir(self._committed, batch_id)
        if os.path.exists(dst):
            # A previous commit() crashed between the rename and the
            # ledger write: the epoch IS published (rename happened),
            # only the marker is missing. Finish the second half — drop
            # any re-staged copy and write the marker — instead of
            # renaming onto a non-empty dir (OSError crash loop).
            # Guard: only trust dst as the published copy if it is a
            # COMPLETE file set (_SUCCESS present). A dst that exists
            # for any other reason (manual restore, torn copy) without
            # _SUCCESS must not silently win over the staged replay.
            import logging
            import shutil

            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                if not os.path.exists(src):
                    raise RuntimeError(
                        f"commit({batch_id}): committed/epoch={batch_id} "
                        "exists but is incomplete (no _SUCCESS) and "
                        "nothing is staged to replace it — manual "
                        "intervention required"
                    )
                shutil.rmtree(dst)
                os.rename(src, dst)
            else:
                logging.getLogger(__name__).warning(
                    "commit(%s): committed/epoch=%s already published "
                    "(_SUCCESS present) — finishing torn commit by "
                    "dropping the re-staged copy and writing the "
                    "ledger marker",
                    batch_id,
                    batch_id,
                )
                shutil.rmtree(src, ignore_errors=True)
        else:
            if not os.path.exists(src):
                raise RuntimeError(f"commit({batch_id}): nothing staged")
            os.rename(src, dst)
        tmp = os.path.join(self._ledger, f".{batch_id}.tmp")
        with open(tmp, "w") as f:
            f.write("committed")
        os.rename(tmp, os.path.join(self._ledger, str(batch_id)))

    def abort(self, batch_id: int) -> None:
        """Drop a staged epoch (Flink abort)."""
        import shutil

        shutil.rmtree(self._epoch_dir(self._staging, batch_id), ignore_errors=True)

    def recover_and_commit(self) -> dict[str, list[int]]:
        """Flink ``recoverAndCommit``: re-commit every durably
        pre-committed epoch (staging dir with ``_SUCCESS``), abort the
        rest. Returns {"committed": [...], "aborted": [...]}."""
        import os

        done: list[int] = []
        dropped: list[int] = []
        for d in sorted(os.listdir(self._staging)):
            if not d.startswith("epoch="):
                continue
            bid = int(d.split("=", 1)[1])
            if os.path.exists(os.path.join(self._staging, d, "_SUCCESS")):
                self.commit(bid)
                done.append(bid)
            else:
                self.abort(bid)
                dropped.append(bid)
        return {"committed": done, "aborted": dropped}

    # -- foreachBatch entry point --------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replay after commit: exactly-once skip
        self.precommit(batch_df, batch_id)
        self.commit(batch_id)


def read_committed(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Read only the committed epochs of a :class:`TwoPhaseCommitSink`
    target — the read-committed isolation half of the 2PC contract
    (staged/aborted data is never visible)."""
    import os

    root = os.path.join(path, "committed")
    dirs = [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("epoch=")
    ]
    if not dirs:
        raise ValueError(f"no committed epochs under {root}")
    return spark.read.format(fmt).load(dirs)


def foreach_batch_fanout(
    sinks: list[Callable[[DataFrame, int], None]],
) -> Callable[[DataFrame, int], None]:
    """StatementSet-style multi-sink: one upstream computation feeds N
    sinks per micro-batch. The batch DF is persisted so the shared
    sub-plan is evaluated once (Blink's `reuse_id` equivalent at the
    application layer)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for sink in sinks:
                sink(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return fn


def merge_upsert(
    spark,
    batch_df: DataFrame,
    target_path: str,
    key_cols: list[str],
) -> None:
    """Idempotent keyed upsert into a parquet target: new rows replace
    existing rows with the same key (JDBC `INSERT ... ON DUPLICATE KEY
    UPDATE` semantics, reference TableSQLFunc.scala:290-316).

    Implementation: anti-join the existing target against the batch
    keys, union the batch, rewrite. With a real warehouse this becomes
    MERGE INTO (Delta/Iceberg) or the JDBC upsert; the semantics and
    the per-batch idempotence contract are identical.
    """
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(target_path)
        keep = existing.join(batch_df.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = keep.unionByName(batch_df)
    except AnalysisException:  # first batch: target does not exist yet
        merged = batch_df
    # any other exception (transient/corrupt read) propagates — treating
    # it as "first batch" would silently overwrite the target
    # localCheckpoint breaks lineage so the rewrite does not read the
    # files it is about to overwrite
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)


def http_bulk_sink(
    url: str,
    index: str,
    id_col: str,
    batch_size: int = 500,
):
    """Elasticsearch-style bulk indexing sink (reference
    Sink.scala Elasticsearch sink): returns a ``foreachBatch``
    function that POSTs NDJSON bulk payloads
    (``{"index": {"_index": ..., "_id": ...}}\\n{doc}``) from EACH
    PARTITION directly to the endpoint — the executors talk to the
    service, the driver never sees the rows, so throughput scales with
    partitions exactly like the es-hadoop connector (which is this
    same bulk-HTTP transport under the hood). Keyed ``_id`` makes
    replays idempotent (at-least-once -> effectively exactly-once on
    the index), the same contract as ``merge_upsert``."""
    def send(batch_df: DataFrame, batch_id: int) -> None:
        cols = batch_df.columns

        def per_partition(rows):
            # imported inside the task: the closure ships to executors
            import json
            import urllib.request

            def flush(lines: list[str]) -> None:
                if not lines:
                    return
                payload = ("\n".join(lines) + "\n").encode()
                req = urllib.request.Request(
                    f"{url.rstrip('/')}/_bulk",
                    data=payload,
                    headers={"Content-Type": "application/x-ndjson"},
                )
                body = urllib.request.urlopen(req, timeout=60).read()
                # Elasticsearch answers HTTP 200 even when individual
                # items failed ("errors": true) — surface them so the
                # micro-batch fails and retries (idempotent _id makes
                # the retry safe); otherwise writes are silently lost
                try:
                    resp = json.loads(body)
                except ValueError:
                    return  # non-ES-shaped endpoint (plain collector)
                if isinstance(resp, dict) and resp.get("errors"):
                    failed = [
                        it["index"]
                        for it in resp.get("items", [])
                        if it.get("index", {}).get("error")
                    ]
                    raise RuntimeError(
                        f"_bulk reported {len(failed)} failed items; "
                        f"first: {failed[:1]}"
                    )

            lines: list[str] = []
            for row in rows:
                d = {c: row[c] for c in cols}
                lines.append(
                    json.dumps(
                        {"index": {"_index": index, "_id": str(d[id_col])}}
                    )
                )
                lines.append(json.dumps(d, default=str))
                if len(lines) >= 2 * batch_size:
                    flush(lines)
                    lines = []
            flush(lines)

        batch_df.foreachPartition(per_partition)

    return send


def redis_hset_sink(
    host: str,
    port: int,
    hash_key: str,
    field_col: str,
    value_col: str,
):
    """Redis HSET sink (reference Sink.scala:63-92: RedisSink with
    ``RedisCommand.HSET``; the UV apps publish per-window uniques the
    same way). Returns a ``foreachBatch`` function whose partitions
    speak the RESP wire protocol directly over a socket — no client
    library needed, executors connect and pipeline HSET commands, and
    keyed fields make replays idempotent (last write wins per field,
    the Redis-native upsert)."""

    def send(batch_df: DataFrame, batch_id: int) -> None:
        cols = (field_col, value_col)

        def per_partition(rows):
            import socket

            def resp(*args: str) -> bytes:
                out = [f"*{len(args)}\r\n".encode()]
                for a in args:
                    b = a.encode()
                    out.append(f"${len(b)}\r\n".encode() + b + b"\r\n")
                return b"".join(out)

            conn = socket.create_connection((host, port), timeout=30)
            try:
                n = 0
                for row in rows:
                    conn.sendall(
                        resp("HSET", hash_key, str(row[cols[0]]), str(row[cols[1]]))
                    )
                    n += 1
                # drain the +OK / :n replies (pipelined); a -ERR reply
                # means the write was rejected — raise so foreachBatch
                # fails and the micro-batch retries (idempotent HSET)
                conn.settimeout(30)
                got = b""
                while got.count(b"\r\n") < n:
                    chunk = conn.recv(65536)
                    if not chunk:
                        break
                    got += chunk
                errs = [
                    line
                    for line in got.split(b"\r\n")
                    if line.startswith(b"-")
                ]
                if errs:
                    raise RuntimeError(
                        f"redis rejected {len(errs)} HSET(s); "
                        f"first: {errs[0].decode(errors='replace')!r}"
                    )
            finally:
                conn.close()

        batch_df.foreachPartition(per_partition)

    return send


def compact_partition(
    spark,
    path: str,
    partition_dir: str,
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction for one committed partition of a
    streaming filesystem sink (the operational follow-up to
    :func:`partition_commit_sink`: per-micro-batch appends leave one
    file per batch×task, and at 100 TB a reader pays an open() per
    tiny file).

    Rewrites the partition's data files into ``ceil(bytes /
    target_bytes)`` files of ~``target_bytes`` each, atomically:
    the compacted files land in a sibling versioned dir, visibility
    flips in ONE ``renameat2(RENAME_EXCHANGE)`` (Linux) so a
    concurrent reader sees either the old file set or the new one,
    never a mix, and the partition's ``_SUCCESS`` marker (commit
    contract) is preserved. Where the kernel/libc lacks
    RENAME_EXCHANGE the flip degrades to two renames with a
    momentary not-found window (never duplicates); a crash at any
    point leaves either the old or the new set complete, and
    re-running compaction converges.

    Returns {"files_before": n, "files_after": m, "bytes": b}.
    """
    import math
    import os
    import shutil

    pdir = os.path.join(path, partition_dir)
    data_files = [
        f
        for f in os.listdir(pdir)
        if not f.startswith(("_", "."))
    ]
    total = sum(os.path.getsize(os.path.join(pdir, f)) for f in data_files)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_out >= len(data_files):
        return {
            "files_before": len(data_files),
            "files_after": len(data_files),
            "bytes": total,
        }
    # dot-prefixed siblings: invisible to Spark's file listing, so a
    # crash that leaves one behind never pollutes a partitioned read
    parent, base = os.path.split(pdir.rstrip("/"))
    staging = os.path.join(parent, f".{base}.compact_staging")
    retired = os.path.join(parent, f".{base}.compact_retired")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(retired, ignore_errors=True)
    (
        spark.read.format(fmt)
        .load(pdir)
        .coalesce(n_out)
        .write.mode("overwrite")
        .format(fmt)
        .save(staging)
    )
    new_files = [
        f for f in os.listdir(staging) if not f.startswith(("_", "."))
    ]
    # carry the commit-contract markers (e.g. _SUCCESS written by
    # partition_commit_sink) into the replacement dir so the flip
    # preserves them even when the compaction write didn't recreate one
    for f in os.listdir(pdir):
        if f.startswith("_") and not os.path.exists(os.path.join(staging, f)):
            shutil.copy2(os.path.join(pdir, f), os.path.join(staging, f))
    if not _exchange_dirs(pdir, staging):
        # no RENAME_EXCHANGE: two renames — readers briefly see
        # not-found, never a mixed/duplicated file set
        os.rename(pdir, retired)
        os.rename(staging, pdir)
        staging = retired
    shutil.rmtree(staging, ignore_errors=True)
    return {
        "files_before": len(data_files),
        "files_after": len(new_files),
        "bytes": total,
    }


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically swap two directories via Linux ``renameat2(...,
    RENAME_EXCHANGE)`` — the single-syscall flip that gives
    :func:`compact_partition` its reader-never-sees-a-mix guarantee.
    Returns False when the libc or filesystem doesn't support it."""
    import ctypes
    import os

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        renameat2 = libc.renameat2
    except (OSError, AttributeError):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    rc = renameat2(
        AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b), RENAME_EXCHANGE
    )
    return rc == 0
