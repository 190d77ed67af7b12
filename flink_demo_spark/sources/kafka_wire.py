"""Kafka WIRE-PROTOCOL producer/consumer — no client library, no jar.

The reference's Kafka apps (``Source.scala:116-155`` JSON consumer,
``Sink.scala`` / ``HotItems.scala:181`` producer) are the one surface
this container cannot run through ``spark-sql-kafka`` (no jar, no
broker). Like the Redis (RESP) and Elasticsearch (bulk-HTTP) sinks,
this module closes the gap at the protocol level: executors speak the
public Kafka binary protocol (api v0: Metadata/Produce/Fetch, magic-0
message sets, CRC-checked) directly over sockets, end-to-end-tested
against an in-process broker implementing the same public spec
(tests/kafka_broker.py).

Scale/fidelity notes:

- NON-NULL keyed records route with Kafka's DEFAULT partitioner
  (positive murmur2 of the key bytes mod partition count), so a
  migrating app's per-key ordering contract is preserved bit-for-bit.
  Null-keyed records are rotated across partitions per batch (the
  spirit of Kafka's sticky/round-robin null-key behaviour — Kafka
  itself makes no placement promise for null keys).
- The producer is a ``foreachBatch`` sink: executors process Arrow
  batches — murmur2 partitioning and message-set assembly are numpy
  batch operations (no per-row Python in the produce loop; the
  per-message CRC32 the protocol frame mandates is a C call per
  record over a preassembled buffer) — and each executor partition
  opens one connection per leader and sends one ProduceRequest
  covering the topic partitions its rows hash to; a non-zero error
  code raises, failing the micro-batch so replay (with idempotent
  downstream keys) retries.
- The consumer maps one Spark task per Kafka partition (the same
  parallelism contract as the real connector) and emits the connector's
  fixed schema (key/value binary + topic/partition/offset metadata,
  CreateTest.scala:141-160 METADATA VIRTUAL columns), so
  ``decode_events_from_kafka`` runs unchanged on its output.
- On a real cluster, prefer the maintained connector (see
  MIGRATING.md); this module is the proof that nothing in the engine
  depends on it.
"""

from __future__ import annotations

import socket
import struct
import zlib
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession

API_PRODUCE, API_FETCH, API_LIST_OFFSETS, API_METADATA = 0, 1, 2, 3

# fetch_range doubles max_bytes while a pinned range makes no progress
# (next record bigger than the fetch size); past this cap it raises
# record-too-large instead — mirroring the real client's behaviour
MAX_FETCH_BYTES = 1 << 28


# ---------------------------------------------------------------------------
# primitive codec (Kafka protocol guide, api version 0)
# ---------------------------------------------------------------------------


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self.take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self.take(n).decode()

    def nbytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self.take(n)


def murmur2(data: bytes) -> int:
    """Kafka's 32-bit murmur2 (seed 0x9747b28c) — the default
    partitioner hashes key bytes with this exact function."""
    m, r = 0x5BD1E995, 24
    mask = 0xFFFFFFFF
    h = (0x9747B28C ^ len(data)) & mask
    n4 = len(data) & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = (h * m) & mask
        h ^= k
    left = len(data) & 3
    if left >= 3:
        h ^= data[n4 + 2] << 16
    if left >= 2:
        h ^= data[n4 + 1] << 8
    if left >= 1:
        h ^= data[n4]
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h


def partition_for_key(key: bytes, num_partitions: int) -> int:
    """toPositive(murmur2(key)) % n — Kafka's default partitioner."""
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


def murmur2_batch(keys: list[bytes]):
    """Vectorized :func:`murmur2` over a batch of keys: one padded
    (n × words) uint32 matrix, the word-mix loop runs over WORD
    POSITIONS (≤ longest-key/4 numpy passes over all keys at once),
    not over keys. Bit-identical to the scalar function (asserted
    against the Java vectors in tests/test_kafka_contract.py)."""
    import numpy as np

    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    m = np.uint64(0x5BD1E995)
    mask = np.uint64(0xFFFFFFFF)
    lens = np.fromiter((len(k) for k in keys), dtype=np.int64, count=n)
    maxw = max(1, int(-(-lens.max() // 4)))
    padded = b"".join(k.ljust(maxw * 4, b"\0") for k in keys)
    bytemat = np.frombuffer(padded, dtype=np.uint8).reshape(n, maxw * 4)
    words = bytemat.view("<u4").reshape(n, maxw).astype(np.uint64)
    h = (np.uint64(0x9747B28C) ^ lens.astype(np.uint64)) & mask
    nwords = lens // 4  # full 4-byte words per key
    for j in range(int(nwords.max())):
        act = nwords > j
        k = words[act, j]
        k = (k * m) & mask
        k ^= k >> np.uint64(24)
        k = (k * m) & mask
        h[act] = (((h[act] * m) & mask) ^ k) & mask
    left = lens & 3
    n4 = (lens & ~3).astype(np.int64)
    idx = np.arange(n)
    for tail_ge, shift in ((3, 16), (2, 8)):
        sel = left >= tail_ge
        if sel.any():
            b = bytemat[idx[sel], n4[sel] + (tail_ge - 1)].astype(np.uint64)
            h[sel] ^= b << np.uint64(shift)
    sel = left >= 1
    if sel.any():
        h[sel] ^= bytemat[idx[sel], n4[sel]].astype(np.uint64)
        h[sel] = (h[sel] * m) & mask
    h ^= h >> np.uint64(13)
    h = (h * m) & mask
    h ^= h >> np.uint64(15)
    return h.astype(np.uint32)


def _message(key: bytes | None, value: bytes | None) -> bytes:
    """One magic-0 message: crc32 over magic..value."""
    body = struct.pack(">bb", 0, 0) + _bytes(key) + _bytes(value)
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def encode_message_set(msgs: list[tuple[bytes | None, bytes | None]]) -> bytes:
    """Batch-assemble a magic-0 message set: numpy scatter writes every
    fixed field and ragged payload into one preallocated buffer — no
    per-message Python packing. The per-message CRC32 the frame format
    mandates is a zlib C call over a slice of the assembled buffer."""
    import numpy as np

    n = len(msgs)
    if n == 0:
        return b""
    if n < 8:  # scalar path cheaper than numpy setup for tiny sets
        return b"".join(
            struct.pack(">qi", 0, len(m)) + m
            for m in (_message(k, v) for k, v in msgs)
        )
    keys = [k for k, _ in msgs]
    vals = [v for _, v in msgs]
    klenp = np.fromiter(
        (0 if k is None else len(k) for k in keys), dtype=np.int64, count=n
    )
    vlenp = np.fromiter(
        (0 if v is None else len(v) for v in vals), dtype=np.int64, count=n
    )
    klenf = np.where(
        np.fromiter((k is None for k in keys), dtype=bool, count=n), -1, klenp
    ).astype(np.int64)
    vlenf = np.where(
        np.fromiter((v is None for v in vals), dtype=bool, count=n), -1, vlenp
    ).astype(np.int64)
    # record = offset(8) size(4) | crc(4) magic(1) attrs(1) klen(4) key vlen(4) val
    body_len = 10 + klenp + vlenp  # magic..value, the CRC'd span is crc-less body
    rec_len = 12 + 4 + body_len
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(rec_len[:-1], out=starts[1:])
    buf = np.zeros(int(rec_len.sum()), dtype=np.uint8)

    def scatter_be32(pos: "np.ndarray", val: "np.ndarray") -> None:
        v = val.astype(np.int64) & 0xFFFFFFFF
        buf[pos] = (v >> 24) & 0xFF
        buf[pos + 1] = (v >> 16) & 0xFF
        buf[pos + 2] = (v >> 8) & 0xFF
        buf[pos + 3] = v & 0xFF

    def scatter_ragged(pos: "np.ndarray", lens: "np.ndarray", payload: bytes) -> None:
        if not payload:
            return
        rep_start = np.repeat(pos, lens)
        seg0 = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=seg0[1:])
        intra = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(seg0, lens)
        buf[rep_start + intra] = np.frombuffer(payload, dtype=np.uint8)

    scatter_be32(starts + 8, 4 + body_len)  # size field (crc..value)
    # magic/attrs at starts+16/17 are already zero
    scatter_be32(starts + 18, klenf)
    scatter_ragged(starts + 22, klenp, b"".join(k for k in keys if k))
    scatter_be32(starts + 22 + klenp, vlenf)
    scatter_ragged(starts + 26 + klenp, vlenp, b"".join(v for v in vals if v))
    mv = memoryview(buf)
    crc32 = zlib.crc32
    body_pos = starts + 16
    crcs = np.fromiter(
        (
            crc32(mv[int(p) : int(p) + int(ln)])
            for p, ln in zip(body_pos, body_len)
        ),
        dtype=np.uint32,
        count=n,
    )
    scatter_be32(starts + 12, crcs)
    return buf.tobytes()


def decode_message_set(buf: bytes) -> list[tuple[int, bytes | None, bytes | None]]:
    """[(offset, key, value)] — trailing partial message (allowed by
    the fetch contract) is dropped; CRC is verified. A flat header
    walk with precompiled structs and zero-copy memoryview slices
    (CRC verify is one zlib C call per message) — no per-field
    reader-object overhead in the fetch hot path."""
    hdr = struct.Struct(">qi").unpack_from  # offset, size
    be32 = struct.Struct(">i").unpack_from
    beU32 = struct.Struct(">I").unpack_from
    crc32 = zlib.crc32
    mv = memoryview(buf)
    n = len(buf)
    pos = 0
    out: list[tuple[int, bytes | None, bytes | None]] = []
    while n - pos >= 12:
        offset, size = hdr(buf, pos)
        if n - pos - 12 < size:
            break
        (crc,) = beU32(buf, pos + 12)
        body = mv[pos + 16 : pos + 12 + size]
        if crc32(body) & 0xFFFFFFFF != crc:
            raise IOError(f"message CRC mismatch at offset {offset}")
        (klen,) = be32(buf, pos + 18)  # skip magic+attrs
        p = pos + 22
        key = None if klen < 0 else bytes(mv[p : p + klen])
        p += max(klen, 0)
        (vlen,) = be32(buf, p)
        p += 4
        value = None if vlen < 0 else bytes(mv[p : p + vlen])
        out.append((offset, key, value))
        pos += 12 + size
    return out


# ---------------------------------------------------------------------------
# request/response exchange
# ---------------------------------------------------------------------------


def _exchange(sock: socket.socket, api_key: int, body: bytes, corr: int) -> _Reader:
    header = struct.pack(">hhi", api_key, 0, corr) + _str("flink-demo-spark")
    payload = header + body
    sock.sendall(struct.pack(">i", len(payload)) + payload)
    raw = b""
    while len(raw) < 4:
        chunk = sock.recv(4 - len(raw))
        if not chunk:
            raise IOError("broker closed connection")
        raw += chunk
    (size,) = struct.unpack(">i", raw)
    buf = b""
    while len(buf) < size:
        chunk = sock.recv(size - len(buf))
        if not chunk:
            raise IOError("broker closed mid-response")
        buf += chunk
    r = _Reader(buf)
    got_corr = r.i32()
    if got_corr != corr:
        raise IOError(f"correlation id mismatch: {got_corr} != {corr}")
    return r


def fetch_metadata(
    bootstrap: tuple[str, int], topic: str
) -> list[tuple[int, str, int]]:
    """[(partition_id, leader_host, leader_port)] via MetadataRequest v0."""
    with socket.create_connection(bootstrap, timeout=30) as sock:
        body = struct.pack(">i", 1) + _str(topic)
        r = _exchange(sock, API_METADATA, body, corr=1)
        brokers = {}
        for _ in range(r.i32()):
            node = r.i32()
            host = r.string()
            port = r.i32()
            brokers[node] = (host, port)
        parts: list[tuple[int, str, int]] = []
        seen_topic = False
        for _ in range(r.i32()):
            err = r.i16()
            name = r.string()
            if err:
                raise IOError(f"metadata error {err} for topic {name}")
            is_ours = name == topic
            seen_topic = seen_topic or is_ours
            for _ in range(r.i32()):
                perr = r.i16()
                pid = r.i32()
                leader = r.i32()
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                if not is_ours:
                    continue  # broker may return extra topics; skip them
                if perr:
                    raise IOError(f"partition {pid} error {perr}")
                host, port = brokers[leader]
                parts.append((pid, host, port))
        if not seen_topic:
            raise IOError(f"topic {topic!r} absent from metadata response")
        return sorted(parts)


def produce(
    addr: tuple[str, int],
    topic: str,
    by_partition: dict[int, list[tuple[bytes | None, bytes | None]]],
) -> None:
    """One ProduceRequest (acks=-1) covering the given partitions;
    raises on any per-partition error code."""
    with socket.create_connection(addr, timeout=30) as sock:
        parts = b"".join(
            struct.pack(">i", pid) + _bytes(encode_message_set(msgs))
            for pid, msgs in sorted(by_partition.items())
        )
        body = (
            struct.pack(">hi", -1, 30000)
            + struct.pack(">i", 1)
            + _str(topic)
            + struct.pack(">i", len(by_partition))
            + parts
        )
        r = _exchange(sock, API_PRODUCE, body, corr=2)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                r.i64()  # base offset
                if err:
                    raise IOError(f"produce error {err} on partition {pid}")


def list_offset(addr: tuple[str, int], topic: str, pid: int, time: int = -1) -> int:
    """ListOffsets v0: time=-1 -> log-end (high watermark), -2 ->
    earliest."""
    with socket.create_connection(addr, timeout=30) as sock:
        body = (
            struct.pack(">i", -1)
            + struct.pack(">i", 1)
            + _str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", pid, time, 1)
        )
        r = _exchange(sock, API_LIST_OFFSETS, body, corr=3)
        offset = 0
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                rp = r.i32()
                err = r.i16()
                if err:
                    raise IOError(f"list-offsets error {err} on partition {rp}")
                for _ in range(r.i32()):
                    offset = r.i64()
        return offset


def fetch_range(
    addr: tuple[str, int],
    topic: str,
    pid: int,
    start: int = 0,
    end: int | None = None,
    max_bytes: int = 1 << 20,
) -> list[tuple[int, bytes | None, bytes | None]]:
    """Fetch partition ``pid`` offsets [start, end) (end=None -> high
    watermark at fetch time)."""
    out: list[tuple[int, bytes | None, bytes | None]] = []
    offset = start
    with socket.create_connection(addr, timeout=30) as sock:
        corr = 100
        while end is None or offset < end:
            body = (
                struct.pack(">iii", -1, 0, 0)
                + struct.pack(">i", 1)
                + _str(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", pid, offset, max_bytes)
            )
            corr += 1
            r = _exchange(sock, API_FETCH, body, corr)
            hw = 0
            got: list[tuple[int, bytes | None, bytes | None]] = []
            for _ in range(r.i32()):
                r.string()
                for _ in range(r.i32()):
                    rp = r.i32()
                    err = r.i16()
                    hw = r.i64()
                    mset = r.take(r.i32())
                    if err:
                        raise IOError(f"fetch error {err} on partition {rp}")
                    got.extend(decode_message_set(mset))
            lim = hw if end is None else min(end, hw)
            out.extend(m for m in got if offset <= m[0] < lim)
            if not got:
                if offset < lim:
                    # a pinned [start, end) range with no progress means
                    # the next message exceeds max_bytes (the broker sent
                    # only a partial message and decode dropped it) —
                    # retry bigger rather than silently committing
                    # offsets whose records were never delivered
                    if max_bytes >= MAX_FETCH_BYTES:
                        raise IOError(
                            f"record at offset {offset} larger than "
                            f"{max_bytes} bytes (record-too-large)"
                        )
                    max_bytes *= 2
                    continue
                break
            if out and out[-1][0] + 1 >= lim:
                break
            offset = got[-1][0] + 1
    return out


def fetch_all(
    addr: tuple[str, int], topic: str, pid: int, max_bytes: int = 1 << 20
) -> list[tuple[int, bytes | None, bytes | None]]:
    """Fetch partition ``pid`` from offset 0 to the high watermark."""
    return fetch_range(addr, topic, pid, 0, None, max_bytes)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def kafka_wire_sink(bootstrap: tuple[str, int], topic: str):
    """``foreachBatch`` producer: expects (key binary|string, value
    binary|string) columns. Executors consume ARROW BATCHES: partition
    routing is one :func:`murmur2_batch` numpy pass (bit-identical to
    the default partitioner for non-null keys; null keys rotate across
    partitions — Kafka promises no placement for them), message sets
    are batch-assembled by :func:`encode_message_set`, and each
    executor partition sends one CRC'd ProduceRequest per leader."""

    def send(batch_df: DataFrame, batch_id: int) -> None:
        parts = fetch_metadata(bootstrap, topic)
        n = len(parts)
        leaders = {pid: (host, port) for pid, host, port in parts}

        def send_batches(batches):
            import os

            import numpy as np
            import pandas as pd

            # null-key rotation offset carried ACROSS Arrow batches:
            # restarting at partition 0 per pdf skews many-small-batch
            # workloads toward low-numbered partitions. Seed per task
            # so concurrent tasks don't all start at 0 either.
            null_rr = os.getpid() % n
            for pdf in batches:
                cnt = len(pdf)
                if cnt == 0:
                    continue
                keys = [
                    k.encode()
                    if isinstance(k, str)
                    else (None if k is None else bytes(k))
                    for k in pdf["key"]
                ]
                vals = [
                    v.encode()
                    if isinstance(v, str)
                    else (None if v is None else bytes(v))
                    for v in pdf["value"]
                ]
                nonnull = np.fromiter(
                    (k is not None for k in keys), dtype=bool, count=cnt
                )
                pids = np.zeros(cnt, dtype=np.int64)
                if nonnull.any():
                    hashed = murmur2_batch([k for k in keys if k is not None])
                    pids[nonnull] = (hashed.astype(np.int64) & 0x7FFFFFFF) % n
                n_null = cnt - int(nonnull.sum())
                if n_null:
                    pids[~nonnull] = (
                        np.arange(null_rr, null_rr + n_null, dtype=np.int64)
                        % n
                    )
                    null_rr = (null_rr + n_null) % n
                by_leader: dict[tuple[str, int], dict[int, list]] = defaultdict(dict)
                for pid in np.unique(pids):
                    sel = np.flatnonzero(pids == pid)
                    by_leader[leaders[int(pid)]][int(pid)] = [
                        (keys[i], vals[i]) for i in sel
                    ]
                for addr, by_pid in by_leader.items():
                    produce(addr, topic, by_pid)
                yield pd.DataFrame({"sent": [cnt]})

        batch_df.select("key", "value").mapInPandas(
            send_batches, "sent long"
        ).collect()

    return send


def kafka_wire_read(
    spark: SparkSession, bootstrap: tuple[str, int], topic: str
) -> DataFrame:
    """Bounded read of a whole topic: ONE SPARK TASK PER KAFKA
    PARTITION (the real connector's parallelism contract), emitting the
    connector's fixed schema so downstream decoders run unchanged.
    timestamp is null / timestampType -1: magic-0 message sets predate
    create-time stamps."""
    import pandas as pd

    parts = fetch_metadata(bootstrap, topic)
    n = len(parts)
    pdf = spark.createDataFrame(
        [(pid, host, port) for pid, host, port in parts],
        "pid int, host string, port int",
    ).repartition(n, "pid")

    def read_partition(batches):
        for b in batches:
            for _, row in b.iterrows():
                msgs = fetch_all((row.host, int(row.port)), topic, int(row.pid))
                yield pd.DataFrame(
                    {
                        "key": [k for _, k, _ in msgs],
                        "value": [v for _, _, v in msgs],
                        "topic": [topic] * len(msgs),
                        "partition": [int(row.pid)] * len(msgs),
                        "offset": [o for o, _, _ in msgs],
                        "timestamp": [pd.NaT] * len(msgs),
                        "timestampType": [-1] * len(msgs),
                    }
                )

    return pdf.mapInPandas(
        read_partition,
        "key binary, value binary, topic string, partition int, "
        "offset bigint, timestamp timestamp, timestampType int",
    )


# ---------------------------------------------------------------------------
# Python Data Source (Spark 4): spark.read/.readStream.format("kafka_wire")
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on Spark version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _PartitionRange(InputPartition):
        def __init__(self, pid: int, host: str, port: int, start: int, end: int):
            self.pid, self.host, self.port = pid, host, port
            self.start, self.end = start, end

    class KafkaWireBatchReader(DataSourceReader):
        def __init__(self, options) -> None:
            self._topic = options["topic"]
            host, port = options["bootstrap"].split(":")
            self._parts = fetch_metadata((host, int(port)), self._topic)

        def partitions(self):
            return [
                _PartitionRange(
                    pid, host, port, 0, list_offset((host, port), self._topic, pid)
                )
                for pid, host, port in self._parts
            ]

        def read(self, p: "_PartitionRange"):
            for off, k, v in fetch_range(
                (p.host, p.port), self._topic, p.pid, p.start, p.end
            ):
                yield (k, v, self._topic, p.pid, off, None, -1)

    class KafkaWireStreamReader(DataSourceStreamReader):
        """Micro-batch reader with per-partition offset ranges: the
        engine checkpoints the {partition: next_offset} dict, so
        restart resumes exactly where the last committed batch ended —
        the same offsets-in-WAL contract as the real Kafka source."""

        def __init__(self, options) -> None:
            self._topic = options["topic"]
            host, port = options["bootstrap"].split(":")
            self._bootstrap = (host, int(port))
            self._parts = fetch_metadata(self._bootstrap, self._topic)
            starting = options.get("startingoffsets", "earliest")
            self._from_latest = starting == "latest"

        def initialOffset(self) -> dict:
            time = -1 if self._from_latest else -2
            return {
                str(pid): list_offset((host, port), self._topic, pid, time)
                for pid, host, port in self._parts
            }

        def latestOffset(self) -> dict:
            return {
                str(pid): list_offset((host, port), self._topic, pid, -1)
                for pid, host, port in self._parts
            }

        def partitions(self, start: dict, end: dict):
            return [
                _PartitionRange(
                    pid, host, port, int(start[str(pid)]), int(end[str(pid)])
                )
                for pid, host, port in self._parts
                if int(start[str(pid)]) < int(end[str(pid)])
            ]

        def read(self, p: "_PartitionRange"):
            for off, k, v in fetch_range(
                (p.host, p.port), self._topic, p.pid, p.start, p.end
            ):
                yield (k, v, self._topic, p.pid, off, None, -1)

        def commit(self, end: dict) -> None:
            pass  # broker-side consumer groups are out of scope

    class KafkaWireDataSource(DataSource):
        """``spark.read/.readStream.format("kafka_wire")`` — a real
        Kafka reader over the wire protocol with no jar, emitting the
        jar connector's exact schema. Options: ``bootstrap``
        ("host:port"), ``topic``, ``startingOffsets``
        (earliest|latest, streaming only)."""

        @classmethod
        def name(cls) -> str:
            return "kafka_wire"

        def schema(self) -> str:
            return (
                "key binary, value binary, topic string, partition int, "
                "offset bigint, timestamp timestamp, timestampType int"
            )

        def reader(self, schema):
            return KafkaWireBatchReader(self.options)

        def streamReader(self, schema):
            return KafkaWireStreamReader(self.options)

    def register_kafka_wire(spark: SparkSession) -> None:
        """Register the format for this session."""
        spark.dataSource.register(KafkaWireDataSource)

except ImportError:  # Spark < 4: the foreachBatch/mapInPandas paths above remain
    register_kafka_wire = None  # type: ignore[assignment]
