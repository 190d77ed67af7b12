"""In-process single-node Kafka broker (protocol api v0).

Implements the PUBLIC Kafka binary protocol — Metadata / Produce /
Fetch / ListOffsets v0 with CRC-checked magic-0 message sets — so the
wire client in ``kafka_wire.py`` runs true end-to-end from Spark
executors with no jar and no external service, the same pattern as
the live RESP server (Redis sink test) and bulk-HTTP endpoint
(Elasticsearch sink test). Ships in the package (not the test tree)
because the driver-checked ``kafka_roundtrip_window`` query spins one
up per session; single-node, in-memory, leads every partition.
"""

from __future__ import annotations

import socket
import struct
import threading

from .kafka_wire import (
    API_FETCH,
    API_LIST_OFFSETS,
    API_METADATA,
    API_PRODUCE,
    _Reader,
    _bytes,
    _str,
    decode_message_set,
    encode_message_set,
)


class _PartLog:
    """One partition's log as offset-stamped CONTIGUOUS wire bytes
    plus the cumulative end position of each message.

    Offsets are message indexes, stamped once at append time (the
    base offset is known then), so a fetch at (offset, max_bytes) is
    a single byte-slice ``data[ends[offset-1] : +max_bytes]`` —
    byte-identical to packing messages one by one and truncating,
    because consecutive messages are adjacent in ``data``. The
    previous per-entry layout re-enumerated the WHOLE partition list
    and re-packed every message on EVERY fetch, which the client's
    1 MiB paging turned into O(log_size) work per page."""

    __slots__ = ("data", "ends")

    def __init__(self) -> None:
        self.data = bytearray()
        self.ends: list[int] = []

    def __len__(self) -> int:
        return len(self.ends)


class KafkaTestBroker:
    def __init__(self, num_partitions: int = 3) -> None:
        self.num_partitions = num_partitions
        # topic -> pid -> _PartLog (stamped contiguous wire bytes)
        self.log: dict[str, dict[int, _PartLog]] = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(64)
        self.host, self.port = self._srv.getsockname()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # -- lifecycle -----------------------------------------------------
    def close(self) -> None:
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass

    def __enter__(self) -> "KafkaTestBroker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- server loop ---------------------------------------------------
    def _serve(self) -> None:
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            while True:
                raw = self._recv(conn, 4)
                if raw is None:
                    return
                (size,) = struct.unpack(">i", raw)
                payload = self._recv(conn, size)
                if payload is None:
                    return
                r = _Reader(payload)
                api_key = r.i16()
                r.i16()  # api_version (v0 only)
                corr = r.i32()
                r.string()  # client id
                if api_key == API_METADATA:
                    body = self._metadata(r)
                elif api_key == API_PRODUCE:
                    body = self._produce(r)
                elif api_key == API_FETCH:
                    body = self._fetch(r)
                elif api_key == API_LIST_OFFSETS:
                    body = self._list_offsets(r)
                else:
                    return  # unknown api: drop the connection
                resp = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except OSError:
            pass
        finally:
            conn.close()

    @staticmethod
    def _recv(conn: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    # -- api handlers --------------------------------------------------
    def _ensure(self, topic: str) -> dict[int, _PartLog]:
        with self._lock:
            return self.log.setdefault(
                topic, {p: _PartLog() for p in range(self.num_partitions)}
            )

    def _metadata(self, r: _Reader) -> bytes:
        topics = [r.string() for _ in range(r.i32())]
        out = struct.pack(">i", 1)  # brokers
        out += struct.pack(">i", 0) + _str(self.host) + struct.pack(">i", self.port)
        out += struct.pack(">i", len(topics))
        for t in topics:
            self._ensure(t)
            out += struct.pack(">h", 0) + _str(t)
            out += struct.pack(">i", self.num_partitions)
            for pid in range(self.num_partitions):
                out += struct.pack(">hiii", 0, pid, 0, 1)  # err,pid,leader,#rep
                out += struct.pack(">i", 0)  # replica node 0
                out += struct.pack(">i", 1) + struct.pack(">i", 0)  # isr
        return out

    def _produce(self, r: _Reader) -> bytes:
        r.i16()  # acks
        r.i32()  # timeout
        out_topics = []
        for _ in range(r.i32()):
            topic = r.string()
            plog = self._ensure(topic)
            presps = []
            for _ in range(r.i32()):
                pid = r.i32()
                mset = r.take(r.i32())
                msgs = decode_message_set(mset)  # CRC-verifies
                # re-encode ONCE at append time (outside the lock);
                # the offset stamp is written under the lock where the
                # base offset is known — fetches then never touch a
                # per-message object again
                tails = [
                    encode_message_set([(k, v)])[8:] for _, k, v in msgs
                ]
                with self._lock:
                    pl = plog[pid]
                    base = len(pl.ends)
                    for i, tail in enumerate(tails):
                        pl.data += struct.pack(">q", base + i) + tail
                        pl.ends.append(len(pl.data))
                presps.append(struct.pack(">ihq", pid, 0, base))
            out_topics.append(
                _str(topic) + struct.pack(">i", len(presps)) + b"".join(presps)
            )
        return struct.pack(">i", len(out_topics)) + b"".join(out_topics)

    def _list_offsets(self, r: _Reader) -> bytes:
        r.i32()  # replica id
        out_topics = []
        for _ in range(r.i32()):
            topic = r.string()
            plog = self._ensure(topic)
            presps = []
            for _ in range(r.i32()):
                pid = r.i32()
                time = r.i64()
                r.i32()  # max offsets
                with self._lock:
                    off = 0 if time == -2 else len(plog[pid])
                presps.append(
                    struct.pack(">ih", pid, 0)
                    + struct.pack(">i", 1)
                    + struct.pack(">q", off)
                )
            out_topics.append(
                _str(topic) + struct.pack(">i", len(presps)) + b"".join(presps)
            )
        return struct.pack(">i", len(out_topics)) + b"".join(out_topics)

    def _fetch(self, r: _Reader) -> bytes:
        r.i32()  # replica id
        r.i32()  # max wait
        r.i32()  # min bytes
        out_topics = []
        for _ in range(r.i32()):
            topic = r.string()
            plog = self._ensure(topic)
            presps = []
            for _ in range(r.i32()):
                pid = r.i32()
                offset = r.i64()
                max_bytes = r.i32()
                # real v0 contract: return AT MOST max_bytes of log —
                # the cut may land mid-message (the client drops the
                # trailing partial and, for a pinned range, retries
                # with a doubled max_bytes; see fetch_range). Messages
                # are stamped and contiguous in pl.data, so this is
                # one O(max_bytes) slice regardless of log length.
                with self._lock:
                    pl = plog[pid]
                    hw = len(pl.ends)
                    if 0 <= offset < hw:
                        start = pl.ends[offset - 1] if offset else 0
                        mset = bytes(pl.data[start : start + max_bytes])
                    else:
                        mset = b""
                presps.append(
                    struct.pack(">ihq", pid, 0, hw) + _bytes(mset)
                )
            out_topics.append(
                _str(topic) + struct.pack(">i", len(presps)) + b"".join(presps)
            )
        return struct.pack(">i", len(out_topics)) + b"".join(out_topics)
