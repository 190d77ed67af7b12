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


class KafkaTestBroker:
    def __init__(self, num_partitions: int = 3) -> None:
        self.num_partitions = num_partitions
        # topic -> pid -> list[(key, value, wire_tail)]; offsets are
        # list indexes; wire_tail is the message's encoded bytes minus
        # the 8-byte offset, stamped per fetch
        self.log: dict[str, dict[int, list]] = {}
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
    def _ensure(self, topic: str) -> dict[int, list]:
        with self._lock:
            return self.log.setdefault(
                topic, {p: [] for p in range(self.num_partitions)}
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
                # store the re-encoded wire bytes once at append time so
                # fetch responses are offset-stamp + slice, not a CRC
                # re-encode per message per fetch
                entries = [
                    (k, v, encode_message_set([(k, v)])[8:])
                    for _, k, v in msgs
                ]
                with self._lock:
                    base = len(plog[pid])
                    plog[pid].extend(entries)
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
                with self._lock:
                    entries = list(enumerate(plog[pid]))[offset:]
                    hw = len(plog[pid])
                # real v0 contract: return AT MOST max_bytes of log —
                # the cut may land mid-message (the client drops the
                # trailing partial and, for a pinned range, retries
                # with a doubled max_bytes; see fetch_range)
                parts = []
                size = 0
                for off, (_k, _v, tail) in entries:
                    parts.append(struct.pack(">q", off) + tail)
                    size += 8 + len(tail)
                    if size >= max_bytes:
                        break
                mset = b"".join(parts)[:max_bytes]
                presps.append(
                    struct.pack(">ihq", pid, 0, hw) + _bytes(mset)
                )
            out_topics.append(
                _str(topic) + struct.pack(">i", len(presps)) + b"".join(presps)
            )
        return struct.pack(">i", len(out_topics)) + b"".join(out_topics)
