"""Streaming metrics (SURVEY.md §2.11 ops row).

Reference: the flink-prometheus playground exports operator metrics
(events/sec, latency) to Prometheus
(``flink-prometheus/.../MyClickEventCount.java:142-184``). Spark's
counterpart is the StreamingQueryListener: every micro-batch reports
rows/sec, batch duration, and state metrics; this module captures
them as JSON lines (swap the writer for a Prometheus pushgateway or
StatsD client in production — the hook is identical).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Collects per-batch progress; thread-safe snapshot via .events."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._events: list[dict] = []

    @property
    def events(self) -> list[dict]:
        with self._lock:
            return list(self._events)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        rec = {
            "name": p.get("name"),
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows"),
            "input_rows_per_sec": p.get("inputRowsPerSecond"),
            "processed_rows_per_sec": p.get("processedRowsPerSecond"),
            "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        }
        with self._lock:
            self._events.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_progress_collector(spark: SparkSession) -> ProgressCollector:
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    return collector
