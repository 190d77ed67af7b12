"""Structured Streaming queries registered in the correctness gate.

Each runs a real streaming pipeline (file-replay source -> watermark
-> windowed agg / stream-stream join -> memory sink, availableNow
trigger) and returns the bounded result; the DuckDB oracle is the
same SQL as the batch twin — asserting the reference's
batch/stream-unification property (``ExecuteMode.scala:41-72``: same
query, two runtime modes, same result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.streams import events_stream
from ..streaming.runner import run_available_now
from ..streaming.windows import interval_join_stream, tumbling_agg
from .registry import query


@query(
    "streaming_window_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*)             AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc=(
        "streaming TUMBLE agg (readStream -> withWatermark -> window -> "
        "memory sink, availableNow): must equal the batch/oracle result."
    ),
)
def streaming_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir, watermark="10 minutes")
    result = run_available_now(tumbling_agg(ev), output_mode="complete")
    return result.orderBy("window_start", "event_type")


@query(
    "streaming_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTES
     AND c.ts <= p.ts
    ORDER BY purchase_id, click_id
    """,
    doc=(
        "stream-stream interval join with watermarks on both sides "
        "(reference TxMatch.scala:51-76): equals the batch interval join."
    ),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = events_stream(spark, sf_dir, watermark="10 minutes").where(
        F.col("event_type") == "purchase"
    )
    clicks = events_stream(spark, sf_dir, watermark="10 minutes").where(
        F.col("event_type") == "click"
    )
    joined = interval_join_stream(purchases, clicks)
    result = run_available_now(joined, output_mode="append")
    return result.orderBy("purchase_id", "click_id")
