"""Event-time windowed aggregations over streams (SURVEY.md §2.7/2.11).

Tumbling/sliding/session windows with watermarks — the streaming
counterparts of the batch window queries in ``plans/temporal.py``;
batch-vs-stream equivalence is asserted by both pytest and the
driver's DuckDB oracle (same oracle SQL for both forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def interval_join_stream(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Stream-stream interval join (reference TxMatch.scala:51-76,
    QueryTest.scala:1040-1091): clicks within 10 minutes before each
    purchase, per user. Both inputs need watermarks."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")
