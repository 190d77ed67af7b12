"""Gap-based sessionization (batch form of session windows).

Reference: ``EventTimeSessionWindows.withGap`` and Table API
``Session withGap`` (``Window.scala:124-157``,
``TableDemo.scala:650-895``). Streaming uses Spark's native
``session_window``; this module provides the equivalent batch
operator plus helpers shared by tests/oracles.

Semantics (matching Spark's session_window): an event at ``t``
extends its session to ``[t, t+gap)``; a new session starts when the
time since the previous event of the same key is ``>= gap``.

Scale: one shuffle on the key, per-partition sort, two window
functions — no state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str | Column,
    ts: str,
    gap: str,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session number (1-based, in time order)."""
    w = Window.partitionBy(key).orderBy(ts)
    gap_expr = F.expr(f"INTERVAL {gap}")
    is_new = (
        F.when(F.col(ts) >= F.lag(ts).over(w) + gap_expr, 1)
        .when(F.lag(ts).over(w).isNull(), 1)
        .otherwise(0)
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(w_run)
    ).drop("__new")
