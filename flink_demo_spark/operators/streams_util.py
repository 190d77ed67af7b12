"""Stream-shape utilities: side-output splitting and coGroup.

- ``split_stream``: the reference's side outputs (``OutputTag`` +
  ``ctx.output``, SideOutput.scala:21, late-data side output
  WatermarkDemo.scala:254). Spark has no side outputs; the idiomatic
  equivalent is N filtered children of one parent plan. Catalyst
  reuses the scan; at 100 TB each child prunes/pushes its own
  predicate.

- ``cogroup_apply``: the reference's ``coGroup``
  (DataSetFunc.scala:334-477) — per-key pair of row groups processed
  together; Spark's ``groupBy().cogroup().applyInPandas`` is the
  direct mapping (Arrow-batched, one shuffle per side).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType


def split_stream(
    df: DataFrame, outputs: dict[str, Column]
) -> dict[str, DataFrame]:
    """Split one DataFrame into named side outputs by predicate.

    Rows matching several predicates go to each (like multiple
    ``ctx.output`` calls); rows matching none are dropped — add an
    explicit catch-all predicate if a default channel is needed.
    """
    return {name: df.where(pred) for name, pred in outputs.items()}


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """coGroup: apply ``fn(left_rows, right_rows)`` per join key."""
    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(lambda l, r: fn(l, r), schema)
    )
