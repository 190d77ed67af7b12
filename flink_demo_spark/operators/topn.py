"""Top-N per group.

Reference idiom: ``row_number() over (partition by ... order by ...)
WHERE rk <= n`` (``QueryTest.scala:1180-1207``) and the HotItems
TopN process function (``hot-item/.../app/HotItems.scala:112-118``).

Spark-first: a rank window + filter. Catalyst pushes the ``rk <= n``
filter into the window via ``WindowGroupLimit`` (Spark 3.5+), so each
partition only keeps n rows during the sort — this is what makes the
operator viable at 100 TB (no full materialization of ranked rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: list[str | Column],
    n: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order_by``.

    ``order_by`` must be deterministic (include a unique tiebreaker).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= n)
