"""Dynamic-config streams: the broadcast-state pattern.

Reference: broadcast state updating the filtering of a main stream
(``tutorial/.../State.scala:91-119``,
``v-1.12.2/.../BroadcastProcessFuncApp.scala:8-38``): a low-rate
config stream is broadcast to all tasks and changes how the keyed
main stream is processed, without restarting the job.

Spark has no broadcast-state API; the idiomatic equivalent is a
``foreachBatch`` sink that re-reads the config table at every
micro-batch and broadcast-joins it against the batch. Config changes
take effect on the next trigger — the same freshness contract as the
reference's JDBC lookup cache TTL (``QueryTest.scala:822-824``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def config_filtered_sink(
    spark: SparkSession,
    config_path: str,
    key: str,
    sink: Callable[[DataFrame, int], None],
    how: str = "left_semi",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: re-read config at each batch, broadcast
    semi-join (allowlist) or anti-join (blocklist) the batch, sink it."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cfg = spark.read.parquet(config_path)  # fresh snapshot per batch
        filtered = batch_df.join(F.broadcast(cfg), key, how)
        sink(filtered, batch_id)

    return process
