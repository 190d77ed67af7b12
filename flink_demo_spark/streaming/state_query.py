"""Queryable state: offline point-in-time reads of a streaming
query's keyed state.

Flink parity: Flink's queryable state (SURVEY.md §2.11, previously a
documented non-goal) exposes a running job's keyed state to external
lookups. Spark 4's state data source ("statestore" format) provides
the same capability against any checkpoint — every micro-batch
commit is a queryable state version — without a custom RPC server:
state lives in the checkpoint, the reader plans one task per state
partition, and the result is a normal DataFrame you can filter/join
(predicate pushdown included). The delta vs Flink: reads are
per-commit snapshots rather than live point lookups; for serving,
pair with a short trigger interval.

Custom ``applyInPandasWithState`` operators are introspectable too:
their user state schema appears TYPED under ``value.groupState.*``
(see test_queryable_state_inspects_custom_operator — per-key partial
window counts read straight out of the count-window operator's
store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_keyed_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Read one operator's keyed state from a streaming checkpoint,
    flattened to key columns + state columns (the reader's raw shape
    is ``key struct, value struct, partition_id``). ``batch_id``
    selects a historical state version (time travel); default is the
    latest committed batch."""
    reader = spark.read.format("statestore")
    reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    raw = reader.load(checkpoint_dir)
    return raw.select("key.*", "value.*")
