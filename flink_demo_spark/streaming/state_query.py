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


def _raw_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int,
    store_name: str | None,
    batch_id: int | None,
) -> DataFrame:
    reader = spark.read.format("statestore")
    reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint_dir)


def keyed_state_schema(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> dict[str, list[tuple[str, str]]]:
    """Introspect the (key, value) field names and types of one
    operator's state store: ``{"key": [(name, type), ...],
    "value": [(name, type), ...]}``.

    Built-in streaming aggregates name their value fields after the
    PHYSICAL agg buffers (e.g. ``count(1)``, ``sum(cents)``) rather
    than the query's aliases — discover them here and rebind by NAME
    via ``read_keyed_state(..., rename=...)`` instead of positionally,
    so a buffer-order change can't silently mislabel columns.
    Schema-only: no state rows are read (driver-side schema walk)."""
    raw = _raw_state(spark, checkpoint_dir, operator_id, store_name, batch_id)
    out: dict[str, list[tuple[str, str]]] = {}
    for part in ("key", "value"):
        dt = raw.schema[part].dataType
        out[part] = [(f.name, f.dataType.simpleString()) for f in dt.fields]
    return out


def read_keyed_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Read one operator's keyed state from a streaming checkpoint,
    flattened to key columns + state columns (the reader's raw shape
    is ``key struct, value struct, partition_id``). ``batch_id``
    selects a historical state version (time travel); default is the
    latest committed batch.

    ``rename`` maps EXISTING flattened column names (discover them
    with :func:`keyed_state_schema`) to user-facing aliases; unknown
    source names or colliding targets raise instead of silently
    mislabeling — prefer this over a positional ``.toDF(...)``
    rebind."""
    raw = _raw_state(spark, checkpoint_dir, operator_id, store_name, batch_id)
    flat = raw.select("key.*", "value.*")
    if rename:
        cols = flat.columns
        missing = sorted(set(rename) - set(cols))
        if missing:
            raise ValueError(
                f"rename refers to state columns that do not exist: "
                f"{missing}; available: {cols} "
                "(introspect with keyed_state_schema())"
            )
        out_names = [rename.get(c, c) for c in cols]
        dupes = sorted({n for n in out_names if out_names.count(n) > 1})
        if dupes:
            raise ValueError(
                f"rename produces duplicate column names: {dupes}"
            )
        flat = flat.select(
            *[flat[c].alias(rename.get(c, c)) for c in cols]
        )
    return flat
