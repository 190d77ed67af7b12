"""Changelog (retract-stream) emulation.

Reference: ``toRetractStream`` — a continuously-updated table emitted
as +I / -U / +U / -D change rows (``TableSQLFunc.scala:817-859``,
rollup changelog ``QueryTest.scala:393-425``). Structured Streaming's
update mode re-emits new values but never retractions; this module
reconstructs the full changelog by diffing each complete-mode
micro-batch snapshot against the previous materialized state inside
``foreachBatch``:

- key only in new snapshot            -> +I
- key in both, value changed          -> -U (old) then +U (new)
- key only in old state               -> -D

The diff is a single full-outer join per micro-batch, keyed like the
aggregation itself — the same cost class as the upsert sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def changelog_sink(
    spark: SparkSession,
    target_path: str,
    changelog_path: str,
    key_cols: list[str],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fn for a COMPLETE-mode aggregation: maintains the
    materialized table at ``target_path`` and appends change rows
    (op in +I/-U/+U/-D, with batch_id) to ``changelog_path``."""

    def process(new_df: DataFrame, batch_id: int) -> None:
        new_df = new_df.localCheckpoint(eager=True)
        val_cols = [c for c in new_df.columns if c not in key_cols]
        from pyspark.errors import AnalysisException

        try:
            old = spark.read.parquet(target_path)
        except AnalysisException:  # first batch: target not created yet
            old = None
        # other errors propagate — a transient read failure must not be
        # mistaken for "first batch" (would relabel everything +I)

        if old is None:
            changes = new_df.select(
                F.lit("+I").alias("op"), F.lit(batch_id).alias("batch_id"), "*"
            )
        else:
            n = new_df.select(
                *key_cols,
                F.lit(True).alias("__in_n"),
                *[F.col(c).alias(f"__n_{c}") for c in val_cols],
            )
            o = old.select(
                *key_cols,
                F.lit(True).alias("__in_o"),
                *[F.col(c).alias(f"__o_{c}") for c in val_cols],
            )
            j = n.join(o, key_cols, "full_outer")
            in_new = F.col("__in_n").isNotNull()
            in_old = F.col("__in_o").isNotNull()
            changed = F.lit(False)
            for c in val_cols:
                changed = changed | (
                    ~F.col(f"__n_{c}").eqNullSafe(F.col(f"__o_{c}"))
                )
            inserts = j.where(in_new & ~in_old).select(
                F.lit("+I").alias("op"), F.lit(batch_id).alias("batch_id"),
                *key_cols, *[F.col(f"__n_{c}").alias(c) for c in val_cols],
            )
            deletes = j.where(in_old & ~in_new).select(
                F.lit("-D").alias("op"), F.lit(batch_id).alias("batch_id"),
                *key_cols, *[F.col(f"__o_{c}").alias(c) for c in val_cols],
            )
            upd = j.where(in_new & in_old & changed)
            retracts = upd.select(
                F.lit("-U").alias("op"), F.lit(batch_id).alias("batch_id"),
                *key_cols, *[F.col(f"__o_{c}").alias(c) for c in val_cols],
            )
            updates = upd.select(
                F.lit("+U").alias("op"), F.lit(batch_id).alias("batch_id"),
                *key_cols, *[F.col(f"__n_{c}").alias(c) for c in val_cols],
            )
            changes = inserts.unionByName(retracts).unionByName(
                updates
            ).unionByName(deletes)

        changes.localCheckpoint(eager=True).write.mode("append").parquet(
            changelog_path
        )
        new_df.write.mode("overwrite").parquet(target_path)

    return process
