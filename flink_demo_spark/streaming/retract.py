"""Retract-stream (changelog) emission — Flink's ``toRetractStream``.

Reference: dynamic tables emit +I / -U / +U change rows when a
continuous aggregate updates (``toRetractStream`` — SURVEY.md §3;
reference usage ``TableSQLFunc.scala`` retract conversions). Spark's
update output mode re-emits the NEW row only; this operator emits the
full retract algebra from keyed state so a downstream consumer that
can't overwrite by key (e.g. an append-only log, a cache keeping
per-key deltas) can apply -old/+new pairs exactly like a Flink
retract sink.

Per key and micro-batch: the first emission is ``+I new``; every
subsequent change emits ``-U old`` then ``+U new``. ``change_seq`` is
a per-key monotone sequence so consumers (and the fold oracle) can
replay the log in order. The changelog CONTENT depends on micro-batch
boundaries (more batches -> more intermediate -U/+U pairs) — that is
inherent to changelogs — but its FOLD (the latest row per key) is
split-invariant and equals the batch aggregate, which is what the
oracle-backed query checks end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

CHANGELOG_SCHEMA = (
    "key long, change string, change_seq long, cnt long, sum_cents long"
)

_STATE = StructType(
    [
        StructField("cnt", LongType()),
        StructField("sum_cents", LongType()),
        StructField("seq", LongType()),
    ]
)


def retract_agg_stream(
    events: DataFrame,
    key_col: str = "user_id",
    cents_col: str = "cents",
) -> DataFrame:
    """Keyed count+sum aggregate as a retract changelog stream.

    ``cents_col`` must be an exact integer representation of the
    value (e.g. ``(CAST(value AS DECIMAL(18,4)) * 10000)::long`` — the
    repo's dsum determinism contract), so state arithmetic is
    order-independent and engine-exact."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cnt, sum_cents, seq = state.get if state.exists else (0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if len(batch):
            add_cnt = int(len(batch))
            add_cents = int(batch[cents_col].astype("int64").sum())
            if cnt:
                out.append((key[0], "-U", seq + 1, cnt, sum_cents))
                out.append(
                    (key[0], "+U", seq + 2, cnt + add_cnt, sum_cents + add_cents)
                )
                seq += 2
            else:
                out.append((key[0], "+I", seq + 1, add_cnt, add_cents))
                seq += 1
            cnt += add_cnt
            sum_cents += add_cents
        state.update((cnt, sum_cents, seq))
        yield pd.DataFrame(
            out, columns=["key", "change", "change_seq", "cnt", "sum_cents"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=CHANGELOG_SCHEMA,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_changelog(log: DataFrame, scale: int = 10_000) -> DataFrame:
    """Apply the retract algebra: the latest surviving row per key
    (every -U is immediately superseded by its +U; a fold that TRUSTS
    the algebra simply keeps the max change_seq insert/update row).

    ``sum_cents`` is a fixed-point integer in units of 1/``scale`` —
    the default matches the repo's dsum contract of
    ``(value::decimal(18,4) * 10000)::long`` (1e-4 units, despite the
    "cents" shorthand in the column name); pass ``scale`` explicitly
    when the changelog was built with a different fixed-point unit."""
    return (
        log.where(F.col("change").isin("+I", "+U"))
        .groupBy("key")
        .agg(
            F.max_by("cnt", "change_seq").alias("cnt"),
            (F.max_by("sum_cents", "change_seq") / float(scale)).alias(
                "sum_value"
            ),
        )
    )
