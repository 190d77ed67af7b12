"""Streaming CEP: consecutive-event pattern detection with keyed state
(SURVEY.md §2.12 streaming form).

The reference's login-fail detector (``LoginFail.scala:78-86``: two
consecutive fails within a horizon, via keyed state + timer or CEP)
as an ``applyInPandasWithState`` operator: per key, the last seen
event is carried in group state so the pattern matches across
micro-batch boundaries when batches arrive in event-time order
(file-replay and ``availableNow`` satisfy this; with out-of-order
batches the watermark-sorted variant in operators/cep.py applies).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_error_id", LongType()),
        StructField("second_error_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_is_match", LongType()),
        StructField("last_id", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def consecutive_pattern_stream(
    events: DataFrame,
    match_type: str = "error",
    horizon_us: int = 30 * 60 * 1_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Emit (key, first_id, second_id) for two strictly consecutive
    ``match_type`` events within ``horizon_us`` per key."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        last_is_match, last_id, last_ts = (
            state.get if state.exists else (0, None, None)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            yield pd.DataFrame(columns=["user_id", "first_error_id", "second_error_id"])
            return
        batch = batch.sort_values([ts_col, id_col])
        out = []
        for _, row in batch.iterrows():
            ts_us = int(pd.Timestamp(row[ts_col]).value // 1_000)
            is_match = 1 if row[type_col] == match_type else 0
            if (
                is_match
                and last_is_match
                and last_ts is not None
                and ts_us - last_ts <= horizon_us
            ):
                out.append((key[0], last_id, int(row[id_col])))
            last_is_match, last_id, last_ts = is_match, int(row[id_col]), ts_us
        state.update((last_is_match, last_id, last_ts))
        yield pd.DataFrame(
            out, columns=["user_id", "first_error_id", "second_error_id"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
