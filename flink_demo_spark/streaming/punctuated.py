"""Punctuated (per-event) watermark emulation (SURVEY.md §2.11).

Reference: ``MyPunctuatedWatermark.scala:11-30`` emits a watermark of
``maxTs - delay`` on EVERY event (vs the periodic generator's timer),
feeding a tumbling window (``WatermarkDemo.scala:183-199``). Spark's
engine watermark only advances at micro-batch boundaries, so the two
observable differences of punctuated generation cannot be expressed
with ``withWatermark``:

1. a window fires as soon as any event pushes the watermark past its
   end — not at the next batch boundary;
2. an out-of-order event is judged against the watermark advanced by
   earlier events OF THE SAME BATCH, so it can be dropped as late even
   though Spark's native semantics (batch-boundary watermark) would
   accept it.

This operator replicates both inside ``applyInPandasWithState``: the
per-key state carries the running ``max_ts`` and the open window
buckets; every event first faces the current per-event watermark
(late -> dropped), then advances it, then closes every window whose
end falls at or below the new watermark. Events are processed in
arrival order (``seq_col``), which is what "punctuated" means —
ordering by event time would erase the semantics being modeled.

State is bounded by the number of open windows per key (window span /
window size), the same bound Flink's window state has.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("window_start_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("max_ts_ms", LongType()),
        StructField("win_starts", ArrayType(LongType())),
        StructField("win_counts", ArrayType(LongType())),
    ]
)


def punctuated_tumbling_count(
    events: DataFrame,
    window_ms: int,
    delay_ms: int,
    key_col: str = "key",
    ts_col: str = "ts_ms",
    seq_col: str = "seq",
) -> DataFrame:
    """Tumbling count windows driven by a per-event watermark of
    ``max_ts - delay`` (reference MyPunctuatedWatermark). Emits
    (key, window_start_ms, n_events) the moment the per-event
    watermark passes a window's end."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            max_ts, starts, counts = state.get
            windows = dict(zip(starts or [], counts or []))
        else:
            max_ts, windows = None, {}
        rows = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple[int, int, int]] = []
        if rows:
            # Vectorized scan replacing the per-event loop; identical
            # semantics because (a) the drop decision for event i uses
            # the watermark advanced by events 0..i-1 of the same batch
            # — a seeded prefix running max — and (b) a window that
            # fires mid-batch can never receive a later batch event
            # (the monotone watermark would drop it), so firing every
            # closable window once at batch end yields the same counts.
            import numpy as np

            batch = pd.concat(rows, ignore_index=True).sort_values(seq_col)
            ts = batch[ts_col].to_numpy().astype("int64")
            no_seed = np.iinfo(np.int64).min
            seed = max_ts if max_ts is not None else no_seed
            # prev_max[i] = max(state seed, ts[0..i-1]) — the watermark
            # each event is judged against (arrival order, punctuated)
            prev_max = np.maximum.accumulate(np.concatenate(([seed], ts)))[:-1]
            starts = (ts // window_ms) * window_ms
            # Flink's window operator drops an element only when its
            # WINDOW END has passed the watermark (the window already
            # fired), not when the element's own ts is behind it —
            # an event landing in a still-open window is counted
            # (WatermarkDemo.scala:183-199, ADVICE r3 medium)
            keep = (prev_max == no_seed) | (
                starts + window_ms > prev_max - delay_ms
            )
            uniq, cnts = np.unique(starts[keep], return_counts=True)
            for s, c in zip(uniq.tolist(), cnts.tolist()):
                windows[s] = windows.get(s, 0) + c
            batch_max = int(ts.max())
            if max_ts is None or batch_max > max_ts:
                max_ts = batch_max
            new_wm = max_ts - delay_ms
            for s in sorted(list(windows)):
                if s + window_ms <= new_wm:
                    out.append((key[0], s, windows.pop(s)))
        state.update(
            (
                max_ts,
                sorted(windows),
                [windows[s] for s in sorted(windows)],
            )
        )
        yield pd.DataFrame(
            out, columns=["key", "window_start_ms", "n_events"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
