"""allowedLateness window re-fire emulation (SURVEY.md §2.7).

Reference: ``WatermarkDemo.scala:207-299`` (``allowedLateness`` +
``sideOutputForLateness``): a tumbling event-time window fires when
the watermark passes its end, but stays open for ``lateness`` more
watermark-time; every late element within that horizon RE-FIRES the
window with the refined aggregate, and the window closes for good
when ``watermark >= end + lateness``. Spark's native watermark
cannot re-fire a closed append-mode window, so the operator keeps
per-key window state in ``applyInPandasWithState`` (the same shape
as ``streaming/punctuated.py``).

Semantics replicated exactly (validated against the reference's
inline golden trace):

1. an element is DROPPED iff ``window_end + lateness <= watermark``
   at its arrival (Flink's window-operator drop rule with
   allowedLateness; the drop set is what ``sideOutputLateData``
   would tag);
2. a window FIRES the first time the watermark reaches its end
   (only if it holds at least one element), emitting ``fire_no=1``;
3. every late-but-kept element that arrives after the window's
   first fire triggers an immediate RE-FIRE (``fire_no`` 2, 3, ...)
   with the updated count — Flink's per-late-element refinement;
4. an element landing in an already-past window that never fired
   (it was empty when the watermark passed) fires it immediately on
   arrival.

Delta from Flink documented here: the watermark is per-event
(``max_ts - delay`` advanced by every event, the punctuated model)
rather than periodic — under the in-order file replay the driver
uses, both produce the same fire sequence, and the per-event form
is fully oracle-expressible.

Events are processed in arrival order (``seq_col``); state is
bounded by windows inside the lateness horizon per key, the same
bound Flink's window state has with allowedLateness.

``flush_ts_ms``: events at or past this timestamp act as an
end-of-stream sentinel — Flink's bounded sources emit a final
+inf watermark that fires every remaining window (the reference
mock does exactly this); the sentinel fires all not-yet-fired
windows and clears state. Leave None for unbounded semantics.
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
        StructField("fire_no", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("max_ts_ms", LongType()),
        StructField("win_starts", ArrayType(LongType())),
        StructField("win_counts", ArrayType(LongType())),
        StructField("win_fires", ArrayType(LongType())),
    ]
)


def allowed_lateness_tumbling_count(
    events: DataFrame,
    window_ms: int,
    delay_ms: int,
    lateness_ms: int,
    key_col: str = "key",
    ts_col: str = "ts_ms",
    seq_col: str = "seq",
    flush_ts_ms: int | None = None,
) -> DataFrame:
    """Tumbling count windows with allowedLateness re-fire
    (WatermarkDemo.scala:207-299). Emits
    (key, window_start_ms, fire_no, n_events) for the initial fire
    and every late-element refinement."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            max_ts, starts, counts, fires = state.get
            wins = {
                s: [c, f]
                for s, c, f in zip(starts or [], counts or [], fires or [])
            }
        else:
            max_ts, wins = None, {}
        rows = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple[int, int, int, int]] = []
        if rows:
            batch = pd.concat(rows, ignore_index=True).sort_values(seq_col)
            # the loop is semantically per-event (each late element
            # re-fires with its own refined count, in arrival order);
            # tolist() at least keeps native ints out of numpy boxing
            for ts in batch[ts_col].astype("int64").tolist():
                if flush_ts_ms is not None and ts >= flush_ts_ms:
                    # end-of-stream watermark: fire remaining windows
                    for s in sorted(wins):
                        c, f = wins[s]
                        if f == 0:
                            out.append((key[0], s, 1, c))
                    wins.clear()
                    continue
                wm = (max_ts - delay_ms) if max_ts is not None else None
                start = (ts // window_ms) * window_ms
                end = start + window_ms
                if wm is not None and end + lateness_ms <= wm:
                    continue  # window closed: dropped (side-output set)
                c, f = wins.get(start, (0, 0))
                c += 1
                if wm is not None and end <= wm:
                    # late element on a fired (or watermark-passed)
                    # window: immediate (re-)fire with refined count
                    f += 1
                    out.append((key[0], start, f, c))
                wins[start] = [c, f]
                if max_ts is None or ts > max_ts:
                    max_ts = ts
                    new_wm = max_ts - delay_ms
                    for s in sorted(wins):
                        c2, f2 = wins[s]
                        if f2 == 0 and s + window_ms <= new_wm:
                            wins[s] = [c2, 1]
                            out.append((key[0], s, 1, c2))
                    for s in list(wins):
                        if s + window_ms + lateness_ms <= new_wm:
                            del wins[s]
        state.update(
            (
                max_ts,
                sorted(wins),
                [wins[s][0] for s in sorted(wins)],
                [wins[s][1] for s in sorted(wins)],
            )
        )
        yield pd.DataFrame(
            out, columns=["key", "window_start_ms", "fire_no", "n_events"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
