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


def _lateness_segment(
    ts,
    max_ts: int | None,
    wins: dict[int, list[int]],
    out: list[tuple[int, int, int, int]],
    key0: int,
    window_ms: int,
    delay_ms: int,
    lateness_ms: int,
) -> int | None:
    """Vectorized twin of the per-event reference semantics over one
    sentinel-free run of events (arrival order). Exactness notes:

    - a DROPPED event satisfies ``ts < end + lateness <= wm <
      max_ts``, so it can never advance the per-key watermark —
      the running max over ALL events equals the running max over
      kept events, and one ``np.maximum.accumulate`` serves both
      the drop check (prev max) and the fire check (cur max);
    - after a window's first fire the watermark never retreats, so
      EVERY kept element with a later index re-fires exactly once:
      ``fire_no = fires_at_first_fire + (rc - rc_at_first_fire)``;
    - the first fire lands at the earliest index where the running
      watermark reaches the window end at-or-after the window's
      first element — ``max(first_el_idx, searchsorted(new_wm,
      end))`` since ``new_wm`` is nondecreasing."""
    import numpy as np

    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return max_ts
    lo = np.iinfo(np.int64).min // 4
    seed = lo if max_ts is None else max_ts
    cur_max = np.maximum.accumulate(np.maximum(ts, seed))
    prev_max = np.concatenate(([seed], cur_max[:-1]))
    wm = prev_max - delay_ms  # watermark BEFORE each arrival
    new_wm = cur_max - delay_ms  # watermark AFTER each arrival
    starts = (ts // window_ms) * window_ms
    ends = starts + window_ms
    kept = ~((prev_max != lo) & (ends + lateness_ms <= wm))
    final_wm = new_wm[-1]

    k_idx = np.nonzero(kept)[0]
    k_ws = starts[k_idx]
    if len(k_ws):
        uniq, inv = np.unique(k_ws, return_inverse=True)
    else:
        uniq = inv = np.array([], dtype=np.int64)
    # rc: running count within each window among kept events,
    # seeded by carried state counts
    rc = np.zeros(len(k_idx), dtype=np.int64)
    for u_i, w in enumerate(uniq):
        sel = inv == u_i
        seed_c = wins.get(int(w), (0, 0))[0]
        rc[sel] = np.arange(1, sel.sum() + 1) + seed_c
    for u_i, w in enumerate(uniq):
        w = int(w)
        sel = np.nonzero(inv == u_i)[0]
        idxs = k_idx[sel]
        rcs = rc[sel]
        seed_c, seed_f = wins.get(w, (0, 0))
        end = w + window_ms
        total_c = int(rcs[-1])
        if seed_f > 0:
            # already fired: every kept arrival re-fires
            for j in range(len(idxs)):
                out.append((key0, w, seed_f + j + 1, int(rcs[j])))
            final_f = seed_f + len(idxs)
        else:
            first_el = 0 if seed_c > 0 else int(idxs[0])
            fpos = int(np.searchsorted(new_wm, end, side="left"))
            F = max(first_el, fpos)
            if F >= n:
                final_f = 0  # never fires in this segment
            else:
                rc_at_f = int(seed_c + np.searchsorted(idxs, F, side="right"))
                out.append((key0, w, 1, rc_at_f))
                after = np.nonzero(idxs > F)[0]
                for j, a in enumerate(after):
                    out.append((key0, w, 2 + j, int(rcs[a])))
                final_f = 1 + len(after)
        if end + lateness_ms <= final_wm:
            wins.pop(w, None)
        else:
            wins[w] = [total_c, final_f]
    # seeded windows that saw no batch events this segment: fire if
    # the advanced watermark reached them, evict if past lateness
    for w in [w for w in wins if w not in set(int(u) for u in uniq)]:
        c, f = wins[w]
        end = w + window_ms
        if f == 0 and end <= final_wm:
            # first index whose watermark reaches the end
            fpos = int(np.searchsorted(new_wm, end, side="left"))
            if fpos < n:
                out.append((key0, w, 1, c))
                wins[w] = [c, 1]
        if end + lateness_ms <= final_wm:
            del wins[w]
    m = int(cur_max[-1])
    return None if m == lo else m



def _lateness_apply(
    ts_all,
    max_ts: int | None,
    wins: dict[int, list[int]],
    key0: int,
    window_ms: int,
    delay_ms: int,
    lateness_ms: int,
    flush_ts_ms: int | None,
) -> tuple[list[tuple[int, int, int, int]], int | None]:
    """One micro-batch of the allowedLateness semantics over a key's
    arrival-ordered timestamps: emits + advanced max_ts, mutating
    ``wins`` in place. Split out of the Spark closure so the
    equivalence fuzz can drive it directly against the per-event
    reference loop."""
    import numpy as np

    out: list[tuple[int, int, int, int]] = []
    if flush_ts_ms is None:
        max_ts = _lateness_segment(
            ts_all, max_ts, wins, out, key0,
            window_ms, delay_ms, lateness_ms,
        )
        return out, max_ts
    # split at end-of-stream sentinels: each fires the not-yet-fired
    # windows and clears state, without advancing the watermark
    sent = np.asarray(ts_all) >= flush_ts_ms
    bounds = np.nonzero(sent)[0]
    pos = 0
    for b in bounds:
        max_ts = _lateness_segment(
            ts_all[pos:b], max_ts, wins, out, key0,
            window_ms, delay_ms, lateness_ms,
        )
        for s in sorted(wins):
            c, f = wins[s]
            if f == 0:
                out.append((key0, s, 1, c))
        wins.clear()
        pos = b + 1
    max_ts = _lateness_segment(
        ts_all[pos:], max_ts, wins, out, key0,
        window_ms, delay_ms, lateness_ms,
    )
    return out, max_ts


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
        import numpy as np

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
            ts_all = batch[ts_col].to_numpy(np.int64)
            out, max_ts = _lateness_apply(
                ts_all, max_ts, wins, key[0],
                window_ms, delay_ms, lateness_ms, flush_ts_ms,
            )
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
