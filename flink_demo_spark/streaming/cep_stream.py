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
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

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


def _consecutive_hits(
    key0,
    ts_us,
    ids,
    matches,
    last_is_match,
    last_id,
    last_ts,
    horizon_us,
):
    """Vectorized consecutive-pair detection: a hit is a match-typed
    event whose immediate predecessor (state-seeded shift) is also a
    match within the horizon — the pairwise fold as one shift compare."""
    import numpy as np

    n = len(ts_us)
    if n == 0:
        return []
    prev_m = np.concatenate(([1 if last_is_match else 0], matches[:-1]))
    prev_id = np.concatenate(
        ([last_id if last_id is not None else -1], ids[:-1])
    )
    prev_ts = np.concatenate(
        ([last_ts if last_ts is not None else 0], ts_us[:-1])
    )
    valid_prev = np.concatenate(
        ([last_ts is not None], np.ones(n - 1, dtype=bool))
    )
    hit = (
        matches.astype(bool)
        & prev_m.astype(bool)
        & valid_prev
        & (ts_us - prev_ts <= horizon_us)
    )
    return [
        (key0, int(a), int(b)) for a, b in zip(prev_id[hit], ids[hit])
    ]


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
        ts_us = (
            pd.to_datetime(batch[ts_col]).astype("int64") // 1_000
        ).to_numpy()
        ids = batch[id_col].to_numpy()
        matches = (batch[type_col] == match_type).to_numpy().astype("int64")
        out = _consecutive_hits(
            key[0], ts_us, ids, matches,
            last_is_match, last_id, last_ts, horizon_us,
        )
        state.update((int(matches[-1]), int(ids[-1]), int(ts_us[-1])))
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


BUFFERED_STATE_SCHEMA = StructType(
    [
        StructField("last_is_match", LongType()),
        StructField("last_id", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_match", ArrayType(LongType())),
    ]
)


def buffered_consecutive_pattern_stream(
    events: DataFrame,
    match_type: str = "error",
    horizon_us: int = 30 * 60 * 1_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Out-of-order-tolerant streaming CEP: the watermark-sorted buffer
    Flink CEP keeps internally (events are queued per key and the NFA
    only consumes them in event-time order once the watermark passes).

    Events above the current watermark wait in group state; each
    invocation (new data, or the event-time timer set at wm+1ms so the
    flush happens even when a later batch brings this key no rows)
    releases the buffered prefix <= watermark to the detector in
    (ts, id) order. Events at or below the watermark on arrival are
    dropped as late, matching Flink CEP's late-event handling. One
    semantic difference, documented: a bounded Flink job emits a final
    MAX_WATERMARK that flushes the tail; Spark's availableNow does not,
    so events inside the final watermark delay stay buffered (use the
    in-order ``consecutive_pattern_stream`` for bounded replays).
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            last_is_match, last_id, last_ts, b_ts, b_id, b_match = state.get
            buf = list(zip(b_ts or [], b_id or [], b_match or []))
        else:
            last_is_match, last_id, last_ts, buf = 0, None, None, []
        wm_us = state.getCurrentWatermarkMs() * 1000
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_arr = (
                    pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000
                ).to_numpy()
                id_arr = pdf[id_col].to_numpy()
                m_arr = (pdf[type_col] == match_type).to_numpy()
                if wm_us > 0:
                    keep = ts_arr > wm_us  # late past watermark: dropped
                    ts_arr, id_arr, m_arr = ts_arr[keep], id_arr[keep], m_arr[keep]
                buf.extend(
                    zip(
                        ts_arr.tolist(),
                        (int(i) for i in id_arr),
                        m_arr.astype("int64").tolist(),
                    )
                )
        buf.sort()
        released = [e for e in buf if e[0] <= wm_us]
        remaining = [e for e in buf if e[0] > wm_us]
        out = []
        if released:
            import numpy as np

            rel = np.asarray(released, dtype="int64")
            out = _consecutive_hits(
                key[0], rel[:, 0], rel[:, 1], rel[:, 2],
                last_is_match, last_id, last_ts, horizon_us,
            )
            last_ts, last_id, last_is_match = (
                int(rel[-1, 0]), int(rel[-1, 1]), int(rel[-1, 2]),
            )
        state.update(
            (
                last_is_match,
                last_id,
                last_ts,
                [e[0] for e in remaining],
                [e[1] for e in remaining],
                [e[2] for e in remaining],
            )
        )
        if remaining:
            # wake this key as soon as the watermark moves again
            state.setTimeoutTimestamp(wm_us // 1000 + 1)
        yield pd.DataFrame(
            out, columns=["user_id", "first_error_id", "second_error_id"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BUFFERED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def drain_in_order(
    recs: list[dict],
    pattern,
    ts_col: str,
    key_cols: list[str],
    key: tuple,
    measures,
    timeout_measures=None,
    eos: bool = False,
):
    """The in-order incremental NFA decision step: walk decided
    anchors off the front of a key's buffered rows, emitting every
    decision, and return ``(out_rows, remaining_recs)``.

    Pure python (no Spark): shared by the
    ``streaming_match_pattern`` applyInPandasWithState closure and
    the split-fuzz harness in ``tests/``, so thousands of random
    micro-batch splits can be driven against the batch operators
    without a streaming query per split. ``eos=True`` finalizes every
    pending decision (the flush_ts / end-of-stream path)."""
    from ..operators.cep import (
        _anchor_dead_now,
        _anchor_failure_is_final,
        _iter_matches_from,
        _match_from,
        _match_future_sensitive,
        _partial_bindings,
    )

    within = pattern.within
    after = pattern.after_match
    out_rows: list[dict] = []
    max_ts = recs[-1][ts_col] if recs else None
    n = len(recs)
    head = 0  # consumed prefix: an index bump, not an O(n) list slice
    frame = None  # materialized lazily ONCE per drain (recs is stable)

    def emit(measure_fn, bindings, flag):
        nonlocal frame
        if frame is None:
            frame = pd.DataFrame(recs)
        rec = measure_fn(frame, bindings)
        if flag is not None:
            rec["is_timeout"] = flag
        for k, v in zip(key_cols, key):
            rec.setdefault(k, v)
        out_rows.append(rec)

    # NOTE: the matcher anchors at the absolute index `head`; all
    # bindings/end indices it returns are absolute into `recs`, so
    # measures() sees the same frame regardless of consumed prefix
    while head < n:
        if _anchor_dead_now(pattern, recs, head):
            head += 1  # can never anchor: drop immediately
            continue
        m = _match_from(None, head, pattern, ts_col, recs)
        t0 = recs[head][ts_col]
        expired = eos or (
            max_ts is not None and (max_ts - t0) > within
        )
        if m is None:
            if expired or _anchor_failure_is_final(pattern, n - head):
                if timeout_measures is not None:
                    partial = _partial_bindings(
                        None, head, pattern, ts_col, recs
                    )
                    if partial:
                        emit(timeout_measures, partial, True)
                head += 1  # anchor dead for good
                continue
            break  # pending: a future row may still complete it
        end, bindings = m
        if isinstance(after, tuple) and after[0] == "skip_to_first":
            if not expired:
                break  # more solutions may land inside the horizon
            max_end = end
            for e2, b2 in _iter_matches_from(
                None, head, pattern, ts_col, recs
            ):
                emit(measures, b2, None)
                max_end = max(max_end, e2)
            idxs = bindings.get(after[1]) or []
            first_idx = min(idxs) if idxs else head
            head = first_idx if first_idx > head else max_end
            continue
        if not expired and _match_future_sensitive(
            pattern, bindings, end, n
        ):
            break  # a future in-horizon row could change the match
        emit(measures, bindings, False if timeout_measures is not None else None)
        if isinstance(after, tuple):  # skip_to_last
            idxs = bindings.get(after[1]) or []
            last_idx = max(idxs) if idxs else head
            head = last_idx if last_idx > head else end
        elif after == "skip_to_next":
            head += 1
        else:
            head = max(end, head + 1)  # past_last; zero-width guard
    return out_rows, recs[head:] if head else recs


def streaming_match_pattern(
    events: DataFrame,
    pattern,
    key_cols: list[str],
    ts_col: str,
    measures,
    output_schema,
    order_cols: list[str] | None = None,
    flush_ts=None,
    timeout_measures=None,
):
    """General streaming twin of ``operators.cep.match_pattern`` —
    Flink's ``CEP.pattern(stream)`` as the reference uses it
    (``CEPDemo.scala:301-341`` patternSelectFunction over a live
    stream; applied: ``OrderPay.scala:31-53``,
    ``LoginFail.scala:78-86``): per key, rows buffer in group
    state and a match emits the moment its outcome is DECIDED — no
    future in-order row can change the preferred match
    (``_match_future_sensitive``: positionally-pinned expectations
    decide on the already-buffered next row; greedy
    relaxed/combinations loop tails and skip-contiguity
    optional/negated tails wait for the horizon, since a later row
    can bind across a gap), or the anchor's WITHIN horizon has
    expired. A failed anchor is discarded only once its horizon
    expires.

    Requires ``pattern.within`` (unbounded patterns would buffer
    forever, exactly like Flink NFA state) and supports ALL after-match
    strategies the batch engine does: ``skip_past_last_event``,
    ``skip_to_next``, ``("skip_to_first", name)`` and
    ``("skip_to_last", name)``. The skip_to_first anchor emits EVERY
    solution at the pinned anchor (CEPDemo.scala:914 semantics), so it
    is decided only once the anchor's WITHIN horizon has expired — any
    earlier, a future in-horizon row could still add a solution; the
    single-match strategies emit at earliest decidability as before.
    Assumes micro-batches arrive in event-time order per key (file
    replay / availableNow) — the same contract as
    ``streaming_match_recognize``. Iterative (row, ctx) conditions
    work unchanged (same NFA).

    End-of-stream: an availableNow run that simply stops delivers no
    final watermark, so matches whose horizon never expires would stay
    buffered (Flink's bounded jobs flush with a final +inf watermark).
    ``flush_ts`` is the same hook ``lateness.py`` uses: rows with
    ``ts >= flush_ts`` act as end-of-stream markers for their key —
    they are NOT buffered as events, and their arrival finalizes every
    pending decision (all skip_to_first anchor solutions emit, pending
    matches emit, dead anchors drop) regardless of the WITHIN horizon.
    The watermarked twin plus a horizon-advancing row remains the
    correct path for out-of-order input.

    ``timeout_measures`` enables the timeout side-output (streaming
    twin of ``match_pattern_with_timeouts`` — Flink's
    ``PatternFlatTimeoutFunction``, reference TimeoutMatchByCep.scala:
    10-19 / OrderPay.scala:31-53): an anchor that BEGAN a partial but
    whose horizon expires incomplete emits a ``timeout_measures`` row
    with ``is_timeout=true``; matches emit with ``is_timeout=false``.
    Same strategy surface as batch (skip_past_last_event /
    skip_to_next). Rows that can never anchor (begin predicate
    rejects) drop immediately instead of waiting out their horizon —
    per-key state stays proportional to live partials, not to
    ``within`` × event rate.
    """
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import BinaryType, StructField, StructType

    from ..operators.cep import _schema_fields

    if pattern.within is None:
        raise ValueError("streaming_match_pattern requires pattern.within")
    after = pattern.after_match
    if timeout_measures is not None and isinstance(after, tuple):
        raise ValueError(
            "timeout side-output supports skip_past_last_event / "
            "skip_to_next (the batch operator's surface)"
        )
    if not (
        after in ("skip_past_last_event", "skip_to_next")
        or (
            isinstance(after, tuple)
            and after[0] in ("skip_to_first", "skip_to_last")
        )
    ):
        raise NotImplementedError(f"unknown after-match strategy {after!r}")
    out_columns = [f.name for f in _schema_fields(output_schema)]
    order = order_cols or [ts_col]
    state_schema = StructType([StructField("buf", BinaryType())])

    def fn(key: tuple, pdfs, state: GroupState):
        recs: list[dict] = pickle.loads(state.get[0]) if state.exists else []
        new = [pdf for pdf in pdfs if len(pdf)]
        eos = False
        if new:
            batch = pd.concat(new, ignore_index=True).sort_values(
                order, kind="stable"
            )
            if flush_ts is not None:
                marker = batch[ts_col] >= flush_ts
                if marker.any():
                    eos = True
                    batch = batch[~marker]
            recs.extend(batch.to_dict("records"))
        out_rows, recs = drain_in_order(
            recs, pattern, ts_col, key_cols, key, measures,
            timeout_measures=timeout_measures, eos=eos,
        )
        state.update((pickle.dumps(recs),))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_columns)
        else:
            yield pd.DataFrame(columns=out_columns)

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_all_in_order(
    recs: list[dict],
    pattern,
    ts_col: str,
    key_cols: list[str],
    key: tuple,
    measures,
    eos: bool = False,
):
    """NO_SKIP incremental decision step (see :func:`drain_in_order`):
    every decided anchor emits its full solution set and never
    consumes rows. Pure python — shared by the streaming closure and
    the split-fuzz harness."""
    from ..operators.cep import _anchor_dead_now, _iter_matches_from

    within = pattern.within
    out_rows: list[dict] = []
    max_ts = recs[-1][ts_col] if recs else None
    frame = None  # materialized once, only if something emits
    start = 0
    while start < len(recs):
        if _anchor_dead_now(pattern, recs, start):
            start += 1  # can never anchor: no need to wait it out
            continue
        t0 = recs[start][ts_col]
        if not (eos or (max_ts - t0) > within):
            break  # this anchor (and all later ones) still open
        for _end, bindings in _iter_matches_from(
            None, start, pattern, ts_col, recs
        ):
            if frame is None:
                frame = pd.DataFrame(recs)
            rec = measures(frame, bindings)
            for k, v in zip(key_cols, key):
                rec.setdefault(k, v)
            out_rows.append(rec)
        start += 1  # NO_SKIP: anchors never consume
    return out_rows, recs[start:] if start else recs


def streaming_match_pattern_all(
    events: DataFrame,
    pattern,
    key_cols: list[str],
    ts_col: str,
    measures,
    output_schema,
    order_cols: list[str] | None = None,
    flush_ts=None,
):
    """Streaming twin of ``operators.cep.match_pattern_all`` — Flink's
    NO_SKIP default strategy over a live stream (reference
    followedByAny golden ``CEPDemo.scala:674-704``): EVERY anchor
    emits EVERY solution (all followedByAny branches, all
    allowCombinations subsets, all non-greedy repeat counts), and
    anchors never consume rows — the next anchor starts one row later
    regardless of what matched.

    Decidability: an anchor's full solution set is final exactly when
    its WITHIN horizon has expired (every row that could participate
    has arrived under the in-order contract) — the same rule the
    ``skip_to_first`` pinned-anchor uses in
    :func:`streaming_match_pattern`. Horizons expire in buffer order
    (t0 is monotone), so the loop walks decided anchors off the front
    and leaves the rest buffered. Requires ``pattern.within``;
    ``flush_ts`` is the same end-of-stream hook (a marker row at/past
    it finalizes every buffered anchor for its key). Assumes in-order
    micro-batches per key (file replay / availableNow); use the
    watermarked twin for out-of-order feeds.
    """
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import BinaryType, StructField, StructType

    from ..operators.cep import _schema_fields

    if pattern.within is None:
        raise ValueError("streaming_match_pattern_all requires pattern.within")
    out_columns = [f.name for f in _schema_fields(output_schema)]
    order = order_cols or [ts_col]
    state_schema = StructType([StructField("buf", BinaryType())])

    def fn(key: tuple, pdfs, state: GroupState):
        recs: list[dict] = pickle.loads(state.get[0]) if state.exists else []
        new = [pdf for pdf in pdfs if len(pdf)]
        eos = False
        if new:
            batch = pd.concat(new, ignore_index=True).sort_values(
                order, kind="stable"
            )
            if flush_ts is not None:
                marker = batch[ts_col] >= flush_ts
                if marker.any():
                    eos = True
                    batch = batch[~marker]
            recs.extend(batch.to_dict("records"))
        out_rows, recs = drain_all_in_order(
            recs, pattern, ts_col, key_cols, key, measures, eos=eos
        )
        state.update((pickle.dumps(recs),))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_columns)
        else:
            yield pd.DataFrame(columns=out_columns)

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_watermarked(
    recs: list[dict],
    pattern,
    ts_col: str,
    key_cols: list[str],
    key: tuple,
    measures,
    wm,
):
    """Watermark-driven incremental NFA step (see
    :func:`drain_in_order`): decide every anchor whose WITHIN horizon
    is entirely behind ``wm`` (a ``pd.Timestamp`` or None), fail-fast
    rows behind the watermark that can never anchor. Pure python —
    shared by ``streaming_match_pattern_watermarked`` and the
    out-of-order split-fuzz harness. ``recs`` must already be sorted
    and late-filtered by the caller."""
    from ..operators.cep import (
        _anchor_dead_now,
        _iter_matches_from,
        _match_from,
    )

    within = pattern.within
    after = pattern.after_match
    out_rows: list[dict] = []
    n = len(recs)
    head = 0  # consumed prefix (index bump, no per-row list slice)
    frame = None  # built lazily once per drain; recs is stable

    def emit(bindings):
        nonlocal frame
        if frame is None:
            frame = pd.DataFrame(recs)
        rec = measures(frame, bindings)
        for k, v in zip(key_cols, key):
            rec.setdefault(k, v)
        out_rows.append(rec)

    while head < n:
        t0 = recs[head][ts_col]
        # fail-fast once the front row is behind the watermark: no
        # future row can sort before it (late rows drop on intake),
        # so a begin-predicate rejection is permanent WITHOUT
        # waiting out the full horizon
        if (
            wm is not None
            and pd.Timestamp(t0) <= wm
            and _anchor_dead_now(pattern, recs, head)
        ):
            head += 1
            continue
        if wm is None or pd.Timestamp(t0) + within > wm:
            break  # horizon still open: rows may yet arrive
        m = _match_from(None, head, pattern, ts_col, recs)
        if m is None:
            head += 1
            continue
        end, bindings = m
        if isinstance(after, tuple) and after[0] == "skip_to_first":
            max_end = end
            for e2, b2 in _iter_matches_from(
                None, head, pattern, ts_col, recs
            ):
                emit(b2)
                max_end = max(max_end, e2)
            idxs = bindings.get(after[1]) or []
            first_idx = min(idxs) if idxs else head
            head = first_idx if first_idx > head else max_end
            continue
        emit(bindings)
        if isinstance(after, tuple):  # skip_to_last
            idxs = bindings.get(after[1]) or []
            last_idx = max(idxs) if idxs else head
            head = last_idx if last_idx > head else end
        elif after == "skip_to_next":
            head += 1
        else:
            head = max(end, head + 1)  # past_last; zero-width guard
    return out_rows, recs[head:] if head else recs


def streaming_match_pattern_watermarked(
    events: DataFrame,
    pattern,
    key_cols: list[str],
    ts_col: str,
    measures,
    output_schema,
    order_cols: list[str] | None = None,
):
    """Out-of-order-tolerant general streaming CEP — the closest twin
    to Flink's watermark-driven NFA (the reference's CEP streams all
    run behind ``assignTimestampsAndWatermarks``, e.g.
    ``CEPDemo.scala:386-397``). Rows buffer per key in event-time
    order; an anchor's fate (match emitted / failure discarded) is
    decided once its WITHIN horizon is entirely behind the watermark
    (``t0 + within <= wm``): every row that could participate is then
    final, because later-arriving rows at or below the watermark are
    dropped as late on intake (Flink CEP's late-event handling).

    Requires ``withWatermark`` upstream and ``pattern.within``.
    Supports every batch after-match strategy (skip_past_last_event,
    skip_to_next, skip_to_first, skip_to_last) — an anchor is decided
    only once its horizon is behind the watermark, at which point all
    its solutions are final, so the skip_to_first emit-all rule needs
    no extra wait here. An event-time timer
    re-fires each key when the watermark advances past its oldest
    buffered anchor, so decisions land even when later batches bring
    the key no rows. Bounded Flink jobs flush with a final +inf
    watermark; availableNow does not — anchors inside the final
    watermark delay stay pending (same documented delta as
    ``buffered_consecutive_pattern_stream``).
    """
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import BinaryType, StructField, StructType

    from ..operators.cep import _schema_fields

    if pattern.within is None:
        raise ValueError(
            "streaming_match_pattern_watermarked requires pattern.within"
        )
    after = pattern.after_match
    if not (
        after in ("skip_past_last_event", "skip_to_next")
        or (
            isinstance(after, tuple)
            and after[0] in ("skip_to_first", "skip_to_last")
        )
    ):
        raise NotImplementedError(f"unknown after-match strategy {after!r}")
    out_columns = [f.name for f in _schema_fields(output_schema)]
    order = order_cols or [ts_col]
    state_schema = StructType([StructField("buf", BinaryType())])
    within = pattern.within

    def fn(key: tuple, pdfs, state: GroupState):
        recs: list[dict] = pickle.loads(state.get[0]) if state.exists else []
        wm_ms = state.getCurrentWatermarkMs()
        wm = pd.Timestamp(wm_ms, unit="ms") if wm_ms > 0 else None
        if not state.hasTimedOut:
            new = [pdf for pdf in pdfs if len(pdf)]
            if new:
                batch = pd.concat(new, ignore_index=True)
                if wm is not None:
                    batch = batch[batch[ts_col] > wm]  # late: dropped
                recs.extend(batch.to_dict("records"))
        recs.sort(key=lambda r: tuple(r[c] for c in order))
        out_rows, recs = drain_watermarked(
            recs, pattern, ts_col, key_cols, key, measures, wm
        )
        state.update((pickle.dumps(recs),))
        if recs and wm_ms > 0:
            # wake when the watermark passes the oldest open horizon
            first_due = int(
                (pd.Timestamp(recs[0][ts_col]) + within).value // 1_000_000
            )
            state.setTimeoutTimestamp(max(first_due, wm_ms + 1))
        yield (
            pd.DataFrame(out_rows, columns=out_columns)
            if out_rows
            else pd.DataFrame(columns=out_columns)
        )

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_match_pattern_all_watermarked(
    events: DataFrame,
    pattern,
    key_cols: list[str],
    ts_col: str,
    measures,
    output_schema,
    order_cols: list[str] | None = None,
):
    """Out-of-order NO_SKIP: :func:`streaming_match_pattern_all`
    behind a watermark (the reference's followedByAny job runs on a
    watermarked stream like every CEPDemo pattern). An anchor emits
    its full solution set once its WITHIN horizon is entirely behind
    the watermark and never consumes rows; rows at or below the
    watermark are dropped late on intake; an event-time timer re-fires
    keys whose oldest open horizon the watermark has passed. Requires
    ``withWatermark`` upstream and ``pattern.within``."""
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import BinaryType, StructField, StructType

    from ..operators.cep import (
        _anchor_dead_now,
        _iter_matches_from,
        _schema_fields,
    )

    if pattern.within is None:
        raise ValueError(
            "streaming_match_pattern_all_watermarked requires pattern.within"
        )
    out_columns = [f.name for f in _schema_fields(output_schema)]
    order = order_cols or [ts_col]
    state_schema = StructType([StructField("buf", BinaryType())])
    within = pattern.within

    def fn(key: tuple, pdfs, state: GroupState):
        recs: list[dict] = pickle.loads(state.get[0]) if state.exists else []
        wm_ms = state.getCurrentWatermarkMs()
        wm = pd.Timestamp(wm_ms, unit="ms") if wm_ms > 0 else None
        if not state.hasTimedOut:
            new = [pdf for pdf in pdfs if len(pdf)]
            if new:
                batch = pd.concat(new, ignore_index=True)
                if wm is not None:
                    batch = batch[batch[ts_col] > wm]  # late: dropped
                recs.extend(batch.to_dict("records"))
        recs.sort(key=lambda r: tuple(r[c] for c in order))
        out_rows: list[dict] = []
        frame = None
        start = 0
        while start < len(recs):
            t0 = recs[start][ts_col]
            if (
                wm is not None
                and pd.Timestamp(t0) <= wm
                and _anchor_dead_now(pattern, recs, start)
            ):
                start += 1  # behind the wm and can never anchor
                continue
            if wm is None or pd.Timestamp(t0) + within > wm:
                break  # horizon still open: rows may yet arrive
            for _end, bindings in _iter_matches_from(
                None, start, pattern, ts_col, recs
            ):
                if frame is None:
                    frame = pd.DataFrame(recs)
                rec = measures(frame, bindings)
                for k, v in zip(key_cols, key):
                    rec.setdefault(k, v)
                out_rows.append(rec)
            start += 1  # NO_SKIP: anchors never consume
        if start:
            recs = recs[start:]
        state.update((pickle.dumps(recs),))
        if recs and wm_ms > 0:
            first_due = int(
                (pd.Timestamp(recs[0][ts_col]) + within).value // 1_000_000
            )
            state.setTimeoutTimestamp(max(first_due, wm_ms + 1))
        yield (
            pd.DataFrame(out_rows, columns=out_columns)
            if out_rows
            else pd.DataFrame(columns=out_columns)
        )

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
