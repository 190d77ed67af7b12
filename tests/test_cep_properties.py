"""Property-based tests for the CEP NFA matcher (pure pandas — no
Spark round trip per example, so hypothesis can explore freely).

The reference has no property tests (SURVEY §5 point 5); this is one
of the additions our test strategy makes on top of its
golden-expectation style.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_demo_spark.operators.cep import Pattern, _match_from

EVENTS = st.lists(st.sampled_from("ab"), min_size=0, max_size=24)


def _rows(seq):
    return pd.DataFrame(
        {
            "event_type": list(seq),
            "ts": pd.to_datetime(range(len(seq)), unit="s"),
        }
    )


def _all_matches(rows, pattern):
    """Replicates match_pattern's driver loop (skip past last event)."""
    out = []
    start, n = 0, len(rows)
    while start < n:
        m = None
        anchor = start
        for anchor in range(start, n):
            m = _match_from(rows, anchor, pattern, "ts")
            if m is not None:
                break
        if m is None:
            break
        end, bindings = m
        out.append(bindings)
        start = anchor + 1 if pattern.after_match == "skip_to_next" else end
    return out


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_next_pair_equals_direct_scan(seq):
    """'a next a' with skip-past-last == greedy non-overlapping scan."""
    rows = _rows(seq)
    pat = Pattern.begin("x", lambda r: r["event_type"] == "a").next(
        "y", lambda r: r["event_type"] == "a"
    )
    got = [(b["x"][0], b["y"][0]) for b in _all_matches(rows, pat)]

    expected = []
    i = 0
    while i + 1 < len(seq):
        if seq[i] == "a" and seq[i + 1] == "a":
            expected.append((i, i + 1))
            i += 2
        else:
            i += 1
    assert got == expected


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_one_or_more_consumes_maximal_runs(seq):
    """'a+' greedy with skip-past-last matches each maximal run of a's."""
    rows = _rows(seq)
    pat = Pattern.begin("run", lambda r: r["event_type"] == "a").one_or_more()
    got = [tuple(b["run"]) for b in _all_matches(rows, pat)]

    expected = []
    cur = []
    for i, c in enumerate(seq):
        if c == "a":
            cur.append(i)
        elif cur:
            expected.append(tuple(cur))
            cur = []
    if cur:
        expected.append(tuple(cur))
    assert got == expected


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_not_followed_by_excludes_forbidden(seq):
    """'a notFollowedBy(b) a' (relaxed): matches never have a 'b'
    strictly between the two bound a's, and both ends bind 'a'."""
    rows = _rows(seq)
    pat = Pattern.begin("x", lambda r: r["event_type"] == "a")
    pat.not_followed_by("nb", lambda r: r["event_type"] == "b")
    pat.followed_by("y", lambda r: r["event_type"] == "a")
    for b in _all_matches(rows, pat):
        i, j = b["x"][0], b["y"][0]
        assert seq[i] == "a" and seq[j] == "a" and i < j
        assert all(seq[k] != "b" for k in range(i + 1, j))


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.booleans()),
        min_size=0,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_consecutive_hits_equals_reference_fold(seq, split):
    """The vectorized shift-compare kernel (streaming/cep_stream.
    _consecutive_hits) must equal the row-at-a-time fold, including
    the state seed across an arbitrary batch split."""
    import numpy as np

    from flink_demo_spark.streaming.cep_stream import _consecutive_hits

    horizon = 5
    rows = sorted(
        ((ts, i, int(m)) for i, (ts, m) in enumerate(seq)),
        key=lambda r: (r[0], r[1]),
    )

    # reference: sequential fold over the whole sequence
    expected = []
    last_m, last_id, last_ts = 0, None, None
    for ts, eid, m in rows:
        if m and last_m and last_ts is not None and ts - last_ts <= horizon:
            expected.append((7, last_id, eid))
        last_m, last_id, last_ts = m, eid, ts

    # vectorized: two batches split at an arbitrary point, state carried
    split = min(split, len(rows))
    got = []
    state = (0, None, None)
    for part in (rows[:split], rows[split:]):
        if not part:
            continue
        arr = np.asarray(part, dtype="int64")
        got.extend(
            _consecutive_hits(
                7, arr[:, 0], arr[:, 1], arr[:, 2],
                state[0], state[1], state[2], horizon,
            )
        )
        state = (int(arr[-1, 2]), int(arr[-1, 1]), int(arr[-1, 0]))
    assert got == expected
