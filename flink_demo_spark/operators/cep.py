"""CEP: complex event pattern matching (SURVEY.md §2.12).

The reference exposes Flink CEP (``tutorial/.../CEPDemo.scala``, 25
feature tests) and SQL MATCH_RECOGNIZE (``QueryTest.scala:942-1026``,
``TableSQLFunc.scala:1569-2248``). Spark has neither; this module
implements the subset the reference actually uses:

- a pattern of named steps, each a row predicate;
- contiguity per step: ``next`` (strictly consecutive) or
  ``followed_by`` (relaxed — skip non-matching events);
- quantifiers: ``times(n)``, ``one_or_more`` (greedy);
- ``within`` horizon from first to last matched event;
- skip strategy after a match: ``skip_past_last_event`` (the
  reference's default choice for its applied patterns).

Execution model (batch): events are grouped per key, sorted by event
time, and an NFA runs inside ``applyInPandas`` — one shuffle on the
key, linear scan per group, state bounded by the pattern length.
The streaming twin (``streaming/stateful.py``) runs the same NFA in
``applyInPandasWithState`` with the buffer kept in group state.

Covers the applied uses: login-fail ``fail next fail within 2s``
(``LoginFail.scala:78-86``), order-timeout ``create followedBy pay
within 15min`` (``OrderPay.scala:31-53``), and the MATCH_RECOGNIZE
V-pattern (down+ up+) via quantified steps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

Predicate = Callable[[pd.Series], bool]


@dataclass(frozen=True)
class Step:
    name: str
    predicate: Predicate
    contiguity: str = "followed_by"  # or "next"
    min_times: int = 1
    max_times: int | None = 1  # None = unbounded (one_or_more when min=1)
    optional: bool = False  # CEP .optional() (CEPDemo.scala:344)
    negated: bool = False  # notNext/notFollowedBy (CEPDemo.scala:566, 640)
    greedy: bool = True  # quantifier preference; False = reluctant B+? (CEPDemo greedy:265)

    def replace(self, **kw) -> "Step":
        from dataclasses import replace as _replace

        return _replace(self, **kw)


@dataclass
class Pattern:
    """Fluent pattern builder mirroring the Flink CEP API surface.

    ``after_match``: 'skip_past_last_event' (default; CEPDemo.scala:879)
    or 'skip_to_next' (overlapping matches, anchor advances one row;
    CEPDemo.scala:846).
    """

    steps: list[Step] = field(default_factory=list)
    within: pd.Timedelta | None = None
    after_match: str = "skip_past_last_event"
    until_pred: Predicate | None = None  # stop condition (CEPDemo.scala:489)

    @staticmethod
    def begin(name: str, predicate: Predicate) -> "Pattern":
        return Pattern(steps=[Step(name, predicate)])

    def next(self, name: str, predicate: Predicate) -> "Pattern":
        self.steps.append(Step(name, predicate, contiguity="next"))
        return self

    def followed_by(self, name: str, predicate: Predicate) -> "Pattern":
        self.steps.append(Step(name, predicate, contiguity="followed_by"))
        return self

    def times(self, n: int) -> "Pattern":
        s = self.steps[-1]
        self.steps[-1] = Step(s.name, s.predicate, s.contiguity, n, n)
        return self

    def one_or_more(self) -> "Pattern":
        s = self.steps[-1]
        self.steps[-1] = Step(s.name, s.predicate, s.contiguity, 1, None)
        return self

    def optional(self) -> "Pattern":
        """Last step may be skipped (CEP .optional, CEPDemo.scala:344)."""
        s = self.steps[-1]
        self.steps[-1] = Step(
            s.name, s.predicate, s.contiguity, s.min_times, s.max_times, True
        )
        return self

    def or_where(self, predicate: Predicate) -> "Pattern":
        """OR-extend the last step's condition (CEP .or, CEPDemo.scala:419)."""
        s = self.steps[-1]
        old = s.predicate
        self.steps[-1] = Step(
            s.name,
            lambda r: old(r) or predicate(r),
            s.contiguity,
            s.min_times,
            s.max_times,
            s.optional,
        )
        return self

    def and_where(self, predicate: Predicate) -> "Pattern":
        """AND-extend the last step's condition (CEP .where chaining /
        .and, CEPDemo.scala:454)."""
        s = self.steps[-1]
        old = s.predicate
        self.steps[-1] = Step(
            s.name,
            lambda r: old(r) and predicate(r),
            s.contiguity,
            s.min_times,
            s.max_times,
            s.optional,
        )
        return self

    def not_next(self, name: str, predicate: Predicate) -> "Pattern":
        """The immediately following event must NOT satisfy predicate
        (CEP .notNext, CEPDemo.scala:566)."""
        self.steps.append(Step(name, predicate, "next", negated=True))
        return self

    def not_followed_by(self, name: str, predicate: Predicate) -> "Pattern":
        """No event satisfying predicate may occur before the next
        step matches (CEP .notFollowedBy, CEPDemo.scala:640). Must be
        followed by another (positive) step."""
        self.steps.append(Step(name, predicate, "followed_by", negated=True))
        return self

    def reluctant(self) -> "Pattern":
        """Make the last quantified step reluctant (B+? / B*? in
        MATCH_RECOGNIZE, TableSQLFunc2.scala:20-267): prefer the
        fewest repeats that let the rest of the pattern match."""
        self.steps[-1] = self.steps[-1].replace(greedy=False)
        return self

    def until(self, predicate: Predicate) -> "Pattern":
        """Stop expanding a one_or_more step when predicate fires
        (CEP .until, CEPDemo.scala:489). The until row is not consumed."""
        self.until_pred = predicate
        return self

    def skip_to_next(self) -> "Pattern":
        """AFTER MATCH SKIP TO NEXT ROW: emit overlapping matches
        (CEP skip strategies, CEPDemo.scala:846)."""
        self.after_match = "skip_to_next"
        return self

    def within_time(self, duration: str) -> "Pattern":
        self.within = pd.Timedelta(duration)
        return self


def _match_from(
    rows: pd.DataFrame, start: int, pattern: Pattern, ts_col: str
) -> tuple[int, dict[str, list[int]]] | None:
    """Try to match the full pattern anchored at row ``start``.

    Backtracking matcher: quantified steps try repeat counts greedily
    (max->min) or reluctantly (min->max, ``reluctant()``); if the rest
    of the pattern cannot match, the quantifier backtracks — standard
    regex/MATCH_RECOGNIZE semantics, which a purely-greedy linear scan
    would miss. Returns (end_index_exclusive, {step: [row indices]}).
    """
    n = len(rows)
    steps = pattern.steps
    t0 = rows.iloc[start][ts_col]

    def in_horizon(j: int) -> bool:
        if pattern.within is None:
            return True
        return rows.iloc[j][ts_col] - t0 <= pattern.within

    def solve(
        si: int, i: int, pending_neg: tuple[Step, ...], bindings: dict
    ) -> tuple[int, dict[str, list[int]]] | None:
        if si == len(steps):
            return i, dict(bindings)
        step = steps[si]

        if step.negated:
            if step.contiguity == "next":
                # notNext: the immediately following event must not match
                if i < n and in_horizon(i) and step.predicate(rows.iloc[i]):
                    return None
                bindings[step.name] = []
                return solve(si + 1, i, pending_neg, bindings)
            # notFollowedBy: forbidden until the next positive step
            # matches (trailing negation unsupported, as in Flink)
            bindings[step.name] = []
            return solve(si + 1, i, pending_neg + (step,), bindings)

        # find the first occurrence (followed_by skips only
        # NON-matching rows — followedByAny would branch here)
        found = -1
        j = i
        while j < n and in_horizon(j):
            row = rows.iloc[j]
            if step.predicate(row):
                found = j
                break
            if any(neg.predicate(row) for neg in pending_neg):
                return None  # a forbidden event occurred first
            if step.contiguity == "next" or si == 0:
                break  # strict position (or anchor) failed
            j += 1
        if found < 0:
            if step.optional:
                bindings[step.name] = []
                return solve(si + 1, i, pending_neg, bindings)
            return None

        # maximal consecutive run from `found` (Flink consecutive()
        # quantifier); `until` stops expansion without consuming
        run = [found]
        j = found + 1
        while (
            (step.max_times is None or len(run) < step.max_times)
            and j < n
            and in_horizon(j)
        ):
            row = rows.iloc[j]
            if pattern.until_pred is not None and pattern.until_pred(row):
                break
            if not step.predicate(row):
                break
            run.append(j)
            j += 1
        if len(run) >= step.min_times:
            counts = range(step.min_times, len(run) + 1)
            for c in (reversed(counts) if step.greedy else counts):
                taken = run[:c]
                bindings[step.name] = taken
                res = solve(si + 1, taken[-1] + 1, (), bindings)
                if res is not None:
                    return res
        if step.optional:
            bindings[step.name] = []
            return solve(si + 1, i, pending_neg, bindings)
        return None

    return solve(0, start, (), {})


def match_pattern(
    df: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    ts_col: str,
    measures: Callable[[pd.DataFrame, dict[str, list[int]]], dict],
    output_schema: StructType | str,
) -> DataFrame:
    """Run the NFA per key over time-sorted events (batch).

    ``measures(rows, bindings) -> dict`` builds one output row per
    match (MATCH_RECOGNIZE MEASURES clause). AFTER MATCH SKIP PAST
    LAST EVENT.
    """
    # resolve output column names on the driver: workers have no session
    out_columns = [f.name for f in _schema_fields(output_schema)]

    def run(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values([ts_col]).reset_index(drop=True)
        out: list[dict] = []
        start = 0
        n = len(rows)
        while start < n:
            m = None
            anchor = start
            for anchor in range(start, n):
                m = _match_from(rows, anchor, pattern, ts_col)
                if m is not None:
                    break
            if m is None:
                break
            end, bindings = m
            rec = measures(rows, bindings)
            for k in key_cols:
                rec.setdefault(k, rows.iloc[0][k])
            out.append(rec)
            if pattern.after_match == "skip_to_next":
                start = anchor + 1  # overlapping matches allowed
            else:
                start = end  # skip past last event
        if not out:
            return pd.DataFrame(columns=out_columns)
        return pd.DataFrame(out)

    return df.groupBy(*key_cols).applyInPandas(run, output_schema)


def _schema_fields(schema: StructType | str):
    if isinstance(schema, StructType):
        return schema.fields
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(schema).fields
