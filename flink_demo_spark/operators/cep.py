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


@dataclass
class Pattern:
    """Fluent pattern builder mirroring the Flink CEP API surface."""

    steps: list[Step] = field(default_factory=list)
    within: pd.Timedelta | None = None

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

    def within_time(self, duration: str) -> "Pattern":
        self.within = pd.Timedelta(duration)
        return self


def _match_from(
    rows: pd.DataFrame, start: int, pattern: Pattern, ts_col: str
) -> tuple[int, dict[str, list[int]]] | None:
    """Try to match the full pattern anchored at row ``start``.

    Returns (end_index_exclusive, {step_name: [row indices]}) for the
    greedy leftmost match, or None.
    """
    n = len(rows)
    bindings: dict[str, list[int]] = {}
    i = start
    t0 = rows.iloc[start][ts_col]

    def in_horizon(j: int) -> bool:
        if pattern.within is None:
            return True
        return rows.iloc[j][ts_col] - t0 <= pattern.within

    for si, step in enumerate(pattern.steps):
        taken: list[int] = []
        # first occurrence of this step
        j = i
        while j < n and in_horizon(j):
            if step.predicate(rows.iloc[j]):
                break
            if step.contiguity == "next" or (si == 0 and j == start):
                return None  # strict: the anchored/next row must match
            j += 1
        else:
            return None
        if not in_horizon(j):
            return None
        taken.append(j)
        j += 1
        # greedy repeats (consecutive rows only, matching Flink's
        # default consecutive() semantics for quantified steps)
        while (
            (step.max_times is None or len(taken) < step.max_times)
            and j < n
            and in_horizon(j)
            and step.predicate(rows.iloc[j])
        ):
            taken.append(j)
            j += 1
        if len(taken) < step.min_times:
            return None
        bindings[step.name] = taken
        i = taken[-1] + 1
    return i, bindings


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
