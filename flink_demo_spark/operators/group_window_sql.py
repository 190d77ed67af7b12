"""Flink group-window SQL front-end: TUMBLE / HOP / SESSION.

Lowers Flink's legacy group-window SQL text —

    SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w, k, SUM(v)
    FROM t GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), k

— onto Spark SQL's native ``window()`` / ``session_window()``
table-valued grouping expressions, so the reference's windowed SQL
runs verbatim (reference ``QueryTest.scala:375-385`` groupby-tumble
with HAVING, ``TableSQLFunc.scala:951-963`` hourly click counts,
``SpendReportJob.scala:95-104`` spend report,
``TableDemo.scala:768-800`` HOP and ``:853-884`` SESSION).

Mapping (pure text rewrite; Catalyst plans the rest, so predicate
pushdown / partial agg / AQE all apply as if the user had written the
Spark form directly):

=============================================  ===============================
Flink group-window construct                   Spark SQL rewrite
=============================================  ===============================
``TUMBLE(ts, INTERVAL 's' U)``                 ``window(ts, 's U')``
``HOP(ts, INTERVAL 'sl' U, INTERVAL 'sz' U)``  ``window(ts, 'sz U', 'sl U')``
                                               (Flink arg order is
                                               (slide, size); Spark's is
                                               (size, slide))
``SESSION(ts, INTERVAL 'g' U)``                ``session_window(ts, 'g U')``
``TUMBLE_START/END(...)``                      ``window.start`` / ``window.end``
``HOP_START/END(...)``                         ``window.start`` / ``window.end``
``SESSION_START/END(...)``                     ``session_window.start/.end``
=============================================  ===============================

Flink requires every ``*_START/_END`` auxiliary to repeat the GROUP BY
window's arguments textually; this front-end enforces the same rule
(normalized for case/whitespace) so a mismatched projection fails fast
instead of silently reading a different window. ``*_ROWTIME`` /
``*_PROCTIME`` auxiliaries are outside the supported surface (they
exist to re-chain Flink group windows; Spark's ``window.end`` already
serves that role) and raise.

Scale: the rewrite is driver-side string work on the SQL text only;
the produced plan is the exact native plan Spark would build for
``groupBy(window(...))`` — a single hash-aggregate shuffle on
(window, keys), partial aggregation map-side, no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["rewrite_group_window_sql", "group_window_sql"]

# TUMBLE(ts, INTERVAL '5' SECOND) / HOP(ts, i, i) / SESSION(ts, i),
# optionally with a _START/_END suffix. ts may be alias-qualified.
_WIN_RE = re.compile(
    r"""
    \b(?P<fn>TUMBLE|HOP|SESSION)(?P<part>_START|_END|_ROWTIME|_PROCTIME)?
    \s*\(\s*
    (?P<ts>[A-Za-z_][\w]*(?:\s*\.\s*[A-Za-z_][\w]*)?)\s*,\s*
    (?P<i1>INTERVAL\s+'[^']+'\s+[A-Za-z]+)\s*
    (?:,\s*(?P<i2>INTERVAL\s+'[^']+'\s+[A-Za-z]+)\s*)?
    \)
    """,
    re.I | re.X,
)

_INTERVAL_RE = re.compile(r"INTERVAL\s+'([^']+)'\s+([A-Za-z]+)", re.I)

_UNITS = {
    "second": "second", "seconds": "second",
    "minute": "minute", "minutes": "minute",
    "hour": "hour", "hours": "hour",
    "day": "day", "days": "day",
}


def _duration(interval_text: str) -> str:
    """``INTERVAL '5' SECOND`` -> ``5 second`` (a Spark duration string)."""
    m = _INTERVAL_RE.fullmatch(interval_text.strip())
    if m is None:  # unreachable via _WIN_RE, kept for direct callers
        raise ValueError(f"unsupported interval: {interval_text!r}")
    n, unit = m.group(1), m.group(2).lower()
    if unit not in _UNITS:
        raise ValueError(
            f"unsupported group-window interval unit {unit!r} "
            "(supported: SECOND/MINUTE/HOUR/DAY)"
        )
    return f"{n} {_UNITS[unit]}"


def _inert_spans(sql: str) -> list[tuple[int, int]]:
    """Spans of ``sql`` where group-window tokens are inert: single- or
    double-quoted string literals (with ``''`` / ``""`` escapes),
    backtick-quoted identifiers, ``--`` line comments, and ``/* */``
    block comments. A TUMBLE/HOP/SESSION-shaped token starting inside one
    of these is text, not a window construct, and must not be rewritten
    (nor trip the identical-arguments / mixed-kinds checks)."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if sql[j] == c:
                    if j + 1 < n and sql[j + 1] == c:
                        # doubled-quote escape; backticks double too
                        # (`a``b` is one identifier — ADVICE r8)
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = min(j + 1, n)
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j < 0 else j
            spans.append((i, j))
            i = j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _norm_spec(m: re.Match) -> tuple[str, str, str | None]:
    """Normalized (ts, i1, i2) key used to enforce Flink's rule that all
    window references in one statement use identical arguments."""
    ts = re.sub(r"\s+", "", m.group("ts")).lower()
    i1 = _duration(m.group("i1"))
    i2 = _duration(m.group("i2")) if m.group("i2") else None
    return ts, i1, i2


def rewrite_group_window_sql(sql: str) -> str:
    """Rewrite Flink group-window SQL text into Spark SQL text.

    Raises ``ValueError`` when the text contains no group-window
    construct, mixes window kinds, uses ``*_ROWTIME``/``*_PROCTIME``,
    or references the same kind with differing arguments.
    """
    inert = _inert_spans(sql)

    def _is_inert(pos: int) -> bool:
        return any(a <= pos < b for a, b in inert)

    matches = [m for m in _WIN_RE.finditer(sql) if not _is_inert(m.start())]
    if not matches:
        raise ValueError("no TUMBLE/HOP/SESSION group-window construct found")

    kinds = {m.group("fn").upper() for m in matches}
    if len(kinds) > 1:
        raise ValueError(f"mixed group-window kinds in one statement: {kinds}")
    kind = kinds.pop()

    specs = {_norm_spec(m) for m in matches}
    if len(specs) > 1:
        raise ValueError(
            f"all {kind} references must use identical arguments, got: {specs}"
        )
    ts_norm, i1, i2 = specs.pop()

    if kind == "HOP" and i2 is None:
        raise ValueError("HOP needs (ts, INTERVAL slide, INTERVAL size)")
    if kind != "HOP" and i2 is not None:
        raise ValueError(f"{kind} takes exactly one INTERVAL argument")
    if not any(m.group("part") is None for m in matches):
        raise ValueError(
            f"{kind}_START/{kind}_END used but the GROUP BY clause has no "
            f"bare {kind}(...) — Flink group-window SQL requires one"
        )

    win_alias = "session_window" if kind == "SESSION" else "window"

    def repl(m: re.Match) -> str:
        if _is_inert(m.start()):
            return m.group(0)  # inside a literal/comment — leave verbatim
        part = (m.group("part") or "").upper()
        if part in ("_ROWTIME", "_PROCTIME"):
            raise ValueError(
                f"{kind}{part} is outside the supported surface "
                "(use window.end to chain windows in Spark)"
            )
        if part == "_START":
            return f"{win_alias}.start"
        if part == "_END":
            return f"{win_alias}.end"
        ts = m.group("ts")
        if kind == "TUMBLE":
            return f"window({ts}, '{i1}')"
        if kind == "HOP":  # Flink (slide, size) -> Spark (size, slide)
            return f"window({ts}, '{i2}', '{i1}')"
        return f"session_window({ts}, '{i1}')"

    return _WIN_RE.sub(repl, sql)


def group_window_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run Flink group-window SQL text against the session catalog."""
    return spark.sql(rewrite_group_window_sql(sql))
