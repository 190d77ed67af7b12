"""Flink windowing TVF SQL front-end: TUMBLE / HOP / CUMULATE.

Flink 1.13 replaced group-window SQL with window TABLE-VALUED
functions (FLIP-145) —

    SELECT window_start, window_end, SUM(v)
    FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))
    GROUP BY window_start, window_end

— each TVF appending ``window_start`` / ``window_end`` /
``window_time`` columns to the relation. This front-end lowers that
text onto plain Spark SQL (a pure driver-side rewrite, like
``group_window_sql``; Catalyst plans the result, so pushdown /
partial agg / AQE apply unchanged):

=============================================  ==============================
Flink window TVF                               Spark SQL rewrite
=============================================  ==============================
``TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), sz))``   subquery projecting
                                               ``window(ts, 'sz')`` start/end
``TABLE(HOP(TABLE t, DESCRIPTOR(ts),             ``window(ts, 'sz', 'sl')``
  sl, sz))``                                   (Flink order (slide, size))
``TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts),        integer-epoch explode:
  step, max))``                                every window ending after
                                               the row (Spark has no native
                                               cumulate; constant fan-out
                                               max/step)
=============================================  ==============================

``window_time`` is appended as ``window_end - INTERVAL 1 MILLISECOND``
(Flink's definition). The SESSION TVF (Flink 1.19+) is outside the
supported surface: session windows merge rows per partition key, which
is a grouping construct, not a per-row projection — use
``session_window()`` / ``group_window_sql`` for session semantics.

Scale: TUMBLE adds no rows; HOP expands size/slide× and CUMULATE
max/step× (the same constant fan-out Flink's own implementations pay);
everything stays whole-stage-codegen row math feeding the normal
aggregate shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .group_window_sql import _duration, _inert_spans

__all__ = ["rewrite_window_tvf_sql", "window_tvf_sql"]

_TVF_RE = re.compile(
    r"""
    \bTABLE\s*\(\s*
    (?P<fn>TUMBLE|HOP|CUMULATE|SESSION)\s*\(\s*
    TABLE\s+(?P<tbl>[A-Za-z_][\w]*(?:\s*\.\s*[A-Za-z_][\w]*)?)
    (?:\s+PARTITION\s+BY\s+[A-Za-z_][\w]*)?\s*,\s*
    DESCRIPTOR\s*\(\s*(?P<ts>[A-Za-z_][\w]*)\s*\)\s*,\s*
    (?P<i1>INTERVAL\s+'[^']+'\s+[A-Za-z]+)\s*
    (?:,\s*(?P<i2>INTERVAL\s+'[^']+'\s+[A-Za-z]+)\s*)?
    \)\s*\)
    """,
    re.I | re.X,
)

_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _seconds(duration: str) -> int:
    """``'2 hour'`` (a :func:`_duration` result) -> whole seconds."""
    n, unit = duration.split()
    return int(n) * _SECONDS[unit]


def _rewrite_one(m: re.Match) -> str:
    fn = m.group("fn").upper()
    tbl, ts = m.group("tbl"), m.group("ts")
    i1 = _duration(m.group("i1"))
    i2 = _duration(m.group("i2")) if m.group("i2") else None

    if fn == "SESSION":
        raise ValueError(
            "the SESSION window TVF is outside the supported surface "
            "(session windows are a grouping construct — use "
            "session_window() or group_window_sql)"
        )
    if fn == "TUMBLE":
        if i2 is not None:
            raise ValueError("TUMBLE TVF takes one INTERVAL argument")
        win = f"window({ts}, '{i1}')"
    elif fn == "HOP":
        if i2 is None:
            raise ValueError(
                "HOP TVF needs (..., INTERVAL slide, INTERVAL size)"
            )
        # Flink argument order is (slide, size); Spark's is (size, slide)
        win = f"window({ts}, '{i2}', '{i1}')"
    else:  # CUMULATE
        if i2 is None:
            raise ValueError(
                "CUMULATE TVF needs (..., INTERVAL step, INTERVAL max)"
            )
        step, size = _seconds(i1), _seconds(i2)
        if size % step != 0 or size <= 0 or step <= 0:
            raise ValueError(
                f"CUMULATE max ({i2}) must be a positive multiple of "
                f"step ({i1})"
            )
        n = size // step
        # integer-epoch explode: a row belongs to every cumulate window
        # ending strictly after it (constant fan-out max/step)
        return (
            "(SELECT * EXCEPT(__ws, __j), "
            "timestamp_seconds(__ws) AS window_start, "
            f"timestamp_seconds(__ws + __j * {step}) AS window_end, "
            f"timestamp_seconds(__ws + __j * {step})"
            " - INTERVAL 1 MILLISECOND AS window_time "
            f"FROM (SELECT *, CAST({ts} AS LONG) DIV {size} * {size} AS __ws, "
            f"explode(sequence(CAST({ts} AS LONG) % {size} DIV {step} + 1, "
            f"{n})) AS __j FROM {tbl}))"
        )
    return (
        "(SELECT * EXCEPT(__w), __w.start AS window_start, "
        "__w.end AS window_end, "
        "__w.end - INTERVAL 1 MILLISECOND AS window_time "
        f"FROM (SELECT *, {win} AS __w FROM {tbl}))"
    )


def rewrite_window_tvf_sql(sql: str) -> str:
    """Rewrite Flink window-TVF SQL text into Spark SQL text.

    Raises ``ValueError`` when no window TVF is present, or on the
    unsupported SESSION TVF / malformed argument lists. Multiple TVFs
    in one statement (e.g. a window join) each rewrite independently.
    """
    inert = _inert_spans(sql)

    def _is_inert(pos: int) -> bool:
        return any(a <= pos < b for a, b in inert)

    matches = [m for m in _TVF_RE.finditer(sql) if not _is_inert(m.start())]
    if not matches:
        raise ValueError("no TUMBLE/HOP/CUMULATE window TVF found")

    out, last = [], 0
    for m in matches:
        out.append(sql[last:m.start()])
        out.append(_rewrite_one(m))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def window_tvf_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run Flink window-TVF SQL text against the session catalog."""
    return spark.sql(rewrite_window_tvf_sql(sql))
