"""Scalar-function parity layer: Flink SQL name -> Spark expression.

The reference exercises its built-in scalar surface in
``official-tutorial/src/test/scala/.../SqlFuncTest.scala`` (SURVEY.md
§2.9). Most names are identical in Spark SQL; this module shims the
ones that differ so a query written against the Flink spelling can be
translated mechanically. Each value is either a Spark SQL function
name (same arity) or a callable building a Column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _split_index(s: Column, sep: Column | str, idx: Column | int) -> Column:
    """Flink SPLIT_INDEX(s, sep, i): 0-based; NULL when out of range."""
    sep_lit = F.lit(sep) if isinstance(sep, str) else sep
    i = F.lit(idx) if isinstance(idx, int) else idx
    arr = F.split(s, sep_lit)
    return F.when(F.size(arr) > i, F.element_at(arr, i + 1))


def _rand_integer(n: Column | int) -> Column:
    """Flink RAND_INTEGER(n): uniform int in [0, n)."""
    n = F.lit(n) if isinstance(n, int) else n
    return F.floor(F.rand() * n).cast("int")


def _truncate(x: Column, d: Column | int = 0) -> Column:
    """Flink TRUNCATE(x, d): toward zero at d decimals."""
    d = F.lit(d) if isinstance(d, int) else d
    factor = F.pow(F.lit(10.0), d)
    return (
        F.when(x >= 0, F.floor(x * factor) / factor)
        .otherwise(-(F.floor(-x * factor) / factor))
    )


def _floor_to(ts: Column, unit: str) -> Column:
    """Flink FLOOR(ts TO unit) -> date_trunc(unit, ts)."""
    return F.date_trunc(unit.lower(), ts)


def _is_unknown(c: Column) -> Column:
    """Flink IS UNKNOWN (3-valued logic) -> isnull of the boolean."""
    return c.isNull()


def _overlaps(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    a_lo, a_hi = F.least(s1, e1), F.greatest(s1, e1)
    b_lo, b_hi = F.least(s2, e2), F.greatest(s2, e2)
    return ((a_lo < b_hi) & (b_lo < a_hi)) | (a_lo == b_lo)


# Flink name -> same-name Spark builtin (identity mappings kept for the
# mechanical translator + as documentation of verified parity)
_IDENTICAL = (
    "abs mod sqrt ln log10 log2 exp power ceil floor sin sinh cos cot tan tanh "
    "left right log "
    "asin acos atan cosh degrees radians sign round rand uuid bin hex "
    "concat_ws upper lower trim ltrim rtrim repeat regexp_replace replace "
    "regexp_extract initcap lpad rpad from_base64 to_base64 chr decode encode "
    "reverse substr str_to_map locate instr ascii char_length parse_url "
    "year month quarter hour minute second date_format from_unixtime "
    "to_timestamp now coalesce cast if nullif"
).split()

FLINK_FUNCTION_MAP: dict[str, str | Callable[..., Column]] = {
    **{name: name for name in _IDENTICAL},
    # differing spellings / semantics
    "split_index": _split_index,
    "rand_integer": _rand_integer,
    "truncate": _truncate,
    "floor_to": _floor_to,  # FLOOR(ts TO unit)
    "ceiling": "ceil",
    "e": lambda: F.exp(F.lit(1.0)),
    "pi": lambda: F.lit(3.141592653589793),
    "character_length": "char_length",
    "position": lambda sub, s: F.instr(s, sub),  # POSITION(sub IN s)
    "similar_to": lambda s, p: (F.col(s) if isinstance(s, str) else s).rlike(p),
    "is_unknown": _is_unknown,
    "dayofmonth": "dayofmonth",
    "dayofweek": "dayofweek",  # Flink/Calcite DAYOFWEEK is 1=Sunday..7, same as Spark
    # (reference SqlFuncTest.scala:421 "sunday = 1")
    "dayofyear": "dayofyear",
    "timestampadd": lambda unit, n, ts: F.expr(f"timestampadd({unit}, {n}, {ts})"),
    "timestampdiff": lambda unit, a, b: F.expr(f"timestampdiff({unit}, {a}, {b})"),
    "overlay": lambda s, r, pos, ln=None: F.overlay(s, r, pos, ln)
    if ln is not None
    else F.overlay(s, r, pos),
    # (s1,e1) OVERLAPS (s2,e2) — SQL-standard period overlap as in
    # Calcite/Flink (SqlFuncTest.scala:477-478): strict interior
    # intersection, plus the S1=S2 equal-start clause (zero-length
    # periods at the same instant overlap; merely touching endpoints
    # do not). Periods are normalized so (e, s) == (s, e).
    "overlaps": _overlaps,
}


def flink_fn(name: str, *args) -> Column:
    """Resolve a Flink SQL function name against the parity map."""
    impl = FLINK_FUNCTION_MAP[name.lower()]
    if callable(impl):
        return impl(*args)
    fn = getattr(F, impl)
    return fn(*args)
