"""As-of (temporal/versioned-table) join.

Reference semantics: temporal table function join
(``LATERAL TABLE(Rates(o.rowtime))``, ``TableSQLFunc.scala:1223-1341``)
and DDL ``FOR SYSTEM_TIME AS OF o.rowtime``
(``QueryTest.scala:777-846``; ``TemporalJoinTest.scala:19-124``): each
probe row joins the single build row with the greatest build-time
``<=`` probe-time for the same key; NULLs when no version exists yet
(golden table at ``TableSQLFunc.scala:1451-1459``).

Spark-first implementation — the union/last_value trick, NOT a
correlated subquery or a driver loop:

1. tag probe rows side=1, build rows side=0;
2. union; one shuffle partitioned by key, sorted by (time, side);
3. ``last_value(build_payload, ignoreNulls) OVER (... ROWS UNBOUNDED
   PRECEDING)`` carries the latest build version forward onto each
   probe row (build-before-probe at equal time => inclusive <=).

Cost at scale: a single hash shuffle of probe+build on the key and a
per-partition sort — the same cost profile as a sort-merge join,
with no row explosion and no skew-prone range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time: str,
    build_time: str,
    payload_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """For each probe row, attach the latest build row with
    ``build_time <= probe_time`` for the same ``on`` key.

    ``payload_cols``: build columns to carry (default: all but key/time).
    ``how='inner'`` drops probe rows with no matching version.
    """
    payload_cols = payload_cols or [
        c for c in build.columns if c not in (on, build_time)
    ]

    p = probe.withColumn("__side", F.lit(1)).withColumn("__t", F.col(probe_time))
    b = build.withColumn("__side", F.lit(0)).withColumn("__t", F.col(build_time))

    # align schemas for the union: probe cols NULL on build rows & vice versa
    probe_cols = list(probe.columns)
    p_u = p.select(
        F.col(on).alias("__k"),
        "__t",
        "__side",
        *[F.col(c) for c in probe_cols if c != on],
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in payload_cols],
    )
    b_u = b.select(
        F.col(on).alias("__k"),
        "__t",
        "__side",
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols if c != on],
        *[F.col(c).alias(f"__b_{c}") for c in payload_cols],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = p_u.unionByName(b_u).select(
        "*",
        *[
            F.last(f"__b_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in payload_cols
        ],
    )
    out = (
        carried.where(F.col("__side") == 1)
        .select(
            F.col("__k").alias(on),
            *[F.col(c) for c in probe_cols if c != on],
            *[F.col(f"__v_{c}").alias(c) for c in payload_cols],
        )
    )
    if how == "inner":
        out = out.dropna(subset=[payload_cols[0]])
    return out


# ---------------------------------------------------------------------------
# FOR SYSTEM_TIME AS OF — SQL front-end
# ---------------------------------------------------------------------------

import re as _re

_TEMPORAL_JOIN_RE = _re.compile(
    r"""
    SELECT\s+(?P<select>.*?)\s+
    FROM\s+(?P<probe>[A-Za-z_][\w.]*)\s+(?:AS\s+)?(?P<palias>\w+)\s+
    (?P<left>LEFT\s+)?JOIN\s+(?P<build>[A-Za-z_][\w.]*)\s+
    FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<talias>\w+)\s*\.\s*(?P<tcol>\w+)\s+
    (?:AS\s+)?(?P<balias>\w+)\s+
    ON\s+(?P<on>.+?)\s*;?\s*$
    """,
    _re.I | _re.S | _re.X,
)

_ON_EQ_RE = _re.compile(r"^\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$")


def temporal_join_sql(spark, sql: str, build_time: str | None = None):
    """Thin SQL front-end lowering Flink's event-time temporal join —
    ``<probe> [LEFT] JOIN <versioned> FOR SYSTEM_TIME AS OF
    <probe>.<rowtime> AS <alias> ON <key equality>`` (reference
    ``QueryTest.scala:777-846`` temporalJoin and
    ``TemporalJoinTest.scala:74-124`` temporalTableJoin run this text
    verbatim) — onto :func:`asof_join`'s union/last_value plan (one
    shuffle, no Join operator).

    Tables resolve through the session catalog (temp views), the
    MATCH_RECOGNIZE front-end's convention. Supported surface = what
    the reference queries use: a single temporal join, one key
    equality in ON, and a select list of column references /
    arithmetic with optional ``AS`` aliases. ``build_time`` defaults
    to the probe's AS-OF time column name when the versioned table has
    it (both reference tables call it ``rowtime``). LEFT JOIN keeps
    probe rows with no version yet (NULL rates — the reference golden
    includes them); plain JOIN drops them.
    """
    from pyspark.sql import functions as F

    m = _TEMPORAL_JOIN_RE.search(sql.strip())
    if m is None:
        raise ValueError(
            "not a SELECT ... FROM p [LEFT] JOIN b FOR SYSTEM_TIME "
            "AS OF p.<t> AS r ON ... query"
        )
    palias, balias = m.group("palias"), m.group("balias")
    if m.group("talias").lower() != palias.lower():
        raise ValueError(
            "FOR SYSTEM_TIME AS OF must reference the probe alias "
            f"({palias}), got {m.group('talias')}"
        )
    on = _ON_EQ_RE.match(m.group("on"))
    if on is None:
        raise ValueError(
            f"unsupported ON clause (need one key equality): {m.group('on')}"
        )
    a1, c1, a2, c2 = on.groups()
    side = {a1.lower(): c1, a2.lower(): c2}
    if set(side) != {palias.lower(), balias.lower()}:
        raise ValueError(f"ON must equate probe and build keys: {m.group('on')}")
    p_key, b_key = side[palias.lower()], side[balias.lower()]

    probe = spark.table(m.group("probe"))
    build = spark.table(m.group("build"))
    tcol = m.group("tcol")
    bt = build_time or (tcol if tcol in build.columns else None)
    if bt is None:
        raise ValueError(
            f"cannot infer the versioned table's time column (no {tcol!r} "
            f"in {m.group('build')}); pass build_time="
        )

    # alias-qualify both sides so select rewriting is collision-free;
    # the build key takes the probe key's qualified name (asof_join
    # joins on a shared column name)
    key_q = f"{palias}__{p_key}"
    probe_q = probe.select(
        *[F.col(c).alias(key_q if c == p_key else f"{palias}__{c}") for c in probe.columns]
    )
    build_q = build.select(
        *[F.col(c).alias(key_q if c == b_key else f"{balias}__{c}") for c in build.columns]
    )
    payload = [c for c in build_q.columns if c != key_q]
    joined = asof_join(
        probe_q,
        build_q,
        on=key_q,
        probe_time=f"{palias}__{tcol}",
        build_time=f"{balias}__{bt}",
        payload_cols=payload,
        how="left" if m.group("left") else "inner",
    )

    def rewrite(expr: str) -> str:
        expr = _re.sub(
            rf"\b{palias}\s*\.\s*(\w+)",
            lambda mm: key_q if mm.group(1) == p_key else f"{palias}__{mm.group(1)}",
            expr,
            flags=_re.I,
        )
        return _re.sub(
            rf"\b{balias}\s*\.\s*(\w+)",
            lambda mm: key_q if mm.group(1) == b_key else f"{balias}__{mm.group(1)}",
            expr,
            flags=_re.I,
        )

    # split the select list on top-level commas
    items, depth, cur = [], 0, []
    for ch in m.group("select"):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))

    cols = []
    for item in items:
        item = item.strip()
        alias_m = _re.search(r"\s+AS\s+(\w+)\s*$", item, _re.I)
        if alias_m:
            body, name = item[: alias_m.start()], alias_m.group(1)
        else:
            body = item
            ref = _re.match(r"^\s*\w+\s*\.\s*(\w+)\s*$", item)
            name = ref.group(1) if ref else item.strip()
        cols.append(F.expr(rewrite(body)).alias(name))
    return joined.select(*cols)
