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
