"""Multi-dimensional data layout: Z-order (Morton) clustering.

The lakehouse file-skipping technique (Delta OPTIMIZE ZORDER, Hudi
clustering): interleave the bits of two filter dimensions into one
sort key, range-partition + sort files by it, and a query filtering a
box in EITHER OR BOTH dimensions touches only the few files whose
min/max z-range intersects the box — parquet row-group stats do the
skipping. Pure column arithmetic (shift/and/or), no UDF; the z-value
computation is exact integer math so it is oracle-checkable.

Reference parity: the reference has no layout optimizer (its tables
are stream-shaped); this is part of the beyond-reference 100 TB
surface, where write-side clustering is what makes the read-side
predicate pushdown actually skip data.

When to use: z-order wins for BOX queries constrained in both
interleaved dimensions. A scan filtered on only one dimension still
sees the other dimension's high bits spread matching rows across
every z-range — if all queries filter a single column, a plain sort
on that column beats z-order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: a's bit i lands at position 2i, b's at 2i+1.
    A sum of shift/and terms in a fixed order — whole-stage codegen,
    bit-exact in any engine. Inputs are widened to long first so the
    arithmetic is 64-bit regardless of the column type: with 32-bit
    int inputs, b's bit 15 would land on the int sign bit and the sum
    could overflow int, diverging from the SQL twin."""
    a = a.cast("long")
    b = b.cast("long")
    z: Column | None = None
    for i in range(bits):
        ta = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        tb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = ta + tb if z is None else z + ta + tb
    return z.cast("long")


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical computation as portable SQL text (DuckDB oracle
    twin of :func:`z_value` — same term order, same integer ops)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    z_col: str,
    n_files: int,
) -> None:
    """Cluster rows into ``n_files`` parquet files by z-value range:
    range-partition on the z-key and sort inside each file so every
    file covers a tight z-interval (tight min/max stats on BOTH
    underlying dimensions -> row-group/file skipping for box
    queries). The one shuffle is the point of the operation — it is
    the write-side investment that repays every subsequent scan."""
    (
        df.repartitionByRange(n_files, z_col)
        .sortWithinPartitions(z_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Hilbert curve index of a 2-D point (the classic iterative xy2d
    walk, public domain — e.g. Wikipedia "Hilbert curve", Warren's
    Hacker's Delight treatment): like :func:`z_value` a space-filling
    clustering key, but with strictly better locality — every unit
    step along the curve moves to a 4-adjacent cell, so a box query
    decomposes into FEWER contiguous index ranges than under Morton
    order (no Z-shaped jumps), i.e. fewer files touched per box at
    equal file count (Delta OPTIMIZE supports both for this reason).

    Implementation: the per-level rotate/flip state walk rides in a
    single JVM ``F.aggregate`` fold over the descending bit weights —
    the (x, y, d) state is an ``array<long>`` lambda variable, so each
    level evaluates once (no exponential expression blowup) and the
    whole key stays inside whole-stage codegen; no UDF, exact 64-bit
    integer math, oracle-checkable."""
    x = x.cast("long")
    y = y.cast("long")
    powers = F.array(
        *[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)]
    )
    init = F.array(x, y, F.lit(0).cast("long"))

    def step(acc: Column, s: Column) -> Column:
        xx = F.element_at(acc, 1)
        yy = F.element_at(acc, 2)
        dd = F.element_at(acc, 3)
        one = F.lit(1).cast("long")
        zero = F.lit(0).cast("long")
        rx = F.when(xx.bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(yy.bitwiseAND(s) > 0, one).otherwise(zero)
        dd2 = dd + s * s * ((rx * 3).bitwiseXOR(ry))
        fx = F.when(rx == 1, s - 1 - xx).otherwise(xx)
        fy = F.when(rx == 1, s - 1 - yy).otherwise(yy)
        nx = F.when(ry == 0, fy).otherwise(xx)
        ny = F.when(ry == 0, fx).otherwise(yy)
        return F.array(nx, ny, dd2)

    return F.element_at(F.aggregate(powers, init, step), 3)


def hilbert_value_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB oracle twin of :func:`hilbert_value`: the same fold via
    ``list_reduce`` — the (x, y, d) state and the per-level weights are
    all LIST(BIGINT), so accumulator and element types line up."""
    weights = ", ".join(
        f"[CAST({1 << i} AS BIGINT), 0, 0]" for i in range(bits - 1, -1, -1)
    )
    return (
        "list_reduce("
        f"list_prepend([CAST({x} AS BIGINT), CAST({y} AS BIGINT), 0], [{weights}]), "
        "(acc, el) -> ["
        "CASE WHEN (CASE WHEN (acc[2] & el[1]) > 0 THEN 1 ELSE 0 END) = 0 "
        "THEN (CASE WHEN (CASE WHEN (acc[1] & el[1]) > 0 THEN 1 ELSE 0 END) = 1 "
        "THEN el[1] - 1 - acc[2] ELSE acc[2] END) ELSE acc[1] END, "
        "CASE WHEN (CASE WHEN (acc[2] & el[1]) > 0 THEN 1 ELSE 0 END) = 0 "
        "THEN (CASE WHEN (CASE WHEN (acc[1] & el[1]) > 0 THEN 1 ELSE 0 END) = 1 "
        "THEN el[1] - 1 - acc[1] ELSE acc[1] END) ELSE acc[2] END, "
        "acc[3] + el[1] * el[1] * "
        "xor((CASE WHEN (acc[1] & el[1]) > 0 THEN 1 ELSE 0 END) * 3, "
        "(CASE WHEN (acc[2] & el[1]) > 0 THEN 1 ELSE 0 END))"
        "])[3]"
    )
