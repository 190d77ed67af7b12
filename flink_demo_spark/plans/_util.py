"""Cross-engine determinism helpers for oracle-backed queries.

Floating-point SUM is order-dependent; Spark and DuckDB aggregate in
different partition orders, so ``round(sum(double), 2)`` can land on
opposite sides of a rounding boundary at scale. The fix: accumulate
in DECIMAL (exact, order-independent) and cast the final value back
to DOUBLE — identical in both engines by construction.

Spark side: ``dsum`` / ``davg``. Oracle side: the matching SQL is
``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column (exact decimal acc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DecimalType(18, scale))).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def osum(expr: str, scale: int = 4) -> str:
    """Oracle-side SQL fragment matching ``dsum``."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oavg(expr: str, scale: int = 4) -> str:
    """Oracle-side SQL fragment matching ``davg``."""
    return f"({osum(expr, scale)} / count({expr}))"


# NOTE (round 6): the former `ordered_small` presentation-sort helper
# (repartition(1) + sortWithinPartitions) was removed along with every
# call site. Registry queries return results UNSORTED: both the
# driver's value hash and the local oracle compare are
# order-insensitive, so a final sort bought nothing — and a
# single-partition funnel on a table-proportional result is a
# straggler/OOM at scale. If a presentation surface ever needs a total
# order over a genuinely small result, sort it after materializing
# (e.g. in pandas), not in the distributed plan.
