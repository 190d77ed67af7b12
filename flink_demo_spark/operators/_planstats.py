"""Catalyst plan-size estimation helper.

Both the MinHash verify-path gate (``dedup.py``) and the pre-explode
fan-out (``text.py``) pick a physical strategy from the optimizer's
estimated input size. That estimate is only reachable through the
PRIVATE ``df._jdf.queryExecution().optimizedPlan().stats()`` bridge —
there is no public PySpark surface for logical-plan statistics.

Pinned against Spark 4.1 (``QueryExecution.optimizedPlan`` /
``LogicalPlan.stats`` — stable across 3.x/4.x but private). If a
future Spark drops the bridge this helper degrades LOUDLY: one
warning per process naming the conf override, then the caller's
conservative default. Set
``spark.flinkDemoSpark.planStats.overrideBytes`` to force a value
(also the escape hatch when cost-based stats are misleading).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_CONF = "spark.flinkDemoSpark.planStats.overrideBytes"
_warned = False


def estimated_plan_bytes(df: DataFrame, default: int) -> int:
    """Optimizer-estimated size of ``df`` in bytes, or ``default``
    when the private stats bridge is unavailable."""
    override = df.sparkSession.conf.get(_CONF, None)
    if override is not None:
        return int(override)
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception as e:  # private API drift: degrade loudly
        global _warned
        if not _warned:
            _warned = True
            warnings.warn(
                "plan-size estimation via the private "
                "queryExecution().optimizedPlan().stats() bridge failed "
                f"({e!r}); falling back to {default} bytes. Set {_CONF} "
                "to choose the strategy explicitly.",
                RuntimeWarning,
                stacklevel=2,
            )
        return default
