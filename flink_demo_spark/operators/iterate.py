"""Bulk iteration (SURVEY.md §2.3 iterate row).

Reference ``DataSetFunc.scala:790-808`` (bulk iteration: re-apply a
step function to a dataset N times) — the Spark-idiomatic analog is a
driver-driven loop over DataFrames with periodic ``localCheckpoint``
lineage truncation, exactly the shape the connected-components
operator (``operators/graph.py``) uses. Each iteration is distributed
work; only the loop control lives on the driver, and checkpointing
every few rounds keeps the plan from growing unboundedly (the classic
iterative-algorithm failure mode at scale).

The reference's STREAMING ``iterate`` examples
(``Transform.scala:95-111``) use the feedback edge only to split a
stream — side outputs, covered by ``streams_util.split_stream``. True
cyclic streaming feedback has no Structured Streaming mapping and
stays a documented non-goal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

StepFn = Callable[[DataFrame, int], DataFrame]
ConvergedFn = Callable[[DataFrame, DataFrame], bool]


def bulk_iterate(
    df: DataFrame,
    step: StepFn,
    max_iterations: int,
    converged: ConvergedFn | None = None,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Apply ``step(df, i)`` up to ``max_iterations`` times.

    ``converged(prev, cur)`` (optional) stops early — note it usually
    triggers a distributed action per round, which is what Flink's
    iteration convergence criterion does too. ``checkpoint_every``
    truncates lineage with an eager ``localCheckpoint`` so plan depth
    stays bounded regardless of iteration count."""
    cur = df
    for i in range(max_iterations):
        nxt = step(cur, i)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if converged is not None and converged(cur, nxt):
            return nxt
        cur = nxt
    return cur
