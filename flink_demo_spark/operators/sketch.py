"""Count-min-sketch heavy hitters with exact verification.

Beyond-reference LLM-pipeline operator (the 100 TB heavy-hitter
pattern): find every token whose corpus frequency reaches a threshold
WITHOUT shuffling the full (token, count) table.

Design — all JVM column expressions, no python stage:

1. ``depth`` bucket columns per token: ``pmod(xxhash64(tok, seed_r),
   width)`` — the CMS rows.
2. Each CMS row is a ``groupBy(bucket).count()`` — a partial-agg
   shuffle whose payload is AT MOST ``width`` rows per row of the
   sketch (the map-side combine reduces the token stream to
   ``partitions × width`` before the exchange), not the vocabulary.
3. The d tiny bucket tables broadcast back onto the token stream;
   ``least(est_1..est_d) >= min_count`` is the CMS estimate filter.
   CMS only OVERESTIMATES, so every true heavy hitter survives (no
   false negatives) — the filter passes a small candidate superset.
4. Exact ``groupBy(tok).count()`` over the surviving tokens only —
   the single vocabulary-keyed shuffle now carries just candidate
   occurrences — and the final ``count >= min_count`` drops the CMS
   false positives.

Result: EXACTLY the tokens with true frequency >= min_count, with
exact counts — same verify-the-sketch-candidates contract as the
MinHash-LSH dedup path (operators/dedup.py), so the operator is fully
DuckDB-oracle-checkable despite being sketch-based.

Cost at scale: d width-bounded agg shuffles + 1 candidate-only
shuffle, vs one full-vocabulary shuffle for the naive groupBy. Width
trades broadcast size against false-positive (wasted verify) volume;
at 100 TB use width ~1-16M cells (8-128 MB broadcast per row is too
big — keep depth*width under the broadcast threshold, e.g. 4x1M
longs = 32 MB total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_heavy_hitters(
    tokens: DataFrame,
    tok_col: str = "tok",
    min_count: int = 100,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Tokens with exact frequency >= ``min_count`` as
    ``(tok, n)`` — CMS candidate filter + exact verification."""
    bucketed = tokens.select(
        F.col(tok_col).alias("tok"),
        *[
            F.pmod(F.xxhash64(F.col(tok_col), F.lit(r)), F.lit(width)).alias(
                f"__cms_b{r}"
            )
            for r in range(depth)
        ],
    )
    probe = bucketed
    for r in range(depth):
        cms_r = bucketed.groupBy(f"__cms_b{r}").agg(
            F.count(F.lit(1)).alias(f"__cms_e{r}")
        )
        probe = probe.join(F.broadcast(cms_r), f"__cms_b{r}")
    est = F.least(*[F.col(f"__cms_e{r}") for r in range(depth)])
    return (
        probe.where(est >= min_count)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
