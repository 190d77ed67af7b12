"""Skew- and shuffle-management operators (SURVEY.md §2.4 physical
distribution; the 100 TB story).

- ``salted_join``: hash-salt a skewed large side and replicate the
  small side over the salt space so one hot key spreads across
  ``salt`` partitions instead of melting one executor. AQE's skew-join
  splitting covers sort-merge joins automatically; explicit salting is
  the portable fallback (and works for aggregations too).
- ``salted_agg``: two-phase aggregation over a salted key (partial per
  (key, salt), then final per key) — what Flink calls local/global
  aggregation and the reference approximates with incremental window
  pre-aggregation (HotItems.scala:80 comment).
- ``bucketed_table``: persist a DataFrame bucketed+sorted by its join
  key; repeated joins on that key then need no exchange at all
  (asserted in tests/test_scale.py).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed ``key`` distribution on ``large``.

    The salt is derived deterministically from the large side's full
    row hash, so rows of one hot key spread uniformly; the small side
    is replicated ``salt`` times (bounded: small × salt rows).
    """
    lcols = [c for c in large.columns]
    l = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase count+sum per key: partial agg on (key, salt), final
    agg on key. Output: key, n, total (decimal-exact double)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(agg_col).cast("string")), F.lit(salt))
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(agg_col).cast("decimal(18,4)")).alias("__s"),
    )
    return partial.groupBy(key).agg(
        F.sum("__n").alias("n"),
        F.sum("__s").cast("double").alias("total"),
    )


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` bucketed and sorted by ``key``; joins between
    tables bucketed the same way need no shuffle (reference co-located
    join / partitionByHash DataSetFunc.scala:546-617)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a stale location from a previous session blocks managed-table
    # creation even after the catalog entry is gone
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, name.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )
    return spark.table(name)
