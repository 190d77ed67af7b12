"""Table catalog for the synthetic test schema.

Mirrors the reference's catalog/DDL layer (``CreateTest.scala:62-334``
declares tables with computed columns + watermarks); here the schema
is fixed parquet, so "DDL" is a loader that normalizes types and
exposes canonical temp views.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings.

The only normalization needed: ``events.ts`` arrives either as
parquet TIMESTAMP(NANOS) — Spark reads it as int64 nanos under
``spark.sql.legacy.parquet.nanosAsLong``, truncate ns -> µs — or as
TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
TIMESTAMP_NTZ. Both normalize to session-tz TimestampType (session
tz is pinned to UTC) so plans and DuckDB oracles (``ts`` is a naive
TIMESTAMP there) agree byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# small dimension tables that should always be broadcast in joins
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame with normalized types."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType regardless of the
    parquet physical encoding (int64 nanos under nanosAsLong, or
    TIMESTAMP_NTZ from a µs-precision file). UTC session tz makes the
    NTZ -> TZ cast wall-clock-preserving."""
    from pyspark.sql.types import TimestampType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        # `div` truncates ns -> µs like DuckDB's TIMESTAMP_NS cast
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(dt, TimestampType):
        return df
    # anything else (e.g. StringType from a malformed file) would fail
    # far downstream with a confusing watermark/comparison error —
    # catch encoding drift at load time instead
    raise TypeError(f"events.ts has unsupported dtype {dt!r}")


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose tables as temp views (canonical names) for spark.sql use."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
