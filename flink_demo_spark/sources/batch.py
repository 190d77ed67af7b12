"""Bounded sources (reference Source.scala:21-96, DDL filesystem
connector CreateTest.scala:73-86).

`fromCollection`/`fromElements` -> ``spark.createDataFrame``;
`readTextFile` -> ``spark.read.text``; CSV DDL -> ``spark.read.csv``
with explicit schema (never inferSchema in production paths — schema
inference is a full extra scan at 100 TB).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def from_collection(
    spark: SparkSession, rows: Iterable, schema: StructType | list[str]
) -> DataFrame:
    return spark.createDataFrame(list(rows), schema)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = False, sep: str = ","
) -> DataFrame:
    return spark.read.csv(path, schema=schema, header=header, sep=sep)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
