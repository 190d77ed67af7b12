"""Unit tests for the Flink-name scalar-function parity layer
(SURVEY §2.9; functions/parity.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_demo_spark.functions import FLINK_FUNCTION_MAP, flink_fn


@pytest.fixture(scope="module")
def one_row(spark):
    return spark.createDataFrame(
        [("a,b,c", 3.14159, "2024-06-15 13:45:30")],
        "csv string, x double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _val(df, col):
    return df.select(col.alias("v")).collect()[0].v


def test_split_index(one_row):
    assert _val(one_row, flink_fn("split_index", F.col("csv"), ",", 1)) == "b"
    assert _val(one_row, flink_fn("split_index", F.col("csv"), ",", 9)) is None


def test_truncate(one_row):
    assert _val(one_row, flink_fn("truncate", F.col("x"), 2)) == 3.14
    assert _val(one_row, flink_fn("truncate", -F.col("x"), 2)) == -3.14


def test_floor_to_unit(one_row):
    got = _val(one_row, flink_fn("floor_to", F.col("ts"), "HOUR"))
    assert got.minute == 0 and got.second == 0 and got.hour == 13


def test_e_and_pi(one_row):
    assert _val(one_row, flink_fn("e")) == pytest.approx(math.e)
    assert _val(one_row, flink_fn("pi")) == pytest.approx(math.pi)


def test_position(one_row):
    # Flink POSITION('b' IN csv) is 1-based
    assert _val(one_row, flink_fn("position", "b", F.col("csv"))) == 3


def test_dayofweek_flink_convention(one_row):
    # 2024-06-15 is a Saturday: Flink/Calcite DAYOFWEEK is 1=Sunday..7 -> 7
    # (reference SqlFuncTest.scala:421 "sunday = 1"), identical to Spark.
    assert _val(one_row, flink_fn("dayofweek", F.col("ts"))) == 7


def test_rand_integer_bounds(spark):
    df = spark.range(200).select(flink_fn("rand_integer", 5).alias("r"))
    vals = {r.r for r in df.collect()}
    assert vals <= {0, 1, 2, 3, 4}
    assert len(vals) >= 3


def test_identity_names_resolve():
    for name in ("abs", "upper", "coalesce", "year"):
        assert name in FLINK_FUNCTION_MAP


def test_overlaps_reference_golden(one_row):
    """(a,b) OVERLAPS (c,d) — reference SqlFuncTest.scala:477-478:
    (02:44:31, +1h) OVERLAPS (03:21:31, +2h) -> TRUE;
    (02:44:31, 03:44:31) OVERLAPS (03:45:31, 05:45:31) -> FALSE."""
    t = lambda s: F.to_timestamp(F.lit(f"2024-06-15 {s}"))
    assert _val(
        one_row,
        flink_fn("overlaps", t("02:44:31"), t("03:44:31"),
                 t("03:21:31"), t("05:21:31")),
    ) is True
    assert _val(
        one_row,
        flink_fn("overlaps", t("02:44:31"), t("03:44:31"),
                 t("03:45:31"), t("05:45:31")),
    ) is False
    # touching endpoints do not overlap; equal starts do
    assert _val(
        one_row,
        flink_fn("overlaps", t("02:00:00"), t("03:00:00"),
                 t("03:00:00"), t("04:00:00")),
    ) is False
    assert _val(
        one_row,
        flink_fn("overlaps", t("02:00:00"), t("02:00:00"),
                 t("02:00:00"), t("02:00:00")),
    ) is True
