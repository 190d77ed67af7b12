"""Subquery surface: scalar/IN/EXISTS, correlated and not
(SURVEY.md §2.9 comparison rows `IN (subquery)`, `EXISTS`;
§4.1 decorrelation — Catalyst rewrites these like Blink does,
reference TableSQLFunc.scala:392, 398-399) + count windows
(§2.7 row: no native Spark equivalent; batch form is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ._util import oavg
from .registry import query


@query(
    "subquery_scalar_correlated",
    oracle=f"""
    SELECT l.l_partkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS below_avg_revenue
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
    """,
    doc=(
        "correlated scalar subquery (TPC-H-Q17 shape): revenue of "
        "below-half-average-quantity items per part. Catalyst "
        "decorrelates to an aggregate + join (reference lists the same "
        "rewrite for Blink, TableSQLFunc.scala:392)."
    ),
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l.l_partkey,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS below_avg_revenue
        FROM lineitem l
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        ORDER BY l.l_partkey
        """
    )


@query(
    "subquery_in_uncorrelated",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    ORDER BY s_suppkey
    """,
    doc="IN (subquery) -> left semi join rewrite (reference SqlFuncTest.scala:83-115).",
)
def subquery_in_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "nation", "region")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (
          SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        ORDER BY s_suppkey
        """
    )


@query(
    "subquery_scalar_global",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.5 * (SELECT {oavg('o_totalprice')} FROM orders)
    ORDER BY o_orderkey
    """,
    doc="uncorrelated scalar subquery: orders above 1.5x the global average.",
)
def subquery_scalar_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / count(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@query(
    "count_window_agg",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    )
    SELECT user_id,
           CAST((rn - 1) // 10 AS BIGINT) AS window_no,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, (rn - 1) // 10
    ORDER BY user_id, window_no
    """,
    doc=(
        "count window (reference countWindow(n) DataStreamFunc.scala:"
        "945-1208 — no Spark native equivalent): tumbling windows of 10 "
        "events per key, batch form via row_number div; streaming form "
        "in streaming/stateful.count_window."
    ),
    bench=True,
)
def count_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("window_no", ((F.col("rn") - 1) / 10).cast("long"))
        .groupBy("user_id", "window_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
                ).cast("double").alias("sum_value"),
        )
        
    )
