"""OVER windows, Top-N, dedup-by-rank (SURVEY.md §2.7).

Re-expresses the reference's OVER-window demos
(``QueryTest.scala:873-927``, ``TableOverWindow.scala:44-341``), the
row_number Top-N idiom (``QueryTest.scala:1180-1207``, HotItems top-3)
and row_number=1 deduplication (``QueryTest.scala:1218-1247``).

Scale notes: every window here partitions by a key (customer,
nation, user) — one shuffle on the partition key, then a local sort
per partition. No global sorts in any hot path; the only global
ORDER BY clauses are on final small outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.topn import top_n_per_group
from ._util import dratio_r, oratio_r
from .registry import query


@query(
    "over_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
    doc="OVER ... ROWS UNBOUNDED PRECEDING (reference QueryTest.scala:873-886).",
)
def over_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w), 2
            ).cast("double").alias("running_total"),
        )
        
    )


@query(
    "over_moving_avg",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {oratio_r(
               "sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w_ma",
               "CAST(count(o_totalprice) OVER w_ma AS DECIMAL(18,0))",
               4, 0, 4)} AS moving_avg
    FROM orders
    WHERE o_custkey < 100
    WINDOW w_ma AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="OVER ... ROWS 2 PRECEDING (reference QueryTest.scala:899-927).",
)
def over_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            dratio_r(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w),
                F.count("o_totalprice").over(w).cast("decimal(18,0)"),
                4, 0, 4,
            ).alias("moving_avg"),
        )
        
    )


@query(
    "over_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey)  OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(row_number() OVER w AS INT) AS seq,
           CAST(rank()      OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderstatus) AS BIGINT) AS status_rank
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, seq
    """,
    doc="lag/lead/row_number/rank over named window.",
)
def over_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.row_number().over(w).alias("seq"),
            F.rank().over(w2).cast("long").alias("status_rank"),
        )
        
    )


@query(
    "topn_per_group",
    oracle="""
    SELECT c_nationkey, rk, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
      FROM customer
    ) WHERE rk <= 3
    ORDER BY c_nationkey, rk
    """,
    doc="row_number Top-N per group (reference QueryTest.scala:1180-1207; HotItems top-3).",
    bench=True,
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return top_n_per_group(
        cust,
        partition_by=["c_nationkey"],
        order_by=[F.desc("c_acctbal"), F.asc("c_custkey")],
        n=3,
    ).select("c_nationkey", "rk", "c_custkey", "c_acctbal").orderBy("c_nationkey", "rk")


@query(
    "dedup_first_per_key",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rk  -- filtered out
      FROM events
    ) WHERE rk = 1
    ORDER BY user_id
    """,
    doc="dedup via row_number=1 (reference QueryTest.scala:1218-1247; versioned view).",
)
def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        
    )


@query(
    "over_range_interval",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS n_last_hour
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="RANGE OVER window with time interval frame (reference TableOverWindow.scala bounded-range variants).",
)
def over_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT user_id, event_id,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS n_last_hour
        FROM events
        ORDER BY user_id, event_id
        """
    )


@query(
    "ntile_quartiles",
    oracle="""
    SELECT q, count(*) AS n, CAST(round(CAST(min(o_totalprice) AS DECIMAL(18,4)), 2) AS DOUBLE) AS min_price,
           CAST(round(CAST(max(o_totalprice) AS DECIMAL(18,4)), 2) AS DOUBLE) AS max_price
    FROM (
      SELECT o_totalprice,
             CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS q
      FROM orders
    )
    GROUP BY q ORDER BY q
    """,
    doc="ntile bucketing over a global order (single-shuffle, agg output).",
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("q"))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice").cast("decimal(18,4)"), 2).cast("double").alias("min_price"),
            F.round(F.max("o_totalprice").cast("decimal(18,4)"), 2).cast("double").alias("max_price"),
        )
        .orderBy("q")
    )


@query(
    "over_distinct_agg",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER w AS INT) AS n_types,
           CAST(sum(DISTINCT CAST(round(value * 100) AS BIGINT)) OVER w
                AS BIGINT) AS sum_distinct_cents
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc=(
        "DISTINCT aggregates in an OVER window (reference QueryTest "
        "distinct-agg-over rows): Spark has no count/sum(DISTINCT) "
        "OVER, so the running distinct state is a collect_set over the "
        "frame — count = size(set), sum = fold over the set (integer "
        "cents keep the fold engine-exact). Set size is bounded by the "
        "distinct-value domain per key, so the frame state scales."
    ),
)
def over_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types"),
        F.aggregate(
            F.collect_set(cents).over(w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_distinct_cents"),
    )
