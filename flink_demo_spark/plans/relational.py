"""Relational surface: joins, set ops, grouping, scalar functions.

Covers SURVEY.md §2.5 (joins), §2.6 (aggregations), §2.8 (sorts /
limits / set ops), §2.9 (scalar functions) — each table row in the
survey cites the reference demo it re-expresses (citations repeated
on each query below).

Spark-first notes: everything here is a declarative DataFrame plan;
Catalyst provides filter/projection pushdown, semi/anti-join rewrite
of EXISTS/IN, join reordering, and partial aggregation (reference
lists the same rewrites for the Blink planner at
``TableSQLFunc.scala:390-402``). Small dimensions (region, nation,
supplier) get explicit ``broadcast()`` hints — at 100 TB the fact
tables (lineitem, orders, events) shuffle on their join keys and the
dims must never shuffle.

Determinism: double SUM/AVG go through exact DECIMAL accumulation
(`plans/_util.py`) so Spark and DuckDB agree bit-for-bit regardless
of partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import (davg, davg_r, dratio_r, dsum, dsum_r, oavg, oavg_r,
                    oratio_r, osum, osum_r)
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation spine (reference: SQL GROUP BY demos QueryTest.scala:356-388,
# agg functions TableSQLFunc.scala:232-239)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum_r('l_quantity', out=2)}                                       AS sum_qty,
           {osum_r('l_extendedprice', out=2)}                                  AS sum_base_price,
           {osum_r('l_extendedprice * (1 - l_discount)', 6, out=2)}            AS sum_disc_price,
           {osum_r('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6, out=2)} AS sum_charge,
           {oavg_r('l_quantity', out=4)}                                        AS avg_qty,
           {oavg_r('l_extendedprice', out=4)}                                   AS avg_price,
           {oavg_r('l_discount', 6, out=4)}                                     AS avg_disc,
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style pricing summary: the scan->filter->agg spine.",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_r("l_quantity", out=2).alias("sum_qty"),
            dsum_r("l_extendedprice", out=2).alias("sum_base_price"),
            dsum_r(disc_price, 6, out=2).alias("sum_disc_price"),
            dsum_r(charge, 6, out=2).alias("sum_charge"),
            davg_r("l_quantity", out=4).alias("avg_qty"),
            davg_r("l_extendedprice", out=4).alias("avg_price"),
            davg_r(F.col("l_discount"), 6, out=4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_top_revenue",
    oracle=f"""
    SELECT l_orderkey,
           {osum_r('l_extendedprice * (1 - l_discount)', 6, out=2)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H-Q3-style: 3-way join + agg + deterministic top-10.",
    bench=True,
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_r(disc_price, 6, out=2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_regional_revenue",
    oracle=f"""
    SELECT n_name,
           {osum_r('l_extendedprice * (1 - l_discount)', 6, out=2)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H-Q5-style 6-way star join; dims broadcast, facts shuffle.",
    bench=True,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum_r(disc_price, 6, out=2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT c_nationkey,
           count(*)                         AS n_customers,
           {oavg_r('c_acctbal', out=4)}    AS avg_balance
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) > 5 AND avg(c_acctbal) > 0
    ORDER BY c_nationkey
    """,
    doc="GROUP BY + HAVING (reference QueryTest.scala:356-388).",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg_r("c_acctbal", out=4).alias("avg_balance"),
            F.avg("c_acctbal").alias("_avg_raw"),
        )
        .where((F.col("n_customers") > 5) & (F.col("_avg_raw") > 0))
        .drop("_avg_raw")
        .orderBy("c_nationkey")
    )


@query(
    "agg_distinct_counts",
    oracle=f"""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)             AS n_customers,
           count(*)                              AS n_orders,
           {osum_r('o_totalprice', out=2)}      AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="count(distinct) per group (reference TableSQLFunc.scala:998-1004 UV).",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum_r("o_totalprice", out=2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2)        AS sd_price,
           round(var_samp(l_discount), 6)                AS var_disc,
           round(median(l_quantity), 2)                  AS med_qty,
           round(corr(l_extendedprice, l_quantity), 4)   AS corr_pq,
           round(min(l_extendedprice), 2)                AS min_price,
           round(max(l_extendedprice), 2)                AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="statistical aggregates (stddev/var/median/corr).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.median("l_quantity"), 2).alias("med_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Multi-dimensional grouping (reference ROLLUP QueryTest.scala:427-454,
# CUBE 502-528, GROUPING SETS 556-582)
# ---------------------------------------------------------------------------


@query(
    "rollup_priority_status",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, {osum_r('o_totalprice', out=2)} AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_r("o_totalprice", out=2).alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "cube_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items, {osum_r('l_quantity', out=2)} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_r("l_quantity", out=2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "grouping_sets_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Joins (reference QueryTest.scala:609-699; DataSetFunc.scala:334-517)
# ---------------------------------------------------------------------------


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                                  AS n_orders,
           round(coalesce({osum('o_totalprice')}, 0.0), 2)    AS sum_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    ORDER BY c_custkey
    """,
    doc="LEFT OUTER JOIN preserving order-less customers.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(dsum("o_totalprice"), F.lit(0.0)), 2).alias(
                "sum_price"
            ),
        )
        
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, count(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="RIGHT OUTER JOIN preserving supplier-less nations.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        
    )


@query(
    "join_full_outer",
    oracle="""
    WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1),
         e AS (SELECT user_id  AS k, count(*) AS n_events FROM events GROUP BY 1)
    SELECT coalesce(o.k, e.k) AS k,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_events, 0) AS n_events
    FROM o FULL OUTER JOIN e ON o.k = e.k
    ORDER BY k
    """,
    doc="FULL OUTER JOIN of two aggregates over disjoint-ish key spaces.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        o.join(e, "k", "full")
        .select(
            "k",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    doc="LEFT SEMI join == EXISTS rewrite (reference TableSQLFunc.scala:398).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="LEFT ANTI join == NOT EXISTS rewrite (reference TableSQLFunc.scala:399).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    doc="cross join (reference QueryTest.scala:679-699).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return (
        region.crossJoin(F.broadcast(nation))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "join_inner_using",
    oracle="""
    SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_name
    """,
    doc="inner equi-join via USING-style key (reference QueryTest.scala:609-635).",
)
def join_inner_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").withColumnRenamed("n_regionkey", "r_regionkey")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), "r_regionkey")
        .select("n_name", "r_name")
        
    )


# ---------------------------------------------------------------------------
# Set operations / distinct (reference QueryTest.scala:127-344,
# TabApiTest.scala:877-949)
# ---------------------------------------------------------------------------


@query(
    "setop_union_distinct",
    oracle="""
    SELECT k FROM (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    ) ORDER BY k
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"))
    )
    return a.union(b).distinct()


@query(
    "setop_union_all",
    oracle="""
    SELECT k, count(*) AS n FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
    ) GROUP BY k ORDER BY k
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    b = orders.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("k")
    )
    return a.unionAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    ORDER BY k
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.subtract(b)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ORDER BY k
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("k"))
    )
    return a.intersect(b)


@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


@query(
    "order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
    doc="ORDER BY + LIMIT + OFFSET (reference TabApiTest.scala:978-997).",
)
def order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Lateral / UNNEST (reference QueryTest.scala:715-771 LATERAL TABLE(split),
# unnest of arrays)
# ---------------------------------------------------------------------------


@query(
    "explode_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    ORDER BY n DESC, word
    """,
    doc="UDTF/LATERAL-style explode: split p_name and count words.",
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        
    )


# ---------------------------------------------------------------------------
# Scalar function parity (reference SqlFuncTest.scala §2.9)
# ---------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS up_name,
           lower(p_brand)                                  AS low_brand,
           substr(p_name, 1, 4)                            AS sub4,
           concat_ws('|', p_brand, p_type)                 AS joined,
           CAST(length(p_name) AS INT)                     AS name_len,
           replace(p_name, ' ', '_')                       AS underscored,
           reverse(p_type)                                 AS rev_type,
           lpad(p_brand, 12, '*')                          AS padded,
           trim(p_name)                                    AS trimmed,
           CAST(strpos(p_name, 'e') AS INT)                AS pos_e,
           string_split(p_name, ' ')[1]                    AS first_word,
           repeat(p_brand, 2)                              AS doubled,
           md5(p_name)                                     AS name_md5,
           left(p_type, 3)                                 AS left3,
           right(p_type, 3)                                AS right3,
           CAST(ascii(p_brand) AS INT)                     AS first_ascii
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
    doc="string function parity (reference SqlFuncTest.scala:224-292).",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.lower("p_brand").alias("low_brand"),
            F.substring("p_name", 1, 4).alias("sub4"),
            F.concat_ws("|", "p_brand", "p_type").alias("joined"),
            F.length("p_name").alias("name_len"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
            F.reverse("p_type").alias("rev_type"),
            F.lpad("p_brand", 12, "*").alias("padded"),
            F.trim("p_name").alias("trimmed"),
            F.instr("p_name", "e").alias("pos_e"),
            F.element_at(F.split("p_name", " "), 1).alias("first_word"),
            F.repeat("p_brand", 2).alias("doubled"),
            F.md5("p_name").alias("name_md5"),
            F.substring("p_type", 1, 3).alias("left3"),
            F.expr("right(p_type, 3)").alias("right3"),
            F.ascii("p_brand").alias("first_ascii"),
        )
        
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 1000), 2)        AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT)             AS ceil_qty,
           CAST(floor(l_quantity) AS BIGINT)            AS floor_qty,
           round(sqrt(l_extendedprice), 6)              AS sqrt_price,
           round(ln(l_extendedprice + 1), 6)            AS ln_price,
           round(log10(l_extendedprice + 1), 6)         AS log10_price,
           round(power(l_discount + 1, 3), 6)           AS pow_disc,
           CAST(l_orderkey % 7 AS BIGINT)               AS mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE)      AS sign_disc,
           round(exp(l_discount), 6)                    AS exp_disc,
           greatest(l_quantity, 25.0)                   AS gq,
           least(l_quantity, 25.0)                      AS lq,
           round(sin(l_discount), 6)                    AS sin_d,
           round(cos(l_discount), 6)                    AS cos_d,
           round(tan(l_discount), 6)                    AS tan_d,
           round(asin(l_discount), 6)                   AS asin_d,
           round(acos(l_discount), 6)                   AS acos_d,
           round(atan(l_quantity), 6)                   AS atan_q,
           round(atan2(l_quantity, 7.0), 6)             AS atan2_q,
           round((exp(l_discount) - exp(-l_discount)) / 2, 6)  AS sinh_d,
           round((exp(l_discount) + exp(-l_discount)) / 2, 6)  AS cosh_d,
           round((exp(2 * l_discount) - 1)
                 / (exp(2 * l_discount) + 1), 6)        AS tanh_d,
           round(cot(l_discount + 0.01), 6)             AS cot_d,
           round(degrees(l_discount), 6)                AS deg_d,
           round(radians(l_quantity), 6)                AS rad_q,
           bin(CAST(l_orderkey AS BIGINT))              AS bin_key,
           hex(CAST(l_orderkey AS BIGINT))              AS hex_key
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    doc=(
        "math function parity, one wide batch (reference SqlFuncTest."
        "scala:139-220): abs/ceil/floor/sqrt/ln/log10/power/mod/sign/"
        "exp/greatest/least plus trig (sin..atan2), hyperbolics, cot, "
        "degrees/radians, BIN, HEX. round(6) absorbs the <=1-ulp "
        "libm-vs-JVM differences; DuckDB lacks hyperbolics, so the "
        "oracle uses the exp() forms. (Formerly two registry entries; "
        "merged so the driver's fixed sample reaches more operators.)"
    ),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000), 2).alias("abs_diff"),
        F.ceil("l_quantity").alias("ceil_qty"),
        F.floor("l_quantity").alias("floor_qty"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_price"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("pow_disc"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_disc"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.greatest("l_quantity", F.lit(25.0)).alias("gq"),
        F.least("l_quantity", F.lit(25.0)).alias("lq"),
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.tan("l_discount"), 6).alias("tan_d"),
        F.round(F.asin("l_discount"), 6).alias("asin_d"),
        F.round(F.acos("l_discount"), 6).alias("acos_d"),
        F.round(F.atan("l_quantity"), 6).alias("atan_q"),
        F.round(F.atan2(F.col("l_quantity"), F.lit(7.0)), 6).alias("atan2_q"),
        F.round(F.sinh("l_discount"), 6).alias("sinh_d"),
        F.round(F.cosh("l_discount"), 6).alias("cosh_d"),
        F.round(F.tanh("l_discount"), 6).alias("tanh_d"),
        F.round(F.cot(F.col("l_discount") + 0.01), 6).alias("cot_d"),
        F.round(F.degrees("l_discount"), 6).alias("deg_d"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
        F.bin(F.col("l_orderkey").cast("long")).alias("bin_key"),
        F.hex(F.col("l_orderkey").cast("long")).alias("hex_key"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                        AS yr,
           CAST(month(o_orderdate) AS INT)                       AS mo,
           CAST(dayofmonth(o_orderdate) AS INT)                  AS dom,
           CAST(quarter(o_orderdate) AS INT)                     AS qtr,
           date_trunc('month', o_orderdate)                      AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE)) AS INT)          AS days_since,
           o_orderdate + INTERVAL 30 DAY                         AS plus30,
           strftime(o_orderdate, '%Y-%m-%d')                     AS iso_day
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    doc="temporal function parity (reference SqlFuncTest.scala:296-504).",
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("plus30"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                                  AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING')      AS status_norm,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END                               AS is_rush
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    doc="CASE/COALESCE/NULLIF/IN conditionals (reference SqlFuncTest.scala:52-135).",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_rush"),
    )


@query(
    "select_without_from",
    oracle="""
    SELECT 2 AS two, 'hello' AS greeting, round(sqrt(2.0), 6) AS root2
    """,
    doc="SELECT without FROM (reference QueryTest.scala:117-121).",
)
def select_without_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        "SELECT 2 AS two, 'hello' AS greeting, round(sqrt(2.0), 6) AS root2"
    )


@query(
    "values_inline_table",
    oracle="""
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, name)
    ORDER BY id
    """,
    doc=(
        "inline VALUES table (reference fromValues TabApiTest.scala:"
        "149-175, fromElements): literal rows as a relation."
    ),
)
def values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, name) "
        "ORDER BY id"
    )


@query(
    "posexplode_ordinality",
    oracle="""
    SELECT p_partkey,
           CAST(generate_subscripts(t, 1) - 1 AS INT) AS pos,
           unnest(t) AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS t FROM part)
    WHERE p_partkey < 100
    ORDER BY p_partkey, pos
    """,
    doc=(
        "UNNEST WITH ORDINALITY / posexplode (reference unnest "
        "QueryTest.scala:752-771): position-indexed lateral explode."
    ),
)
def posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return (
        p.select(
            "p_partkey",
            F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
        )
        
    )


@query(
    "natural_join",
    oracle="""
    SELECT n_name, r_name
    FROM (SELECT n_name, n_regionkey AS regionkey FROM nation)
    NATURAL JOIN (SELECT r_name, r_regionkey AS regionkey FROM region)
    ORDER BY n_name
    """,
    doc="NATURAL JOIN on a shared column name (reference QueryTest.scala:679-699).",
)
def natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        SELECT n_name, r_name
        FROM (SELECT n_name, n_regionkey AS regionkey FROM nation)
        NATURAL JOIN (SELECT r_name, r_regionkey AS regionkey FROM region)
        ORDER BY n_name
        """
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {osum_r('l_extendedprice * (1 - l_discount)', 6, out=2)} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H-Q10-style returned-items report: 4-way join, filtered "
        "fact scan, top-20 by revenue (broadcast nation; orders/lineitem "
        "shuffle on their keys)."
    ),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_r(disc_price, 6, out=2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_orderdate,
           {osum_r('l_quantity', out=2)} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
    doc=(
        "TPC-H-Q18-style large-volume orders: IN over a grouped-HAVING "
        "subquery (semi-join after pre-aggregation) + re-aggregation."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum_r("l_quantity", out=2).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@query(
    "agg_distinct_sums",
    oracle="""
    SELECT l_linestatus,
           round(sum(DISTINCT l_quantity), 2)           AS sum_distinct_qty,
           round(avg(DISTINCT l_quantity), 4)           AS avg_distinct_qty,
           count(DISTINCT l_partkey)                    AS n_parts
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc=(
        "sum(DISTINCT)/avg(DISTINCT) (reference sum0.distinct, "
        "count(distinct) TabApiTest.scala:375-392; quantities are "
        "integral so the distinct sums are exact)."
    ),
)
def agg_distinct_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias(
                "sum_distinct_qty"
            ),
            F.round(F.expr("avg(DISTINCT l_quantity)"), 4).alias(
                "avg_distinct_qty"
            ),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "predicate_between_symmetric",
    oracle="""
    SELECT p_partkey,
           (p_size BETWEEN 30 AND 10) AS plain_reversed,
           (p_size BETWEEN least(10, 30) AND greatest(10, 30)) AS symmetric
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
    doc=(
        "BETWEEN SYMMETRIC expansion (reference SqlFuncTest.scala:52-99: "
        "Spark/DuckDB lack SYMMETRIC — expand via least/greatest; the "
        "reversed plain BETWEEN is always false)."
    ),
)
def predicate_between_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.col("p_size").between(30, 10).alias("plain_reversed"),
        F.col("p_size")
        .between(F.least(F.lit(10), F.lit(30)), F.greatest(F.lit(10), F.lit(30)))
        .alias("symmetric"),
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT {oratio_r(
              "sum(CASE WHEN p_type = 'ECONOMY' "
              "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) "
              "ELSE CAST(0 AS DECIMAL(18,6)) END) * 100",
              "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))",
              6, 6, 4)} AS economy_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc=(
        "TPC-H-Q14-style conditional-aggregate ratio: CASE inside SUM, "
        "exact decimal accumulation, single output row."
    ),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "ECONOMY", disc).otherwise(zero)
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        dratio_r(
            F.sum(promo) * F.lit(100), F.sum(disc), 6, 6, 4
        ).alias("economy_share_pct")
    )


@query(
    "q22_dormant_customers",
    oracle=f"""
    SELECT CAST(c_nationkey % 5 AS INT) AS code,
           count(*) AS n_customers,
           {osum_r('c_acctbal', out=2)} AS total_balance
    FROM customer
    WHERE c_acctbal > (SELECT {oavg('c_acctbal')} FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey % 5
    ORDER BY code
    """,
    doc=(
        "TPC-H-Q22-style: scalar subquery threshold + NOT EXISTS anti "
        "join + derived grouping code (Catalyst decorrelation + "
        "RewritePredicateSubquery, reference TableSQLFunc.scala:392-399)."
    ),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views_needed = _t(spark, sf_dir, "customer")
    from ..catalog import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT CAST(c_nationkey % 5 AS INT) AS code,
               count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_balance
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / count(c_acctbal)
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey % 5
        ORDER BY code
        """
    )


@query(
    "zip_with_index",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx,
           o_orderkey
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY idx
    """,
    doc=(
        "deterministic zipWithIndex (reference DataSetFunc.scala:989-1012): "
        "0-based dense index over a total order (Flink's zipWithIndex is "
        "partition-order-dependent; the deterministic form fixes the order)."
    ),
)
def zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    w = Window.orderBy("o_orderkey")
    return o.select(
        (F.row_number().over(w) - 1).cast("long").alias("idx"), "o_orderkey"
    )


@query(
    "scalar_datetime_funcs2",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) + INTERVAL 3 HOUR               AS plus3h,
           CAST(ts AS TIMESTAMP) + INTERVAL 2 MONTH              AS plus2mo,
           CAST(date_diff('minute',
                  date_trunc('day', CAST(ts AS TIMESTAMP)),
                  CAST(ts AS TIMESTAMP)) AS INT)                 AS mins_into_day,
           CAST(last_day(CAST(CAST(ts AS TIMESTAMP) AS DATE))
                AS TIMESTAMP)                                    AS eom,
           CAST(week(CAST(ts AS TIMESTAMP)) AS INT)              AS wk,
           CAST(dayofyear(CAST(ts AS TIMESTAMP)) AS INT)         AS doy,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)   AS unix_s
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
    doc=(
        "second temporal batch (reference SqlFuncTest.scala:296-504: "
        "TIMESTAMPADD, TIMESTAMPDIFF, LAST_DAY, WEEK, DAYOFYEAR, unix "
        "conversions). Cross-engine traps pinned here: DuckDB epoch() "
        "ROUNDS fractional seconds (oracle floors to match Spark's "
        "truncating unix_timestamp), Spark add_months drops the "
        "time-of-day (timestampadd keeps it, matching DuckDB interval "
        "arithmetic), and last_day is DATE-typed (cast TIMESTAMP both "
        "sides per the determinism contract)."
    ),
)
def scalar_datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.expr("timestampadd(HOUR, 3, ts)").alias("plus3h"),
        F.expr("timestampadd(MONTH, 2, ts)").alias("plus2mo"),
        F.expr("timestampdiff(MINUTE, date_trunc('day', ts), ts)")
        .cast("int")
        .alias("mins_into_day"),
        F.last_day("ts").cast("timestamp").alias("eom"),
        F.weekofyear("ts").alias("wk"),
        F.dayofyear("ts").alias("doy"),
        F.unix_timestamp("ts").alias("unix_s"),
    )


# (scalar_math_funcs2 merged into scalar_math_funcs above)


@query(
    "join_salted_skew",
    # the salt must not change the join result — the oracle is the
    # PLAIN equi-join, which is exactly the operator's contract
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_orderkey
    """,
    doc=(
        "salting for skewed join keys (SURVEY §2.4 partitionCustom / "
        "skew handling): the large side salts on its full row hash, "
        "the small side replicates salt times, and the result is "
        "bit-identical to the plain equi-join — one hot key spreads "
        "over `salt` reducers instead of one straggler task."
    ),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import skew

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    out = skew.salted_join(orders, cust, "o_custkey", salt=8)
    return out.select("o_orderkey", "c_name")


@query(
    "agg_salted_hot_keys",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "two-phase salted aggregation for ultra-hot grouping keys "
        "(SURVEY §2.4; 5 event types x 20% of the stream each is the "
        "worst-case hot-key shape): partial agg on (key, salt) then "
        "final on key, decimal-exact, equal to the direct group-by."
    ),
)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import skew

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return skew.salted_agg(ev, "event_type", "value", salt=16).orderBy(
        "event_type"
    )


@query(
    "cogroup_order_items",
    # coGroup emits one row per key with BOTH sides' groups, keys
    # present on either side included — the full-outer aggregated join
    oracle="""
    WITH o AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1),
         l AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1)
    SELECT coalesce(o.k, l.k) AS k,
           coalesce(o.n, 0) AS n_orders,
           coalesce(l.n, 0) AS n_items
    FROM o FULL JOIN l ON o.k = l.k
    ORDER BY k
    """,
    doc=(
        "coGroup (reference DataSetFunc.scala:334-477): per-key PAIR "
        "of row groups processed together via "
        "groupBy().cogroup().applyInPandas — keys present on either "
        "side appear once with both groups (possibly empty), the "
        "semantics a join cannot express without a full-outer + "
        "aggregate detour."
    ),
)
def cogroup_order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.streams_util import cogroup_apply

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )

    def counts(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        k = l["k"].iloc[0] if len(l) else r["k"].iloc[0]
        return pd.DataFrame(
            {"k": [k], "n_orders": [len(l)], "n_items": [len(r)]}
        )

    out = cogroup_apply(
        orders, li, ["k"], counts, "k long, n_orders long, n_items long"
    )
    return out


@query(
    "join_bucketed_colocated",
    # co-location must not change the join result: the plain
    # aggregated equi-join is the oracle; the no-Exchange property is
    # plan-asserted in tests (test_bucketed_join_no_exchange)
    oracle="""
    SELECT o.o_custkey AS custkey, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_spend,
           min(c.c_name) AS c_name
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY o.o_custkey ORDER BY custkey
    """,
    doc=(
        "co-located bucketed join (reference partitionByHash / "
        "co-located join DataSetFunc.scala:546-617): both sides "
        "persisted bucketed+sorted on the key, so the join needs no "
        "exchange at read time — result identical to the plain join."
    ),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import bucketed_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    bo = bucketed_table(spark, orders, "q_bucketed_orders", "o_custkey")
    bc = bucketed_table(
        spark,
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_name"),
        "q_bucketed_customer",
        "o_custkey",
    )
    out = (
        bo.join(bc, "o_custkey")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
            F.min("c_name").alias("c_name"),
        )
    )
    return out


_PRIORITIES = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "not_specified"),
    ("5-LOW", "low"),
]


@query(
    "pivot_status_priority",
    oracle="SELECT o_orderstatus, "
    + ", ".join(
        "CAST(round(sum(CASE WHEN o_orderpriority = '{p}' THEN"
        " CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE)"
        " AS {a}".format(p=p, a=a)
        for p, a in _PRIORITIES
    )
    + " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "PIVOT / cross-tab (order value by status x priority) - the "
        "reshape every BI layer asks of a table API, via Spark's "
        "native groupBy().pivot() with an EXPLICIT value list (no "
        "discovery pass - with values given, pivot compiles to one "
        "conditional-aggregate pass, a plain partial-agg shuffle; "
        "without them Spark first runs a distinct job). Cell values "
        "use the repo's exact-decimal sum contract (dsum_r) so every "
        "cell is order-independent and half-up-rounded identically "
        "to the oracle's conditional CASE sums; absent cells are "
        "NULL in both engines."
    ),
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import DecimalType

    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [p for p, _ in _PRIORITIES])
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DecimalType(18, 4))), 2
            ).cast("double")
        )
    )
    return piv.select(
        "o_orderstatus",
        *[F.col(f"`{p}`").alias(a) for p, a in _PRIORITIES],
    )
