"""TPC-H-style suite completion (adapted to the driver's reduced schema).

Round 1 shipped Q1/Q3/Q5/Q10/Q14/Q18/Q22; this module adds the
remaining patterns the test schema supports: Q4 (correlated EXISTS),
Q6 (selective scan-agg), Q7/Q8/Q9 (multi-way join + year extraction +
conditional share), Q12 (conditional counts), Q13 (outer-join
distribution), Q15 (view + scalar-max equality), Q16 (NOT IN + distinct
count), Q17 (correlated avg subquery), Q19 (OR-of-ANDs pushdown),
Q21 (double EXISTS/NOT EXISTS via per-key window sets).

The reference exercises the same relational surface through its Blink
planner batch demos (``TableSQLFunc.scala:390-402``, ``QueryTest
.scala:356-388``); TPC-H shapes are the canonical stand-ins.

Adaptations forced by the schema (no partsupp, no commit/receipt
dates, no shipmode/shipinstruct): Q2/Q11/Q20 run against a partsupp
DERIVED deterministically from part x supplier with dbgen's public
supplier-assignment formula (see the Q2/Q11/Q20 section below) — both
engines materialize the identical relation, so the three query shapes
are exercised for real; Q4/Q21 define "late" as shipping >60 days
after the order date; Q12 buckets by l_returnflag instead of
l_shipmode; Q16 counts lineitem suppliers instead of partsupp rows.

Scale notes (100 TB): every query keeps the fact tables (lineitem,
orders) on the build side of shuffles keyed by their join keys;
dimension tables (region, nation, supplier, part subsets) are
broadcast so they never shuffle the fact side. Q17 semi-filters
lineitem down to the brand's parts BEFORE the per-part average so the
heavy groupBy runs on ~1/25 of the data. Q21's double-EXISTS is one
window pass over (orderkey)-partitioned lineitem — no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..catalog import load_table
from ._util import dratio_r, dsum, dsum_r, oratio_r, osum, osum_r
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
_OREV = "l_extendedprice * (1 - l_discount)"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H-Q4-style: correlated EXISTS -> left-semi join with a "
    "non-equi residual (late = shipped >60d after order).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {osum_r('l_extendedprice * l_discount', 6, out=2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H-Q6: selective scan + single agg; all predicates push to "
    "the parquet scan (verified in tests/test_plan_properties.py).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_r(
                F.col("l_extendedprice") * F.col("l_discount"), 6, out=2
            ).alias("revenue")
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {osum_r('volume', 6, out=2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             {_OREV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H-Q7: bi-national volume; dims broadcast, facts shuffle "
    "once per equi-join key.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_r(_rev(), 6, out=2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {oratio_r("sum(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END AS DECIMAL(18,6)))",
                      "sum(CAST(volume AS DECIMAL(18,6)))", 6, 6, 6)} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_OREV} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H-Q8: market share of NATION_5 suppliers in EUROPE for "
    "ECONOMY parts; conditional share of decimal-exact sums.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("c_nk")
    )
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    li = _t(spark, sf_dir, "lineitem")
    vol = _rev()
    base = (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"), "inner")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    share_num = F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0)
    return (
        base.groupBy("o_year")
        .agg(
            dratio_r(
                F.sum(share_num.cast(DecimalType(18, 6))),
                F.sum(F.col("volume").cast(DecimalType(18, 6))),
                6, 6, 6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {osum_r('amount', 6, out=2)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_OREV} AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H-Q9 (no partsupp -> revenue in place of profit): "
    "LIKE-filtered part dim broadcast against the lineitem fact.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("nation", "o_year")
        .agg(dsum_r(_rev(), 6, out=2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END)
             AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H-Q12-style (returnflag for shipmode): conditional counts "
    "by priority class.",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H-Q13: outer join with an ON-clause residual, two-level "
    "aggregation (per-customer then distribution).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    cond = (cu["c_custkey"] == o["o_custkey"]) & (
        o["o_orderpriority"] != "1-URGENT"
    )
    return (
        cu.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST({_OREV} AS DECIMAL(18,6))) AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_rev_dec, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H-Q15: revenue view + scalar max subquery; equality is "
    "safe because revenue accumulates in exact DECIMAL on both engines.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev().cast(DecimalType(18, 6))).alias("total_rev_dec")
    )
    # scalar max via a window over the aggregated (supplier-cardinality)
    # result, NOT a second aggregation of lineitem: one fact-table scan
    # total; the empty partitionBy is safe because rev is dim-sized
    mx = F.max("total_rev_dec").over(Window.partitionBy())
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("mx", mx)
        .where(F.col("total_rev_dec") == F.col("mx"))
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev_dec"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < -500)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H-Q16-style (lineitem suppliers for partsupp): NOT IN "
    "anti-join + count distinct.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < -500).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT {oratio_r('sum(CAST(l_extendedprice AS DECIMAL(18,4)))', 'CAST(7 AS DECIMAL(18,0))', 4, 0, 2)} AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS avg_pk,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    / count(l_quantity)) AS qty_threshold
      FROM lineitem
      GROUP BY l_partkey
    ) pa ON avg_pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold
    """,
    doc="TPC-H-Q17: correlated per-part average -> semi-filter lineitem "
    "to the brand's parts first so the heavy per-part agg runs on the "
    "reduced set (per-part avg is unchanged by the part filter).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
    avg_q = branded.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast(DecimalType(18, 4))).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_threshold")
    )
    return (
        branded.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("avg_pk"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dratio_r(
                F.sum(F.col("l_extendedprice").cast(DecimalType(18, 4))),
                F.lit(7).cast(DecimalType(18, 0)),
                4, 0, 2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {osum_r(_OREV, 6, out=2)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H-Q19-style: OR-of-ANDs join residual; Catalyst extracts "
    "the common p_partkey equi-key so this stays a hash join.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm(
        "Brand#4", 15, 20, 30
    )
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(dsum_r(_rev(), 6, out=2).alias("revenue"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H-Q21-style (late = shipped >60d after order date): the "
    "EXISTS/NOT-EXISTS pair collapses to one window pass over "
    "orderkey-partitioned lineitem — distinct-supplier count >1 and "
    "distinct LATE-supplier count ==1 — instead of two self-joins.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn("is_late", late).select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(late, F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        j.where(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20 — the three queries the driver schema blocked for nine
# rounds (no partsupp table). Unblocked by DERIVING partsupp
# deterministically from part x supplier with dbgen's own public
# supplier-assignment formula (TPC-H spec 4.2.3 / dbgen build.c:
# suppkey = (partkey + i*(S/4 + (partkey-1)/S)) % S + 1, i in 0..3), so
# BOTH engines materialize the identical 4-suppliers-per-part relation
# and the three query shapes (correlated min, global-fraction HAVING,
# quantity-threshold semi-join chain) run for real. availqty and
# supplycost are deterministic integer mixes (cents — never floats), so
# every comparison and aggregate below is integer-exact.
# ---------------------------------------------------------------------------

_PS_SQL = """ps AS (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey + i.i * (s.cnt // 4 + (p_partkey - 1) // s.cnt))
                  % s.cnt + 1 AS BIGINT) AS ps_suppkey,
             CAST((p_partkey * 31 + i.i * 17) % 9999 + 1 AS BIGINT)
               AS ps_availqty,
             CAST((p_partkey * 7 + i.i * 3) % 99900 + 100 AS BIGINT)
               AS ps_supplycost_cents
      FROM part
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
      CROSS JOIN (SELECT count(*) AS cnt FROM supplier) s
    )"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp relation (see module comment above): 4 rows
    per part, supplier picked by the dbgen formula over the ACTUAL
    supplier count (a 1-row broadcast — the relation scales with the
    dims, and derivation is a pure map over part at 100 TB)."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    scnt = _t(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    return (
        part.crossJoin(F.broadcast(scnt))
        .select(
            "p_partkey",
            "s_cnt",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "CAST((p_partkey + i * (s_cnt DIV 4 + (p_partkey - 1)"
                " DIV s_cnt)) % s_cnt + 1 AS BIGINT)"
            ).alias("ps_suppkey"),
            F.expr(
                "CAST((p_partkey * 31 + i * 17) % 9999 + 1 AS BIGINT)"
            ).alias("ps_availqty"),
            F.expr(
                "CAST((p_partkey * 7 + i * 3) % 99900 + 100 AS BIGINT)"
            ).alias("ps_supplycost_cents"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_SQL}, euro AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents,
             s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), mn AS (
      SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost_cents
      FROM euro GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           e.ps_supplycost_cents AS supplycost_cents
    FROM euro e
    JOIN mn ON mn.ps_partkey = e.ps_partkey
           AND e.ps_supplycost_cents = mn.min_cost_cents
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size = 15
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc=(
        "TPC-H-Q2 (minimum-cost supplier) on the derived partsupp: "
        "for every size-15 part, the EUROPE supplier(s) "
        "offering the region-wide minimum supply cost - the "
        "correlated-min-subquery pattern, planned as a group-min + "
        "equality join back (one pass over the region-filtered "
        "partsupp instead of a per-row subquery). All dims "
        "(supplier/nation/region/part filters) broadcast; the only "
        "shuffles are the per-part min census and its join back - "
        "at 100 TB partsupp is fact-sized and this stays a "
        "single-shuffle pattern. Costs compared in integer cents; "
        "top-100 deterministic via the full TPC-H tie-break chain."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro = (
        ps.join(F.broadcast(supp), ps["ps_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "ps_partkey", "ps_supplycost_cents", "s_acctbal", "s_name",
            "n_name",
        )
        .persist()  # 2 consumers: the min census + the detail join
    )
    # the census side re-aliases its key: mn derives FROM euro, and an
    # un-renamed self-join would carry ambiguous attribute references
    mn = euro.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost_cents")
    ).withColumnRenamed("ps_partkey", "mn_partkey")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") == 15)
    return (
        euro.join(
            mn,
            (F.col("ps_partkey") == F.col("mn_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("min_cost_cents")),
        )
        .join(F.broadcast(part), euro["ps_partkey"] == part["p_partkey"])
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("ps_supplycost_cents").alias("supplycost_cents"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_SQL}, nat_ps AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_cents * ps.ps_availqty AS v
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ), val AS (
      SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
      FROM nat_ps GROUP BY ps_partkey
    ), tot AS (
      SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n_parts FROM val
    )
    SELECT ps_partkey, value_cents
    FROM val, tot
    WHERE value_cents * n_parts > 2 * total_cents
    ORDER BY value_cents DESC, ps_partkey
    """,
    doc=(
        "TPC-H-Q11 (important stock identification) on the derived "
        "partsupp: parts whose NATION_7 stock value exceeds "
        "twice the average per-part value, the global-fraction "
        "HAVING pattern. TPC-H scales its fraction by 1/SF so the "
        "row count stays meaningful as parts grow; the same "
        "scale-relative idea here is value > 2x the mean, as the "
        "integer cross-multiplication value_cents * n_parts > "
        "2 * total_cents (no float fraction, no fixed constant "
        "that empties at 100 TB - the dedup posting cap's lesson), "
        "the "
        "nation filter broadcasts onto the partsupp scan, and the "
        "global total is a 1-row broadcast over the per-part value "
        "census - one shuffle, census-sized everything after, the "
        "shape that survives a fact-sized partsupp at 100 TB."
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    val = (
        ps.join(F.broadcast(supp), ps["ps_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long")
            .alias("value_cents")
        )
        .persist()  # 2 consumers: the global total + the filter
    )
    tot = val.agg(
        F.sum("value_cents").cast("long").alias("total_cents"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .where(
            F.col("value_cents") * F.col("n_parts")
            > 2 * F.col("total_cents")
        )
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PS_SQL}, sm AS (
      SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), cand AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
                 AND p.p_name LIKE 'small%'
      JOIN sm ON sm.l_partkey = ps.ps_partkey
             AND sm.l_suppkey = ps.ps_suppkey
      WHERE 2 * ps.ps_availqty > sm.qty
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    JOIN cand ON cand.ps_suppkey = s.s_suppkey
    ORDER BY s.s_name, n.n_name
    """,
    doc=(
        "TPC-H-Q20 (potential part promotion) on the derived "
        "partsupp: EUROPE suppliers holding more than half a "
        "year's shipped quantity of any 'small%' part - the nested "
        "IN-subquery chain, planned as filters + joins: lineitem "
        "collapses to its (part, supplier, 1996) quantity census "
        "FIRST (partial agg - the only fact-sized shuffle), the "
        "part-name filter broadcasts onto partsupp, the threshold "
        "is the integer cross-multiplication 2*availqty > qty "
        "(sum(l_quantity) is integral, cast exact), and the "
        "supplier set reaches the dim join as a distinct census. "
        "Matches TPC-H semantics where pairs with no 1996 "
        "shipments are excluded (NULL comparison in the spec's "
        "correlated form = inner join here)."
    ),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem")
    sm = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    cand = (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .join(
            sm,
            (ps["ps_partkey"] == sm["l_partkey"])
            & (ps["ps_suppkey"] == sm["l_suppkey"]),
        )
        .where(2 * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cand, supp["s_suppkey"] == cand["ps_suppkey"])
        .select("s_name", "n_name")
        .orderBy("s_name", "n_name")
    )
