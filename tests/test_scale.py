"""Scale-technique tests: salting and bucketing change the physical
plan without changing results."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_demo_spark.catalog import load_table
from flink_demo_spark.operators.skew import bucketed_table, salted_agg, salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", salt=8)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type): (r.n, round(r.total, 2))
        for r in ev.groupBy(F.col("event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .collect()
    }
    two_phase = {
        r.event_type: (r.n, round(r.total, 2))
        for r in salted_agg(ev, "event_type", "value", salt=16).collect()
    }
    assert plain == two_phase


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key: the join plan must contain
    no shuffle Exchange (the co-located join the reference gets from
    partitionByHash, DataSetFunc.scala:546-617). Broadcast is disabled
    so the planner must pick the bucket-aware sort-merge join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    b_orders = bucketed_table(spark, orders, "b_orders", "o_orderkey", 8)
    b_li = bucketed_table(spark, li, "b_lineitem", "o_orderkey", 8)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = b_orders.join(b_li, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join must not shuffle:\n{plan[:800]}"
        )
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_kmeans_update_partition_order_invariant(spark, sf_dir):
    """The DECIMAL-accumulated centroid update must be bit-identical
    under any partitioning/ordering of the input — that order
    independence is the entire basis for oracle-checking a clustering
    (VERDICT round 6). Float-sum means would fail this test."""
    from flink_demo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = similarity.ivf_assign(
        emb,
        sorted(
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in emb.where(F.col("vec_id") < 8).collect()
        ),
    )
    base = similarity.kmeans_update(assigned)
    for layout in (
        assigned.repartition(7),
        assigned.repartition(3, "vec_id"),
        assigned.coalesce(1),
        assigned.orderBy(F.col("vec_id").desc()),
    ):
        assert similarity.kmeans_update(layout) == base
