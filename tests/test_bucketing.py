"""Bucketed co-located join: both sides pre-bucketed on the join key
-> SortMergeJoin with ZERO Exchange nodes (the repeated-join scale path
SCALE.md describes)."""

import pytest
from pyspark.sql import functions as F

from zinger_spark.operators.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path_factory):
    # session catalog needs a warehouse; get_spark sets one under cwd
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("i_val")
    )
    write_bucketed(orders, "bt_orders", "o_key", buckets=8)
    write_bucketed(items, "bt_items", "o_key", buckets=8)
    yield "bt_orders", "bt_items"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_items")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join strategy decision is real
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "o_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # correctness: every item matches exactly one order
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, "o_key")
    got = joined.groupBy("o_val").count().orderBy("o_val").collect()
    plain = (
        spark.table(left)
        .join(spark.table(right), "o_key")
        .groupBy("o_val")
        .count()
        .orderBy("o_val")
        .collect()
    )
    assert got == plain
