"""Bucketed co-located join: writing both sides bucketed by the join
key lets the join run with NO exchange on either side — the 100 TB
fact-fact join strategy (pre-shuffled storage instead of per-query
shuffle). The reference never got this far (it re-shuffles per job);
this is the idiomatic-Spark upgrade the engine standardizes on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse.dir is static; managed tables land in ./spark-warehouse
    # and are dropped (data included) on teardown.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.range(1000).select(
        F.col("id").alias("order_id"), (F.col("id") % 7).alias("status")
    )
    lines = spark.range(5000).select(
        (F.col("id") % 1000).alias("order_id"), F.col("id").alias("line_id")
    )
    (
        orders.write.bucketBy(8, "order_id").sortBy("order_id")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lines.write.bucketBy(8, "order_id").sortBy("order_id")
        .mode("overwrite").saveAsTable("b_lines")
    )
    yield "b_orders", "b_lines"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # Disable broadcast so the join strategy question is real.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "order_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree  # co-located: no shuffle either side
        assert joined.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_same_join_shuffles_both_sides(spark, bucketed_tables):
    """Control: the identical join over plain DataFrames exchanges."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(1000).select(
            F.col("id").alias("order_id"), (F.col("id") % 7).alias("status")
        )
        lines = spark.range(5000).select(
            (F.col("id") % 1000).alias("order_id"), F.col("id").alias("line_id")
        )
        joined = orders.join(lines, "order_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
