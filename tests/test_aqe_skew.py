"""AQE skew-join handling: the runtime half of the engine's skew
story. The salting operators (operators/skew.py) are the explicit
path for aggregations; for JOINS the engine leans on Spark's adaptive
skew-join split (spark.sql.adaptive.skewJoin) — this test proves the
session config actually fires: a heavily skewed sort-merge join
executes with the skew flag set, splitting the hot partition instead
of serializing it through one task."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # One key owns ~95% of the left side.
    left = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    # One row per key on the right: the join output stays |left|,
    # keeping the test fast — skew detection looks at the SHUFFLE
    # partition sizes, which the hot left key alone provides.
    right = spark.range(50).select(
        F.col("id").alias("k"), F.col("id").alias("w")
    )
    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    try:
        # Force SMJ (no broadcast escape hatch) and thresholds low
        # enough that the fixture's hot partition counts as skewed.
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

        joined = left.join(right, "k")
        # collect() drives THIS DataFrame's own query execution, so
        # its executedPlan is the final adaptive plan (a noop write
        # would build a separate QueryExecution and leave this one
        # isFinalPlan=false).
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
        assert "skewed" in final  # AQEShuffleRead split the hot partition
    finally:
        for key, val in saved.items():
            conf.set(key, val)
