"""applyInPandasWithState: per-key state accumulates across
micro-batches and the final emission matches the batch aggregate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from listenbrainz_server_spark.streaming.jobs import read_parquet_stream
from listenbrainz_server_spark.streaming.stateful import running_user_totals


def test_running_totals_match_batch(spark, tmp_path):
    path = str(tmp_path / "events")
    rows1 = [(1, 1.0), (1, 2.0), (2, 5.0)]
    rows2 = [(1, 4.0), (3, 7.0)]
    df1 = spark.createDataFrame(rows1, "user_id long, value double")
    df2 = spark.createDataFrame(rows2, "user_id long, value double")
    df1.coalesce(1).write.mode("append").parquet(path)
    df2.coalesce(1).write.mode("append").parquet(path)

    stream = read_parquet_stream(spark, path, df1.schema, max_files=1)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # Update mode emits one row per (user, trigger); the LAST emission
    # per user is the cumulative state == the batch aggregate.
    emitted = spark.table("totals")
    batch = (
        df1.unionByName(df2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum("value").alias("total_value"),
        )
    )
    expect = {(r.user_id, r.total_events, r.total_value) for r in batch.collect()}
    # Keep the max-progress emission per user (cumulative counts only grow).
    got = {}
    for r in emitted.collect():
        prev = got.get(r.user_id)
        if prev is None or r.total_events > prev[0]:
            got[r.user_id] = (r.total_events, r.total_value)
    got_set = {(u, n, v) for u, (n, v) in got.items()}
    assert got_set == expect
