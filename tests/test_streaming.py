"""Stream-mode ≡ batch-mode equivalence for the streaming jobs —
the property that lets the engine treat its transformations as
mode-agnostic (batch oracle checks then cover streaming semantics)."""

from __future__ import annotations

from datetime import datetime

import pytest

from listenbrainz_server_spark.streaming.jobs import (
    read_parquet_stream,
    run_to_memory_sink,
    session_aggregate,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_dir(tmp_path_factory):
    """Small deterministic event log written as two parquet 'appends'
    (the incremental dump shape, listens/dump.py:219-249)."""
    d = str(tmp_path_factory.mktemp("stream_events"))
    return d


def _mk_events(spark, path):
    rows = [
        (1, datetime.fromisoformat("2024-01-01 10:00:00"), "play", 1.0),
        (1, datetime.fromisoformat("2024-01-01 10:10:00"), "play", 2.0),
        (1, datetime.fromisoformat("2024-01-01 12:00:00"), "skip", 1.0),
        (2, datetime.fromisoformat("2024-01-01 10:05:00"), "play", 3.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_stream_equals_batch(spark, event_dir):
    batch = _mk_events(spark, event_dir)
    stream = read_parquet_stream(spark, event_dir, batch.schema)
    out = windowed_counts(stream, "ts", ["event_type"], window="1 hour")
    run_to_memory_sink(out, "wc_test")
    got = spark.table("wc_test").select("w", "event_type", "n", "total_value")
    expect = windowed_counts(batch, "ts", ["event_type"], window="1 hour")
    cols = ["w", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_session_window_stream_equals_batch(spark, event_dir):
    batch = _mk_events(spark, event_dir)
    stream = read_parquet_stream(spark, event_dir, batch.schema)
    out = session_aggregate(stream, "ts", "user_id", gap="30 minutes")
    run_to_memory_sink(out, "sw_test")
    got = spark.table("sw_test")
    expect = session_aggregate(batch, "ts", "user_id", gap="30 minutes")
    cols = ["user_id", "sw", "n_events"]
    assert _rows(got, cols) == _rows(expect, cols)
    # Sanity: user 1 has two sessions (10:00-10:10 merged, 12:00 alone).
    u1 = [r for r in got.collect() if r.user_id == 1]
    assert sorted(r.n_events for r in u1) == [1, 2]
