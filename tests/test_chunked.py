"""Chunked execution ≡ unchunked: the MLHD chunking harness must be
semantics-free — any per-user computation gives identical results
chunked or not (similarity/recording/common.py:190-213 contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.operators.sessionize import session_pairs, with_session_ids
from listenbrainz_server_spark.plans.chunked import run_chunked

SF = "/root/testdata/sf0.001"


def _pair_pipeline(events):
    sess = with_session_ids(events, "user_id", "ts", 1800, tiebreak=("event_id",))
    return session_pairs(sess, "user_id", "session_id", "event_type")


def test_chunked_similarity_equals_unchunked(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    direct = {
        (r.item_a, r.item_b, r.score) for r in _pair_pipeline(ev).collect()
    }
    chunked = run_chunked(
        spark,
        ev,
        key_col="user_id",
        n_chunks=4,
        per_chunk=_pair_pipeline,
        state_dir=str(tmp_path),
        combine=lambda df: df.groupBy("item_a", "item_b").agg(
            F.sum("score").alias("score")
        ),
    )
    got = {(r.item_a, r.item_b, r.score) for r in chunked.collect()}
    assert got == direct


def test_chunks_partition_the_keyspace(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    total = ev.count()
    chunked = run_chunked(
        spark,
        ev,
        key_col="user_id",
        n_chunks=4,
        per_chunk=lambda df: df.select("user_id", "event_id"),
        state_dir=str(tmp_path),
    )
    assert chunked.count() == total
    assert chunked.select("event_id").distinct().count() == total
