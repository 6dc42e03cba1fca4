"""Chunked execution harness.

The reference bounds its biggest shuffle (MLHD recording similarity:
quadratic within-session self-join over 27k users' full histories) by
splitting the keyspace into 16 user-prefix chunks, running the
pipeline per chunk with intermediate Parquet outputs, then combining
(similarity/recording/common.py:190-213, mlhd/download.py:24-60,
SURVEY.md §3.3). This module is that harness, generalized:

    run_chunked(spark, df, key_col, n_chunks, per_chunk, state_dir)
        → combined DataFrame

Per-chunk outputs are materialized to Parquet (stage barrier: each
chunk is an independent job whose shuffle state is bounded by chunk
size, and a failed chunk restarts alone — checkpoint/restart for
free). The combine is a unionByName + caller-supplied re-aggregation.

Chunking key: ``pmod(hash(key), n_chunks)`` — hash-uniform, no
knowledge of key distribution needed (the reference's hex-prefix trick
is the same thing for hex-string keys).

Scale notes: chunk count trades job overhead vs per-job shuffle size;
at 100 TB pick n_chunks so one chunk's shuffle fits the cluster's
healthy shuffle capacity (the reference used 16 chunks × 2000 shuffle
partitions). Chunks also cap executor-memory pressure for quadratic
operators (session pair generation).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def chunk_of(key_col: str, n_chunks: int):
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_chunks))


def run_chunked(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    n_chunks: int,
    per_chunk: Callable[[DataFrame], DataFrame],
    state_dir: str,
    combine: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Run ``per_chunk`` over hash-chunks of ``df``; write each chunk's
    output to Parquet under ``state_dir``; return the (optionally
    re-aggregated) union of all chunk outputs.

    ``per_chunk`` must be closed over the chunk: pair-generation style
    operators are valid because sessions/pairs never span users, and
    users never span chunks.
    """
    paths = []
    for c in range(n_chunks):
        chunk_df = df.where(chunk_of(key_col, n_chunks) == c)
        out = per_chunk(chunk_df)
        path = os.path.join(state_dir, f"chunk={c}")
        out.write.mode("overwrite").parquet(path)
        paths.append(path)
    combined = spark.read.parquet(*paths)
    return combine(combined) if combine is not None else combined
