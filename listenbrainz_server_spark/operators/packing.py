"""Sequence packing for training batches.

The GPT-style concat-and-chunk pack: documents are laid out in a
deterministic order, token offsets accumulate, and fixed
``budget``-token windows over the concatenated stream become training
sequences. A document whose span crosses a window boundary straddles
two sequences (the standard trade — no padding waste, occasional
cross-doc attention masked downstream).

Scale shape: a single global ordering would funnel the whole corpus
through one window partition. Packing instead runs per hash shard —
``pmod(hash(id), n_shards)`` — so each shard's running-offset window is
independent (shuffle on shard, window within shard); sequence identity
is (shard, seq_in_shard). Shard count scales with the cluster, order
within a shard is deterministic by id, so output is reproducible
regardless of input partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: Column,
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, seq_id) training-sequence slot.

    Returns one row per document: shard, within-shard start offset,
    token count, seq_id = floor(offset / budget), and whether the
    document straddles into the next sequence.
    """
    w = Window.partitionBy("shard").orderBy(id_col)
    sized = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        token_count_col.cast("bigint").alias("n_tokens"),
    )
    return (
        sized.withColumn(
            "start_offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn("seq_id", F.floor(F.col("start_offset") / budget).cast("bigint"))
        .withColumn(
            "straddles",
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget)
            > F.col("seq_id"),
        )
        .select(id_col, "shard", "seq_id", "start_offset", "n_tokens", "straddles")
    )


def ffd_pack(
    df: DataFrame,
    id_col: str,
    token_count_col: Column,
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing bin packing: documents packed WHOLE into
    ``budget``-token bins — the no-straddle alternative to
    ``pack_sequences`` for pipelines that refuse cross-document
    attention (each bin pads its tail instead). Documents longer than
    the budget are flagged oversize (bin_id = -1; route them to the
    chunker, t_chunk_documents' job).

    FFD runs per hash shard (same sharding contract as
    pack_sequences: deterministic by id, independent shards, shard
    count scales with the cluster). Within a shard the classic
    sequential algorithm runs in one Arrow pass — sort by
    (n_tokens desc, id), place each doc in the first bin it fits.
    Guarantees the audit relies on: no bin exceeds budget; at most
    one bin is <= budget/2 full (any two such bins would have been
    merged by first-fit); bins >= ceil(total_tokens / budget).
    """
    import pandas as pd

    # ids must be numeric and NON-NEGATIVE: pmod is always >= 0 while
    # SQL's % follows the dividend's sign, so a negative id would land
    # in different shards here vs an oracle using `%` (the fixture's
    # ids are sequential non-negative bigints, as pack_sequences
    # assumes too).
    id_t = df.schema[id_col].dataType.simpleString()
    sized = df.select(
        F.col(id_col).alias("_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        token_count_col.cast("bigint").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list = []  # running fill per open bin
        bin_ids = []
        for t in pdf["n_tokens"]:
            if t > budget:
                bin_ids.append(-1)
                continue
            for i, f in enumerate(fills):
                if f + t <= budget:
                    fills[i] = f + t
                    bin_ids.append(i)
                    break
            else:
                fills.append(t)
                bin_ids.append(len(fills) - 1)
        out = pdf.assign(bin_id=bin_ids)
        return out[["_id", "shard", "bin_id", "n_tokens"]]

    schema = f"_id {id_t}, shard int, bin_id int, n_tokens bigint"
    return (
        sized.groupBy("shard")
        .applyInPandas(pack, schema)
        .withColumnRenamed("_id", id_col)
    )
