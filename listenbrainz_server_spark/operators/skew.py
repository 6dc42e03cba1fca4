"""Skew mitigation: salted two-phase aggregation.

The reference handles skew implicitly (per-user caps shrink hot keys,
sitewide/entity.py:50-59; hand-raised shuffle partitions,
mlhd.py:37-39). At 100 TB a single hot grouping key (one viral
recording, one 'und' language bucket) overwhelms its reducer even with
AQE skew-join splitting — AQE splits *join* skew, not *aggregation*
skew. Classic fix: salt the key, aggregate twice.

  phase 1: groupBy(key, salt)  — hot key spreads over N reducers
  phase 2: groupBy(key)        — N partials per key re-combined

Phase 2 input is |keys| × salt rows — negligible. Correct for any
algebraic aggregate (count/sum/min/max); count-distinct requires the
two-level exact form instead (distinct_count_salted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name -> (input col or '*', fn) with fn in
    {count, sum, min, max}. Example::

        salted_agg(events, ["event_type"],
                   {"n": ("*", "count"), "total": ("value", "sum")})
    """
    salted = df.withColumn("_salt", (F.rand(seed=0) * salt_buckets).cast("int"))

    phase1_exprs: list[Column] = []
    phase2_exprs: list[Column] = []
    for name, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn in ("min", "max"):
            agg_fn = F.min if fn == "min" else F.max
            phase1_exprs.append(agg_fn(col).alias(name))
            phase2_exprs.append(agg_fn(name).alias(name))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")

    phase1 = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def distinct_count_salted(
    df: DataFrame, keys: Sequence[str], what: str, alias: str
) -> DataFrame:
    """Exact COUNT(DISTINCT) without a hot-key reducer: dedup on
    (keys, what) first — the distinct shuffle spreads over the value
    domain — then count per key."""
    return (
        df.select(*keys, what)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )
