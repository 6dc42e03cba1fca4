"""As-of and range joins — temporal operators Spark's DataFrame API
lacks as primitives, composed scalably from built-ins.

As-of join (each left row matched to the latest right row at or
before its timestamp, per key) is the canonical time-series join.
The naive formulation — an inequality theta join + per-left-row
max() — degenerates to a per-key nested loop. The scalable form used
here is the UNION-TAG SWEEP: tag both inputs, union them, sort by
(key, time, tag) within key partitions, and carry the most recent
right-side attributes forward with last_value(ignorenulls) — ONE hash
shuffle on the key, one sort, zero row multiplication, no range
explosion. This is how kdb/Polars/Flink implement as-of under the
hood, expressed in pure Spark window functions.

Range join (left rows matched to right intervals) gets the standard
BUCKETIZATION rewrite: intervals are exploded into the fixed-width
time buckets they overlap, turning the inequality into an equi join
on (key, bucket) with a residual filter — candidate volume scales
with interval/bucket width, never |L|×|R|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matching right row within the
    same key: ``direction="backward"`` (default) takes the greatest
    ``right_ts`` <= ``left_ts``; ``"forward"`` the smallest
    ``right_ts`` >= ``left_ts`` (NULLs when no such row exists, or
    when it is further away than ``tolerance_seconds``).

    ``direction="nearest"`` (pandas ``merge_asof``/kdb parity) takes
    whichever side is closer in absolute distance, backward winning
    exact-distance ties — pandas' tie rule.

    All directions are the SAME union-tag sweep — forward just scans
    the merged stream in descending time, so the carried
    last-non-null right row is the nearest at-or-after one. Right-side
    timestamps sort adjacent to a left row at the same instant on the
    matching side (tag 0 first in scan order), honoring the
    at-or-before / at-or-after contracts. Nearest runs BOTH sweeps
    over one merged stream: same partition key, so Catalyst plans one
    Exchange with two sorts — still zero row multiplication.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lt = left.withColumn("_tag", F.lit(1)).withColumn("_t", F.col(left_ts))
    rt = (
        right.select(
            *keys,
            F.col(right_ts).alias("_rts"),
            *[F.col(c) for c in right_vals],
        )
        .withColumn("_tag", F.lit(0))
        .withColumn("_t", F.col("_rts"))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    merged = lt.select(rt.columns).unionByName(rt.select(rt.columns))

    def carried_cols(descending: bool, prefix: str) -> list[Column]:
        t_order = F.col("_t").desc() if descending else F.col("_t").asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(t_order, F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return [
            F.last(c, ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in ["_rts", *right_vals]
        ]

    keep = [c for c in left.columns]
    out_vals: list[Column] = []

    if direction == "nearest":
        carried = merged.select(
            "*", *carried_cols(False, "_b_"), *carried_cols(True, "_f_")
        ).where(F.col("_tag") == 1)
        gap_b = F.col("_t").cast("double") - F.col("_b__rts").cast("double")
        gap_f = F.col("_f__rts").cast("double") - F.col("_t").cast("double")
        ok_b = F.col("_b__rts").isNotNull()
        ok_f = F.col("_f__rts").isNotNull()
        if tolerance_seconds is not None:
            tol = F.lit(float(tolerance_seconds))
            ok_b = ok_b & (gap_b <= tol)
            ok_f = ok_f & (gap_f <= tol)
        # Backward wins exact-distance ties (pandas merge_asof rule).
        use_b = ok_b & (~ok_f | (gap_b <= gap_f))
        use_f = ok_f & ~use_b
        for c in right_vals:
            out_vals.append(
                F.when(use_b, F.col(f"_b_{c}"))
                .when(use_f, F.col(f"_f_{c}"))
                .alias(c)
            )
        out_vals.append(
            F.when(use_b, F.col("_b__rts"))
            .when(use_f, F.col("_f__rts"))
            .alias("asof_ts")
        )
        return carried.select(*keep, *out_vals)

    carried = merged.select(
        "*", *carried_cols(direction == "forward", "_asof_")
    ).where(F.col("_tag") == 1)

    matched = F.col("_asof__rts").isNotNull()
    if tolerance_seconds is not None:
        gap = (
            F.col("_t").cast("double") - F.col("_asof__rts").cast("double")
            if direction == "backward"
            else F.col("_asof__rts").cast("double") - F.col("_t").cast("double")
        )
        matched = matched & (gap <= F.lit(float(tolerance_seconds)))
    for c in right_vals:
        out_vals.append(F.when(matched, F.col(f"_asof_{c}")).alias(c))
    out_vals.append(F.when(matched, F.col("_asof__rts")).alias("asof_ts"))
    return carried.select(*keep, *out_vals)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner join of left rows to right intervals
    (``right_start`` <= ts < ``right_end``) per key, via bucketized
    equi join: each interval lands in every bucket it overlaps
    (explode of a bounded sequence), each left row in exactly one —
    the join key becomes (keys..., bucket) and the inequality is a
    residual filter. Shuffle volume ~ |L| + |R|·(interval/bucket).
    """
    b = F.lit(bucket_seconds)
    lb = left.withColumn("_bk", F.floor(F.col(left_ts).cast("double") / b))
    rb = right.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start).cast("double") / b),
                F.floor(
                    (F.col(right_end).cast("double") - F.lit(1e-6)) / b
                ),
            )
        ),
    )
    joined = lb.join(rb, [*keys, "_bk"]).where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop("_bk")
