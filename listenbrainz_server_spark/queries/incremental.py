"""Incremental-engine queries: the full partial/delta/combine lifecycle
run end-to-end with real Parquet state, checked against a direct
(non-incremental) DuckDB aggregate — the recompute-equivalence
invariant (SURVEY.md §7.4 hard part #1).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.incremental.engine import IncrementalEngine, IncrementalStat
from listenbrainz_server_spark.queries import register

_CUTOFF = "2024-01-20"

_STATE_ROOT: str | None = None


def _state_dir(sf_dir: str) -> str:
    """Process-lifetime incremental state dir, one subdir per input
    dataset (a partial built over sf0.001 must never satisfy the
    freshness check for an sf0.01 run — the date range alone matches).

    Outlives the returned DataFrame's lazy plan (the plan reads the
    Parquet partial on execution — a driver-side collect to 'rescue'
    rows from a vanishing temp dir would be a hot-path anti-pattern at
    aggregate cardinality ×100). Cleaned at interpreter exit."""
    global _STATE_ROOT
    if _STATE_ROOT is None:
        _STATE_ROOT = tempfile.mkdtemp(prefix="lbs_incr_state_")
        atexit.register(shutil.rmtree, _STATE_ROOT, ignore_errors=True)
    import hashlib

    sub = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{_STATE_ROOT}/{sub}"
    return path


def _user_type_stat() -> IncrementalStat:
    return IncrementalStat(
        name="user_event_counts",
        aggregate=lambda df: df.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("listen_count"),
            F.sum("value").alias("total_value"),
        ),
        keys=("user_id", "event_type"),
        sum_cols=("listen_count", "total_value"),
    )


# --------------------------------------------------------------------------
# Full lifecycle: base partial (< cutoff) persisted to Parquet state,
# delta (>= cutoff) aggregated and combined. Equals the direct agg.
# --------------------------------------------------------------------------
@register(
    "i_incremental_lifecycle",
    """
    SELECT user_id, event_type,
           COUNT(*) AS listen_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id, event_type
    """,
    doc="incremental engine lifecycle: partial+delta+combine ≡ full recompute "
    "(incremental_stats_engine.py:86-227)",
)
def i_incremental_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    engine = IncrementalEngine(spark, _state_dir(sf_dir))
    stat = _user_type_stat()
    combined = engine.run(
        stat,
        full_df=ev.where(F.col("ts") < cutoff),
        delta_df=ev.where(F.col("ts") >= cutoff),
        from_date="2024-01-01",
        to_date="2024-02-01",
        created="2024-01-20",
    )
    return combined.select(
        "user_id",
        "event_type",
        F.col("listen_count").cast("bigint").alias("listen_count"),
        F.round("total_value", 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Affected-key pruning: stats recomputed ONLY for users in the delta
# (only_inc mode, stats/incremental/user/entity.py:38-53).
# --------------------------------------------------------------------------
@register(
    "i_affected_key_pruning",
    f"""
    WITH delta_users AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE ts >= TIMESTAMP '{_CUTOFF} 00:00:00'
    )
    SELECT e.user_id, e.event_type, COUNT(*) AS listen_count
    FROM events e
    JOIN delta_users d
      ON e.user_id = d.user_id AND e.event_type = d.event_type
    GROUP BY e.user_id, e.event_type
    """,
    doc="only-incremental affected-key pruning (user/entity.py:38-53)",
)
def i_affected_key_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    engine = IncrementalEngine(spark, _state_dir(sf_dir))
    stat = IncrementalStat(
        name="user_event_counts_pruned",
        aggregate=lambda df: df.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("listen_count")
        ),
        keys=("user_id", "event_type"),
        sum_cols=("listen_count",),
    )
    combined = engine.run(
        stat,
        full_df=ev.where(F.col("ts") < cutoff),
        delta_df=ev.where(F.col("ts") >= cutoff),
        from_date="2024-01-01",
        to_date="2024-02-01",
        created="2024-01-20",
        only_affected=True,
    )
    return combined.select(
        "user_id", "event_type", F.col("listen_count").cast("bigint").alias("listen_count")
    )
