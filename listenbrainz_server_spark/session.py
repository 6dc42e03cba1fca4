"""SparkSession factory.

Mirrors the reference's session setup (listenbrainz_spark/__init__.py:24-73:
app name, shuffle-partition tuning, test-mode config) but sized for the
local harness and, via the same knobs, for a large cluster:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces the reference's hand-set ``spark.sql.shuffle.partitions = 2000``
  per-job tuning (listenbrainz_spark/similarity/recording/mlhd.py:37-39).
- UTC session timezone so timestamp semantics are engine-independent
  (and comparable against the DuckDB oracle).
- Arrow enabled for the few Pandas-UDF operators (multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "listenbrainz_server_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = int(_DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Deterministic, oracle-comparable timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # convert SMJ->broadcast at runtime. This is the scale story:
        # static shuffle-partition counts never fit both sf0.001 and 100TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local default sized to cores; AQE coalesces below it as needed.
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scans: vectorized reader + pushdown are defaults; keep
        # explicit so a misconfigured cluster profile can't silently
        # disable them.
        .config("spark.sql.parquet.filterPushdown", "true")
        # Testdata's events.ts is TIMESTAMP(NANOS); Spark has no nanos
        # type, so read as long and convert in the catalog loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        .config("spark.executor.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def cluster_profile(executors: int = 1000, cores: int = 5, mem_gb: int = 16) -> dict[str, str]:
    """Config deltas for a real multi-executor deployment at the
    100 TB scale this engine targets (local[] testing uses the
    defaults in get_session; spark-submit merges these on top).

    Sizing rationale:
    - shuffle.partitions ≈ 2-3× total cores so AQE coalesces DOWN
      (splitting up is impossible); at 100 TB inputs this also keeps
      post-shuffle partitions under ~256 MB for a ~20 TB shuffle.
    - maxPartitionBytes 256m → ~400k input splits for 100 TB, fine
      for a 1000-executor scheduler.
    - Kryo + compressed broadcasts for the dimension-join path.
    """
    total_cores = executors * cores
    return {
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(cores),
        "spark.executor.memory": f"{mem_gb}g",
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.shuffle.service.enabled": "true",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(executors),
    }


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
