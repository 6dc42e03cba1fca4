"""Dataset registry: named tables over a parquet directory.

The reference resolves datasets by HDFS path constants and registers
temp views per query (listenbrainz_spark/path.py, listens/data.py:38-55).
We keep a thin catalog: table name -> parquet path under a base dir,
lazily loaded, optionally cached, registered as temp views so both the
DataFrame API and spark.sql() see the same names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, f"{name}.parquet")


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong) and we convert to micros
# timestamps here — same truncation DuckDB applies reading TIMESTAMP_NS.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Plain parquet scan. Column pruning + predicate pushdown are left
    to Catalyst — callers filter/select on the returned DataFrame and the
    scan narrows automatically (verify with .explain: PushedFilters/ReadSchema).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name in _NANO_TS_COLS:
        # Runtime-settable; required even on externally-built sessions
        # (the driver harness constructs its own SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(base_dir, name))
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # Integer `div` — float division loses precision at 1e18 ns.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))

    from listenbrainz_server_spark.schemas import validate

    return validate(name, df)


def register_views(spark: SparkSession, base_dir: str, tables=TPCH_TABLES) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = table_path(base_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
