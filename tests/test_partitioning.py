"""Partitioned-fact behavior: the S1/S9 contract — facts written
partitionBy(year, month) must scan only matching partitions when
filtered (listens/compact.py:27-45, listens/data.py:89-115; the
reference builds the OR-clause by hand, Catalyst prunes for free)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from listenbrainz_server_spark.sources.sinks import partitioned_overwrite


@pytest.fixture(scope="module")
def partitioned_facts(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("facts") / "listens")
    rows = []
    for year in (2023, 2024):
        for month in (1, 2, 3):
            rows += [(year * 100 + month + i, year, month) for i in range(5)]
    df = spark.createDataFrame(rows, "v long, year int, month int")
    partitioned_overwrite(df, path, ["year", "month"])
    return path


def test_partition_pruning_in_plan(spark, partitioned_facts):
    df = spark.read.parquet(partitioned_facts).where(
        (F.col("year") == 2024) & (F.col("month") == 2)
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "isnotnull(year" in plan
    assert df.count() == 5


def test_pruned_scan_reads_single_partition(spark, partitioned_facts):
    df = spark.read.parquet(partitioned_facts).where(
        (F.col("year") == 2024) & (F.col("month") == 2)
    )
    # numFiles in the scan metadata should reflect one partition dir.
    scan = df._jdf.queryExecution().executedPlan().toString()
    got = {(r.year, r.month) for r in df.select("year", "month").distinct().collect()}
    assert got == {(2024, 2)}


def test_multi_range_or_predicate_prunes(spark, partitioned_facts):
    """The reference's hand-built (year=.. AND month=..) OR ... clause
    (listens/data.py:89-114) — expressed as a plain predicate, Catalyst
    still prunes partitions."""
    df = spark.read.parquet(partitioned_facts).where(
        ((F.col("year") == 2023) & (F.col("month") == 1))
        | ((F.col("year") == 2024) & (F.col("month") == 3))
    )
    got = {(r.year, r.month) for r in df.select("year", "month").distinct().collect()}
    assert got == {(2023, 1), (2024, 3)}
    assert df.count() == 10
