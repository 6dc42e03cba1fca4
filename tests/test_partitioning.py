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


def test_zorder_layout_prunes_secondary_dimension(spark, tmp_path):
    """Why z-order: under a user-sorted layout a time-range filter
    touches every file; under the Morton key the hour bits are folded
    into the sort key, so the same filter's rows concentrate in a
    subset of files. Measured with input_file_name over 16
    range-partitioned files per layout."""
    from pyspark.sql import functions as F

    from listenbrainz_server_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.01"
    z = reg["x_zorder_key"].fn(spark, sf)
    from listenbrainz_server_spark.catalog import load_table

    ev = load_table(spark, sf, "events").select("event_id", "ts")
    d = z.join(ev, "event_id").withColumn(
        "hour_bucket", (F.unix_timestamp("ts") / 3600).cast("bigint") % 256
    )

    def files_touched(sort_col, pred):
        path = str(tmp_path / f"layout_{sort_col}")
        d.repartitionByRange(16, F.col(sort_col)).write.mode("overwrite").parquet(
            path
        )
        got = (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        total = (
            spark.read.parquet(path)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return got, total

    pred = (F.col("hour_bucket") >= 32) & (F.col("hour_bucket") < 48)
    z_hit, z_total = files_touched("zkey", pred)
    u_hit, u_total = files_touched("user_id", pred)
    # The user-sorted layout scatters every hour across ~all files;
    # the z-ordered layout concentrates an hour range.
    assert u_hit >= u_total - 1
    assert z_hit < u_hit
