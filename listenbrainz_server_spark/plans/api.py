"""Handler dispatch: name → provider, the full query_map analog
(listenbrainz_spark/query_map.py:45-96 + request_consumer dispatch
request_consumer.py:105-114, minus the RabbitMQ transport — our
engine returns DataFrames; callers chunk results via messages.py).

Every non-transport name in the reference's dispatch table resolves
here to a real computation. Parameterized stats handlers accept the
reference's request params (entity column, stats range name via
plans/ranges.py); names whose full pipeline lives in the query
registry dispatch straight to the registered provider.

Transport-only steps of the import.* family (tar download, zstd
extraction, HDFS upload) stay out of scope; their Spark compute —
CSV→Parquet transform, tombstone application, partitioned compaction,
base∪incremental union — is what the import.* entries run.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.plans import handlers
from listenbrainz_server_spark.plans.ranges import resolve_range


def _registered(name: str) -> Callable:
    """Dispatch to a registered query provider (lazy import: the
    registry imports operator modules, never this one)."""

    def run(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
        from listenbrainz_server_spark.queries import load_all

        return load_all()[name].fn(spark, sf_dir)

    run.__name__ = f"registered_{name}"
    return run


def _events_handler(fn: Callable, **defaults):
    def run(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
        events = load_table(spark, sf_dir, "events")
        return fn(events, **{**defaults, **params})

    return run


def _echo(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """echo.echo health check (listenbrainz_spark/echo/echo.py:1-8)."""
    return spark.createDataFrame([("echo", sf_dir)], "message string, data_dir string")


# -- parameterized stats handlers -------------------------------------------


def _anchor(events: DataFrame) -> datetime:
    """Ranges anchor to the latest listen, not wall clock
    (stats/__init__.py:150-218)."""
    return events.agg(F.max("ts")).first()[0]


def _range_filtered_events(
    spark: SparkSession, sf_dir: str, stats_range: str | None
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    if stats_range is None:
        return events
    frm, to = resolve_range(_anchor(events), stats_range)
    return events.where((F.col("ts") >= F.lit(frm)) & (F.col("ts") < F.lit(to)))


def _stats_user_entity(
    spark: SparkSession,
    sf_dir: str,
    entity: str = "event_type",
    stats_range: str | None = None,
    **params,
) -> DataFrame:
    ev = _range_filtered_events(spark, sf_dir, stats_range)
    return handlers.user_entity_stats(ev, entity_col=entity, **params)


def _stats_daily_activity(
    spark: SparkSession,
    sf_dir: str,
    stats_range: str | None = None,
    **params,
) -> DataFrame:
    """stats.user.daily_activity with the standard stats_range param
    (user/daily_activity.py over the ranged scan): the weekday×hour
    grid stays dense per user, only the counted events are ranged."""
    ev = _range_filtered_events(spark, sf_dir, stats_range)
    return handlers.daily_activity(ev, **params)


def _stats_genre_activity(
    spark: SparkSession,
    sf_dir: str,
    stats_range: str | None = None,
    k: int = 2,
    **params,
) -> DataFrame:
    """stats.user.genre_activity with the standard stats_range param
    (genre_activity.py:22-79 shape): top-k entity per hour over the
    ranged scan."""
    from listenbrainz_server_spark.operators.topk import top_k_per_group

    ev = _range_filtered_events(spark, sf_dir, stats_range)
    agg = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("listen_count"))
    return top_k_per_group(
        agg,
        partition_by=["hour"],
        order_by=[F.col("listen_count").desc(), F.col("event_type")],
        k=k,
    ).withColumn("rank", F.col("rank").cast("bigint"))


def _similar_users(
    spark: SparkSession,
    sf_dir: str,
    max_num_users: int = 25,
    threshold: float = 0.15,
    **params,
) -> DataFrame:
    """similarity.similar_users with the reference's params
    (request_manage.py:355-360)."""
    from listenbrainz_server_spark.queries.handlers4 import similar_users_handler

    return similar_users_handler(
        spark, sf_dir, max_num_users=max_num_users, threshold=threshold
    )


def _stats_sitewide_entity(
    spark: SparkSession,
    sf_dir: str,
    entity: str = "event_type",
    stats_range: str | None = None,
    **params,
) -> DataFrame:
    ev = _range_filtered_events(spark, sf_dir, stats_range)
    return handlers.sitewide_entity_stats(ev, entity_col=entity, **params)


def _stats_entity_listeners(
    spark: SparkSession,
    sf_dir: str,
    entity: str = "event_type",
    stats_range: str | None = None,
    **params,
) -> DataFrame:
    ev = _range_filtered_events(spark, sf_dir, stats_range)
    return handlers.entity_listener_stats(ev, entity_col=entity, **params)


def _stats_listening_activity(
    spark: SparkSession,
    sf_dir: str,
    stats_range: str = "month",
    sitewide: bool = False,
    **params,
) -> DataFrame:
    """listening_activity with buckets generated from the
    listening-activity range table (stats/common/
    listening_activity.py:60-185 — doubled comparison windows,
    partial-day exclusion on "this" ranges, and per-range bucket
    steps: days for week/month/quarter, months for half-year/year,
    years for all_time)."""
    from datetime import timedelta

    from listenbrainz_server_spark.plans.ranges import resolve_activity_range

    events = load_table(spark, sf_dir, "events")
    frm, to, default_granularity = resolve_activity_range(
        _anchor(events), stats_range
    )
    granularity = params.pop("granularity", None) or default_granularity

    rows = []
    cur = frm
    while cur < to:
        if granularity == "day":
            nxt = cur + timedelta(days=1)
            label = cur.strftime("%Y-%m-%d")
        elif granularity == "month":
            nxt = (cur.replace(day=1) + timedelta(days=32)).replace(
                day=1, hour=0, minute=0, second=0, microsecond=0
            )
            label = cur.strftime("%Y-%m")
        else:
            nxt = cur.replace(
                year=cur.year + 1, month=1, day=1,
                hour=0, minute=0, second=0, microsecond=0,
            )
            label = cur.strftime("%Y")
        rows.append((label, cur, nxt))
        cur = nxt
    buckets = spark.createDataFrame(
        rows, "bucket string, start timestamp, end timestamp"
    )
    ev = events.where((F.col("ts") >= F.lit(frm)) & (F.col("ts") < F.lit(to)))
    if sitewide:
        agg = (
            ev.join(
                F.broadcast(buckets),
                (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")),
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("listen_count"))
        )
        return (
            buckets.select("bucket")
            .join(agg, "bucket", "left")
            .select(
                "bucket",
                F.coalesce("listen_count", F.lit(0).cast("bigint")).alias(
                    "listen_count"
                ),
            )
        )
    return handlers.listening_activity(ev, buckets, **params)


def _era_activity(
    spark: SparkSession, sf_dir: str, sitewide: bool = False, **params
) -> DataFrame:
    """era_activity (era_activity.py:40-43): listens bucketed by the
    entity's era year; sitewide drops the user dimension."""
    orders = load_table(spark, sf_dir, "orders")
    filtered = orders.where(F.year("o_orderdate") >= 1800)
    keys = (
        [F.year("o_orderdate").cast("bigint").alias("era_year")]
        if sitewide
        else [
            F.col("o_custkey").alias("user_id"),
            F.year("o_orderdate").cast("bigint").alias("era_year"),
        ]
    )
    return filtered.groupBy(*keys).agg(F.count(F.lit(1)).alias("listen_count"))


def _artist_evolution_activity(
    spark: SparkSession, sf_dir: str, sitewide: bool = False, **params
) -> DataFrame:
    """artist_evolution_activity (artist_evolution_activity.py:33-54):
    entity × year counts; sitewide aggregates across users."""
    orders = load_table(spark, sf_dir, "orders")
    keys = [
        F.year("o_orderdate").cast("bigint").alias("year"),
        F.col("o_orderpriority").alias("entity"),
    ]
    if not sitewide:
        keys.insert(0, F.col("o_custkey").alias("user_id"))
    return orders.groupBy(*keys).agg(F.count(F.lit(1)).alias("listen_count"))


# -- CF pipeline ------------------------------------------------------------


def _cf_create_dataframes(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """cf...create_dataframes (create_dataframes.py:166-183): playcounts
    with dense surrogate ids for both axes."""
    from listenbrainz_server_spark.operators.ids import surrogate_ids_scalable
    from listenbrainz_server_spark.queries.ml import _playcounts

    pc = _playcounts(spark, sf_dir)
    users = surrogate_ids_scalable(pc, "user_id", "spark_user_id")
    items = surrogate_ids_scalable(pc, "item_id", "recording_id")
    return (
        pc.join(users, "user_id")
        .join(items, "item_id")
        .select("spark_user_id", "recording_id", "playcount")
    )


# -- import.* compute -------------------------------------------------------


def _import_full(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.dump.full compute: full-dump swap-in (listens/dump.py:
    204-208) — rewrite the events dataset atomically, return it.

    With an ``archive`` param the request routes through the S6
    dump-archive transport (import_full_dump_to_hdfs parity,
    listens/dump.py:33-55): streaming tar extraction, atomic-swap
    land, import-registry upsert — returning the 1-row import report
    the reference handler returns as JSON."""
    if params.get("archive"):
        from listenbrainz_server_spark.sources.dump import import_dump

        work = tempfile.mkdtemp(prefix="lbs_import_")
        return import_dump(
            spark,
            params["archive"],
            work,
            params.get("out_path") or os.path.join(work, "listens"),
            params.get("metadata_path") or os.path.join(work, "meta"),
            dump_id=int(params.get("dump_id", 0)),
            dump_type="full",
        )
    from listenbrainz_server_spark.sources.sinks import atomic_swap_write

    ev = load_table(spark, sf_dir, "events")
    out = params.get("out_path") or os.path.join(
        tempfile.mkdtemp(prefix="lbs_import_"), "events_full"
    )
    atomic_swap_write(ev, out)
    return spark.read.parquet(out)


def _import_incremental(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.dump.incremental compute: base ∪ incremental union
    (listens/data.py:25-55) — cutoff split plays the two dumps.

    With an ``archive`` param the request routes through the S6
    transport in append mode (import_incremental_dump_to_hdfs parity,
    listens/dump.py:57-80)."""
    if params.get("archive"):
        from listenbrainz_server_spark.sources.dump import import_dump

        work = tempfile.mkdtemp(prefix="lbs_import_")
        return import_dump(
            spark,
            params["archive"],
            work,
            params.get("out_path") or os.path.join(work, "listens"),
            params.get("metadata_path") or os.path.join(work, "meta"),
            dump_id=int(params.get("dump_id", 0)),
            dump_type="incremental",
        )
    from listenbrainz_server_spark.sources.readers import union_base_incremental

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(params.get("cutoff", "2024-01-20")).cast("timestamp")
    return union_base_incremental(
        ev.where(F.col("ts") < cutoff),
        ev.where(F.col("ts") >= cutoff),
        ev.schema,
        spark,
    )


def _import_sample(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.dump.sample compute: reproducible hash-sampled subset."""
    from listenbrainz_server_spark.operators.sampling import hash_sample

    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "event_id", params.get("fraction", 0.1))


def _import_mlhd(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.dump.mlhd compute: TSV→Parquet transform
    (mlhd/download.py:63-110). Reads a caller-provided csv_glob, or
    synthesizes a tiny fixture when none is given (no MLHD dump ships
    with the testdata)."""
    from listenbrainz_server_spark.sources.readers import mlhd_csv_ingest

    csv_glob = params.get("csv_glob")
    if csv_glob is None:
        d = tempfile.mkdtemp(prefix="lbs_mlhd_")
        with open(os.path.join(d, "user0.txt"), "w") as f:
            f.write("100\tmb1\trel1\trec1\n")
        csv_glob = os.path.join(d, "*.txt")
    return mlhd_csv_ingest(spark, csv_glob)


def _import_deleted(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.deleted_listens compute: tombstone anti join
    (listens/delete.py:27-60)."""
    from listenbrainz_server_spark.sources.readers import apply_tombstones

    ev = load_table(spark, sf_dir, "events")
    tombstones = ev.where(F.col("event_id") % 100 == 0).select("event_id")
    return apply_tombstones(ev, tombstones, ["event_id"])


def _import_compact(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.compact_listens compute: date-partitioned rewrite
    (listens/compact.py:36-45); returns the compacted dataset."""
    from listenbrainz_server_spark.sources.sinks import partitioned_overwrite

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = params.get("out_path") or os.path.join(
        tempfile.mkdtemp(prefix="lbs_compact_"), "events_compact"
    )
    partitioned_overwrite(ev, out, ["day"])
    return spark.read.parquet(out)


def _import_pg_tables(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """import.pg_metadata_tables compute: refresh the small dimension
    tables into a registry (postgres/__init__.py analog — JDBC source
    swapped for the parquet dims in this container)."""
    from listenbrainz_server_spark.sources.sinks import registry_upsert

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    out = params.get("out_path") or os.path.join(
        tempfile.mkdtemp(prefix="lbs_pg_"), "dims"
    )
    dims = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(
        F.col("n_nationkey").alias("dim_key"),
        F.col("n_name").alias("dim_name"),
        F.col("r_name").alias("dim_group"),
    )
    return registry_upsert(spark, out, dims, ["dim_key"])


QUERY_MAP: dict[str, Callable] = {
    # -- core + stats ------------------------------------------------------
    "echo.echo": _echo,
    "stats.user.entity": _stats_user_entity,
    "stats.user.listening_activity": _stats_listening_activity,
    "stats.user.genre_activity": _stats_genre_activity,
    "stats.user.daily_activity": _stats_daily_activity,
    "stats.user.era_activity": _era_activity,
    "stats.user.artist_evolution_activity": _artist_evolution_activity,
    "stats.sitewide.entity": _stats_sitewide_entity,
    "stats.sitewide.listening_activity": lambda spark, sf_dir, **p: (
        _stats_listening_activity(spark, sf_dir, sitewide=True, **p)
    ),
    "stats.sitewide.era_activity": lambda spark, sf_dir, **p: (
        _era_activity(spark, sf_dir, sitewide=True, **p)
    ),
    "stats.sitewide.artist_evolution_activity": lambda spark, sf_dir, **p: (
        _artist_evolution_activity(spark, sf_dir, sitewide=True, **p)
    ),
    "stats.entity.listeners": _stats_entity_listeners,
    # -- import family (Spark compute; transport out of scope) -------------
    "import.dump.full": _import_full,
    "import.dump.incremental": _import_incremental,
    "import.dump.sample": _import_sample,
    "import.dump.mlhd": _import_mlhd,
    "import.deleted_listens": _import_deleted,
    "import.compact_listens": _import_compact,
    "import.pg_metadata_tables": _import_pg_tables,
    # -- CF pipeline -------------------------------------------------------
    "cf.missing_mb_data": _registered("h_missing_data"),
    "cf.recommendations.recording.create_dataframes": _cf_create_dataframes,
    "cf.recommendations.recording.train_model": _registered("m_als_cv"),
    "cf.recommendations.recording.recommendations": _registered("m_als_recommend"),
    "cf.recommendations.recording.discovery": _registered("h_discovery"),
    # -- similarity --------------------------------------------------------
    "similarity.similar_users": _similar_users,
    "similarity.recording": _events_handler(handlers.similar_entities),
    "similarity.artist": _registered("h_similar_weighted"),
    # -- popularity / releases / troi / tags -------------------------------
    "popularity.popularity": _events_handler(handlers.popularity),
    "releases.fresh": _registered("h_fresh_releases"),
    "troi.playlists": _events_handler(handlers.playlist_picks),
    "tags.default": _registered("h_tags_percentile"),
    # -- year in music -----------------------------------------------------
    "year_in_music.new_releases_of_top_artists": _registered("h_yim_new_releases"),
    "year_in_music.most_listened_year": _registered("h_yim_most_listened_year"),
    "year_in_music.artist_evolution_activity": _registered("h_artist_evolution"),
    "year_in_music.day_of_week": _events_handler(handlers.day_of_week),
    "year_in_music.similar_users": _similar_users,
    "year_in_music.top_stats": _registered("h_yim_top_stats"),
    "year_in_music.listens_per_day": _registered("h_yim_listens_per_day"),
    "year_in_music.listen_count": _registered("h_yim_listen_count"),
    "year_in_music.new_artists_discovered_count": _registered("h_yim_new_entities"),
    "year_in_music.listening_time": _registered("h_yim_listening_time"),
    "year_in_music.top_genres": _registered("h_top_genres"),
    "year_in_music.genre_activity": _registered("h_genre_activity"),
    "year_in_music.top_missed_recordings": _registered("h_yim_top_missed"),
    "year_in_music.top_discoveries": _registered("h_yim_top_discoveries"),
}


def get_query_handler(name: str) -> Callable:
    """query_map.py:99-100 analog."""
    return QUERY_MAP[name]


def dispatch(name: str, spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    return get_query_handler(name)(spark, sf_dir, **params)
