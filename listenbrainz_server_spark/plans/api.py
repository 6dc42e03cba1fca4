"""Handler dispatch: name → provider, the query_map analog
(listenbrainz_spark/query_map.py:45-96 + request_consumer dispatch
request_consumer.py:105-114, minus the RabbitMQ transport — our
engine returns DataFrames; callers chunk results via messages.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.plans import handlers


def _events_handler(fn: Callable, **defaults):
    def run(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
        events = load_table(spark, sf_dir, "events")
        return fn(events, **{**defaults, **params})

    return run


def _echo(spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    """echo.echo health check (listenbrainz_spark/echo/echo.py:1-8)."""
    return spark.createDataFrame([("echo", sf_dir)], "message string, data_dir string")


QUERY_MAP: dict[str, Callable] = {
    "echo.echo": _echo,
    "stats.user.entity": _events_handler(handlers.user_entity_stats),
    "stats.user.daily_activity": _events_handler(handlers.daily_activity),
    "stats.sitewide.entity": _events_handler(handlers.sitewide_entity_stats),
    "stats.entity.listeners": _events_handler(handlers.entity_listener_stats),
    "popularity.popularity": _events_handler(handlers.popularity),
    "similarity.recording": _events_handler(handlers.similar_entities),
    "year_in_music.day_of_week": _events_handler(handlers.day_of_week),
    "troi.playlists": _events_handler(handlers.playlist_picks),
}


def get_query_handler(name: str) -> Callable:
    """query_map.py:99-100 analog."""
    return QUERY_MAP[name]


def dispatch(name: str, spark: SparkSession, sf_dir: str, **params) -> DataFrame:
    return get_query_handler(name)(spark, sf_dir, **params)
