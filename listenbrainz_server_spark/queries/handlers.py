"""Handler-API queries: the reference's query_map surface (SURVEY.md
§2.12) exercised end-to-end through plans/api.dispatch, each with a
DuckDB oracle. The events table plays the listens fact role.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from listenbrainz_server_spark.plans.api import dispatch
from listenbrainz_server_spark.queries import register


# --------------------------------------------------------------------------
# stats.user.entity — the M0 vertical slice: group-count → top-K →
# totals alongside (user/artist.py:34-110).
# --------------------------------------------------------------------------
@register(
    "h_user_entity_stats",
    """
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS listen_count
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, event_type, listen_count,
               CAST(SUM(listen_count) OVER (PARTITION BY user_id) AS BIGINT) AS total_count,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS entity_count
        FROM counts
    )
    SELECT * FROM (
        SELECT user_id, event_type, listen_count, total_count, entity_count,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY listen_count DESC, event_type) AS BIGINT) AS rank
        FROM tot
    ) WHERE rank <= 3
    """,
    doc="stats.user.entity handler: per-user top-K entities + totals",
)
def h_user_entity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("stats.user.entity", spark, sf_dir, k=3)


# --------------------------------------------------------------------------
# stats.sitewide.entity — per-user cap before global agg + top-K
# (sitewide/entity.py:50-59, sitewide/artist.py:73-77).
# --------------------------------------------------------------------------
@register(
    "h_sitewide_entity",
    """
    WITH per_user AS (
        SELECT user_id, event_type, LEAST(COUNT(*), 10) AS capped
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(SUM(capped) AS BIGINT) AS listen_count
    FROM per_user GROUP BY event_type
    ORDER BY listen_count DESC, event_type
    LIMIT 3
    """,
    doc="stats.sitewide.entity handler: capped counts, global top-K",
)
def h_sitewide_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("stats.sitewide.entity", spark, sf_dir, cap=10, k=3)


# --------------------------------------------------------------------------
# stats.entity.listeners — top listeners per entity
# (stats/listener/entity.py:20-28).
# --------------------------------------------------------------------------
@register(
    "h_entity_listeners",
    """
    WITH counts AS (
        SELECT event_type, user_id, COUNT(*) AS listen_count
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, user_id, listen_count,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS total_listeners
        FROM counts
    )
    SELECT * FROM (
        SELECT event_type, user_id, listen_count, total_listeners,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY listen_count DESC, user_id) AS BIGINT) AS rank
        FROM tot
    ) WHERE rank <= 3
    """,
    doc="stats.entity.listeners handler: top-K listeners per entity",
)
def h_entity_listeners(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("stats.entity.listeners", spark, sf_dir, k=3)


# --------------------------------------------------------------------------
# stats.user.daily_activity — weekday×hour dense grid
# (user/daily_activity.py:28-90).
# --------------------------------------------------------------------------
@register(
    "h_daily_activity",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    grid AS (
        SELECT d.dow + 1 AS dow, h.hour
        FROM (SELECT UNNEST(range(7)) AS dow) d
        CROSS JOIN (SELECT UNNEST(range(24)) AS hour) h
    ),
    agg AS (
        SELECT user_id,
               CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               COUNT(*) AS listen_count
        FROM events GROUP BY 1, 2, 3
    )
    SELECT u.user_id, g.dow, g.hour, COALESCE(a.listen_count, 0) AS listen_count
    FROM users u CROSS JOIN grid g
    LEFT JOIN agg a ON a.user_id = u.user_id AND a.dow = g.dow AND a.hour = g.hour
    """,
    doc="stats.user.daily_activity handler: weekday×hour zero-filled grid",
)
def h_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("stats.user.daily_activity", spark, sf_dir)


# --------------------------------------------------------------------------
# popularity.popularity — listen totals + distinct listeners
# (popularity/common.py:17,54).
# --------------------------------------------------------------------------
@register(
    "h_popularity",
    """
    SELECT event_type,
           COUNT(*) AS total_listen_count,
           COUNT(DISTINCT user_id) AS total_user_count
    FROM events GROUP BY event_type
    """,
    doc="popularity.popularity handler",
)
def h_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("popularity.popularity", spark, sf_dir)


# --------------------------------------------------------------------------
# similarity.recording — sessionized co-occurrence similarity
# (similarity/recording/common.py:59-172).
# --------------------------------------------------------------------------
@register(
    "h_similar_entities",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
               DATE_DIFF('second',
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) AS gap_s
        FROM events
    ),
    sessions AS (
        SELECT user_id, event_type,
               SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    ),
    pairs AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b, COUNT(*) AS score
        FROM sessions a
        JOIN sessions b ON a.user_id = b.user_id AND a.session_id = b.session_id
                        AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT * FROM (
        SELECT item_a, item_b, score,
               CAST(RANK() OVER (
                   PARTITION BY item_a ORDER BY score DESC, item_b) AS BIGINT) AS rank
        FROM pairs WHERE score > 1
    ) WHERE rank <= 100
    """,
    doc="similarity.recording handler: sessionize → pair counts → rank limit",
)
def h_similar_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events ordering tie-break is handled inside sessionize via ts only;
    # events have unique (user, ts) at this scale — rank method matches.
    return dispatch(
        "similarity.recording", spark, sf_dir, session_gap_s=1800, threshold=1, limit=100
    )


# --------------------------------------------------------------------------
# year_in_music.day_of_week — per-user argmax weekday
# (year_in_music/day_of_week.py:22-28).
# --------------------------------------------------------------------------
@register(
    "h_day_of_week",
    """
    WITH counts AS (
        SELECT user_id, CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
               dayname(ts) AS weekday, COUNT(*) AS n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id, dow, weekday, n FROM (
        SELECT user_id, dow, weekday, n,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, dow) AS rn
        FROM counts
    ) WHERE rn = 1
    """,
    doc="year_in_music.day_of_week handler: per-user top weekday "
    "(EEEE-style name like the reference, ISO-index tie-break)",
)
def h_day_of_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("year_in_music.day_of_week", spark, sf_dir)


# --------------------------------------------------------------------------
# troi.playlists — deterministic md5-shuffle picks
# (troi/periodic_jams.py:56-64).
# --------------------------------------------------------------------------
@register(
    "h_playlist_picks",
    """
    SELECT * FROM (
        SELECT user_id, event_type,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY MD5(event_type)) AS BIGINT) AS pick
        FROM (SELECT DISTINCT user_id, event_type FROM events)
    ) WHERE pick <= 2
    """,
    doc="troi.playlists handler: md5-derived diversification picks",
)
def h_playlist_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dispatch("troi.playlists", spark, sf_dir, picks=2)
