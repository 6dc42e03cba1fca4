"""Generate the golden message-stream files for the handler e2e tests
(VERDICT r8 #6 — the reference's dominant test pattern, SURVEY §5.1:
full handler → chunked JSON messages → golden file, mirroring
stats/user/tests/test_user_stats.py:16-71).

Each golden captures the COMPLETE message stream a handler produces at
sf0.001 through the production chunking path (plans.api.dispatch →
messages.iter_message_chunks), canonicalized so the comparison is
deterministic even where row order is not:

- rows: every data row across all messages, JSON-canonicalized
  (sorted keys, default=str for dates) and sorted — the multiset of
  streamed rows;
- n_messages / chunk_size / message_type: the stream shape (chunk
  sizes are a deterministic function of row count, full chunks then a
  remainder, so n_messages is stable even when order isn't).

Regenerate ONLY when a deliberate output change lands:
    python tools/gen_golden.py
then review the diff like any contract change.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from listenbrainz_server_spark.messages import (
    CHUNK_LISTENER_STATS,
    CHUNK_SIMILARITY,
    CHUNK_USER_STATS,
    iter_message_chunks,
)
from listenbrainz_server_spark.plans.api import dispatch

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

# (golden file stem, handler name, params, chunk_size, message_type)
CASES = [
    (
        "stats_user_entity_all_time",
        "stats.user.entity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "user_entity",
    ),
    (
        "stats_sitewide_entity_all_time",
        "stats.sitewide.entity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "sitewide_entity",
    ),
    (
        "year_in_music_top_genres",
        "year_in_music.top_genres",
        {},
        CHUNK_USER_STATS,
        "year_in_music_top_genres",
    ),
    (
        "stats_user_listening_activity_all_time",
        "stats.user.listening_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "user_listening_activity",
    ),
    (
        "year_in_music_day_of_week",
        "year_in_music.day_of_week",
        {},
        CHUNK_USER_STATS,
        "year_in_music_day_of_week",
    ),
    (
        "stats_sitewide_listening_activity_all_time",
        "stats.sitewide.listening_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "sitewide_listening_activity",
    ),
    (
        "year_in_music_listen_count",
        "year_in_music.listen_count",
        {},
        CHUNK_USER_STATS,
        "year_in_music_listen_count",
    ),
    (
        "year_in_music_most_listened_year",
        "year_in_music.most_listened_year",
        {},
        CHUNK_USER_STATS,
        "year_in_music_most_listened_year",
    ),
    (
        "stats_user_daily_activity_all_time",
        "stats.user.daily_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "user_daily_activity",
    ),
    (
        "stats_user_era_activity_all_time",
        "stats.user.era_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "user_era_activity",
    ),
    (
        "year_in_music_listening_time",
        "year_in_music.listening_time",
        {},
        CHUNK_USER_STATS,
        "year_in_music_listening_time",
    ),
    # r11 widening (VERDICT r10 #6/#7): a LISTENER-family handler, a
    # popularity variant, and the FLOAT-emitting similar-users handler
    # — the float case pins the chunker's canonical rounding contract
    # (messages.MESSAGE_FLOAT_DP): similarity scores cross the message
    # boundary 6dp-rounded, so the golden is stable under plan /
    # partial-sum-order changes. Chunk sizes follow the reference's
    # per-family constants (SURVEY §4.3: 25 user stats / 5000 listener
    # stats / 10000 similarity — similarity/user.py:14
    # USERS_PER_MESSAGE, message type "similar_users").
    (
        "stats_entity_listeners_all_time",
        "stats.entity.listeners",
        {"stats_range": "all_time"},
        CHUNK_LISTENER_STATS,
        "entity_listener",
    ),
    (
        "popularity_popularity",
        "popularity.popularity",
        {},
        CHUNK_LISTENER_STATS,
        "popularity",
    ),
    (
        "similarity_similar_users",
        "similarity.similar_users",
        {},
        CHUNK_SIMILARITY,
        "similar_users",
    ),
    # r11 second batch — four more reference-corpus handlers, two of
    # them float-emitting (releases.fresh's score, tags.default's
    # percent → exercised through the rounding contract). Chunk sizes
    # and message types from the reference: fresh_releases.py:14
    # USERS_PER_MESSAGE=5 / type "fresh_releases", tags/tags.py:7
    # RECORDINGS_PER_MESSAGE=10000 / type "tags_dataset",
    # stats/user/genre_activity.py:17 "user_genre_activity",
    # year_in_music top_stats.py:16 "year_in_music_top_stats".
    (
        "stats_user_genre_activity_all_time",
        "stats.user.genre_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "user_genre_activity",
    ),
    (
        "year_in_music_top_stats",
        "year_in_music.top_stats",
        {},
        CHUNK_USER_STATS,
        "year_in_music_top_stats",
    ),
    (
        "releases_fresh",
        "releases.fresh",
        {},
        5,
        "fresh_releases",
    ),
    (
        "tags_default",
        "tags.default",
        {},
        CHUNK_SIMILARITY,
        "tags_dataset",
    ),
    # r11 third batch — the remaining stat families toward the
    # reference's ~20-handler golden corpus: a sitewide era pin, the
    # artist-evolution family, and two more YIM stats. Types from the
    # reference (stats/incremental/sitewide/era_activity.py:74
    # "sitewide_era_activity", stats/user/artist_evolution_activity
    # .py:21 "user_artist_evolution_activity", year_in_music/
    # listens_per_day.py:10 "year_in_music_listens_per_day",
    # new_artists_discovered.py:16
    # "year_in_music_new_artists_discovered_count").
    (
        "stats_sitewide_era_activity_all_time",
        "stats.sitewide.era_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "sitewide_era_activity",
    ),
    (
        "stats_user_artist_evolution_all_time",
        "stats.user.artist_evolution_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "user_artist_evolution_activity",
    ),
    (
        "year_in_music_listens_per_day",
        "year_in_music.listens_per_day",
        {},
        CHUNK_USER_STATS,
        "year_in_music_listens_per_day",
    ),
    (
        "year_in_music_new_artists_discovered_count",
        "year_in_music.new_artists_discovered_count",
        {},
        CHUNK_USER_STATS,
        "year_in_music_new_artists_discovered_count",
    ),
    # r11 fourth batch — the similarity family and the YIM playlist
    # stats. similarity.artist's type is the reference's literal
    # (similarity/artist.py:151 "similarity_artist"); recording
    # similarity's reference type is the dynamic
    # f"{name}_similarity_{entity}" (similarity/recording/common.py:
    # 217) — "session_similarity_recording" for our session-based CF
    # tier; both top_discoveries and top_missed_recordings stream as
    # "year_in_music_playlists" in the reference (top_discoveries.py:
    # 60, top_missed_recordings.py:114).
    (
        "similarity_artist",
        "similarity.artist",
        {},
        CHUNK_SIMILARITY,
        "similarity_artist",
    ),
    (
        "similarity_recording",
        "similarity.recording",
        {},
        CHUNK_SIMILARITY,
        "session_similarity_recording",
    ),
    (
        "year_in_music_top_discoveries",
        "year_in_music.top_discoveries",
        {},
        CHUNK_USER_STATS,
        "year_in_music_playlists",
    ),
    (
        "year_in_music_top_missed_recordings",
        "year_in_music.top_missed_recordings",
        {},
        CHUNK_USER_STATS,
        "year_in_music_playlists",
    ),
    # r11 fifth batch — toward full coverage of the deterministic
    # dispatch surface: the troi playlist stream, the remaining YIM
    # activity stats, the sitewide artist-evolution tier, the CF
    # missing-data feed, and the YIM alias of similar-users. Types and
    # chunk sizes from the reference: troi/periodic_jams.py:10,84
    # (USERS_PER_MESSAGE=100, "troi_playlists"); year_in_music/
    # new_releases_of_top_artists.py:33, genre_activity.py:24,
    # artist_evolution.py:20, similar_users.py:23 (one dict message —
    # chunked here at the similarity width); stats/sitewide/
    # artist_evolution_activity.py + spark/background.py:163
    # ("sitewide_artist_evolution_activity"); missing_mb_data/
    # missing_mb_data.py:79 (one message PER USER ROW → chunk 1).
    (
        "troi_playlists",
        "troi.playlists",
        {},
        100,
        "troi_playlists",
    ),
    (
        "year_in_music_new_releases_of_top_artists",
        "year_in_music.new_releases_of_top_artists",
        {},
        CHUNK_USER_STATS,
        "year_in_music_new_releases_of_top_artists",
    ),
    (
        "year_in_music_genre_activity",
        "year_in_music.genre_activity",
        {},
        CHUNK_USER_STATS,
        "year_in_music_genre_activity",
    ),
    (
        "year_in_music_artist_evolution",
        "year_in_music.artist_evolution_activity",
        {},
        CHUNK_USER_STATS,
        "year_in_music_artist_evolution_activity",
    ),
    (
        "stats_sitewide_artist_evolution_all_time",
        "stats.sitewide.artist_evolution_activity",
        {"stats_range": "all_time"},
        CHUNK_USER_STATS,
        "sitewide_artist_evolution_activity",
    ),
    (
        "cf_missing_mb_data",
        "cf.missing_mb_data",
        {},
        1,
        "missing_musicbrainz_data",
    ),
    (
        "year_in_music_similar_users",
        "year_in_music.similar_users",
        {},
        CHUNK_SIMILARITY,
        "year_in_music_similar_users",
    ),
    # r11 sixth batch — every remaining DETERMINISTIC dispatch name,
    # leaving only the ALS-ML pair (cf.train_model /
    # cf.recommendations — iterative trainers, pinned by their own
    # hash-gated contract queries instead) and the four
    # transport-parameterized imports (full/incremental/mlhd/compact
    # + pg: archive/path plumbing, pinned by the S6 dump tests)
    # without a golden. Types from the reference: echo/echo.py:4
    # ("echo"); spark/background.py:168
    # ("cf_recommendations_recording_dataframes"); discovery.py has
    # no message (parquet sink) — the compute's rows stream under a
    # descriptive type; sample/deleted likewise return the dataset.
    (
        "echo_echo",
        "echo.echo",
        {},
        1,
        "echo",
    ),
    (
        "import_dump_sample",
        "import.dump.sample",
        {},
        CHUNK_SIMILARITY,
        "import_sample_dump",
    ),
    (
        "import_deleted_listens",
        "import.deleted_listens",
        {},
        CHUNK_SIMILARITY,
        "import_deleted_listens",
    ),
    (
        "cf_create_dataframes",
        "cf.recommendations.recording.create_dataframes",
        {},
        CHUNK_SIMILARITY,
        "cf_recommendations_recording_dataframes",
    ),
    (
        "cf_discovery",
        "cf.recommendations.recording.discovery",
        {},
        CHUNK_SIMILARITY,
        "recording_discovery",
    ),
    # The reference's INCREMENTAL golden pattern (VERDICT r9 #6;
    # listenbrainz_spark/tests/__init__.py:69-72 — incremental dumps
    # 2 and 3 stack onto imported dump 1 before the handler runs):
    # base partial from events < Jan 15, delta dump 2 (Jan 15-22)
    # combined then ADVANCED into state, delta dump 3 (>= Jan 22)
    # combined on top, final user-entity stats streamed through the
    # production chunker. "#incremental" routes to the special
    # producer below, NOT to dispatch — the dispatch surface stays
    # exactly the reference's 45 names.
    (
        "stats_user_entity_incremental",
        "stats.user.entity#incremental",
        {},
        CHUNK_USER_STATS,
        "user_entity",
    ),
    # r12 (VERDICT r11 #6): the sitewide and listener incremental
    # paths get the same full+stacked-delta golden treatment. The
    # sitewide provider runs NEVER-PRUNED (sitewide/entity.py:38-40
    # semantics: the global aggregate needs every key's total, so no
    # affected-key pruning) — these producers combine the FULL frame.
    (
        "stats_sitewide_entity_incremental",
        "stats.sitewide.entity#incremental",
        {},
        25,
        "sitewide_entity",
    ),
    (
        "stats_entity_listeners_incremental",
        "stats.entity.listeners#incremental",
        {},
        5000,
        "entity_listener",
    ),
]


def _stacked_combine(spark, sf_dir, stat):
    """The reference's incremental fixture shape
    (listenbrainz_spark/tests/__init__.py:69-72): base partial from
    events < Jan 15, delta dump 2 (Jan 15-22) combined then ADVANCED
    into state, delta dump 3 (>= Jan 22) combined on top. Returns the
    final combined aggregate (full frame — never-pruned callers pass
    it straight to their final stats query)."""
    import tempfile

    from pyspark.sql import functions as F

    from listenbrainz_server_spark.catalog import load_table
    from listenbrainz_server_spark.incremental.engine import IncrementalEngine

    ev = load_table(spark, sf_dir, "events")
    cut1 = F.lit("2024-01-15").cast("timestamp")
    cut2 = F.lit("2024-01-22").cast("timestamp")
    eng = IncrementalEngine(spark, tempfile.mkdtemp(prefix="golden_incr_"))
    eng.create_partial(
        stat,
        ev.where(F.col("ts") < cut1),
        from_date="2024-01-01",
        to_date="2024-02-01",
        created="2024-01-15",
    )
    dump2 = eng.combine(
        stat,
        eng.delta_aggregate(
            stat, ev.where((F.col("ts") >= cut1) & (F.col("ts") < cut2))
        ),
    )
    eng.advance_partial(stat, dump2, created="2024-01-22")
    return eng.combine(
        stat, eng.delta_aggregate(stat, ev.where(F.col("ts") >= cut2))
    )


def _produce_incremental_user_entity(spark, sf_dir, **params):
    """Full + two stacked incremental batches -> final handler stats."""
    from listenbrainz_server_spark.plans.incremental_stats import (
        final_user_entity_stats,
        user_entity_stat,
    )

    return final_user_entity_stats(
        _stacked_combine(spark, sf_dir, user_entity_stat())
    )


def _produce_incremental_sitewide_entity(spark, sf_dir, **params):
    """Sitewide full+stacked-delta: per-(user, entity) capped partials
    combine (cap composes per pass — exact at fixture scale where no
    pair nears the 500 cap), never-pruned global top-K final."""
    from listenbrainz_server_spark.plans.incremental_stats import (
        final_sitewide_entity_stats,
        sitewide_entity_stat,
    )

    return final_sitewide_entity_stats(
        _stacked_combine(spark, sf_dir, sitewide_entity_stat())
    )


def _produce_incremental_entity_listeners(spark, sf_dir, **params):
    """Listener stats full+stacked-delta: per-(entity, user) counts
    combine, total_listeners + top-K recomputed from the combined
    aggregate."""
    from listenbrainz_server_spark.plans.incremental_stats import (
        entity_listener_stat,
        final_entity_listener_stats,
    )

    return final_entity_listener_stats(
        _stacked_combine(spark, sf_dir, entity_listener_stat())
    )


SPECIAL_PRODUCERS = {
    "stats.user.entity#incremental": _produce_incremental_user_entity,
    "stats.sitewide.entity#incremental": _produce_incremental_sitewide_entity,
    "stats.entity.listeners#incremental": _produce_incremental_entity_listeners,
}


def stream_canonical(spark, stem, name, params, chunk_size, message_type) -> dict:
    producer = SPECIAL_PRODUCERS.get(name)
    if producer is not None:
        df = producer(spark, SF_DIR, **params)
    else:
        df = dispatch(name, spark, SF_DIR, **params)
    msgs = list(iter_message_chunks(df, chunk_size, message_type))
    rows = sorted(
        json.dumps(r, sort_keys=True, default=str)
        for m in msgs
        for r in m["data"]
    )
    return {
        "handler": name,
        "params": params,
        "message_type": message_type,
        "chunk_size": chunk_size,
        "n_messages": len(msgs),
        "types_ok": all(m["type"] == message_type for m in msgs),
        "rows": rows,
    }


def main() -> None:
    from listenbrainz_server_spark.session import get_session

    spark = get_session("gen_golden")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    # Optional stem filter: `gen_golden.py stem [stem ...]` regenerates
    # only those cases (adding a case shouldn't rewrite 40 files).
    wanted = set(sys.argv[1:])
    cases = [c for c in CASES if not wanted or c[0] in wanted]
    if wanted and len(cases) != len(wanted):
        raise SystemExit(f"unknown stems: {wanted - {c[0] for c in cases}}")
    for stem, name, params, chunk, mtype in cases:
        got = stream_canonical(spark, stem, name, params, chunk, mtype)
        path = os.path.join(GOLDEN_DIR, f"{stem}.json")
        with open(path, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"wrote {path}: {len(got['rows'])} rows, "
              f"{got['n_messages']} messages")


if __name__ == "__main__":
    main()
