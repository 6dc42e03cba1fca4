"""Handler-API coverage, part 4: the round-2 parity set — similar
users (symmetric top-N expansion), year_in_music new-releases (the
explode-both-sides equi-join composition), YIM top stats / listens per
day / listen count.

Table roles: orders≈listens (o_custkey≈user), supplier-key sets per
order≈artist_credit_mbids arrays, part≈release_group, events≈listens
for the time-series handlers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.operators.joins import (
    densify,
    explode_equi_join,
    priority_pick,
)
from listenbrainz_server_spark.operators.topk import top_k_per_group
from listenbrainz_server_spark.queries import register

# --------------------------------------------------------------------------
# similarity.similar_users (similarity/user.py:63-86): cosine pairs
# (i<j) expanded symmetrically, row_number per user by similarity,
# top-N kept. The pair source is the DataFrame-native DIMSUM
# formulation (queries/ml.py m_user_cosine).
# --------------------------------------------------------------------------
# Mirrors the DEGREE-CAPPED default of queries/ml.py user_cosine_pairs
# (VERDICT r2 #3): norms over the full vector, candidate pairs from the
# per-item top-20-by-playcount subset.
_COSINE_PAIRS_SQL = """
    pc AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id, COUNT(*) AS playcount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    capped AS (
        SELECT user_id, item_id, playcount FROM (
            SELECT user_id, item_id, playcount,
                   ROW_NUMBER() OVER (
                       PARTITION BY item_id
                       ORDER BY playcount DESC, user_id
                   ) AS idr
            FROM pc
        ) WHERE idr <= 20
    ),
    norms AS (
        SELECT user_id, sqrt(SUM(playcount * playcount * 1.0)) AS nrm FROM pc GROUP BY 1
    ),
    dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               SUM(a.playcount * b.playcount * 1.0) AS dot
        FROM capped a JOIN capped b
          ON a.item_id = b.item_id AND a.user_id < b.user_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT user_a, user_b, dot / (na.nrm * nb.nrm) AS sim
        FROM dots
        JOIN norms na ON na.user_id = user_a
        JOIN norms nb ON nb.user_id = user_b
        WHERE dot / (na.nrm * nb.nrm) >= 0.15
    )
"""


@register(
    "h_similar_users",
    f"""
    WITH {_COSINE_PAIRS_SQL},
    sym_pairs AS (
        SELECT user_a AS user_id, user_b AS other_user_id, sim FROM pairs
        UNION ALL
        SELECT user_b AS user_id, user_a AS other_user_id, sim FROM pairs
    )
    SELECT user_id, other_user_id, ROUND(sim, 6) AS similarity
    FROM (
        SELECT user_id, other_user_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY sim DESC, other_user_id
               ) AS rn
        FROM sym_pairs
    ) WHERE rn <= 25
    """,
    doc="similarity.similar_users handler: symmetric expansion + top-25 "
    "(similarity/user.py:70-86)",
)
def h_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similar_users_handler(spark, sf_dir)


def similar_users_handler(
    spark: SparkSession,
    sf_dir: str,
    max_num_users: int = 25,
    threshold: float = 0.15,
) -> DataFrame:
    """similarity.similar_users with the reference's request params
    (request_manage.py:355-360: max_num_users default 25)."""
    from listenbrainz_server_spark.queries.ml import user_cosine_pairs

    pairs = user_cosine_pairs(spark, sf_dir, threshold=threshold)
    # Symmetric expansion via explode, not UNION ALL of two selects —
    # a union would run the whole cosine pipeline twice (the reference
    # unions because its CoordinateMatrix is already materialized,
    # similarity/user.py:70-81); explode reads each pair once.
    combined = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("user_a").alias("user_id"),
                    F.col("user_b").alias("other_user_id"),
                    F.col("similarity_raw"),
                ),
                F.struct(
                    F.col("user_b").alias("user_id"),
                    F.col("user_a").alias("other_user_id"),
                    F.col("similarity_raw"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    top = top_k_per_group(
        combined,
        partition_by=["user_id"],
        order_by=[F.col("similarity_raw").desc(), F.col("other_user_id")],
        k=max_num_users,
        keep_rank=False,
    )
    return top.select(
        "user_id",
        "other_user_id",
        F.round("similarity_raw", 6).alias("similarity"),
    )


# --------------------------------------------------------------------------
# year_in_music.new_releases_of_top_artists
# (new_releases_of_top_artists.py:39-133) — the 3h→2min join lesson
# composed end-to-end: artist-credit ARRAYS are grouped as keys,
# per-user top arrays are exploded to artist ids, the release side
# explodes its own artist array, and the match is an equi join on the
# exploded id — never arrays_overlap (BroadcastNestedLoopJoin).
#
# Roles: a listen := an order; its artist-credit array := the sorted
# set of suppliers in the order; release_group := part (p_size <= 2 ≈
# "first_release_date_year = Y"); release's artist array := suppliers
# who shipped it; primary_type priority := p_type prefix
# (STANDARD < SMALL < MEDIUM < LARGE < other ≈ Album < EP < Single < Other < Broadcast).
# --------------------------------------------------------------------------
_TOP_ARTISTS = 5
_MAX_RELEASES_PER_ARTIST = 1
_TYPE_PRIORITY_SQL = """CASE
        WHEN p_type LIKE 'STANDARD%' THEN 1
        WHEN p_type LIKE 'SMALL%' THEN 2
        WHEN p_type LIKE 'MEDIUM%' THEN 3
        WHEN p_type LIKE 'LARGE%' THEN 4
        ELSE 5 END"""


@register(
    "h_yim_new_releases",
    f"""
    WITH listens AS (
        SELECT o.o_custkey AS user_id, o.o_orderkey,
               list_sort(list(DISTINCT l.l_suppkey)) AS artist_credit_ids
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    artist_counts AS (
        SELECT user_id, artist_credit_ids, COUNT(*) AS listen_count
        FROM listens GROUP BY 1, 2
    ),
    top_artists AS (
        SELECT user_id, artist_credit_ids,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY listen_count DESC,
                            array_to_string(artist_credit_ids, ',')
               ) AS rn
        FROM artist_counts
    ),
    top_n_artists AS (
        SELECT DISTINCT user_id, UNNEST(artist_credit_ids) AS artist_id
        FROM top_artists WHERE rn <= {_TOP_ARTISTS}
    ),
    releases_of_year AS (
        SELECT p.p_partkey, p.p_name, p.p_type,
               UNNEST(list_sort(list(DISTINCT l.l_suppkey))) AS artist_id
        FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 2
        GROUP BY p.p_partkey, p.p_name, p.p_type
    ),
    matched AS (
        SELECT t.user_id, t.artist_id, r.p_partkey, r.p_name,
               {_TYPE_PRIORITY_SQL} AS type_priority
        FROM releases_of_year r JOIN top_n_artists t ON r.artist_id = t.artist_id
    ),
    ranked AS (
        SELECT user_id, artist_id, p_partkey, p_name, type_priority,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, artist_id
                   ORDER BY type_priority ASC, p_partkey ASC
               ) AS release_rank
        FROM matched
    )
    SELECT user_id, CAST(artist_id AS BIGINT) AS artist_id,
           p_partkey AS release_id, p_name AS title,
           CAST(type_priority AS BIGINT) AS type_priority
    FROM ranked WHERE release_rank <= {_MAX_RELEASES_PER_ARTIST}
    """,
    doc="year_in_music.new_releases_of_top_artists handler: array group "
    "keys + explode-both-sides equi join + type-priority rank "
    "(new_releases_of_top_artists.py:39-133)",
)
def h_yim_new_releases(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_type", "p_size"
    )

    # Listen-level artist-credit arrays (sorted set → deterministic
    # group keys, exactly the reference's artist_credit_mbids role).
    listens = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("artist_credit_ids"))
    )
    artist_counts = listens.groupBy("user_id", "artist_credit_ids").agg(
        F.count(F.lit(1)).alias("listen_count")
    )
    top_arrays = top_k_per_group(
        artist_counts,
        partition_by=["user_id"],
        order_by=[
            F.col("listen_count").desc(),
            F.array_join(F.col("artist_credit_ids"), ","),
        ],
        k=_TOP_ARTISTS,
        keep_rank=False,
    )
    top_n_artists = (
        top_arrays.select(
            "user_id", F.explode("artist_credit_ids").alias("artist_id")
        ).distinct()
    )

    releases = (
        part.where(F.col("p_size") <= 2)
        .join(li, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_type")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("artists"))
        .select(
            "p_partkey",
            "p_name",
            F.explode("artists").alias("artist_id"),
            F.when(F.col("p_type").startswith("STANDARD"), 1)
            .when(F.col("p_type").startswith("SMALL"), 2)
            .when(F.col("p_type").startswith("MEDIUM"), 3)
            .when(F.col("p_type").startswith("LARGE"), 4)
            .otherwise(5)
            .alias("type_priority"),
        )
    )
    matched = releases.join(top_n_artists, "artist_id")
    ranked = top_k_per_group(
        matched,
        partition_by=["user_id", "artist_id"],
        order_by=[F.col("type_priority").asc(), F.col("p_partkey").asc()],
        k=_MAX_RELEASES_PER_ARTIST,
        keep_rank=False,
    )
    return ranked.select(
        "user_id",
        F.col("artist_id").cast("bigint").alias("artist_id"),
        F.col("p_partkey").alias("release_id"),
        F.col("p_name").alias("title"),
        F.col("type_priority").cast("bigint").alias("type_priority"),
    )


# --------------------------------------------------------------------------
# year_in_music.top_stats (top_stats.py:33-54): top-50 per user for
# each entity kind, one unioned frame tagged with entity_kind (the
# reference loops artists/recordings/release_groups through one
# engine).
# --------------------------------------------------------------------------
_YIM_K = 50


def _top_stats_kind_sql(kind: str, expr: str) -> str:
    return f"""
    SELECT user_id, entity_kind, entity, listen_count, rank FROM (
        SELECT user_id, '{kind}' AS entity_kind, {expr} AS entity,
               COUNT(*) AS listen_count,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY COUNT(*) DESC, {expr}
               ) AS BIGINT) AS rank
        FROM events GROUP BY user_id, {expr}
    ) WHERE rank <= {_YIM_K}
    """


@register(
    "h_yim_top_stats",
    " UNION ALL ".join(
        [
            _top_stats_kind_sql("artists", "event_type"),
            _top_stats_kind_sql("recordings", "json_extract_string(props, '$.k')"),
            _top_stats_kind_sql(
                "release_groups", "CAST(CAST(ts AS DATE) AS VARCHAR)"
            ),
        ]
    ),
    doc="year_in_music.top_stats handler: per-user top-50 across three "
    "entity kinds in one pass (top_stats.py:33-54)",
)
def h_yim_top_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = {
        "artists": F.col("event_type"),
        "recordings": F.get_json_object("props", "$.k"),
        "release_groups": F.col("ts").cast("date").cast("string"),
    }
    outs = []
    for kind, expr in kinds.items():
        counts = ev.groupBy("user_id", expr.alias("entity")).agg(
            F.count(F.lit(1)).alias("listen_count")
        )
        top = top_k_per_group(
            counts,
            partition_by=["user_id"],
            order_by=[F.col("listen_count").desc(), F.col("entity")],
            k=_YIM_K,
        )
        outs.append(
            top.select(
                "user_id",
                F.lit(kind).alias("entity_kind"),
                "entity",
                "listen_count",
                F.col("rank").cast("bigint").alias("rank"),
            )
        )
    merged = outs[0]
    for o in outs[1:]:
        merged = merged.unionByName(o)
    return merged


# --------------------------------------------------------------------------
# year_in_music.listens_per_day (listens_per_day.py:7-14): per-user
# per-day listen counts over the year, zero-filled on the dense
# user × day grid (the listening-activity engine with day buckets).
# --------------------------------------------------------------------------
@register(
    "h_yim_listens_per_day",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    days AS (
        SELECT CAST(d AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)
    ),
    agg AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS listen_count
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01'
        GROUP BY 1, 2
    )
    SELECT u.user_id, d.day, COALESCE(a.listen_count, 0) AS listen_count
    FROM users u CROSS JOIN days d
    LEFT JOIN agg a ON a.user_id = u.user_id AND a.day = d.day
    """,
    doc="year_in_music.listens_per_day handler: dense user×day grid "
    "(listens_per_day.py:7-14)",
)
def h_yim_listens_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    days = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-12-31', "
        "INTERVAL 1 DAY)) AS day"
    )
    agg = (
        ev.where(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2025-01-01").cast("timestamp"))
        )
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("listen_count"))
    )
    return densify(
        users,
        days,
        agg,
        join_keys=["user_id", "day"],
        fill={"listen_count": F.lit(0).cast("bigint")},
    ).select("user_id", "day", "listen_count")


# --------------------------------------------------------------------------
# year_in_music.listen_count (listen_count.py:16-31): yearly per-user
# totals; the reference folds them into one JSON map — same map built
# here (collect over aggregate cardinality, never fact rows).
# --------------------------------------------------------------------------
@register(
    "h_yim_listen_count",
    """
    SELECT user_id, COUNT(*) AS listen_count
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01'
    GROUP BY user_id
    """,
    doc="year_in_music.listen_count handler (listen_count.py:16-40)",
)
def h_yim_listen_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2025-01-01").cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("listen_count"))
    )


# --------------------------------------------------------------------------
# year_in_music.top_genres EXACT semantics (top_genres.py:29-110):
# h_top_genres covers the priority dedup but counts occurrences; the
# reference keeps the PRIORITY-WINNING SOURCE'S genre_count value
# (ROW_NUMBER pick), sums those, computes percent, keeps RANK <= 25,
# and packs a descending-sorted struct list per user. This handler
# reproduces that exactly; the struct list is serialized to a string
# (genre:count:pct_micro joined by '|') so both engines hash it
# identically. Sources mirror the reference's three pre-aggregated tag
# tables: each emits one row per (user, item, genre) with its own
# count, over OVERLAPPING row subsets so the priority pick is
# exercised (recording-tags ≈ returnflag-N lines, release-group-tags ≈
# low line numbers, artist-tags ≈ all lines).
# --------------------------------------------------------------------------
@register(
    "h_top_genres_exact",
    """
    WITH purchases AS (
        SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
               LOWER(split_part(p.p_type, ' ', 1)) AS genre,
               l.l_quantity, l.l_linenumber, l.l_returnflag
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
    ),
    src1 AS (
        SELECT user_id, item_id, genre, 1 AS priority,
               CAST(MAX(l_quantity) AS BIGINT) AS genre_count
        FROM purchases WHERE l_returnflag = 'N' GROUP BY 1, 2, 3
    ),
    src2 AS (
        SELECT user_id, item_id, genre, 2 AS priority,
               CAST(SUM(l_quantity) AS BIGINT) AS genre_count
        FROM purchases WHERE l_linenumber <= 3 GROUP BY 1, 2, 3
    ),
    src3 AS (
        SELECT user_id, item_id, genre, 3 AS priority,
               COUNT(*) AS genre_count
        FROM purchases GROUP BY 1, 2, 3
    ),
    all_genres AS (
        SELECT * FROM src1 UNION ALL SELECT * FROM src2 UNION ALL SELECT * FROM src3
    ),
    prioritized AS (
        SELECT user_id, item_id, genre, genre_count FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, item_id, genre ORDER BY priority ASC) AS rn
            FROM all_genres
        ) WHERE rn = 1
    ),
    together AS (
        SELECT user_id, genre, SUM(genre_count) AS genre_count
        FROM prioritized GROUP BY 1, 2
    ),
    percentage AS (
        SELECT user_id, genre, genre_count,
               CAST(ROUND(genre_count * 1000000.0 /
                    SUM(genre_count) OVER (PARTITION BY user_id), 0) AS BIGINT)
                   AS pct_micro,
               RANK() OVER (PARTITION BY user_id ORDER BY genre_count DESC) AS ranking
        FROM together
    )
    SELECT user_id,
           STRING_AGG(genre || ':' || genre_count || ':' || pct_micro, '|'
                      ORDER BY genre_count DESC, genre DESC, pct_micro DESC) AS data
    FROM percentage WHERE ranking <= 25 GROUP BY user_id
    """,
    doc="year_in_music.top_genres exact handler: priority-winner count pick, "
    "RANK<=25, sorted struct list (top_genres.py:29-110)",
)
def h_top_genres_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_linenumber", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    purchases = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
            F.lower(F.substring_index("p_type", " ", 1)).alias("genre"),
            "l_quantity",
            "l_linenumber",
            "l_returnflag",
        )
        # ONE user-keyed exchange before the explode: hash(user_id)
        # satisfies every downstream clustering requirement — the
        # (user, item, genre, priority) agg, the priority-pick window,
        # the (user, genre) agg, the share/rank windows, and the final
        # per-user pack — so the exploded rows never shuffle (same
        # rationale as h_top_genres; measured there at 3.6×).
        .repartition("user_id")
    )

    # One pass over the join: three per-source aggregations as separate
    # frames would execute the fact join three times. Instead each row
    # emits its applicable (priority, value) entries via a filtered
    # inline array, and one grouped aggregation computes every
    # source's statistic; the priority-appropriate one is selected per
    # group (MAX for source 1, SUM for source 2, COUNT for source 3).
    entries = F.filter(
        F.array(
            F.struct(
                F.lit(1).alias("priority"),
                F.when(F.col("l_returnflag") == "N", F.col("l_quantity")).alias("v"),
            ),
            F.struct(
                F.lit(2).alias("priority"),
                F.when(F.col("l_linenumber") <= 3, F.col("l_quantity")).alias("v"),
            ),
            F.struct(F.lit(3).alias("priority"), F.lit(1.0).alias("v")),
        ),
        lambda s: s["v"].isNotNull(),
    )
    all_genres = (
        purchases.select(
            "user_id", "item_id", "genre", F.explode(entries).alias("pv")
        )
        .select("user_id", "item_id", "genre", "pv.priority", "pv.v")
        .groupBy("user_id", "item_id", "genre", "priority")
        .agg(
            F.max("v").alias("_mx"),
            F.sum("v").alias("_sm"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        .withColumn(
            "genre_count",
            F.when(F.col("priority") == 1, F.col("_mx"))
            .when(F.col("priority") == 2, F.col("_sm"))
            .otherwise(F.col("_cnt"))
            .cast("bigint"),
        )
        .drop("_mx", "_sm", "_cnt")
    )
    prioritized = priority_pick(
        all_genres, keys=["user_id", "item_id", "genre"]
    ).select("user_id", "genre", "genre_count")
    together = prioritized.groupBy("user_id", "genre").agg(
        F.sum("genre_count").alias("genre_count")
    )
    user_w = Window.partitionBy("user_id")
    percentage = together.withColumn(
        "pct_micro",
        F.round(
            F.col("genre_count") * 1000000.0 / F.sum("genre_count").over(user_w), 0
        ).cast("bigint"),
    ).withColumn(
        "ranking",
        F.rank().over(Window.partitionBy("user_id").orderBy(F.col("genre_count").desc())),
    )
    # sort_array on struct(genre_count, genre, pct_micro) descending ==
    # ORDER BY genre_count DESC, genre DESC, pct_micro DESC.
    packed = (
        percentage.where(F.col("ranking") <= 25)
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("genre_count", "genre", "pct_micro")), False
            ).alias("arr")
        )
    )
    return packed.select(
        "user_id",
        F.array_join(
            F.transform(
                "arr",
                lambda s: F.concat_ws(
                    ":", s["genre"], s["genre_count"], s["pct_micro"]
                ),
            ),
            "|",
        ).alias("data"),
    )
