"""Remaining operator-inventory coverage: lateral/positional explode
(J12), array_sort with lambda comparator (O3), 3-source priority merge
(U3), boolean window aggregate (A10), prefix chunk filter (P10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.queries import register


# --------------------------------------------------------------------------
# J12: lateral explode with position (LATERAL VIEW explode,
# artist_evolution_activity.py:52-54) — array built per user, then
# posexploded; positions are well-defined because the array is sorted.
# --------------------------------------------------------------------------
@register(
    "j12_posexplode",
    """
    WITH distinct_types AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_type) - 1
                AS INT) AS pos,
           event_type
    FROM distinct_types
    """,
    doc="J12 lateral/positional explode (artist_evolution_activity.py:52-54)",
)
def j12_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arrays = (
        ev.select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("event_type")).alias("types"))
    )
    return arrays.select(
        "user_id", F.posexplode("types").alias("pos", "event_type")
    )


# --------------------------------------------------------------------------
# O3: array_sort with a lambda comparator (recommend.py:113-133,
# fresh_releases.py:87-111) — sort struct array by count desc, name
# asc; emitted as a joined string for engine-independent comparison.
# --------------------------------------------------------------------------
@register(
    "o3_array_sort_lambda",
    """
    WITH counts AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           STRING_AGG(o_orderstatus || ':' || n, ',' ORDER BY n DESC, o_orderstatus)
               AS ranked_statuses
    FROM counts
    GROUP BY o_orderpriority
    """,
    doc="O3 array_sort w/ SQL lambda comparator (recommend.py:113-133)",
)
def o3_array_sort_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    packed = counts.groupBy("o_orderpriority").agg(
        F.collect_list(F.struct("o_orderstatus", "n")).alias("arr")
    )
    sorted_arr = F.expr(
        """
        array_sort(arr, (l, r) -> CASE
            WHEN l.n > r.n THEN -1 WHEN l.n < r.n THEN 1
            WHEN l.o_orderstatus < r.o_orderstatus THEN -1
            WHEN l.o_orderstatus > r.o_orderstatus THEN 1 ELSE 0 END)
        """
    )
    return packed.select(
        "o_orderpriority",
        F.array_join(
            F.transform(
                sorted_arr, lambda s: F.concat_ws(":", s.o_orderstatus, s.n)
            ),
            ",",
        ).alias("ranked_statuses"),
    )


# --------------------------------------------------------------------------
# U3: 3-source UNION ALL + priority dedup (top_genres.py:29-63 —
# recording/artist/release-group genre sources, best priority wins).
# --------------------------------------------------------------------------
@register(
    "u3_priority_merge",
    """
    WITH merged AS (
        SELECT o_custkey, o_orderkey, 1 AS priority FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey, o_orderkey, 2 AS priority FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_custkey, o_orderkey, 3 AS priority FROM orders WHERE o_orderstatus = 'P'
    )
    SELECT o_custkey, CAST(MIN(priority) AS INT) AS best_priority,
           COUNT(*) AS n_orders
    FROM merged
    GROUP BY o_custkey
    """,
    doc="U3 multi-source union + priority pick (top_genres.py:29-63)",
)
def u3_priority_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def src(status: str, prio: int) -> DataFrame:
        return orders.where(F.col("o_orderstatus") == status).select(
            "o_custkey", "o_orderkey", F.lit(prio).alias("priority")
        )

    merged = src("F", 1).unionByName(src("O", 2)).unionByName(src("P", 3))
    return merged.groupBy("o_custkey").agg(
        F.min("priority").cast("int").alias("best_priority"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A10: boolean aggregate over a window (any(...) OVER w featured-artist
# detection, similarity/artist.py:28-36).
# --------------------------------------------------------------------------
@register(
    "a10_bool_or_window",
    """
    SELECT DISTINCT user_id,
           BOOL_OR(event_type = 'purchase') OVER (PARTITION BY user_id) AS has_purchase
    FROM events
    """,
    doc="A10 any()/bool_or over window (similarity/artist.py:28-36)",
)
def a10_bool_or_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return ev.select(
        "user_id",
        F.bool_or(F.col("event_type") == "purchase").over(w).alias("has_purchase"),
    ).distinct()


# --------------------------------------------------------------------------
# J13: explode-both-sides equi join instead of arrays_overlap — the
# reference's documented 3h→2min rewrite
# (new_releases_of_top_artists.py:39-43). Array sides are built from
# events (user→types, hour→types); overlap pairs come from the
# exploded equi join, never a nested loop.
# --------------------------------------------------------------------------
@register(
    "j13_explode_equi_join",
    """
    WITH user_types AS (SELECT DISTINCT user_id, event_type FROM events),
         hour_types AS (
            SELECT DISTINCT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, event_type
            FROM events
         )
    SELECT u.user_id, COUNT(DISTINCT h.hour) AS overlapping_hours
    FROM user_types u JOIN hour_types h ON u.event_type = h.event_type
    GROUP BY u.user_id
    """,
    doc="J13 explode-to-equi-join arrays_overlap rewrite (3h->2min lesson)",
)
def j13_explode_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.joins import explode_equi_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.groupBy("user_id").agg(F.collect_set("event_type").alias("types_a"))
    right = ev.groupBy(F.hour("ts").cast("bigint").alias("hour")).agg(
        F.collect_set("event_type").alias("types_b")
    )
    joined = explode_equi_join(left, "types_a", right, "types_b")
    return joined.groupBy("user_id").agg(
        F.countDistinct("hour").alias("overlapping_hours")
    )


# --------------------------------------------------------------------------
# Skew: salted two-phase aggregation ≡ direct aggregation (the
# aggregation-skew mitigation AQE doesn't provide; operators/skew.py).
# --------------------------------------------------------------------------
@register(
    "x_salted_agg",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value,
           MAX(user_id) AS max_user
    FROM events
    GROUP BY event_type
    """,
    doc="salted two-phase aggregation equals direct aggregation (skew path)",
)
def x_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {"n": ("*", "count"), "total_value": ("value", "sum"), "max_user": ("user_id", "max")},
        salt_buckets=16,
    )
    return out.select(
        "event_type", "n", F.round("total_value", 2).alias("total_value"), "max_user"
    )


@register(
    "x_salted_count_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS listener_count
    FROM events
    GROUP BY event_type
    """,
    doc="hot-key-free exact count distinct (dedup-first two-phase)",
)
def x_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.skew import distinct_count_salted

    ev = load_table(spark, sf_dir, "events")
    return distinct_count_salted(ev, ["event_type"], "user_id", "listener_count")


# --------------------------------------------------------------------------
# Approximate count-distinct (HLL): the 100TB upgrade path for A4 —
# SURVEY §2.4 notes the reference's popularity combine already accepts
# approximation (it sums exact partial distincts across batches);
# approx_count_distinct makes the trade explicit and mergeable. HLL
# estimates differ per engine, so the raw estimate can't be hashed
# cross-engine; the registered form is the SELF-AUDITING variant
# (VERDICT r8 #1): it emits the exact distinct computed in the same
# scan plus the bounded-error boolean |est-exact|/exact <= 0.05 —
# the CHECK itself is hash-stable, so an estimator drifting out of
# tolerance flips the boolean and fails the driver hash gate. The
# production form (estimate only, no exact twin) is the same agg
# minus the count_distinct column.
# --------------------------------------------------------------------------
@register(
    "x_approx_distinct",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_listeners,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HLL) listener counts, self-auditing "
    "form: exact twin + |est-exact|/exact <= 0.05 boolean inside the "
    "driver hash gate (mergeable scale path for A4)",
)
def x_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = F.count_distinct("user_id").cast("bigint")
    est = F.approx_count_distinct("user_id", rsd=0.02)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_listeners"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.abs(est.cast("double") - exact.cast("double")) / exact
            <= F.lit(0.05)
        ).alias("est_within_5pct"),
    )


# --------------------------------------------------------------------------
# RANGE-frame rolling window: 24h trailing count per user (beyond
# reference — its windows are all default ROWS frames, SURVEY §2.5).
# Timestamps truncated to seconds on both sides so the frame boundary
# is engine-identical.
# --------------------------------------------------------------------------
@register(
    "x_rolling_window",
    """
    WITH e AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS tsec FROM events
    )
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY tsec
               RANGE BETWEEN INTERVAL '24 hours' PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_trailing_24h
    FROM e
    """,
    doc="RANGE-frame rolling 24h trailing count per user",
)
def x_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    tsec = F.date_trunc("second", F.col("ts")).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(tsec)
        .rangeBetween(-24 * 3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_24h"),
    )


# --------------------------------------------------------------------------
# Exact interpolated percentiles (beyond reference — no percentile
# aggregates there; Spark `percentile` ≡ DuckDB `quantile_cont`).
# --------------------------------------------------------------------------
@register(
    "x_percentile",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="exact interpolated percentiles per group (p50/p90)",
)
def x_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


# --------------------------------------------------------------------------
# Pivot: wide month × event_type matrix (beyond reference — SURVEY
# notes the reference has no pivot; standard OLAP surface).
# --------------------------------------------------------------------------
@register(
    "x_pivot",
    """
    SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
    doc="pivot: day × event_type wide counts (groupBy().pivot())",
)
def x_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for absent cells; counts must be 0.
    for c in ["click", "error", "purchase", "signup", "view"]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)).cast("bigint"))
    return out


# --------------------------------------------------------------------------
# Unpivot/melt: wide metrics → long (quantity/price/discount as rows).
# --------------------------------------------------------------------------
@register(
    "x_unpivot",
    """
    SELECT l_orderkey, l_linenumber, metric, ROUND(val, 4) AS val
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_linenumber = 1
    )
    """,
    doc="unpivot/melt wide metric columns to long rows",
)
def x_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    out = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    mapping = {"l_quantity": "quantity", "l_discount": "discount", "l_tax": "tax"}
    metric = F.col("metric")
    for src, dst in mapping.items():
        metric = F.when(F.col("metric") == src, dst).otherwise(metric)
    return out.select(
        "l_orderkey", "l_linenumber", metric.alias("metric"), F.round("val", 4).alias("val")
    )


# --------------------------------------------------------------------------
# Rollup: subtotals + grand total (beyond reference — no grouping
# sets/cube/rollup exist there; SURVEY §2.4 note).
# --------------------------------------------------------------------------
@register(
    "x_rollup",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
           o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP(1, o_orderpriority)
    """,
    doc="rollup: per-(year,priority) + per-year subtotals + grand total",
)
def x_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").cast("bigint").alias("y"), "o_orderpriority"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# Chunked-harness execution through the correctness gate: the MLHD
# 16-chunk pattern (plans/chunked.py) must be invisible to results —
# oracle is the plain unchunked pair count.
# --------------------------------------------------------------------------
@register(
    "x_chunked_pairs",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
               DATE_DIFF('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
        FROM events
    ),
    sessions AS (
        SELECT user_id, event_type,
               SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT a.event_type AS item_a, b.event_type AS item_b, COUNT(*) AS score
    FROM sessions a
    JOIN sessions b ON a.user_id = b.user_id AND a.session_id = b.session_id
                    AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    doc="chunked execution harness ≡ unchunked (4 hash chunks, parquet barriers)",
)
def x_chunked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.operators.sessionize import (
        session_pairs,
        with_session_ids,
    )
    from listenbrainz_server_spark.plans.chunked import run_chunked

    ev = load_table(spark, sf_dir, "events")

    def per_chunk(df: DataFrame) -> DataFrame:
        sess = with_session_ids(df, "user_id", "ts", 1800, tiebreak=("event_id",))
        return session_pairs(sess, "user_id", "session_id", "event_type")

    return run_chunked(
        spark,
        ev,
        key_col="user_id",
        n_chunks=4,
        per_chunk=per_chunk,
        state_dir=tempfile.mkdtemp(prefix="lbs_chunk_"),
        combine=lambda df: df.groupBy("item_a", "item_b").agg(
            F.sum("score").cast("bigint").alias("score")
        ),
    )


# --------------------------------------------------------------------------
# P10: string-prefix chunk filter (user_id LIKE 'c%' 16-way chunking,
# similarity/recording/mlhd.py:32-35).
# --------------------------------------------------------------------------
@register(
    "p10_prefix_chunk",
    """
    SELECT p_brand, COUNT(*) AS n
    FROM part
    WHERE p_brand LIKE 'Brand#1%'
    GROUP BY p_brand
    """,
    doc="P10 prefix chunk filter (similarity/recording/mlhd.py:32-35)",
)
def p10_prefix_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(F.col("p_brand").startswith("Brand#1"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# CUBE: all grouping-set combinations over (status, priority) —
# completes the grouping-sets family next to x_rollup.
# --------------------------------------------------------------------------
@register(
    "x_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="cube: every grouping-set combination + subtotals + grand total",
)
def x_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# Approximate percentile sketch. Spark's implementation is a KLL-class
# mergeable quantile sketch, DuckDB's approx_quantile a different
# sketch — raw estimates legitimately differ per engine, so the
# registered form is the SELF-AUDITING variant (VERDICT r8 #1): for
# each estimated quantile q it re-joins the estimate against the
# group's rows and asserts the estimate's TRUE rank is within the
# sketch's rank-error contract (accuracy=1000 → relative rank error
# 1e-3; audited at eps=0.01 + 1 row of discreteness slack). The rank
# booleans + exact group counts are hash-stable; an estimator whose
# rank error exceeds the bound flips a boolean and fails the gate.
# --------------------------------------------------------------------------
@register(
    "x_approx_percentile",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50_exact,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_exact,
           ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99_exact,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS p99_rank_ok
    FROM orders GROUP BY o_orderpriority
    """,
    doc="approx_percentile quantile sketch per order priority, "
    "self-auditing form: true-rank-of-estimate within 1% of target "
    "rank, inside the driver hash gate (mergeable sketch); exact "
    "p50/p90/p99 references emitted ROUND(...,6) on both sides — "
    "quantile_cont and F.percentile use algebraically-equal but "
    "floating-point-different interpolation forms that land 1 ulp "
    "apart when the bracketing neighbors are EQUAL (the "
    "x_equidepth_bins r13 find; advisor r13 #1 flagged this query "
    "as the same latent data-dependent flake)",
)
def x_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    est = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 1000).alias("pct"),
    ).select(
        "o_orderpriority",
        F.col("pct").getItem(0).alias("p50"),
        F.col("pct").getItem(1).alias("p90"),
        F.col("pct").getItem(2).alias("p99"),
    )
    # One more group pass computes each estimate's true rank: the
    # estimates frame is |groups|-sized → broadcast; the fact table is
    # scanned once.
    joined = orders.join(F.broadcast(est), "o_orderpriority")
    eps = 0.01

    def rank_ok(est_col: str, q: float):
        n = F.count(F.lit(1)).cast("double")
        cnt_le = F.count_if(F.col("o_totalprice") <= F.col(est_col)).cast("double")
        return F.abs(cnt_le - F.lit(q) * n) <= F.lit(eps) * n + F.lit(1.0)

    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # Exact references for the oracle (VERDICT r10 #4 pattern),
        # ROUND(...,6) symmetrically: in the equal-neighbor case
        # Spark's lo + frac*(hi-lo) returns lo exactly while DuckDB's
        # convex form can land one ulp low (the x_equidepth_bins fix).
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_exact"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99_exact"),
        rank_ok("p50", 0.5).alias("p50_rank_ok"),
        rank_ok("p90", 0.9).alias("p90_rank_ok"),
        rank_ok("p99", 0.99).alias("p99_rank_ok"),
    )


# --------------------------------------------------------------------------
# Arbitrary GROUPING SETS: per-status and per-priority subtotals
# WITHOUT the combined or grand-total sets — the member of the
# grouping-sets family cube/rollup can't express (each computes a
# superset). One scan, one expand — same execution shape as x_cube.
# --------------------------------------------------------------------------
@register(
    "x_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="grouping sets: per-status + per-priority subtotals only "
    "(the non-cube/rollup member of the family)",
)
def x_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# Retention-policy sweep — the data-governance what-if: for each
# candidate retention window (7/14/30/60/90 days back from the data
# horizon), how many events, active users, and how much event value
# would survive deletion of everything older. One scan, the cutoff
# dim exploded against per-day partial aggregates (a |days|-sized
# reduction), so the sweep never rescans raw events per cutoff —
# the d_threshold_sweep pattern applied to retention.
# --------------------------------------------------------------------------
@register(
    "x_retention_sweep",
    """
    WITH h AS (SELECT MAX(ts) AS horizon FROM events),
    daily AS (
        SELECT CAST(FLOOR(EPOCH(h.horizon - ts) / 86400) AS BIGINT) AS age_d,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS v
        FROM events, h GROUP BY 1
    ),
    users AS (
        SELECT user_id,
               CAST(FLOOR(EPOCH(h.horizon - last_ts) / 86400) AS BIGINT)
                   AS min_age_d
        FROM (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id),
             h
    ),
    cut AS (SELECT UNNEST([7, 14, 30, 60, 90]) AS keep_days)
    SELECT keep_days,
           (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM daily
            WHERE age_d < keep_days) AS n_events,
           (SELECT COUNT(*) FROM users
            WHERE min_age_d < keep_days) AS n_users,
           (SELECT ROUND(COALESCE(SUM(v), 0), 2) FROM daily
            WHERE age_d < keep_days) AS total_value
    FROM cut
    """,
    doc="retention-policy what-if sweep: events/users/value surviving "
    "each candidate keep-window, from day-level partials (one scan, "
    "never per-cutoff rescans)",
)
def x_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("horizon"))
    age_d = F.floor(
        (F.col("horizon").cast("double") - F.col("ts").cast("double")) / 86400
    ).cast("bigint")
    daily = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy(age_d.alias("age_d"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    users = (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.floor(
                (F.col("horizon").cast("double") - F.col("last_ts").cast("double"))
                / 86400
            )
            .cast("bigint")
            .alias("min_age_d"),
        )
    )
    cuts = ev.sparkSession.createDataFrame(
        [(c,) for c in (7, 14, 30, 60, 90)], "keep_days int"
    )
    ev_counts = (
        cuts.join(F.broadcast(daily), daily["age_d"] < cuts["keep_days"], "left")
        .groupBy("keep_days")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.round(F.coalesce(F.sum("v"), F.lit(0)), 2).alias("total_value"),
        )
    )
    user_counts = (
        cuts.join(
            F.broadcast(users), users["min_age_d"] < cuts["keep_days"], "left"
        )
        .groupBy("keep_days")
        .agg(F.count("user_id").alias("n_users"))
    )
    return (
        ev_counts.join(user_counts, "keep_days")
        .select("keep_days", "n_events", "n_users", "total_value")
    )


# --------------------------------------------------------------------------
# RFM segmentation — the classic recency/frequency/monetary customer
# cut: per purchasing user, days since last purchase (vs the corpus
# horizon), purchase count, and total spend, each quintiled by NTILE
# over a deterministic total order (metric + user_id tiebreak, so both
# engines split identical row sequences). Segment = "R F M" digit
# string. One user-keyed reduction, three window passes over the
# |users|-sized frame, horizon broadcast. Scale note: global NTILE
# needs a total order of the USER-LEVEL reduction (3-4 orders smaller
# than events); past the point that outgrows one task's sort budget,
# swap for the histogram-CDF boundary bucketing t_quality_calibrated_
# hist demonstrates — value-quantile semantics instead of exact
# equal-count NTILE, same report contract.
# --------------------------------------------------------------------------
@register(
    "a_rfm_segments",
    """
    WITH p AS (
        SELECT user_id,
               MAX(ts) AS last_ts,
               COUNT(*) AS freq,
               ROUND(SUM(value), 2) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    h AS (SELECT MAX(ts) AS horizon FROM events),
    base AS (
        SELECT user_id,
               CAST(FLOOR(EPOCH(h.horizon - last_ts) / 86400) AS BIGINT)
                   AS recency_days,
               freq, monetary
        FROM p, h
    )
    SELECT user_id, recency_days, freq, monetary,
           CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
               AS segment
    FROM (
        SELECT user_id, recency_days, freq, monetary,
               NTILE(5) OVER (ORDER BY recency_days ASC, user_id) AS r,
               NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f,
               NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m
        FROM base)
    """,
    doc="RFM segmentation: per-user recency/frequency/monetary "
    "quintiles (deterministic NTILE order) + composite segment code",
)
def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    horizon = ev.agg(F.max("ts").alias("horizon"))
    base = p.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.floor(
            (F.col("horizon").cast("double") - F.col("last_ts").cast("double"))
            / 86400
        )
        .cast("bigint")
        .alias("recency_days"),
        "freq",
        "monetary",
    )
    r = F.ntile(5).over(Window.orderBy(F.col("recency_days").asc(), "user_id"))
    f = F.ntile(5).over(Window.orderBy(F.col("freq").desc(), "user_id"))
    m = F.ntile(5).over(Window.orderBy(F.col("monetary").desc(), "user_id"))
    return base.select(
        "user_id",
        "recency_days",
        "freq",
        "monetary",
        r.cast("bigint").alias("r"),
        f.cast("bigint").alias("f"),
        m.cast("bigint").alias("m"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ),
    )


# --------------------------------------------------------------------------
# Token-budget Pareto curve — the mix-governance decision chart: rank
# documents by the quality heuristic (best first, doc_id tiebreak),
# bucket into 5% tranches, and report each tranche's token mass and
# the cumulative token share — i.e. "spending X% of the token budget
# on the best docs buys this much of the corpus' quality mass". The
# global order runs over the doc-level reduction (id, quality,
# tokens), never raw text.
# --------------------------------------------------------------------------
from listenbrainz_server_spark.queries.text import _QUALITY_EXPR


@register(
    "x_token_budget_pareto",
    f"""
    WITH toks AS (
        SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
    ),
    d AS (
        SELECT doc_id,
               len(t) AS tokens,
               {_QUALITY_EXPR} AS q
        FROM toks
    ),
    ranked AS (
        SELECT doc_id, tokens, q,
               NTILE(20) OVER (ORDER BY q DESC, doc_id) AS tranche
        FROM d
    ),
    per AS (
        SELECT tranche, COUNT(*) AS n_docs,
               CAST(SUM(tokens) AS BIGINT) AS tranche_tokens,
               ROUND(AVG(q), 6) AS avg_quality
        FROM ranked GROUP BY tranche
    ),
    tot AS (SELECT SUM(tranche_tokens) AS all_tokens FROM per)
    SELECT CAST(tranche AS BIGINT) AS tranche, n_docs, tranche_tokens,
           avg_quality,
           ROUND(SUM(tranche_tokens) OVER (ORDER BY tranche
                     ROWS UNBOUNDED PRECEDING) * 1.0 / all_tokens, 6)
               AS cum_token_share
    FROM per, tot
    """,
    doc="token-budget Pareto curve: 5% quality tranches with token "
    "mass and cumulative token share (global order over the doc-level "
    "reduction)",
)
def x_token_budget_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from listenbrainz_server_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tokens"),
        quality_score(F.col("text")).alias("q"),
    )
    ranked = d.withColumn(
        "tranche", F.ntile(20).over(Window.orderBy(F.col("q").desc(), "doc_id"))
    )
    per = ranked.groupBy("tranche").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("tranche_tokens"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
    )
    tot = per.agg(F.sum("tranche_tokens").alias("all_tokens"))
    cum = Window.orderBy("tranche").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("tranche").cast("bigint").alias("tranche"),
            "n_docs",
            "tranche_tokens",
            "avg_quality",
            F.round(
                F.sum("tranche_tokens").over(cum) * 1.0 / F.col("all_tokens"), 6
            ).alias("cum_token_share"),
        )
    )


# --------------------------------------------------------------------------
# Seeded-Laplace noisy release counts — the governance tier's
# noisy-aggregate release shape: per-source document counts with
# Laplace(1/eps) noise from a hash-derived uniform seeded by
# md5(release_seed || ':' || source). The noise is a pure function of
# (release_seed, source): re-running the release pipeline can't leak
# via fresh draws (the whole release is ONE mechanism draw), and
# adding a source never perturbs another source's noise.
#
# PRIVACY CAVEAT (this is the honest contract, not fine print): the
# mechanism is differentially private ONLY if release_seed is secret
# and never published — anyone who knows the seed recomputes the
# noise exactly and recovers the true count from n_noisy. The
# registered query runs with the DEFAULT seed below, which is in this
# public repo, so the registered form is a deterministic,
# oracle-checkable NOISE-SHAPE DEMO of the release pipeline, not a DP
# release. A real release passes a secret out-of-band seed.
# u = (first-8-hex of md5 + 0.5) / 2^32 in (0,1); noise via the
# inverse-CDF transform −(1/eps)·sign(u−½)·ln(1−2|u−½|). Everything
# is exact-deterministic except one ln() — both engines call libm on
# identical doubles, and the 4-dp rounding absorbs ulp skew.
# --------------------------------------------------------------------------
DP_DEMO_SEED = "dp"  # public demo seed — see privacy caveat above
# The oracle interpolates DP_DEMO_SEED (advisor r7): the Spark side
# derives its default noise from the same constant, so editing the
# seed cannot silently desync the two engines.
@register(
    "x_dp_counts",
    f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    seeded AS (
        SELECT source, n,
               (('0x' || substr(md5('{DP_DEMO_SEED}:' || source), 1, 8))::BIGINT + 0.5)
                   / 4294967296.0 AS u
        FROM counts
    )
    SELECT source, 1.0 AS epsilon,
           ROUND(n - (1.0 / 1.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)),
                 4) AS n_noisy
    FROM seeded
    """,
    doc="seeded-Laplace noisy release counts: Laplace(1/eps) noise "
    "from an md5(release_seed:source)-derived uniform (inverse-CDF "
    "transform, eps=1). DP only under a SECRET seed; the registered "
    "default seed is public, making this the reproducible "
    "noise-shape demo of the release pipeline",
)
def x_dp_counts(
    spark: SparkSession, sf_dir: str, release_seed: str = DP_DEMO_SEED
) -> DataFrame:
    eps = 1.0
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(release_seed + ":"), F.col("source"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 0.5
    ) / F.lit(4294967296.0)
    noise = (
        -(1.0 / eps)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return counts.select(
        "source",
        F.lit(eps).alias("epsilon"),
        F.round(F.col("n") + noise, 4).alias("n_noisy"),
    )


# --------------------------------------------------------------------------
# Stratified exact-quota sampling — the split builder x_hash_sample's
# Bernoulli gate can't give you: EXACTLY ceil(10%) of each source
# (per-stratum quotas for eval sets, annotation batches, per-domain
# audits). Deterministic: rows rank by md5(doc_id:strat) within their
# stratum and the first ceil(n×rate) survive — stable across runs,
# partitionings, and engines; adding documents to one source never
# changes another source's sample.
# --------------------------------------------------------------------------
@register(
    "x_stratified_sample",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id
               ) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source FROM ranked
    WHERE rk <= (n + 9) // 10
    """,
    doc="stratified exact-quota sample: deterministic md5-ranked "
    "top-ceil(10%) per source (per-stratum quotas, run- and "
    "partitioning-stable)",
)
def x_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))),
        "doc_id",
    )
    wc = Window.partitionBy("source")
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        # Integer arithmetic: (n + 9) div 10 == ceil(n/10) exactly for
        # all n — CEIL(n * 0.1) in doubles overshoots by one for some n
        # (e.g. 30 * 0.1 = 3.0000000000000004).
        .where(F.col("rk") <= F.expr("(n + 9) div 10"))
        .select("doc_id", "source")
    )


# --------------------------------------------------------------------------
# Growth accounting — the weekly user-lifecycle state machine every
# product dashboard runs (the "growth accounting" decomposition:
# DAU/WAU change = new + resurrected − churned): each user-week is
# labeled new (first activity ever), retained (active this week and
# last), resurrected (active, dormant ≥1 week before), or churned
# (inactive this week, active last week — attributed to the FIRST
# inactive week, clamped to the data horizon). One distinct
# (user, week) reduction, one per-user lag/lead window, map-side
# week/state count — no joins, user-keyed exchanges only.
# --------------------------------------------------------------------------
@register(
    "w_user_lifecycle",
    """
    WITH active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ),
    horizon AS (SELECT MAX(w) AS maxw FROM active),
    labeled AS (
        SELECT user_id, w,
               CASE WHEN LAG(w) OVER u IS NULL THEN 'new'
                    WHEN LAG(w) OVER u = w - INTERVAL 7 DAY THEN 'retained'
                    ELSE 'resurrected' END AS state,
               LEAD(w) OVER u AS next_w
        FROM active
        WINDOW u AS (PARTITION BY user_id ORDER BY w)
    ),
    churned AS (
        SELECT user_id, w + INTERVAL 7 DAY AS w, 'churned' AS state
        FROM labeled, horizon
        WHERE (next_w IS NULL OR next_w > w + INTERVAL 7 DAY)
          AND w + INTERVAL 7 DAY <= maxw
    )
    SELECT CAST(w AS DATE) AS week_start, state,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT user_id, w, state FROM labeled
          UNION ALL SELECT user_id, w, state FROM churned)
    GROUP BY 1, 2
    """,
    doc="weekly growth accounting: per-week new / retained / "
    "resurrected / churned user counts (lag-lead lifecycle state "
    "machine over the distinct user-week reduction)",
)
def w_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_lifecycle_states(load_table(spark, sf_dir, "events"))


def user_lifecycle_states(ev: DataFrame) -> DataFrame:
    """The lifecycle state machine over any (user_id, ts) frame —
    split out so the per-state transitions (incl. horizon-clamped
    churn) are pinned on a crafted fixture in tests."""
    from pyspark.sql import Window

    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    u = Window.partitionBy("user_id").orderBy("w")
    prev_w = F.lag("w").over(u)
    labeled = active.select(
        "user_id",
        "w",
        F.when(prev_w.isNull(), "new")
        .when(prev_w == F.col("w") - F.expr("INTERVAL 7 DAYS"), "retained")
        .otherwise("resurrected")
        .alias("state"),
        F.lead("w").over(u).alias("next_w"),
    )
    horizon = active.agg(F.max("w").alias("maxw"))
    week_after = F.col("w") + F.expr("INTERVAL 7 DAYS")
    churned = (
        labeled.crossJoin(F.broadcast(horizon))
        .where(
            (F.col("next_w").isNull() | (F.col("next_w") > week_after))
            & (week_after <= F.col("maxw"))
        )
        .select("user_id", week_after.alias("w"), F.lit("churned").alias("state"))
    )
    return (
        labeled.select("user_id", "w", "state")
        .unionByName(churned)
        .groupBy(F.col("w").cast("date").alias("week_start"), "state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Quality-calibrated training mix (VERDICT r5 #8) — closes the
# mix-governance loop: instead of externally-supplied domain weights
# (x_interleave_domains), each source's sampling weight is DERIVED
# from its measured quality — weight = 0.5 + 1.5 × (fraction of the
# source's docs passing the d_clean_corpus admission gate), so clean
# sources are upsampled toward 2× and junk sources decay toward 0.5×.
# The expansion is the same deterministic integer-copies +
# md5-gated-fractional-copy machinery, except the fractional
# threshold is COMPUTED from the weight (lowercase fixed-width hex of
# floor(frac × 2^32) — string compare == numeric compare, identical
# in both engines; FLOOR before CAST because DuckDB CAST rounds).
# Plan: one word-keyed agg for the gate, a tiny broadcast of
# |sources| weights, then map-only expansion — no global sort.
# --------------------------------------------------------------------------
@register(
    "x_quality_weighted_mix",
    """
    WITH uni AS (
        SELECT doc_id, source, w, COUNT(*) AS n
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2, 3
    ),
    flags AS (
        SELECT doc_id, source,
               CASE WHEN SUM(n) >= 20 AND MAX(n) * 1.0 / SUM(n) <= 0.25
                    THEN 1 ELSE 0 END AS ok
        FROM uni GROUP BY doc_id, source
    ),
    rates AS (
        SELECT source,
               ROUND(0.5 + 1.5 * ROUND(AVG(ok), 4), 4) AS weight
        FROM flags GROUP BY source
    ),
    plan AS (
        SELECT f.doc_id, f.source, r.weight,
               CAST(FLOOR(r.weight) AS INT) AS n_full,
               LPAD(LOWER(to_hex(CAST(FLOOR(
                   (r.weight - FLOOR(r.weight)) * 4294967296) AS BIGINT))),
                   8, '0') AS thr
        FROM flags f JOIN rates r USING (source)
    ),
    cop AS (
        SELECT doc_id, source, weight,
               n_full + CASE WHEN substr(
                   md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) < thr
                   THEN 1 ELSE 0 END AS copies
        FROM plan
    )
    SELECT doc_id, source, weight, CAST(copy AS BIGINT) AS copy,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR))
               AS interleave_key
    FROM (SELECT doc_id, source, weight, UNNEST(range(1, copies + 1)) AS copy
          FROM cop)
    """,
    doc="quality-calibrated training mix: per-source weight derived "
    "from the measured quality-gate pass rate (0.5x..2x), expanded "
    "via deterministic integer + md5-gated fractional copies with "
    "computed hex thresholds",
)
def x_quality_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.functions.text import quality_flag

    docs = load_table(spark, sf_dir, "documents")
    flags = docs.select(
        "doc_id", "source", quality_flag(F.col("text")).cast("int").alias("ok")
    )
    rates = flags.groupBy("source").agg(
        F.round(0.5 + 1.5 * F.round(F.avg("ok"), 4), 4).alias("weight")
    )
    frac = F.col("weight") - F.floor(F.col("weight"))
    sized = rates.select(
        "source",
        "weight",
        F.floor(F.col("weight")).cast("int").alias("n_full"),
        F.lpad(
            F.lower(F.hex(F.floor(frac * F.lit(4294967296)).cast("bigint"))),
            8,
            "0",
        ).alias("thr"),
    )
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 8
    )
    pland = flags.join(F.broadcast(sized), "source").select(
        "doc_id",
        "source",
        "weight",
        (F.col("n_full") + (h < F.col("thr")).cast("int")).alias("copies"),
    )
    expanded = pland.select(
        "doc_id",
        "source",
        "weight",
        F.explode(
            F.when(
                F.col("copies") >= 1, F.sequence(F.lit(1), F.col("copies"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("copy"),
    )
    return expanded.select(
        "doc_id",
        "source",
        "weight",
        F.col("copy").cast("bigint").alias("copy"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("copy").cast("string"),
            )
        ).alias("interleave_key"),
    )


# --------------------------------------------------------------------------
# Deterministic domain-weighted interleaving — epoch construction for a
# training mix: each source gets a sampling weight (upsample > 1 means
# integer repeat copies plus a hash-gated fractional copy; downsample
# < 1 keeps a hash-selected subset), and every emitted copy carries an
# md5 interleave key that consumers range-partition on to get a stable
# global shuffle order WITHOUT a single global sort. Map-only: no
# joins, no aggregation, no driver state; the fractional gate compares
# a fixed-width md5 prefix against a per-weight hex threshold (string
# compare of lowercase hex == numeric compare), so the decision is
# reproducible across engines and partitionings — same contract as
# x_hash_sample.
#
# Weights here derive from the source index (src<k>): k%4==0 -> 0.25x,
# 1 -> 1.0x, 2 -> 1.75x, 3 -> 2.5x — exercising drop, identity,
# integer+fraction, and multi-copy paths in one query.
# --------------------------------------------------------------------------
@register(
    "x_interleave_domains",
    r"""
    WITH base AS (
        SELECT doc_id, source,
               CASE WHEN regexp_extract(source, '(\d+)', 1) = '' THEN 1
                    ELSE CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 4
               END AS m,
               substr(md5(CAST(doc_id AS VARCHAR) || ':keep'), 1, 8) AS h
        FROM documents
    ),
    sized AS (
        SELECT doc_id, source,
               (CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 2 END)
               + (CASE WHEN h < (CASE m WHEN 0 THEN '40000000'
                                        WHEN 1 THEN '00000000'
                                        WHEN 2 THEN 'c0000000'
                                        ELSE '80000000' END)
                       THEN 1 ELSE 0 END) AS copies
        FROM base
    ),
    expanded AS (
        SELECT doc_id, source, UNNEST(range(1, copies + 1)) AS copy
        FROM sized
    )
    SELECT doc_id, source, copy,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR))
               AS interleave_key
    FROM expanded
    """,
    doc="deterministic domain-weighted interleaving: per-source "
    "up/downsampling via integer copies + md5-gated fractional copy, "
    "md5 interleave key for sort-free global epoch order",
)
def x_interleave_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # A source without digits gets weight-class 1 (identity, 1.0x)
    # instead of an ANSI CAST_INVALID_INPUT crash on ''::int.
    digits = F.regexp_extract("source", r"(\d+)", 1)
    m = F.when(digits == "", F.lit(1)).otherwise(digits.cast("int") % 4)
    n_full = (
        F.when(m == 0, 0).when(m == 1, 1).when(m == 2, 1).otherwise(2)
    )
    thr = (
        F.when(m == 0, "40000000")
        .when(m == 1, "00000000")
        .when(m == 2, "c0000000")
        .otherwise("80000000")
    )
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":keep"))), 1, 8
    )
    copies = n_full + (h < thr).cast("int")
    expanded = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("copy"),
    )
    return expanded.select(
        "doc_id",
        "source",
        F.col("copy").cast("bigint").alias("copy"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("copy").cast("string"),
            )
        ).alias("interleave_key"),
    )


# --------------------------------------------------------------------------
# Retention cohorts — the classic product-analytics matrix the
# reference's listening stats stop short of: users grouped by their
# first-activity day (cohort), counted as retained on each later
# offset day they were active. Plan: per-user first-day agg (keyed),
# join back on user (keyed), distinct (cohort, offset, user) then the
# matrix agg — every exchange user- or cohort-keyed, no window over
# the corpus.
# --------------------------------------------------------------------------
@register(
    "a_retention_cohorts",
    """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
        GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act
    WHERE day_offset <= 14
    GROUP BY 1, 2
    """,
    doc="retention cohorts: users by first-activity day x active "
    "day-offset (0-14), the product-analytics retention matrix",
)
def a_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        act.where(F.col("day_offset") <= 14)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --------------------------------------------------------------------------
# Epoch manifest — the composed training-order artifact a loader
# actually streams: the domain-weighted copies of x_interleave_domains
# joined with the curriculum phase of x_curriculum_order, each row
# carrying (phase, interleave_key) — range-partition on that pair and
# you have curriculum-staged, domain-mixed, deterministically
# shuffled epochs with no global sort anywhere. Demonstrates that the
# pipeline's artifacts compose: both inputs are the registered
# queries' exact computations.
# --------------------------------------------------------------------------
def _epoch_manifest_sql() -> str:
    from listenbrainz_server_spark.queries.text import _QUALITY_EXPR

    return f"""
    WITH toks AS (
        SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents
    ),
    q AS (
        SELECT doc_id, {_QUALITY_EXPR} AS quality FROM toks
    ),
    binned AS (
        SELECT doc_id,
               CAST(LEAST(69, GREATEST(0,
                    FLOOR((quality + 1.0) / 0.05))) AS INT) AS bin
        FROM q
    ),
    bc AS (SELECT bin, COUNT(*) AS n FROM binned GROUP BY 1),
    cum AS (
        SELECT bin,
               COALESCE(SUM(n) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below,
               SUM(n) OVER () AS tot
        FROM bc
    ),
    phases AS (
        SELECT b.doc_id,
               CAST(3 - LEAST(3, FLOOR((c.below * 1.0 / c.tot) * 4)) AS INT)
                   AS phase
        FROM binned b JOIN cum c USING (bin)
    ),
    base AS (
        SELECT doc_id, source,
               CASE WHEN regexp_extract(source, '(\\d+)', 1) = '' THEN 1
                    ELSE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4
               END AS m,
               substr(md5(CAST(doc_id AS VARCHAR) || ':keep'), 1, 8) AS h
        FROM documents
    ),
    sized AS (
        SELECT doc_id, source,
               (CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 2 END)
               + (CASE WHEN h < (CASE m WHEN 0 THEN '40000000'
                                        WHEN 1 THEN '00000000'
                                        WHEN 2 THEN 'c0000000'
                                        ELSE '80000000' END)
                       THEN 1 ELSE 0 END) AS copies
        FROM base
    ),
    expanded AS (
        SELECT doc_id, source, UNNEST(range(1, copies + 1)) AS copy
        FROM sized
    )
    SELECT e.doc_id, e.source, e.copy, p.phase,
           md5(CAST(e.doc_id AS VARCHAR) || ':' || CAST(e.copy AS VARCHAR))
               AS interleave_key
    FROM expanded e JOIN phases p USING (doc_id)
    """


@register(
    "x_epoch_manifest",
    _epoch_manifest_sql(),
    doc="composed epoch manifest: domain-weighted interleave copies x "
    "curriculum phase, keyed for sort-free curriculum-staged epochs",
)
def x_epoch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.queries import load_all

    reg = load_all()
    copies = reg["x_interleave_domains"].fn(spark, sf_dir)
    phases = reg["x_curriculum_order"].fn(spark, sf_dir).select("doc_id", "phase")
    return copies.join(phases, "doc_id").select(
        "doc_id", "source", "copy", "phase", "interleave_key"
    )


# --------------------------------------------------------------------------
# Ordered conversion funnel — signup → view → click → purchase, each
# stage's first occurrence required AFTER the previous stage's: the
# sequential-event analysis sessionized products ask for. Computed as
# four conditional min-timestamp aggregates per user (one keyed agg,
# no self-joins, no window): first_view = min ts of a view AFTER
# first_signup, etc. — the stage chain folds into nested conditional
# aggregates instead of a 4-way join, which is the plan you want at
# scale (a join-chain formulation shuffles the events table four
# times; this shuffles once).
# --------------------------------------------------------------------------
@register(
    "a_conversion_funnel",
    """
    WITH stage1 AS (
        SELECT user_id, MIN(ts) FILTER (event_type = 'signup') AS t_signup
        FROM events GROUP BY user_id
    ),
    stage2 AS (
        SELECT e.user_id, s.t_signup,
               MIN(e.ts) FILTER (e.event_type = 'view' AND e.ts > s.t_signup)
                   AS t_view
        FROM events e JOIN stage1 s USING (user_id)
        GROUP BY e.user_id, s.t_signup
    ),
    stage3 AS (
        SELECT e.user_id, s.t_signup, s.t_view,
               MIN(e.ts) FILTER (e.event_type = 'click' AND e.ts > s.t_view)
                   AS t_click
        FROM events e JOIN stage2 s USING (user_id)
        GROUP BY e.user_id, s.t_signup, s.t_view
    ),
    stage4 AS (
        SELECT e.user_id, s.t_signup, s.t_view, s.t_click,
               MIN(e.ts) FILTER (e.event_type = 'purchase' AND e.ts > s.t_click)
                   AS t_purchase
        FROM events e JOIN stage3 s USING (user_id)
        GROUP BY e.user_id, s.t_signup, s.t_view, s.t_click
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_signup) AS BIGINT) AS reached_signup,
           CAST(COUNT(t_view) AS BIGINT) AS reached_view,
           CAST(COUNT(t_click) AS BIGINT) AS reached_click,
           CAST(COUNT(t_purchase) AS BIGINT) AS reached_purchase
    FROM stage4
    """,
    doc="ordered conversion funnel signup->view->click->purchase: "
    "stage-chained conditional min-ts aggregates, corpus shuffled "
    "per stage on user_id only",
)
def a_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(df, etype, prev_col, out_col):
        cond = (F.col("event_type") == etype) & (
            F.col("ts") > F.col(prev_col) if prev_col else F.lit(True)
        )
        keys = [c for c in df.columns if c.startswith("t_")] if prev_col else []
        joined = ev.join(df, "user_id") if prev_col else ev
        return joined.groupBy("user_id", *keys).agg(
            F.min(F.when(cond, F.col("ts"))).alias(out_col)
        )

    s1 = first_after(None, "signup", None, "t_signup")
    s2 = first_after(s1, "view", "t_signup", "t_view")
    s3 = first_after(s2, "click", "t_view", "t_click")
    s4 = first_after(s3, "purchase", "t_click", "t_purchase")
    return s4.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("reached_signup"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_purchase").alias("reached_purchase"),
    )


# --------------------------------------------------------------------------
# Daily anomaly detection — ops monitoring over the event stream:
# per-type daily counts, per-type mean/std (rounded on both engines
# before the z-score so float summation order can't flip a verdict),
# and a z > 2 spike flag. Corpus reduces to type x day rows before
# any statistics — one keyed agg plus a type-keyed broadcast join.
# --------------------------------------------------------------------------
@register(
    "a_daily_anomalies",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    mom AS (
        SELECT event_type, ROUND(AVG(n), 6) AS mu,
               ROUND(STDDEV_POP(n), 6) AS sigma
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n,
           ROUND((d.n - m.mu) / NULLIF(m.sigma, 0), 4) AS z,
           ((d.n - m.mu) / NULLIF(m.sigma, 0) > 2.0) AS spike
    FROM daily d JOIN mom m USING (event_type)
    """,
    doc="daily anomaly detection: per-type daily counts with z-score "
    "spike flags (type-keyed stats, corpus reduced before any math)",
)
def a_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    mom = daily.groupBy("event_type").agg(
        F.round(F.avg("n"), 6).alias("mu"),
        F.round(F.stddev_pop("n"), 6).alias("sigma"),
    )
    # sigma = 0 (constant daily counts / single active day) must yield
    # NULL, not an ANSI DIVIDE_BY_ZERO crash — mirrored by the oracle's
    # NULLIF.
    z = F.when(F.col("sigma") != 0, (F.col("n") - F.col("mu")) / F.col("sigma"))
    return daily.join(F.broadcast(mom), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        F.round(z, 4).alias("z"),
        (z > 2.0).alias("spike"),
    )


# --------------------------------------------------------------------------
# A/B experiment report — deterministic hash assignment (same
# md5-prefix coordinate as x_hash_sample, so arms are reproducible
# across engines and reshuffles), per-arm conversion (>= 15 purchase
# events — raw has-purchased is degenerate on this fixture: every
# user purchases at least once, making the pooled variance zero), and
# the pooled two-proportion z statistic, NULL when the pooled
# variance degenerates. One pass over events, two tiny aggregates, a
# 1-row output.
# --------------------------------------------------------------------------
@register(
    "x_ab_test_report",
    """
    WITH assigned AS (
        SELECT user_id,
               substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 8) < '80000000'
                   AS arm_a,
               COUNT(*) FILTER (event_type = 'purchase') >= 15 AS converted
        FROM events
        GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(COUNT(*) FILTER (arm_a) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (arm_a AND converted) AS BIGINT) AS conv_a,
               CAST(COUNT(*) FILTER (NOT arm_a) AS BIGINT) AS n_b,
               CAST(COUNT(*) FILTER (NOT arm_a AND converted) AS BIGINT) AS conv_b
        FROM assigned
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(conv_a * 1.0 / NULLIF(n_a, 0), 6) AS rate_a,
           ROUND(conv_b * 1.0 / NULLIF(n_b, 0), 6) AS rate_b,
           ROUND((conv_a * 1.0 / NULLIF(n_a, 0) - conv_b * 1.0 / NULLIF(n_b, 0))
                 / NULLIF(sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / NULLIF(n_a, 0) + 1.0 / NULLIF(n_b, 0))), 0), 4)
               AS z
    FROM arms
    """,
    doc="A/B experiment report: md5-deterministic arm assignment, "
    "per-arm purchase conversion, pooled two-proportion z statistic",
)
def x_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("bigint")) >= 15
        ).alias("converted")
    ).withColumn(
        "arm_a",
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))), 1, 8
        )
        < "80000000",
    )
    arms = assigned.agg(
        F.sum(F.col("arm_a").cast("bigint")).alias("n_a"),
        F.sum((F.col("arm_a") & F.col("converted")).cast("bigint")).alias("conv_a"),
        F.sum((~F.col("arm_a")).cast("bigint")).alias("n_b"),
        F.sum((~F.col("arm_a") & F.col("converted")).cast("bigint")).alias("conv_b"),
    )
    # An empty arm (every user hashing to one side on a tiny
    # population) must yield NULL rates/z, not an ANSI crash — every
    # division is guarded like the oracle's NULLIFs.
    def safe_div(num, den):
        return F.when(den != 0, num / den)

    p_a = safe_div(F.col("conv_a") * 1.0, F.col("n_a"))
    p_b = safe_div(F.col("conv_b") * 1.0, F.col("n_b"))
    pooled = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    denom = F.sqrt(
        pooled * (1.0 - pooled)
        * (safe_div(F.lit(1.0), F.col("n_a")) + safe_div(F.lit(1.0), F.col("n_b")))
    )
    z = F.when(denom != 0, (p_a - p_b) / denom)
    return arms.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
    )


# --------------------------------------------------------------------------
# PII masking / pseudonymization — the governance pass every
# training-data pipeline runs before a corpus leaves the trust
# boundary. Three standard transforms, all deterministic so the
# masked dataset is reproducible and joinable across runs:
#   - pseudonymize the key: salted md5 (stable pseudonym, not
#     reversible from the output alone);
#   - mask the quasi-identifier name: every digit except the last
#     three becomes '*' (format-preserving, last-3 kept for support
#     workflows — the PAN-masking convention);
#   - generalize the numeric attribute: account balance coarsened to
#     $500 buckets (k-anonymity-style generalization).
# Map-only projection: zero shuffles, zero UDFs — at 100 TB this is
# a pure scan-rewrite that parallelizes perfectly.
# --------------------------------------------------------------------------
@register(
    "x_pii_mask",
    """
    SELECT md5('pii-salt-1' || CAST(c_custkey AS VARCHAR)) AS pseudo_id,
           CONCAT(
               regexp_replace(SUBSTR(c_name, 1, LENGTH(c_name) - 3),
                              '[0-9]', '*', 'g'),
               SUBSTR(c_name, LENGTH(c_name) - 2, 3)
           ) AS name_masked,
           CAST(FLOOR(c_acctbal / 500) * 500 AS BIGINT) AS acctbal_bucket,
           c_mktsegment
    FROM customer
    """,
    doc="PII masking: salted pseudonym key, last-3-visible digit mask, "
    "k-anonymity balance generalization (map-only, zero shuffle)",
)
def x_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    head = F.substring(name, 1, F.length(name) - 3)
    tail = F.substring(name, -3, 3)
    return cust.select(
        F.md5(F.concat(F.lit("pii-salt-1"), F.col("c_custkey").cast("string"))).alias(
            "pseudo_id"
        ),
        F.concat(F.regexp_replace(head, "[0-9]", "*"), tail).alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 500) * 500).cast("bigint").alias(
            "acctbal_bucket"
        ),
        "c_mktsegment",
    )


# --------------------------------------------------------------------------
# Longest activity streak per user — gaps-and-islands at hour
# granularity (the YIM "streak" stat family; ref
# year_in_music/top_stats.py computes the per-user superlative shape).
# Island id = hour_number - row_number: constant within a consecutive
# run, so one window + one groupBy finds every streak; a second
# window picks each user's best (longest, earliest-start tie-break).
# Both windows are keyed by user_id — no global sort, no skew beyond
# a single user's history (bounded).
# --------------------------------------------------------------------------
@register(
    "a_listening_streaks",
    """
    WITH hours AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
    ),
    isl AS (
        SELECT user_id, h,
               CAST(epoch(h) AS BIGINT) // 3600
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h) AS grp
        FROM hours
    ),
    streaks AS (
        SELECT user_id, MIN(h) AS best_streak_start, COUNT(*) AS len
        FROM isl GROUP BY user_id, grp
    ),
    ranked AS (
        SELECT user_id, best_streak_start, len,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, best_streak_start ASC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_streaks
        FROM streaks
    )
    SELECT user_id,
           CAST(len AS BIGINT) AS best_streak_hours,
           best_streak_start,
           CAST(n_streaks AS BIGINT) AS n_streaks
    FROM ranked WHERE rn = 1
    """,
    doc="longest consecutive-active-hour streak per user "
    "(gaps-and-islands: hour_number - row_number island id)",
)
def a_listening_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hours = ev.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("h")
    isl = hours.withColumn(
        "grp",
        (F.unix_timestamp("h") / 3600).cast("bigint") - F.row_number().over(w),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.min("h").alias("best_streak_start"),
        F.count(F.lit(1)).alias("len"),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("best_streak_start").asc()
    )
    w_cnt = Window.partitionBy("user_id")
    return (
        streaks.withColumn("rn", F.row_number().over(w_best))
        .withColumn("n_streaks", F.count(F.lit(1)).over(w_cnt))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("best_streak_hours"),
            "best_streak_start",
            F.col("n_streaks").cast("bigint").alias("n_streaks"),
        )
    )


# --------------------------------------------------------------------------
# Per-source token-budget admission (the rate-limit half of the ingest
# gate family, next to st_quality_gate's quality half): each source
# may contribute at most BUDGET tokens to the corpus; docs are
# admitted in deterministic arrival order (doc_id) until the source's
# running token total crosses the cap. One source-keyed cumulative
# window. Scale note: the window sorts each source's docs in one
# task — for a mega-source beyond a task's sort budget the same
# contract is served by the two-pass histogram-CDF trick
# (t_quality_calibrated_hist): bucket doc_ids, cumsum the per-bucket
# token totals, broadcast the bucket offsets back.
# --------------------------------------------------------------------------
@register(
    "x_source_token_budget",
    """
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           (cum_tokens <= 2000) AS admitted
    FROM cum
    """,
    doc="per-source token-budget cap: arrival-ordered cumulative "
    "admission so no source exceeds its corpus contribution quota",
)
def x_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    return d.withColumn("cum_tokens", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("cum_tokens").cast("bigint"),
        (F.col("cum_tokens") <= 2000).alias("admitted"),
    )


# --------------------------------------------------------------------------
# Event-type transition matrix — first-order Markov transitions over
# each user's event stream (the w_session_paths family reduced to its
# stochastic matrix: input for next-event prediction baselines and
# funnel-shape drift monitors). One lead() window keyed by user, then
# a tiny (type, type) aggregate; probabilities normalize per source
# row. The window is per-user (bounded); the matrix is |types|² rows.
# --------------------------------------------------------------------------
@register(
    "w_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, SUM(n) AS t FROM pairs GROUP BY 1)
    SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
           ROUND(p.n * 1.0 / t.t, 6) AS prob
    FROM pairs p JOIN tot t USING (from_type)
    """,
    doc="first-order event-type Markov transition matrix "
    "(per-user lead window, per-row-normalized probabilities)",
)
def w_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("from_type")
    return pairs.withColumn("t", F.sum("n").over(w_tot)).select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 1.0 / F.col("t"), 6).alias("prob"),
    )


# --------------------------------------------------------------------------
# Power iteration over the event-type Markov chain — w_transition_
# matrix taken three steps further: starting from the uniform
# distribution, pi <- pi·P three times. The iterative-linear-algebra
# shape on Spark: ONE pass over the fact table builds the sparse
# matrix (|types|² rows), then each iteration is a broadcast join of
# the |types|-row vector against the matrix plus one tiny keyed
# aggregate — the heavy scan never re-runs, and iteration cost is
# independent of corpus size. Each iterate is ROUNDED to 6 dp so both
# engines' float summation orders can't diverge the hash (the
# v_centroid_outliers rule). Types with no outgoing transitions shed
# mass (this is the observed-transition chain, not a patched ergodic
# one) — documented, deterministic.
# --------------------------------------------------------------------------
@register(
    "w_markov_power",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, SUM(n) AS t FROM pairs GROUP BY 1),
    p AS (
        SELECT pr.from_type, pr.to_type, ROUND(pr.n * 1.0 / tot.t, 6) AS prob
        FROM pairs pr JOIN tot USING (from_type)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    pi0 AS (
        SELECT event_type,
               ROUND(1.0 / (SELECT COUNT(*) FROM types), 6) AS pi
        FROM types
    ),
    pi1 AS (
        SELECT p.to_type AS event_type, ROUND(SUM(pi0.pi * p.prob), 6) AS pi
        FROM pi0 JOIN p ON p.from_type = pi0.event_type GROUP BY 1
    ),
    pi2 AS (
        SELECT p.to_type AS event_type, ROUND(SUM(pi1.pi * p.prob), 6) AS pi
        FROM pi1 JOIN p ON p.from_type = pi1.event_type GROUP BY 1
    ),
    pi3 AS (
        SELECT p.to_type AS event_type, ROUND(SUM(pi2.pi * p.prob), 6) AS pi
        FROM pi2 JOIN p ON p.from_type = pi2.event_type GROUP BY 1
    )
    SELECT event_type, pi AS pi3 FROM pi3
    """,
    doc="3-step power iteration over the event-type transition matrix "
    "(uniform start; broadcast vector x sparse matrix per step)",
)
def w_markov_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("from_type")
    # Pin the |types|² matrix once: without this every iteration (and
    # the final collect) replays the fact-table scan + lead window —
    # 4 scans of the corpus at 100 TB for a matrix of a few dozen rows.
    p = (
        pairs.withColumn(
            "prob", F.round(F.col("n") * 1.0 / F.sum("n").over(w_tot), 6)
        )
        .select("from_type", "to_type", "prob")
        .localCheckpoint(eager=True)
    )
    n_types = ev.select("event_type").distinct().count()
    pi = ev.select("event_type").distinct().withColumn(
        "pi", F.round(F.lit(1.0) / F.lit(n_types), 6)
    )
    for _ in range(3):
        pi = (
            F.broadcast(pi)
            .join(p, pi["event_type"] == p["from_type"])
            .groupBy(F.col("to_type").alias("next_event_type"))
            .agg(F.round(F.sum(F.col("pi") * F.col("prob")), 6).alias("pi"))
            .withColumnRenamed("next_event_type", "event_type")
        )
    return pi.select("event_type", F.col("pi").alias("pi3"))


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest — the baseline every real forecast
# must beat: predict each day's event count with the count 7 days
# earlier, score MAE / MAPE over all days that have a week-ago
# observation. One fact-table reduction to daily counts, then a lag
# window over the |days|-sized frame (agg-below-window — the window's
# input is already thousands of rows at any corpus size).
# --------------------------------------------------------------------------
@register(
    "a_seasonal_baseline",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT day, n, LAG(n, 7) OVER (ORDER BY day) AS pred
        FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(ABS(n - pred)), 6) AS mae,
           ROUND(AVG(ABS(n - pred) * 1.0 / n), 6) AS mape
    FROM lagged WHERE pred IS NOT NULL
    """,
    doc="seasonal-naive (lag-7) daily-count forecast backtest: MAE and "
    "MAPE over the daily reduction",
)
def a_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    lagged = daily.withColumn("pred", F.lag("n", 7).over(Window.orderBy("day")))
    return lagged.where(F.col("pred").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg(F.abs(F.col("n") - F.col("pred"))), 6).alias("mae"),
        F.round(
            F.avg(F.abs(F.col("n") - F.col("pred")) * 1.0 / F.col("n")), 6
        ).alias("mape"),
    )


# --------------------------------------------------------------------------
# Per-user novelty curve — how many event types each user touches for
# the FIRST time per day, plus the running total: the discovery-rate
# analog of h_yim_new_entities at daily grain. First occurrences via a
# (user, type)-keyed row_number (never a distinct-in-window, which
# Spark can't do incrementally); the daily rollup and the cumulative
# sum are both user-keyed windows — bounded by one user's history,
# never the corpus.
# --------------------------------------------------------------------------
@register(
    "w_novelty_curve",
    """
    WITH firsts AS (
        SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT user_id, first_day AS day, COUNT(*) AS novel_types
        FROM firsts GROUP BY 1, 2
    )
    SELECT user_id, day, CAST(novel_types AS BIGINT) AS novel_types,
           CAST(SUM(novel_types) OVER (PARTITION BY user_id ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_novel
    FROM daily
    """,
    doc="per-user daily novelty curve: first-time event types per day "
    "+ running total (user-keyed windows only)",
)
def w_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("day")
    )
    daily = firsts.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("novel_types")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.col("novel_types").cast("bigint"),
        F.sum("novel_types").over(w).cast("bigint").alias("cum_novel"),
    )


# --------------------------------------------------------------------------
# Corpus diversity index — the dataset-card headline numbers for
# source balance: Shannon entropy (bits) of the source share
# distribution, the effective source count 2^H (how many EQUAL-sized
# sources the mix behaves like), and the largest single-source share.
# One source-keyed reduction (|sources| rows), scalar math on rounded
# shares so both engines sum identically.
# --------------------------------------------------------------------------
@register(
    "x_source_entropy",
    """
    WITH per_src AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    shares AS (
        SELECT source, ROUND(n * 1.0 / SUM(n) OVER (), 6) AS share
        FROM per_src
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           ROUND(SUM(-share * log2(share)), 6) AS entropy_bits,
           ROUND(POW(2.0, SUM(-share * log2(share))), 6) AS effective_sources,
           ROUND(MAX(share), 6) AS top_share
    FROM shares
    """,
    doc="source-balance diversity index: share entropy (bits), "
    "effective source count 2^H, max single-source share",
)
def x_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    shares = per_src.select(
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy()), 6
        ).alias("share")
    )
    h = F.sum(-F.col("share") * F.log2("share"))
    return shares.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(F.pow(F.lit(2.0), h), 6).alias("effective_sources"),
        F.round(F.max("share"), 6).alias("top_share"),
    )


# --------------------------------------------------------------------------
# Deterministic subsample confidence interval for a mean — the
# resampling-statistics pattern at scale: 32 half-sample replicates,
# each a hash-gated ~50% subsample (bit b of md5(replicate, event_id)
# — identical bytes in both engines, so the replicate assignment is
# reproducible anywhere), mean per replicate, and the spread of the
# replicate means gives the standard error (se ≈ sd/√2 for
# delete-half subsamples). The physical shape is the Poisson-
# bootstrap shape: a map-side explode of each row into its replicate
# memberships (32×|rows|, embarrassingly parallel) and one
# replicate-keyed aggregate — no resampling-with-replacement shuffle,
# no driver-side loop. CI math runs on the ROUNDED aggregate moments
# so both engines derive identical bounds.
# --------------------------------------------------------------------------
@register(
    "x_subsample_ci",
    """
    WITH assign AS (
        SELECT r.b, e.value
        FROM events e
        CROSS JOIN (SELECT unnest(range(0, 32)) AS b) r
        WHERE substr(md5('rep' || CAST(r.b AS VARCHAR) || ':'
                         || CAST(e.event_id AS VARCHAR)), 1, 1) <= '7'
    ),
    rmeans AS (SELECT b, AVG(value) AS m FROM assign GROUP BY b),
    stats AS (
        SELECT ROUND(AVG(m), 4) AS boot_mean,
               ROUND(STDDEV_SAMP(m), 4) AS boot_sd
        FROM rmeans
    ),
    base AS (
        SELECT ROUND(AVG(value), 4) AS mean_value,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
    )
    SELECT base.mean_value, base.n,
           CAST(32 AS INT) AS n_replicates,
           stats.boot_mean, stats.boot_sd,
           ROUND(base.mean_value - 1.96 * stats.boot_sd / sqrt(2.0), 4) AS ci_low,
           ROUND(base.mean_value + 1.96 * stats.boot_sd / sqrt(2.0), 4) AS ci_high
    FROM base CROSS JOIN stats
    """,
    doc="delete-half subsample CI for mean(events.value): 32 hash-"
    "gated replicates, map-side explode + one keyed aggregate",
)
def x_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    reps = ev.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        F.col("event_id"),
    ).where(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("rep"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            1,
        )
        <= "7"
    )
    rmeans = reps.groupBy("b").agg(F.avg("value").alias("m"))
    stats = rmeans.agg(
        F.round(F.avg("m"), 4).alias("boot_mean"),
        F.round(F.stddev_samp("m"), 4).alias("boot_sd"),
    )
    base = ev.agg(
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.count(F.lit(1)).alias("n"),
    )
    half_se = F.col("boot_sd") / F.sqrt(F.lit(2.0))
    return base.crossJoin(F.broadcast(stats)).select(
        "mean_value",
        "n",
        F.lit(32).cast("int").alias("n_replicates"),
        "boot_mean",
        "boot_sd",
        F.round(F.col("mean_value") - 1.96 * half_se, 4).alias("ci_low"),
        F.round(F.col("mean_value") + 1.96 * half_se, 4).alias("ci_high"),
    )


# --------------------------------------------------------------------------
# k-anonymity audit — the release gate that pairs with x_pii_mask:
# after generalization, every quasi-identifier combination must be
# shared by at least k individuals or the row is re-identifiable.
# Audits a CANDIDATE finer generalization ($100 balance buckets —
# the release x_pii_mask would prefer if it passed) and reports every
# violating cell with its population: non-empty result = that
# generalization leaks, fall back to the coarser $500 tier. One keyed
# aggregate; the audit output is |violating cells|, not |rows|.
# --------------------------------------------------------------------------
@register(
    "x_kanon_audit",
    """
    WITH cells AS (
        SELECT c_mktsegment,
               CAST(FLOOR(c_acctbal / 100) * 100 AS BIGINT) AS acctbal_bucket,
               COUNT(*) AS cell_size
        FROM customer
        GROUP BY 1, 2
    )
    SELECT c_mktsegment, acctbal_bucket, CAST(cell_size AS BIGINT) AS cell_size
    FROM cells WHERE cell_size < 5
    """,
    doc="k-anonymity audit (k=5) of a candidate $100-bucket "
    "generalization; violating cells returned, empty = releasable",
)
def x_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 100) * 100).cast("bigint").alias(
            "acctbal_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("cell_size"))
    return cells.where(F.col("cell_size") < 5).select(
        "c_mktsegment", "acctbal_bucket", F.col("cell_size").cast("bigint")
    )


# --------------------------------------------------------------------------
# Z-order (Morton) layout key — multi-dimensional clustering for scan
# pruning: interleaving the bits of (user bucket, hour bucket) gives a
# single sort key under which BOTH a user-range filter and a
# time-range filter touch few contiguous files — the 100 TB data-
# layout lever Spark itself doesn't ship (Delta/Iceberg OPTIMIZE
# ZORDER compute exactly this key and sort by it). Pure bit
# arithmetic, map-only; writing the table back sorted by zkey is the
# S9 partitioned-sink path. 8 bits per dimension → 16-bit key.
# --------------------------------------------------------------------------
def _zorder_sql() -> str:
    terms = " + ".join(
        f"(((user_id % 256) // {1 << i}) % 2) * {1 << (2 * i)} + "
        f"(((CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) % 256) // {1 << i}) % 2 * {1 << (2 * i + 1)}"
        for i in range(8)
    )
    return f"""
    SELECT event_id, user_id,
           CAST({terms} AS BIGINT) AS zkey
    FROM events
    """


@register(
    "x_zorder_key",
    _zorder_sql(),
    doc="Morton z-order key over (user bucket, hour bucket) — the "
    "multi-dim clustering sort key for layout-level scan pruning",
)
def x_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id") % 256
    h = (F.unix_timestamp("ts") / 3600).cast("bigint") % 256
    zkey = F.lit(0).cast("bigint")
    for i in range(8):
        zkey = (
            zkey
            + (F.floor(u / (1 << i)) % 2) * (1 << (2 * i))
            + (F.floor(h / (1 << i)) % 2) * (1 << (2 * i + 1))
        )
    return ev.select("event_id", "user_id", zkey.cast("bigint").alias("zkey"))


# --------------------------------------------------------------------------
# User growth curve — cumulative distinct users by day. The naive
# form (COUNT(DISTINCT user) OVER cumulative window) holds every id
# in window state; the scalable identity is: a user contributes to
# the cumulative count exactly from their FIRST-SEEN day, so one
# per-user min(day) aggregate + a day-level cumulative sum over the
# REDUCED (≤ |days|) table gives the same curve. Pattern generalizes
# to any cumulative-distinct metric at 100 TB.
# --------------------------------------------------------------------------
@register(
    "a_user_growth",
    """
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d)
    SELECT d AS day, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    """,
    doc="cumulative-distinct user growth via first-seen-day reduction "
    "(no distinct-state window; cumsum runs on the day-level table)",
)
def a_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("d").alias("day"),
        F.col("new_users").cast("bigint"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


# --------------------------------------------------------------------------
# Rolling 7-day distinct users via HLL sketch algebra — the ONLY
# shape that survives 100 TB: exact rolling distinct needs every
# (day, user) pair re-deduplicated per window (state ∝ users ×
# window), while a mergeable sketch needs one fixed-size sketch per
# day and a union across each 7-day window. One day-keyed sketch
# aggregate over the fact table; the window merge runs on the
# |days|-sized dim (broadcast self-join), touching the fact table
# once. HLL estimates are not SQL-reproducible in DuckDB, so the
# registered form is the SELF-AUDITING variant (VERDICT r8 #1): the
# same query also computes the exact rolling distinct (from the
# distinct (day,user) projection — fixture-affordable; at 100 TB the
# production form drops the exact twin and this audit runs on a
# sample) and emits |est-exact|/exact <= 0.05 as a hash-stable
# boolean next to the exact value the oracle reproduces.
# --------------------------------------------------------------------------
@register(
    "x_hll_rolling_distinct",
    """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_rolling,
           TRUE AS est_within_5pct
    FROM days d JOIN du e
      ON e.day <= d.day AND e.day >= d.day - INTERVAL 6 DAY
    GROUP BY d.day
    """,
    doc="rolling 7-day distinct users from mergeable per-day HLL "
    "sketches (sketch-union window merge), self-auditing form: exact "
    "rolling twin + <=5% error boolean inside the driver hash gate",
)
def x_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)  # feeds both the sketch and exact tiers
    )
    daily = du.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    d = daily.select("day").alias("d")
    e = daily.alias("e")
    win_cond = lambda: (F.col("e.day") <= F.col("d.day")) & (
        F.col("e.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS")
    )
    est = (
        F.broadcast(d)
        .join(e, win_cond())
        .groupBy(F.col("d.day").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("e.sk")))
            .cast("double")
            .alias("est")
        )
    )
    exact = (
        F.broadcast(daily.select("day").alias("d"))
        .join(du.alias("e"), win_cond())
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct(F.col("e.user_id")).cast("bigint").alias("exact_rolling"))
    )
    return exact.join(est, "day").select(
        F.col("day").cast("date").alias("day"),
        "exact_rolling",
        (
            F.abs(F.col("est") - F.col("exact_rolling"))
            / F.col("exact_rolling")
            <= F.lit(0.05)
        ).alias("est_within_5pct"),
    )


# --------------------------------------------------------------------------
# Listen-share inequality (Gini) — how concentrated activity is
# across users: the balance metric a sampling strategy consults
# before per-user caps (a4_capped_count's "why") and the corpus
# analog of x_dataset_card's dup-rate. Exact Gini via the rank
# identity G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over per-user totals
# sorted ascending. The Spark plan never ranks users: tied users share
# the same x, so Σ i·x is tie-order independent and collapses to the
# VALUE-grouped form Σ_v v·(c_v·B_v + c_v(c_v+1)/2) where B_v counts
# users with smaller totals — one fact-table aggregate, one groupBy
# over count values, and a prefix sum over the |distinct count
# values|-sized frame (thousands of rows at any corpus size, vs the
# |users|-sized single-partition sort SURVEY §4.3 names as the 100 TB
# hazard). Σ runs in decimal(38,0) so rank×count products can't
# overflow bigint at scale. The oracle keeps the per-user ROW_NUMBER
# form — the identity is exact, so the hash must still match.
# --------------------------------------------------------------------------
@register(
    "a_listen_gini",
    """
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n ASC, user_id ASC) AS i
        FROM per_user
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(2.0 * SUM(i * n) / (COUNT(*) * SUM(n))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    """,
    doc="exact Gini of per-user event counts (rank identity over the "
    "user-level reduction; activity-concentration report)",
)
def a_listen_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    by_val = per_user.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, -1)
    pref = by_val.withColumn("b", F.coalesce(F.sum("c").over(w), F.lit(0)))
    # Ranks of the c tied users at value n are b+1 .. b+c, so their
    # Σ i·x contribution is n·(c·b + c(c+1)/2) — c(c+1) is even, so
    # DIV keeps it integral; decimal(38,0) keeps the sum exact.
    # Cast BEFORE the products: c·b and c(c+1) must not be evaluated in
    # bigint first or the cast to decimal arrives after the overflow.
    # c(c+1)/2 halves the even factor while still a bigint (halving
    # can't overflow) and widens to decimal before the multiply.
    cd = F.col("c").cast("decimal(38,0)")
    bd = F.col("b").cast("decimal(38,0)")
    tri = F.expr(
        "CASE WHEN c % 2 = 0"
        "  THEN CAST(c DIV 2 AS DECIMAL(38,0)) * (c + 1)"
        "  ELSE CAST(c AS DECIMAL(38,0)) * ((c + 1) DIV 2) END"
    )
    contrib = F.col("n").cast("decimal(38,0)") * (cd * bd + tri)
    stats = pref.agg(
        F.sum("c").cast("bigint").alias("n_users"),
        F.sum(F.col("n") * F.col("c")).cast("bigint").alias("n_events"),
        F.sum(contrib).alias("si"),
    )
    return stats.select(
        "n_users",
        "n_events",
        # Divide by the two counts SEPARATELY in double — the bigint
        # product n_users * n_events overflows first at 100 TB scale.
        F.round(
            2.0 * F.col("si") / F.col("n_users") / F.col("n_events")
            - (F.col("n_users") + 1.0) / F.col("n_users"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Session-duration distribution — the engagement summary over the
# sessionized stream: session count, events per session, and the
# duration percentiles product analytics watches. Sessions come from
# the same native session_window operator st_session_window uses
# (extra min/max aggregates ride the same single exchange); the stats
# run over the |sessions|-sized reduction. Durations are defined
# first-event→last-event in whole seconds (epoch floored on both
# engines — DuckDB's CAST rounds).
# --------------------------------------------------------------------------
@register(
    "a_session_stats",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts >= LAG(ts) OVER w + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
                 - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS dur_s
        FROM sessions GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events,
           ROUND(AVG(dur_s), 4) AS avg_dur_s,
           ROUND(quantile_cont(dur_s, 0.5), 4) AS p50_dur_s,
           ROUND(quantile_cont(dur_s, 0.9), 4) AS p90_dur_s
    FROM per_session
    """,
    doc="session count, events/session, and duration percentiles over "
    "the sessionized stream (single-exchange session build)",
)
def a_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.streaming.jobs import session_aggregate

    ev = load_table(spark, sf_dir, "events")
    sess = session_aggregate(
        ev,
        "ts",
        "user_id",
        gap="30 minutes",
        extra_aggs=[
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        ],
    )
    per_session = sess.select(
        "n_events",
        (
            F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
        ).alias("dur_s"),
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.round(F.avg("dur_s"), 4).alias("avg_dur_s"),
        F.round(F.percentile("dur_s", F.lit(0.5)), 4).alias("p50_dur_s"),
        F.round(F.percentile("dur_s", F.lit(0.9)), 4).alias("p90_dur_s"),
    )


# --------------------------------------------------------------------------
# DAU/WAU stickiness — daily actives over rolling-7-day actives, the
# standard engagement ratio. This is the EXACT tier (distinct
# (day, user) pairs re-counted per window — fine while users × 7 days
# fits a shuffle); x_hll_rolling_distinct is the same window on
# sketches, the shape that replaces this at 100 TB. Day dim is tiny →
# the rolling window is a broadcast day-to-day join, and the fact
# table reduces to distinct (day, user) once.
# --------------------------------------------------------------------------
@register(
    "a_dau_wau",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT d.day, COUNT(DISTINCT e.user_id) AS wau
        FROM dau d JOIN du e ON e.day <= d.day AND e.day >= d.day - 6
        GROUP BY d.day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           ROUND(d.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
    """,
    doc="DAU / rolling-7-day-WAU stickiness (exact tier; HLL variant "
    "is x_hll_rolling_distinct)",
)
def a_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    win = F.broadcast(dau.select("day")).join(
        du.select(F.col("day").alias("eday"), "user_id"),
        (F.col("eday") <= F.col("day"))
        & (F.col("eday") >= F.date_sub(F.col("day"), 6)),
    )
    wau = win.groupBy("day").agg(F.count_distinct("user_id").alias("wau"))
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("bigint"),
        F.col("wau").cast("bigint"),
        F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
    )


# --------------------------------------------------------------------------
# Inter-event arrival gaps per type — the ops-latency panel: p50/p90
# seconds between consecutive events of each type within a user's
# stream, plus event volume. One user+type-keyed lag window (bounded
# by a user's history), then a |types|-sized percentile reduction.
# Gap seconds are floored to integers on both engines before the
# percentile so interpolation runs on identical inputs.
# --------------------------------------------------------------------------
@register(
    "a_inter_event_time",
    """
    WITH gaps AS (
        SELECT event_type,
               FLOOR(EPOCH(ts) - EPOCH(LAG(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)))
                   AS gap_s
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5), 4) AS p50_s,
           ROUND(quantile_cont(gap_s, 0.9), 4) AS p90_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
    doc="inter-arrival gap percentiles per event type (user+type-keyed "
    "lag window, |types|-sized percentile reduction)",
)
def a_inter_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # Fractional-epoch subtraction BEFORE the floor: unix_timestamp
    # truncates each side to whole seconds first, which disagrees with
    # the oracle's FLOOR(EPOCH(a) - EPOCH(b)) on sub-second timestamps.
    gaps = ev.select(
        "event_type",
        F.floor(
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").cast("bigint").alias("n_gaps"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 4).alias("p90_s"),
    )


# --------------------------------------------------------------------------
# Hour-of-day regularity per user — Shannon entropy of each user's
# activity distribution over the 24 hours: near-0 bits is a
# single-hour metronome (cron job / bot), near log2(24)≈4.58 is
# diffuse human-like activity. The behavioral twin of t_char_entropy,
# same shape: one (user, hour) reduction, rounded shares, user-keyed
# entropy fold.
# --------------------------------------------------------------------------
@register(
    "w_hour_entropy",
    """
    WITH byhour AS (
        SELECT user_id, EXTRACT(hour FROM ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    probs AS (
        SELECT user_id,
               ROUND(c * 1.0 / SUM(c) OVER (PARTITION BY user_id), 6) AS p
        FROM byhour
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS active_hours,
           ROUND(SUM(-p * log2(p)), 6) AS hour_entropy_bits
    FROM probs GROUP BY user_id
    """,
    doc="per-user hour-of-day activity entropy (bot/metronome "
    "detector; user-keyed reductions only)",
)
def w_hour_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    byhour = ev.groupBy(
        "user_id", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    probs = byhour.select(
        "user_id",
        F.round(
            F.col("c") * 1.0 / F.sum("c").over(Window.partitionBy("user_id")), 6
        ).alias("p"),
    )
    return probs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_hours"),
        F.round(F.sum(-F.col("p") * F.log2("p")), 6).alias("hour_entropy_bits"),
    )


# --------------------------------------------------------------------------
# Small-file compaction planner — the table-maintenance pass every
# large parquet corpus needs (Iceberg/Delta "rewrite small files", or
# the reference's per-dump repartition before upload): greedily packs
# each source partition's documents, in deterministic doc_id order,
# into target-size output files and reports the resulting layout.
# The bin id is pure arithmetic on a per-source prefix sum —
# floor(bytes_before / target) — so planning is ONE window + ONE
# aggregate, no driver loop, no sort beyond the per-partition window
# order; at 100 TB the plan itself stays a per-partition computation
# (source-keyed exchanges only) and the executor that writes file i
# needs only its own rows. fill_ratio > 1 marks bins whose last doc
# overflowed the target (the standard greedy-packing tail).
# --------------------------------------------------------------------------
_COMPACT_TARGET = 2048  # bytes per output file at fixture scale


@register(
    "x_compaction_plan",
    f"""
    WITH sized AS (
        SELECT source, doc_id, n_chars,
               SUM(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM documents
    )
    SELECT source,
           CAST((cum0 // {_COMPACT_TARGET}) AS BIGINT) AS file_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS file_bytes,
           ROUND(SUM(n_chars) * 1.0 / {_COMPACT_TARGET}, 4) AS fill_ratio
    FROM (SELECT source, n_chars, cum - n_chars AS cum0 FROM sized)
    GROUP BY source, cum0 // {_COMPACT_TARGET}
    """,
    doc=f"compaction plan: greedy sequential packing of each source's "
    f"docs into {_COMPACT_TARGET}-byte target files via a prefix-sum "
    "bin id (one window + one aggregate; source-keyed only)",
)
def x_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = docs.select(
        "source",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("cum0"),
    ).withColumn("file_idx", F.expr(f"cum0 div {_COMPACT_TARGET}"))
    return binned.groupBy("source", "file_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("file_bytes"),
        F.round(
            F.sum("n_chars") * 1.0 / _COMPACT_TARGET, 4
        ).alias("fill_ratio"),
    ).select("source", F.col("file_idx").cast("bigint").alias("file_idx"),
             "n_docs", "file_bytes", "fill_ratio")


# --------------------------------------------------------------------------
# Zone-map / file-skipping report — the scan-pruning observability
# query: per (event_type, day) zone, min/max of the value column and
# whether a representative predicate (value >= 400) could SKIP the
# zone entirely (vmax < 400 ⇒ no row can match — exactly the
# parquet row-group / Iceberg manifest pruning rule). At 100 TB this
# is how you audit whether your partition layout actually prunes: a
# skippable_share near 0 says the predicate column is spread across
# every zone and the layout (or a z-order on that column —
# x_zorder_key) needs to change. Map-side-combinable min/max/count
# only; one zone-keyed exchange.
# --------------------------------------------------------------------------
@register(
    "x_zone_map_report",
    """
    WITH zones AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               COUNT(*) AS n_rows, MIN(value) AS vmin, MAX(value) AS vmax
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_rows) AS total FROM zones)
    SELECT event_type, day, CAST(n_rows AS BIGINT) AS n_rows,
           vmin, vmax,
           (vmax < 400.0) AS skippable,
           ROUND(n_rows * 1.0 / total, 6) AS row_share
    FROM zones, tot
    """,
    doc="zone-map report: per (event_type, day) min/max/count of "
    "value + skippability under value >= 400 (scan-pruning audit; "
    "map-side-combinable stats, one zone-keyed exchange)",
)
def x_zone_map_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    zones = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    tot = zones.agg(F.sum("n_rows").alias("total"))
    return zones.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "day",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "vmin",
        "vmax",
        (F.col("vmax") < 400.0).alias("skippable"),
        F.round(F.col("n_rows") * 1.0 / F.col("total"), 6).alias("row_share"),
    )


# --------------------------------------------------------------------------
# Count-Min-Sketch heavy-hitter audit (r8): the mergeable
# bounded-memory frequency sketch every 100 TB pipeline reaches for
# when exact per-key counts stop fitting (Cormode & Muthukrishnan,
# J.Alg'05). The sketch is D×W integer cells — CONSTANT size no matter
# the input: each event increments one cell per hash row, so building
# it is an explode(D) + groupBy(row, cell) whose partial aggregation
# collapses every task's contribution to ≤ D·W cells before the (tiny)
# shuffle, and two sketches merge by cell-wise addition (the same
# combine). est(k) = min_j cells[j][h_j(k)] ≥ exact(k), always.
#
# Hashing is the repo's deterministic md5 convention (first 8 hex →
# bigint, mod W), byte-identical in DuckDB, and all arithmetic is
# integer — the oracle parity is exact. The report joins the estimate
# against the EXACT top-20 so the CMS overcount is auditable: on this
# near-uniform fixture the ε·N collision floor (ε ≈ e/W) is the same
# order as the true counts, which is precisely the regime where a
# sketch must NOT be trusted blindly — the overcount column is the
# deliverable. Scale: sketch build is one bounded-size aggregate over
# one scan; probes broadcast-join the ≤ D·W-row sketch.
# --------------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 2048


def _cms_cell_sql(j: str, key: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {_CMS_W}"
    )


def _cms_cell_spark(j, key):  # j: Column or int, key: Column
    jc = F.lit(j) if isinstance(j, int) else j
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(jc.cast("string"), F.lit(":"), key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_W
    )


@register(
    "x_heavy_hitters",
    f"""
    WITH rows_j AS (SELECT UNNEST(range({_CMS_D})) AS j),
    cms AS (
        SELECT j, {_cms_cell_sql("j", "user_id")} AS cell,
               COUNT(*) AS c
        FROM events CROSS JOIN rows_j
        GROUP BY 1, 2
    ),
    top AS (
        SELECT user_id, COUNT(*) AS exact_n
        FROM events GROUP BY 1
        ORDER BY exact_n DESC, user_id LIMIT 20
    )
    SELECT t.user_id, t.exact_n,
           MIN(c.c) AS cms_est,
           MIN(c.c) - t.exact_n AS overcount
    FROM top t
    CROSS JOIN rows_j j
    JOIN cms c
      ON c.j = j.j
     AND c.cell = {_cms_cell_sql("j.j", "t.user_id")}
    GROUP BY t.user_id, t.exact_n
    ORDER BY exact_n DESC, user_id
    """,
    doc=f"Count-Min-Sketch ({_CMS_D}x{_CMS_W}, deterministic md5 rows) "
    "heavy-hitter audit: constant-size mergeable sketch built in one "
    "bounded aggregate; exact top-20 users joined against their CMS "
    "estimate with the (always >= 0) overcount exposed — integer-only, "
    "oracle parity exact",
)
def x_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    # Build: one scan, explode to D (j, cell) pairs per event, count.
    # Partial agg bounds every task's output at D·W cells.
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell_spark(j, F.col("user_id")).alias("cell"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("e")
    ).select("e.j", "e.cell")
    cms = cells.groupBy("j", "cell").agg(F.count(F.lit(1)).alias("c"))

    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(20)
    )
    probes = top.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell_spark(j, F.col("user_id")).alias("cell"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_n", "p.j", "p.cell")
    return (
        probes.join(F.broadcast(cms), ["j", "cell"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
    )


# --------------------------------------------------------------------------
# Bloom-filter scan pruning (r8): the runtime-filter pattern every
# 100 TB engine injects under a selective dim⋈fact join (Spark itself:
# spark.sql.optimizer.runtime.bloomFilter.enabled; Bloom CACM'70).
# Instead of shuffling the fact table to semi-join a filtered dim, a
# constant-size bit set built from the dim keys is broadcast and the
# fact scan is pruned in-pipeline; the exact join then runs only on
# survivors. This query builds the Bloom EXPLICITLY (deterministic md5
# bit positions, byte-identical in DuckDB) and audits it: per ship
# year, rows scanned, rows the Bloom passes, true matches, false
# positives. All counts are integers — oracle parity is exact.
#
# Shape notes (the scale story IS the point here):
#  * the bit set is a ≤ k·|keys|-row DISTINCT positions frame,
#    broadcast; membership = k chained BROADCAST left joins (no
#    explode — a positions explode + groupBy(row) would shuffle the
#    fact table, exactly what the Bloom exists to avoid);
#  * the probe side stays one scan → k broadcast joins → one
#    aggregate: zero fact-table shuffles;
#  * production form: compile the positions to a long[] broadcast
#    variable or let Spark inject it (conf above); the positions-join
#    form is the declarative equivalent the optimizer can see through.
# m=512 bits / k=3 keeps the fixture's false-positive band visible
# (sf0.1: ~90 keys -> fill 0.44 -> fp ~ 0.09) — an always-empty
# false_pos column would audit nothing.
# --------------------------------------------------------------------------
_BLOOM_M = 512
_BLOOM_K = 3
_BLOOM_BAL = 9000.0


def _bloom_pos_sql(j: int, key: str) -> str:
    return (
        f"('0x' || substr(md5('{j}:' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {_BLOOM_M}"
    )


def _bloom_pos_spark(j: int, key) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % _BLOOM_M
    )


@register(
    "x_bloom_prune",
    f"""
    WITH keys AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal > {_BLOOM_BAL}
    ),
    bits AS (
        SELECT DISTINCT p FROM keys, UNNEST([
            {", ".join(_bloom_pos_sql(j, "s_suppkey") for j in range(_BLOOM_K))}
        ]) AS t(p)
    ),
    probe AS (
        SELECT year(l_shipdate) AS ship_year,
               ({" AND ".join(f"{_bloom_pos_sql(j, 'l_suppkey')} IN (SELECT p FROM bits)" for j in range(_BLOOM_K))})
                   AS bloom_pass,
               l_suppkey IN (SELECT s_suppkey FROM keys) AS is_true
        FROM lineitem
    )
    SELECT ship_year,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (bloom_pass) AS n_bloom_pass,
           COUNT(*) FILTER (is_true) AS n_true,
           COUNT(*) FILTER (bloom_pass AND NOT is_true) AS n_false_pos,
           ROUND(COUNT(*) FILTER (bloom_pass AND NOT is_true) * 1.0
                 / COUNT(*) FILTER (NOT is_true), 6) AS fp_rate
    FROM probe
    GROUP BY ship_year
    ORDER BY ship_year
    """,
    doc=f"Bloom-filter scan-pruning audit (m={_BLOOM_M} bits, "
    f"k={_BLOOM_K} deterministic md5 hashes) — bit set built from "
    f"high-balance suppliers (s_acctbal > {_BLOOM_BAL:g}), fact scan "
    "pruned via k chained broadcast joins (zero fact shuffles); per "
    "ship year: rows, bloom passes, true matches, false positives — "
    "integer-exact, fp_rate 6dp",
)
def x_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    keys = supp.where(F.col("s_acctbal") > _BLOOM_BAL).select(
        F.col("s_suppkey").cast("bigint").alias("k")
    )
    bits = (
        keys.select(
            F.explode(
                F.array(
                    *[_bloom_pos_spark(j, F.col("k")) for j in range(_BLOOM_K)]
                )
            ).alias("p")
        )
        .distinct()
        # NOT pinned: bits is re-derived per probe join, but the
        # supplier scan is tiny and an eager checkpoint costs a whole
        # extra job (A/B measured 2.2 s pinned vs 1.4 s not, sf0.1).
    )
    # repartition = single-file-fixture parallelism fix ONLY (the md5
    # probe math otherwise runs on a 3-task scan; measured 2.1 -> ~1 s
    # warm). At real scale the scan arrives in thousands of splits and
    # this shuffle should be dropped — the design point is that the
    # Bloom probe adds ZERO fact-table shuffles.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            F.col("l_suppkey").cast("bigint").alias("sk"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # k chained broadcast left joins: `bits` is distinct, so no row
    # duplication; found_j IS NOT NULL == bit j set. The fact table is
    # never shuffled until the final (tiny) per-year aggregate.
    probe = li
    for j in range(_BLOOM_K):
        probe = probe.join(
            F.broadcast(
                bits.select(
                    F.col("p").alias(f"p{j}"), F.lit(1).alias(f"found{j}")
                )
            ),
            _bloom_pos_spark(j, F.col("sk")) == F.col(f"p{j}"),
            "left",
        )
    bloom_pass = None
    for j in range(_BLOOM_K):
        bloom_pass = (
            F.col(f"found{j}").isNotNull() if j == 0
            else bloom_pass & F.col(f"found{j}").isNotNull()
        )
    probe = probe.join(
        F.broadcast(keys.select(F.col("k").alias("tk"), F.lit(1).alias("tfound"))),
        F.col("sk") == F.col("tk"),
        "left",
    ).select(
        "ship_year",
        bloom_pass.alias("bloom_pass"),
        F.col("tfound").isNotNull().alias("is_true"),
    )
    return (
        probe.groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_if(F.col("bloom_pass")).cast("bigint").alias("n_bloom_pass"),
            F.count_if(F.col("is_true")).cast("bigint").alias("n_true"),
            F.count_if(F.col("bloom_pass") & ~F.col("is_true"))
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .select(
            "ship_year",
            "n_rows",
            "n_bloom_pass",
            "n_true",
            "n_false_pos",
            F.round(
                F.col("n_false_pos") * 1.0 / (F.col("n_rows") - F.col("n_true")), 6
            ).alias("fp_rate"),
        )
        .orderBy("ship_year")
    )


# --------------------------------------------------------------------------
# DSIR importance weights (r8): Data Selection with Importance
# Resampling (Xie et al., NeurIPS 2023) — the standard recipe for
# "select raw-corpus documents that look like a target domain":
# hashed n-gram bag features, a multinomial LM per side, and per-doc
# importance weight log p_target(doc) - log p_raw(doc). At 100 TB this
# is the cheap alternative to model-based scoring: two bounded
# (B-bucket) count aggregates + one broadcast join per doc-token.
#
#  * features: word unigrams + bigrams hashed into B=4096 buckets via
#    the repo's deterministic md5 convention (byte-identical in
#    DuckDB);
#  * LMs: add-1-smoothed bucket multinomials — target = one declared
#    source (src0), raw = the whole corpus;
#  * weight: per-gram log-ratio quantized to integer nanounits and
#    summed as BIGINT (order-free exact, t_tfidf precedent), then
#    normalized by gram count (DSIR's sum is length-biased; the
#    per-gram mean ranks documents, not document lengths);
#  * output: top-50 docs by avg log-ratio — the docs DSIR would
#    resample FIRST into a src0-flavored mix.
#
# Scale: the gram explode is pinned once, doc-partitioned, so the
# per-doc aggregate is exchange-free; both LMs are <= B-row frames
# (broadcast); nothing quadratic anywhere.
# --------------------------------------------------------------------------
_DSIR_B = 4096
_DSIR_TARGET = "src0"


def _dsir_bucket_sql(expr: str) -> str:
    return (
        f"('0x' || substr(md5({expr}), 1, 8))::BIGINT % {_DSIR_B}"
    )


@register(
    "x_dsir_weights",
    f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               {_dsir_bucket_sql("g")} AS b
        FROM (
            SELECT doc_id, source, UNNEST(
                list_transform(ws, w -> 'u:' || w)
                || list_transform(range(1, len(ws)),
                                  i -> 'b:' || ws[i] || ' ' || ws[i+1])
            ) AS g
            FROM toks
        )
    ),
    rawc AS (SELECT b, COUNT(*) AS cr FROM grams GROUP BY b),
    tgtc AS (SELECT b, COUNT(*) AS ct FROM grams
             WHERE source = '{_DSIR_TARGET}' GROUP BY b),
    nt AS (SELECT COUNT(*) AS n FROM grams WHERE source = '{_DSIR_TARGET}'),
    nr AS (SELECT COUNT(*) AS n FROM grams),
    lr AS (
        SELECT r.b,
               CAST(ROUND((LN((COALESCE(t.ct, 0) + 1.0) / (nt.n + {_DSIR_B}))
                          - LN((r.cr + 1.0) / (nr.n + {_DSIR_B}))) * 1e9)
                    AS BIGINT) AS qlr
        FROM rawc r LEFT JOIN tgtc t USING (b), nt, nr
    )
    SELECT g.doc_id,
           MIN(g.source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(SUM(l.qlr) * 1.0 / COUNT(*) / 1e9, 6) AS avg_logratio
    FROM grams g JOIN lr l USING (b)
    GROUP BY g.doc_id
    ORDER BY avg_logratio DESC, doc_id
    LIMIT 50
    """,
    doc="DSIR importance weights (Xie et al. 2023): hashed unigram+"
    f"bigram bag ({_DSIR_B} md5 buckets), add-1 bucket LMs for "
    f"target='{_DSIR_TARGET}' vs raw corpus, per-doc mean log-ratio "
    "(integer-nanounit quantized, BIGINT-summed — order-free exact); "
    "top-50 docs the resampler would pick first",
)
def x_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        # ^ explode preserves this; the
        # per-doc aggregate below is then exchange-free
    )
    ws = F.col("ws")
    gram_strs = F.concat(
        F.transform(ws, lambda w: F.concat(F.lit("u:"), w)),
        F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 2),
                lambda i: F.concat(
                    F.lit("b:"), F.get(ws, i), F.lit(" "), F.get(ws, i + 1)
                ),
            ),
        ).otherwise(F.array()),
    )
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(gram_strs).alias("g"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint") % _DSIR_B
        ).alias("b"),
    ).localCheckpoint(eager=True)  # feeds both LMs + the per-doc agg

    rawc = grams.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgtc = (
        grams.where(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    nt = grams.where(F.col("source") == _DSIR_TARGET).agg(
        F.count(F.lit(1)).alias("n_t")
    )
    nr = grams.agg(F.count(F.lit(1)).alias("n_r"))
    lr = (
        rawc.join(tgtc, "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                        / (F.col("n_t") + _DSIR_B)
                    )
                    - F.log((F.col("cr") + 1.0) / (F.col("n_r") + _DSIR_B))
                )
                * 1e9
            )
            .cast("bigint")
            .alias("qlr"),
        )
    )
    return (
        grams.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("qlr").alias("qsum"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.round(F.col("qsum") * 1.0 / F.col("n_grams") / 1e9, 6).alias(
                "avg_logratio"
            ),
        )
        .orderBy(F.col("avg_logratio").desc(), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# x_chi_square (r8): Pearson chi-square contingency audit between a
# categorical feature and a cohort label — the standard "is this
# feature independent of the split?" check for A/B bucketing bugs and
# leaky dataset splits (e.g. a hash-split whose buckets correlate
# with event type means the hash key leaks the feature). Cohort =
# user_id % 4, the same declared-modulus convention as x_hash_split.
# One fact scan -> one (type, cohort) count aggregate (map-side
# combinable, |cells| = |types| x 4); marginals and the statistic are
# cell-frame arithmetic over broadcast-sized frames. Integer counts
# exact; expected/contrib 6dp.
# --------------------------------------------------------------------------
@register(
    "x_chi_square",
    """
    WITH cells AS (
        SELECT event_type, user_id % 4 AS cohort, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(n) AS row_n FROM cells GROUP BY 1),
    ct AS (SELECT cohort, SUM(n) AS col_n FROM cells GROUP BY 1),
    tot AS (SELECT SUM(n) AS total FROM cells)
    SELECT c.event_type, c.cohort, CAST(c.n AS BIGINT) AS n,
           ROUND(rt.row_n * ct.col_n * 1.0 / tot.total, 6) AS expected,
           ROUND(POW(c.n - rt.row_n * ct.col_n * 1.0 / tot.total, 2)
                 / (rt.row_n * ct.col_n * 1.0 / tot.total), 6) AS contrib
    FROM cells c
    JOIN rt USING (event_type) JOIN ct USING (cohort), tot
    ORDER BY event_type, cohort
    """,
    doc="Pearson chi-square contingency audit (event_type x user-"
    "cohort): per-cell observed/expected/contribution for detecting "
    "cohort-feature dependence in splits; one map-side-combinable "
    "cell aggregate, marginals over the broadcast-sized cell frame",
)
def x_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("n"))
    rt = cells.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    ct = cells.groupBy("cohort").agg(F.sum("n").alias("col_n"))
    tot = cells.agg(F.sum("n").alias("total"))
    exp = F.col("row_n") * F.col("col_n") * 1.0 / F.col("total")
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "cohort")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "cohort",
            F.col("n").cast("bigint").alias("n"),
            F.round(exp, 6).alias("expected"),
            F.round(F.pow(F.col("n") - exp, 2) / exp, 6).alias("contrib"),
        )
        .orderBy("event_type", "cohort")
    )


# --------------------------------------------------------------------------
# x_epoch_shuffle_quality (r8): mixing audit for the epoch ordering —
# given documents ordered by the deterministic md5 interleave key
# (the x_interleave_domains convention), how often are ADJACENT rows
# from the same source, vs the Σ p_i² rate perfect mixing predicts?
# A ratio ≫ 1 means the shuffle key clumps a source (bad batches:
# consecutive same-domain examples raise gradient correlation); ≈ 1
# certifies the md5 key mixes. One window pass over the ordered
# corpus + one tiny aggregate; integer counts exact, rates 6dp.
# Scale: the lag window needs a total order — at 100 TB you audit a
# bounded SAMPLE of the order (the statistic is an average, stable on
# samples), or per range-partition with the same contract.
# --------------------------------------------------------------------------
@register(
    "x_epoch_shuffle_quality",
    """
    WITH ordered AS (
        SELECT source,
               LAG(source) OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch'), doc_id
               ) AS prev_source
        FROM documents
    ),
    adj AS (
        SELECT COUNT(*) FILTER (prev_source IS NOT NULL) AS n_pairs,
               COUNT(*) FILTER (prev_source = source) AS n_same
        FROM ordered
    ),
    shares AS (
        SELECT SUM(POW(n * 1.0 / tot, 2)) AS expected_rate
        FROM (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
             (SELECT COUNT(*) AS tot FROM documents)
    )
    SELECT CAST(a.n_pairs AS BIGINT) AS n_pairs,
           CAST(a.n_same AS BIGINT) AS n_same,
           ROUND(a.n_same * 1.0 / a.n_pairs, 6) AS same_rate,
           ROUND(s.expected_rate, 6) AS expected_rate,
           ROUND((a.n_same * 1.0 / a.n_pairs) / s.expected_rate, 6)
               AS mixing_ratio
    FROM adj a, shares s
    """,
    doc="epoch-ordering mixing audit: adjacent same-source rate under "
    "the md5 interleave order vs the sum-p_i-squared perfect-mixing "
    "expectation; ratio ~1 certifies the shuffle key, >>1 flags "
    "clumping; integer counts exact, rates 6dp",
)
def x_epoch_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch"))),
        "doc_id",
    )
    ordered = docs.select(
        "source", F.lag("source").over(w).alias("prev_source")
    )
    adj = ordered.agg(
        F.count_if(F.col("prev_source").isNotNull()).alias("n_pairs"),
        F.count_if(F.col("prev_source") == F.col("source")).alias("n_same"),
    )
    tot = docs.agg(F.count(F.lit(1)).alias("tot"))
    shares = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(F.pow(F.col("n") * 1.0 / F.col("tot"), 2)).alias("expected_rate"))
    )
    return adj.crossJoin(F.broadcast(shares)).select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("n_same").cast("bigint").alias("n_same"),
        F.round(F.col("n_same") * 1.0 / F.col("n_pairs"), 6).alias("same_rate"),
        F.round("expected_rate", 6).alias("expected_rate"),
        F.round(
            (F.col("n_same") * 1.0 / F.col("n_pairs")) / F.col("expected_rate"), 6
        ).alias("mixing_ratio"),
    )


# --------------------------------------------------------------------------
# x_split_leakage (r8): train/test contamination audit — the classic
# eval-hygiene failure where a doc-id-keyed split puts VERBATIM
# duplicates of the same text on both sides of the train/test fence
# (the reason dedup must precede splitting; Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better" §5).
# Duplicate tier = shared 8-word prefix (the crawl-boilerplate
# fingerprint d_cross_source_dups uses — the fixture has no verbatim
# full-text copies, so the exact tier would audit an always-empty
# set), split = the x_hash_split md5-range convention. Reports, per
# split pair, how many duplicate groups and docs straddle the fence;
# zero means the split is leak-free AT THIS TIER (near-dup tiers
# escalate to d_minhash_lsh / d_semdedup before splitting). One
# prefix-hash aggregate + one tiny self-join of the leaky-group
# frame — integer-exact.
# --------------------------------------------------------------------------
@register(
    "x_split_leakage",
    """
    WITH tagged AS (
        SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS th,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         < 'cccccccc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         < 'e6666666' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    per_group AS (
        SELECT th, split, COUNT(*) AS n FROM tagged GROUP BY 1, 2
    ),
    leaks AS (
        SELECT a.th, a.split AS split_a, b.split AS split_b,
               a.n AS n_a, b.n AS n_b
        FROM per_group a JOIN per_group b
          ON a.th = b.th AND a.split < b.split
    )
    SELECT split_a, split_b,
           CAST(COUNT(*) AS BIGINT) AS n_leaky_groups,
           CAST(COALESCE(SUM(n_a + n_b), 0) AS BIGINT) AS n_docs_involved
    FROM leaks
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="train/test leakage audit: exact-duplicate text groups that "
    "straddle the doc-id hash split (dedup-before-split hygiene, Lee "
    "et al. 2022); per split pair, leaky group + involved doc counts "
    "— zero on a clean corpus; integer-exact",
)
def x_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tagged = hash_split(docs, "doc_id").select(
        F.md5(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
        ).alias("th"),
        "split",
    )
    per_group = tagged.groupBy("th", "split").agg(F.count(F.lit(1)).alias("n"))
    a = per_group.select(
        "th", F.col("split").alias("split_a"), F.col("n").alias("n_a")
    )
    b = per_group.select(
        "th", F.col("split").alias("split_b"), F.col("n").alias("n_b")
    )
    leaks = a.join(b, "th").where(F.col("split_a") < F.col("split_b"))
    return (
        leaks.groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_leaky_groups"),
            F.sum(F.col("n_a") + F.col("n_b")).cast("bigint").alias(
                "n_docs_involved"
            ),
        )
        .orderBy("split_a", "split_b")
    )


# --------------------------------------------------------------------------
# x_reservoir_sample (r9): EXACT-SIZE weighted sampling without
# replacement, per stratum — Efraimidis & Spirakis (IPL 2006) A-Res:
# each row draws key = -ln(u)/w (the exponential race; u uniform,
# w the weight) and the k SMALLEST keys per stratum are the sample,
# which is distributed exactly as sequential weighted draws without
# replacement. Complements the sampling family: x_hash_sample /
# t_weighted_sample are Bernoulli (variable size), x_stratified_sample
# is exact-quota but unweighted; this is exact-quota AND weighted —
# the "give me exactly 50 docs per source, long docs proportionally more
# likely" mix builder.
#
# Determinism & the oracle: u = (md5_32(doc_id) + 0.5) / 2^32 (never
# 0 or 1, bit-identical in any engine with md5 — the repo's seeded-
# uniform idiom); the race key is QUANTIZED to integer nanounits
# (floor(1e9 * ln(u)/-w), ties by doc_id) so a last-ULP ln()
# difference between engines cannot flip the rank-k boundary. One
# top-k-per-group window (W1 shape: partial top-k per partition under
# AQE, no global sort) — at 100 TB this is the same plan as
# w1_topk_per_group.
# --------------------------------------------------------------------------
@register(
    "x_reservoir_sample",
    """
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               CAST(FLOOR(
                   1e9 * LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                            / 4294967296.0)
                   / -GREATEST(n_chars, 1)
               ) AS BIGINT) AS race_key
        FROM documents
    )
    SELECT source, doc_id, n_chars, rank FROM (
        SELECT source, doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY race_key, doc_id) AS BIGINT)
                   AS rank
        FROM keyed)
    WHERE rank <= 10
    """,
    doc="weighted reservoir sample (Efraimidis-Spirakis A-Res): "
    "exactly 10 docs per source, selection probability proportional "
    "to n_chars, without replacement -- exponential race keys from "
    "md5 uniforms, quantized to integer nanounits so the rank-k "
    "boundary is engine-exact; one top-k-per-group window",
)
def x_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        + 0.5
    ) / F.lit(4294967296.0)
    race = F.floor(
        F.lit(1e9) * F.log(u) / -F.greatest(F.col("n_chars"), F.lit(1))
    ).cast("bigint")
    w = Window.partitionBy("source").orderBy(race, "doc_id")
    return (
        docs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
        .select("source", "doc_id", "n_chars", "rank")
    )


# --------------------------------------------------------------------------
# x_benford_audit (r9): first-significant-digit distribution vs
# Benford's law per event type — the classic fabricated-data /
# pipeline-bug screen for positive, scale-spanning measures (Benford
# 1938; Nigrini's audit practice): organically generated magnitudes
# put ~30.1% of leading digits at 1, falling to 4.6% at 9, while
# uniform synthetics (like this fixture's purchase values — the audit
# SHOWS that) and hand-typed numbers don't. One groupBy after a
# column-expression digit extract; the expected shares are 6dp
# LITERALS in both engines (computing log10(1+1/d) at runtime would
# bet the hash on two libms agreeing in the last ULP).
# --------------------------------------------------------------------------
@register(
    "x_benford_audit",
    """
    WITH digits AS (
        SELECT event_type,
               CAST(FLOOR(value / POWER(10, FLOOR(LOG10(value)))) AS INT)
                   AS digit
        FROM events WHERE value > 0
    ),
    expected(digit, exp_share) AS (VALUES
        (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757)
    ),
    counts AS (
        SELECT event_type, digit, COUNT(*) AS n_obs
        FROM digits GROUP BY 1, 2
    ),
    totals AS (
        SELECT event_type, SUM(n_obs) AS total FROM counts GROUP BY 1
    )
    SELECT c.event_type, e.digit,
           CAST(COALESCE(c2.n_obs, 0) AS BIGINT) AS n_obs,
           ROUND(COALESCE(c2.n_obs, 0) * 1.0 / c.total, 6) AS obs_share,
           CAST(e.exp_share AS DOUBLE) AS exp_share,
           ROUND(ABS(COALESCE(c2.n_obs, 0) * 1.0 / c.total
                     - CAST(e.exp_share AS DOUBLE)), 6) AS abs_dev
    FROM totals c
    CROSS JOIN expected e
    LEFT JOIN counts c2
      ON c2.event_type = c.event_type AND c2.digit = e.digit
    ORDER BY c.event_type, e.digit
    """,
    doc="Benford first-digit audit per event type: observed leading-"
    "digit shares vs the 6dp literal Benford expectation (dense 9-"
    "digit grid per type, zero-count digits kept), absolute deviation "
    "6dp -- the fabricated-data / unit-mixup screen for positive "
    "scale-spanning measures",
)
def x_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    digits = ev.select(
        "event_type",
        F.floor(
            F.col("value") / F.pow(F.lit(10.0), F.floor(F.log10("value")))
        )
        .cast("int")
        .alias("digit"),
    )
    counts = digits.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    totals = counts.groupBy("event_type").agg(F.sum("n_obs").alias("total"))
    benford = spark.createDataFrame(
        [
            (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
            (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
            (9, 0.045757),
        ],
        "digit int, exp_share double",
    )
    grid = totals.crossJoin(F.broadcast(benford))
    share = F.coalesce(F.col("n_obs"), F.lit(0)) * 1.0 / F.col("total")
    return (
        grid.join(counts, ["event_type", "digit"], "left")
        .select(
            "event_type",
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            F.round(share, 6).alias("obs_share"),
            "exp_share",
            F.round(F.abs(share - F.col("exp_share")), 6).alias("abs_dev"),
        )
        .orderBy("event_type", "digit")
    )


# --------------------------------------------------------------------------
# x_equidepth_bins (r9): equi-depth (equal-population) binning per
# event type, cut points from the t-digest sketch — the feature-
# engineering / zone-layout form of quantile bucketing (equi-WIDTH
# histograms starve under skew; equi-depth keeps every bucket
# informative). Cuts = digest deciles (operators/tdigest.py: one
# mapInPandas sketch pass, sketch-only shuffle), assignment = a
# broadcast of 9 cuts per type + one column-expression count — no
# second percentile scan of the data. Registered form is the
# bounded-error audit (the w_mad_tdigest idiom): every decile bin's
# population share must sit within 0.02 + 10/n of the ideal 0.10
# (digest rank error is ~1e-3; the slack absorbs ties at cut values
# and small-group discreteness). The oracle reproduces counts and
# the invariant booleans.
# --------------------------------------------------------------------------
@register(
    "x_equidepth_bins",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(10 AS BIGINT) AS n_bins,
           ROUND(quantile_cont(value, 0.1), 6) AS dec_1,
           ROUND(quantile_cont(value, 0.2), 6) AS dec_2,
           ROUND(quantile_cont(value, 0.3), 6) AS dec_3,
           ROUND(quantile_cont(value, 0.4), 6) AS dec_4,
           ROUND(quantile_cont(value, 0.5), 6) AS dec_5,
           ROUND(quantile_cont(value, 0.6), 6) AS dec_6,
           ROUND(quantile_cont(value, 0.7), 6) AS dec_7,
           ROUND(quantile_cont(value, 0.8), 6) AS dec_8,
           ROUND(quantile_cont(value, 0.9), 6) AS dec_9,
           TRUE AS all_bins_present,
           TRUE AS equi_depth_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="equi-depth decile binning per event type with t-digest cut "
    "points (sketch pass + broadcast cuts, no second percentile "
    "scan in the serving shape); hash-gated audit: all 10 bins "
    "populated and every bin share within 0.02 + 10/n of 0.10; "
    "exact decile references dec_1..dec_9 are emitted ROUND(…,6) "
    "and DuckDB-recomputed (quantile_cont == F.percentile except a "
    "1-ulp equal-neighbor interpolation case found at sf0.1 — hence "
    "the symmetric rounding; the yardstick the digest cuts are "
    "audited against)",
)
def x_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.tdigest import (
        group_tdigest_quantiles,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    cuts = (
        group_tdigest_quantiles(
            ev, "event_type", "value",
            qs=tuple(i / 10 for i in range(1, 10)),
        )
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("est")).alias("cuts"))
    )
    binned = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.size(F.filter("cuts", lambda c: c <= F.col("value"))).alias("bin"),
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("nb")
    )
    tol = lambda n: 0.02 + 10.0 / n  # noqa: E731 - digest error + ties
    # Value-oracle upgrade (VERDICT r10 #4): exact decile references,
    # DuckDB-recomputed, ROUND(...,6) on BOTH sides — F.percentile and
    # quantile_cont interpolate with algebraically-equal forms that
    # diverge by 1 ulp when the bracketing neighbors are equal (the
    # r13 sf0.1 find). Fixture-scale audit columns only — the serving
    # shape is digest cuts + broadcast, no exact percentile scan.
    exact_decs = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile(
                "value", F.array(*[F.lit(i / 10) for i in range(1, 10)])
            ).alias("dx")
        )
        .select(
            "event_type",
            # ROUND(…, 6) on BOTH sides (r13): the unrounded refs were
            # pinned on "F.percentile == quantile_cont bit-exact", but
            # the CHECK_sf01_r13 sweep found the exception — when the
            # interpolation NEIGHBORS ARE EQUAL, Spark's
            # lo + frac*(hi-lo) returns lo exactly while DuckDB's
            # convex form can land one ulp low (measured 59.24 vs
            # 59.239999999999995 at sf0.1). 6 dp is far above ulp
            # noise and far below the digest-audit tolerances.
            *[
                F.round(F.element_at("dx", i), 6).alias(f"dec_{i}")
                for i in range(1, 10)
            ],
        )
    )
    return (
        per_bin.groupBy("event_type")
        .agg(
            F.sum("nb").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            (F.max("nb") * 1.0 / F.sum("nb")).alias("max_share"),
            (F.min("nb") * 1.0 / F.sum("nb")).alias("min_share"),
        )
        .join(F.broadcast(exact_decs), "event_type")
        .select(
            "event_type",
            "n",
            "n_bins",
            *[f"dec_{i}" for i in range(1, 10)],
            (F.col("n_bins") == 10).alias("all_bins_present"),
            (
                (F.col("max_share") <= 0.1 + tol(F.col("n")))
                & (F.col("min_share") >= 0.1 - tol(F.col("n")))
            ).alias("equi_depth_ok"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# x_tdigest_rolling (r9): rolling 7-day value quantiles (p50/p95)
# from mergeable per-day t-digests — the quantile sibling of
# x_hll_rolling_distinct's sketch algebra, and the third consumer of
# operators/tdigest.py. Exact rolling percentiles need every (day,
# value) re-buffered per window; the sketch form builds ONE fixed-size
# digest per day (fact table touched once) and unions 7 digests per
# window on the |days|-sized dim — the only shape that survives
# 100 TB of history. Digest estimates aren't SQL-reproducible, so the
# registered form is the self-auditing variant: the exact window
# count (oracle-reproduced) plus rank-interval booleans — each
# estimate's true rank interval among the window's exact values must
# touch its target quantile +/-(0.01 + 1/n) (the w_mad_tdigest audit
# with its small-window discreteness term; at
# 100 TB the exact twin drops and the audit runs on a sample).
# --------------------------------------------------------------------------
@register(
    "x_tdigest_rolling",
    """
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, value FROM events
    ),
    days AS (SELECT DISTINCT day FROM ev)
    SELECT d.day,
           CAST(COUNT(*) AS BIGINT) AS n_7d,
           quantile_cont(e.value, 0.5) AS p50_exact,
           quantile_cont(e.value, 0.95) AS p95_exact,
           TRUE AS p50_rank_ok,
           TRUE AS p95_rank_ok
    FROM days d JOIN ev e
      ON e.day <= d.day AND e.day >= d.day - INTERVAL 6 DAY
    GROUP BY d.day
    ORDER BY d.day
    """,
    doc="rolling 7-day p50/p95 of event value from mergeable per-day "
    "t-digests (one digest per day, 7-way sketch union per window on "
    "the days dim; fact table scanned once) -- self-auditing form: "
    "exact window count + EXACT window p50/p95 references (DuckDB-"
    "recomputed via quantile_cont, bit-exact with F.percentile) + "
    "rank-interval booleans (+/-0.01+1/n) in the hash gate",
)
def x_tdigest_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from listenbrainz_server_spark.operators.tdigest import (
        merge_centroid_sets,
        merge_digests,
        partition_digests,
        quantile_of,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    )
    keyed = ev.select(
        F.date_format("day", "yyyy-MM-dd").alias("dstr"), "value"
    )
    # Pin the per-day digest table ONCE (guide §2.1, r15): it feeds
    # THREE plan branches (the window join's day side, its digest
    # side, and the exact twin's day side) — without a cut the whole
    # events-scan → per-partition digest build → keyed sketch merge
    # re-executed per branch (~0.2 s a pass, 3 of the query's ~3 s).
    # |days| rows of O(delta) centroids — trivially executor-bounded.
    daily = (
        merge_digests(partition_digests(keyed, "dstr", "value"), "dstr")
        .withColumn("day", F.col("dstr").cast("date"))
        .localCheckpoint(eager=True)
    )

    win_cond = (F.col("e.day") <= F.col("d.day")) & (
        F.col("e.day") >= F.date_sub(F.col("d.day"), 6)
    )
    windows = (
        F.broadcast(daily.select("day").alias("d"))
        .join(daily.alias("e"), win_cond)
        .select(
            F.col("d.day").alias("day"),
            F.col("e.means").alias("means"),
            F.col("e.weights").alias("weights"),
        )
    )

    def est_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = merge_centroid_sets(list(pdf["means"]), list(pdf["weights"]))
        return pd.DataFrame(
            {
                "day": [pdf["day"].iloc[0]],
                "est50": [quantile_of(m, w, 0.5)],
                "est95": [quantile_of(m, w, 0.95)],
            }
        )

    est = windows.groupBy("day").applyInPandas(
        est_quantiles, "day date, est50 double, est95 double"
    )

    # Exact twin (fixture-affordable): window-joined raw values give
    # the oracle-reproduced count and the rank intervals of the
    # estimates.
    wf = (
        F.broadcast(daily.select("day").alias("d"))
        .join(ev.alias("e"), win_cond)
        .select(F.col("d.day").alias("day"), F.col("e.value").alias("value"))
        .join(F.broadcast(est), "day")
    )
    n = F.count(F.lit(1))
    return (
        wf.groupBy("day")
        .agg(
            n.cast("bigint").alias("n_7d"),
            # Value-oracle upgrade (VERDICT r10 #4 pattern): the exact
            # window percentiles the digest is audited against are
            # emitted and DuckDB-recomputed (quantile_cont ==
            # F.percentile bit-exact over the identical window join).
            F.percentile("value", F.lit(0.5)).alias("p50_exact"),
            F.percentile("value", F.lit(0.95)).alias("p95_exact"),
            (F.count_if(F.col("value") < F.col("est50")) / n).alias("lo50"),
            (F.count_if(F.col("value") <= F.col("est50")) / n).alias("hi50"),
            (F.count_if(F.col("value") < F.col("est95")) / n).alias("lo95"),
            (F.count_if(F.col("value") <= F.col("est95")) / n).alias("hi95"),
        )
        .select(
            "day",
            "n_7d",
            "p50_exact",
            "p95_exact",
            # tolerance 0.01 + 1/n: early windows hold few values, so
            # a single rank step can exceed a fixed 1% (the
            # w_mad_tdigest discreteness term)
            (
                (F.col("lo50") <= 0.51 + 1.0 / F.col("n_7d"))
                & (F.col("hi50") >= 0.49 - 1.0 / F.col("n_7d"))
            ).alias("p50_rank_ok"),
            (
                (F.col("lo95") <= 0.96 + 1.0 / F.col("n_7d"))
                & (F.col("hi95") >= 0.94 - 1.0 / F.col("n_7d"))
            ).alias("p95_rank_ok"),
        )
        .orderBy("day")
    )
