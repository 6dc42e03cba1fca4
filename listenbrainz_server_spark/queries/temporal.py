"""Temporal-join queries: as-of join and bucketized range join over
the events table (operators/asof.py). DuckDB verifies the as-of with
its native ASOF JOIN — an independent implementation of the same
semantics, so agreement is a strong check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.operators.asof import asof_join, range_join_bucketed
from listenbrainz_server_spark.queries import register


# --------------------------------------------------------------------------
# As-of join: each click matched to the user's latest purchase at or
# before the click. Union-tag sweep (one shuffle), never a per-key
# nested loop.
# --------------------------------------------------------------------------
@register(
    "j_asof_join",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts, ROUND(MAX(value), 2) AS purch_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, p.purch_value, p.ts AS asof_ts
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="as-of join: latest purchase at-or-before each click per user "
    "(union-tag sweep vs DuckDB native ASOF JOIN)",
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purch_value"))
    )
    return asof_join(
        clicks,
        purch,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["purch_value"],
    ).select("event_id", "user_id", "purch_value", "asof_ts")


# --------------------------------------------------------------------------
# Range join: clicks falling inside [signup, signup + 2h) windows of
# the same user, counted per signup — bucketized equi join (1-hour
# buckets), the inequality only as a residual filter.
# --------------------------------------------------------------------------
@register(
    "j_range_join",
    """
    WITH signups AS (
        SELECT event_id AS signup_id, user_id, ts AS w_start,
               ts + INTERVAL 2 HOUR AS w_end
        FROM events WHERE event_type = 'signup'
    ),
    clicks AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT s.signup_id, s.user_id, COUNT(c.ts) AS n_clicks
    FROM signups s JOIN clicks c
      ON c.user_id = s.user_id AND c.ts >= s.w_start AND c.ts < s.w_end
    GROUP BY 1, 2
    """,
    doc="range join: clicks within 2h after each signup, bucketized "
    "equi join (never |L|x|R|)",
)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = range_join_bucketed(
        clicks,
        signups,
        keys=["user_id"],
        left_ts="ts",
        right_start="w_start",
        right_end="w_end",
        bucket_seconds=3600,
    )
    return joined.groupBy("signup_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )


# --------------------------------------------------------------------------
# Numeric BAND JOIN — the |a.x − b.x| <= eps theta-join family
# (Snowflake band joins, DuckDB IEJoin territory), done scalably via
# value bucketization: each left row probes buckets {b−1, b, b+1}
# (explode of three keys), the right side sits at floor(x/eps), and
# the inequality survives only as a residual filter — candidate
# volume is band occupancy, never |L|×|R|. A pair meets exactly once
# (the right row's bucket is a function of its value), so no dedup
# pass. The ORACLE is the naive theta-join — an independent
# construction of the same semantics, so agreement checks the
# bucketization itself. Here: pairs of users with near-equal total
# purchase spend (the matched-cohort build for A/B analyses).
# --------------------------------------------------------------------------
@register(
    "j_band_join",
    """
    WITH spend AS (
        SELECT user_id, ROUND(SUM(value), 2) AS sp
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           a.sp AS spend_a, b.sp AS spend_b,
           ROUND(ABS(a.sp - b.sp), 2) AS diff
    FROM spend a JOIN spend b
      ON a.user_id < b.user_id AND ABS(a.sp - b.sp) <= 1.0
    """,
    doc="numeric band join: user pairs with total purchase spend "
    "within 1.0 (bucketized band self-join vs the oracle's naive "
    "theta join)",
)
def j_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    eps = 1.0
    ev = load_table(spark, sf_dir, "events")
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("sp"))
    )
    bucket = F.floor(F.col("sp") / F.lit(eps))
    left = spend.select(
        F.col("user_id").alias("user_a"),
        F.col("sp").alias("spend_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("_bk"),
    )
    right = spend.select(
        F.col("user_id").alias("user_b"),
        F.col("sp").alias("spend_b"),
        bucket.alias("_bk"),
    )
    return (
        left.join(right, "_bk")
        .where(
            (F.col("user_a") < F.col("user_b"))
            & (F.abs(F.col("spend_a") - F.col("spend_b")) <= eps)
        )
        .select(
            "user_a",
            "user_b",
            "spend_a",
            "spend_b",
            F.round(F.abs(F.col("spend_a") - F.col("spend_b")), 2).alias("diff"),
        )
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time dimension join — the warehouse temporal pattern:
# the dimension's history is materialized as validity intervals
# (type-2 rows: valid_from = change ts, valid_to = next change via
# one per-key lead window, open tail closed with a far sentinel), and
# facts join to the dimension row whose interval contains the fact
# timestamp. Here the "dimension" is each user's spend tier, re-
# derived at every purchase; facts are all non-purchase events. The
# physical join is the bucketized interval equi join (never |L|x|R|);
# the SCD2 build is one keyed window over the (small) change stream.
# --------------------------------------------------------------------------
@register(
    "j_scd2_join",
    """
    WITH horizon AS (
        SELECT MAX(ts) + INTERVAL 1 SECOND AS h FROM events
    ),
    dim AS (
        SELECT user_id,
               CASE WHEN value >= 15 THEN 'gold'
                    WHEN value >= 5 THEN 'silver'
                    ELSE 'bronze' END AS tier,
               ts AS valid_from,
               COALESCE(LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                        (SELECT h FROM horizon)) AS valid_to
        FROM events WHERE event_type = 'purchase'
    ),
    facts AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type <> 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts, d.tier, d.valid_from
    FROM facts f JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts >= d.valid_from AND f.ts < d.valid_to
    """,
    doc="SCD2 join: type-2 validity intervals from the change stream "
    "(lead window), facts matched point-in-time via bucketized "
    "interval join",
)
def j_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # Open-tail sentinel = data horizon, NOT a far-future constant: the
    # bucketized join explodes each interval into every bucket it
    # overlaps, so a year-2100 sentinel would fan the open rows into
    # tens of thousands of buckets. Horizon-clamping keeps the fan-out
    # proportional to actual history.
    horizon = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("_h")
    )
    dim = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(F.col("value") >= 15, "gold")
            .when(F.col("value") >= 5, "silver")
            .otherwise("bronze")
            .alias("tier"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
        .crossJoin(F.broadcast(horizon))
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(
                    Window.partitionBy("user_id").orderBy("valid_from", "event_id")
                ),
                F.col("_h"),
            ),
        )
        .drop("event_id", "_h")
    )
    facts = ev.where(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = range_join_bucketed(
        facts,
        dim,
        keys=["user_id"],
        left_ts="ts",
        right_start="valid_from",
        right_end="valid_to",
        bucket_seconds=86400,
    )
    return joined.select("event_id", "user_id", "ts", "tier", "valid_from")


# --------------------------------------------------------------------------
# Forward as-of with staleness tolerance — the attribution direction:
# each click matched to the user's NEXT purchase within 24 h (NULL
# when none follows in time). Same union-tag sweep as j_asof_join,
# scanned in descending time; the tolerance bound is what keeps the
# report honest (an unbounded forward match attributes a purchase
# weeks later to this click). DuckDB oracle uses native ASOF with the
# flipped inequality + a tolerance filter.
# --------------------------------------------------------------------------
@register(
    "j_asof_forward",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts, ROUND(MAX(value), 2) AS purch_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    matched AS (
        SELECT c.event_id, c.user_id, p.purch_value, p.ts AS asof_ts, c.ts
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id,
           CASE WHEN asof_ts <= ts + INTERVAL 24 HOUR
                THEN purch_value END AS purch_value,
           CASE WHEN asof_ts <= ts + INTERVAL 24 HOUR
                THEN asof_ts END AS asof_ts
    FROM matched
    """,
    doc="forward as-of join: next purchase within 24h after each "
    "click (descending union-tag sweep + staleness tolerance)",
)
def j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purch_value"))
    )
    return asof_join(
        clicks,
        purch,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["purch_value"],
        tolerance_seconds=24 * 3600,
        direction="forward",
    ).select("event_id", "user_id", "purch_value", "asof_ts")


# --------------------------------------------------------------------------
# Nearest as-of — the sensor-alignment direction (pandas merge_asof
# direction="nearest", kdb aj closest): each click matched to the
# purchase CLOSEST in time either side, within 12 h, backward winning
# exact-distance ties. One union-tag stream, both sweeps (same
# partition key -> one Exchange, two sorts). DuckDB's ASOF has no
# nearest mode, so the oracle derives it from the two native
# directions + a row_number over (within-tolerance DESC, distance,
# side) — an independent construction of the same total order, which
# doubles as a cross-check of the choose-nearest logic itself.
# --------------------------------------------------------------------------
@register(
    "j_asof_nearest",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts, ROUND(MAX(value), 2) AS purch_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    bwd AS (
        SELECT c.event_id, c.user_id, c.ts, p.purch_value, p.ts AS asof_ts,
               0 AS side
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    fwd AS (
        SELECT c.event_id, c.user_id, c.ts, p.purch_value, p.ts AS asof_ts,
               1 AS side
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    ),
    ranked AS (
        SELECT event_id, user_id, purch_value, asof_ts,
               (asof_ts IS NOT NULL
                AND ABS(EPOCH(ts) - EPOCH(asof_ts)) <= 43200) AS ok,
               ROW_NUMBER() OVER (
                   PARTITION BY event_id
                   ORDER BY (asof_ts IS NOT NULL
                             AND ABS(EPOCH(ts) - EPOCH(asof_ts)) <= 43200) DESC,
                            ABS(EPOCH(ts) - EPOCH(asof_ts)),
                            side) AS rn
        FROM (SELECT * FROM bwd UNION ALL SELECT * FROM fwd)
    )
    SELECT event_id, user_id,
           CASE WHEN ok THEN purch_value END AS purch_value,
           CASE WHEN ok THEN asof_ts END AS asof_ts
    FROM ranked WHERE rn = 1
    """,
    doc="nearest as-of join: closest purchase either side of each "
    "click within 12h, backward wins ties (dual union-tag sweep vs a "
    "DuckDB two-direction + row_number reconstruction)",
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purch_value"))
    )
    return asof_join(
        clicks,
        purch,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["purch_value"],
        tolerance_seconds=12 * 3600,
        direction="nearest",
    ).select("event_id", "user_id", "purch_value", "asof_ts")
