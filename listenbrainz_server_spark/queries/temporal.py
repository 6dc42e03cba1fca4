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


def _fulfillment_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order fulfillment windows [order date, last ship date]
    (clamped well-formed) for the nation-0 / nation-1 cohorts —
    shared by the exact pair join and the sweep census."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            F.broadcast(
                cust.where(F.col("c_nationkey").isin(0, 1)).select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderkey").alias("k"), F.col("c_nationkey").alias("nat"))
        .agg(
            F.min("o_orderdate").alias("s"),
            # the synthetic fixture does not guarantee ship >= order;
            # clamp so the interval is well-formed (mirrored in SQL)
            F.greatest(F.min("o_orderdate"), F.max("l_shipdate")).alias("e"),
        )
        # Pin (r14 opt): the census sweep reads this frame FIVE times
        # (start events, end events, span, and both day-delta sides)
        # and the overlap join twice — without a cut the 3-table
        # join+agg re-executed per consumer. The pinned frame is one
        # narrow row per qualifying order (cohort-filtered), a small
        # fraction of the input at any scale.
        .localCheckpoint(eager=True)
    )


# --------------------------------------------------------------------------
# j_interval_overlap (r8): interval × interval OVERLAP join — the
# two-sided generalization of j_range_join (point-in-interval) and
# the batch analog of st_interval_join; the genomics/session-overlap
# workhorse (Flink interval join, DuckDB/Trino range-join family).
# Intervals = per-order fulfillment windows [order date, last ship
# date] for two customer cohorts (nation 0 vs nation 1).
#
# Scale shape — the naive theta join is |A|·|B|; instead:
#  * each interval is CHOPPED into the month buckets it covers
#    (F.sequence over truncated dates — bounded explode, interval
#    span / month);
#  * candidates join EQUI on the month bucket (hash join, pushdown-
#    friendly), overlap verified exactly in-candidate;
#  * the classic duplicate problem (a pair overlaps in k shared
#    buckets → reported k times) is solved WITHOUT a distinct
#    shuffle: a pair is emitted only in the bucket that contains
#    GREATEST(a.start, b.start) — the overlap's first month — which
#    each qualifying pair has exactly one of (the emit-once spatial-
#    join trick).
# Output is the per-month overlap census (pair count + total overlap
# days), not the pair list — the audit a scheduler wants. Integer
# counts/days exact.
# --------------------------------------------------------------------------
@register(
    "j_interval_overlap",
    """
    WITH iv AS (
        SELECT o.o_orderkey AS k, c.c_nationkey AS nat,
               MIN(o.o_orderdate) AS s,
               GREATEST(MIN(o.o_orderdate), MAX(l.l_shipdate)) AS e
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_nationkey IN (0, 1)
        GROUP BY 1, 2
    ),
    a AS (SELECT k, s, e FROM iv WHERE nat = 0),
    b AS (SELECT k, s, e FROM iv WHERE nat = 1),
    pairs AS (
        SELECT GREATEST(a.s, b.s) AS os, LEAST(a.e, b.e) AS oe
        FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
    )
    SELECT date_trunc('month', os) AS overlap_month,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(date_diff('day', os, oe) + 1) AS BIGINT)
               AS total_overlap_days
    FROM pairs
    GROUP BY 1
    ORDER BY 1
    """,
    doc="interval-overlap join (order fulfillment windows, nation-0 x "
    "nation-1 cohorts) via month-bucket chop + equi candidates + "
    "exact in-candidate verify, pair emitted ONLY in the bucket of "
    "greatest(start)s so no distinct pass is needed; per-month "
    "pair/overlap-day census, integer-exact. COST IS QUALIFYING-PAIR "
    "BOUND (86x wall at 10x data, SCALING.md -- pairs grow "
    "quadratically with cohort density): the exact lower bound when "
    "the PAIRS are the output; when only the census is needed, "
    "j_overlap_census_sweep computes it in O(n log n)",
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _fulfillment_intervals(spark, sf_dir)
    # Chop each interval into covered month buckets; bounded explode
    # (fulfillment windows span a few months).
    chopped = iv.select(
        "k",
        "nat",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.trunc("s", "month"), F.trunc("e", "month"), F.expr("interval 1 month")
            )
        ).alias("m"),
    )
    # EXPLICIT repartition count: the chopped frames are a few
    # hundred KB, so AQE coalesces the join's exchange to ONE task —
    # which then expands into millions of candidate pairs serially
    # (measured 80 s at sf0.1; 32 explicit partitions, exempt from
    # AQE coalescing, bring it back to seconds — the r6 fan-out
    # lesson).
    a = chopped.where(F.col("nat") == 0).select(
        F.col("k").alias("ak"), F.col("s").alias("as_"), F.col("e").alias("ae"), "m"
    ).repartition(spark.sparkContext.defaultParallelism, "m")
    b = chopped.where(F.col("nat") == 1).select(
        F.col("k").alias("bk"), F.col("s").alias("bs"), F.col("e").alias("be"), "m"
    ).repartition(spark.sparkContext.defaultParallelism, "m")
    overlap = (F.col("as_") <= F.col("be")) & (F.col("bs") <= F.col("ae"))
    first_bucket = F.trunc(F.greatest("as_", "bs"), "month") == F.col("m")
    pairs = a.join(b, "m").where(overlap & first_bucket).select(
        F.greatest("as_", "bs").alias("os"),
        F.least("ae", "be").alias("oe"),
    )
    return (
        pairs.groupBy(F.trunc("os", "month").alias("overlap_month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.datediff("oe", "os") + 1).cast("bigint").alias(
                "total_overlap_days"
            ),
        )
        .orderBy("overlap_month")
    )


# --------------------------------------------------------------------------
# j_overlap_census_sweep (r9): the interval-overlap CENSUS computed
# WITHOUT enumerating pairs — the sf1 smoke measured j_interval_
# overlap at 86x wall for 10x data with its census output FIXED at
# 80 rows (SCALING.md): qualifying pairs grow quadratically with
# cohort density, and any pair-enumerating plan is bound by them.
# When the deliverable is the census (not the pair list), sweep-line
# does it in O(n log n):
#
#  * pairs starting per month — one global event sweep: order all
#    starts/ends by (t, rank, k) with per-time rank (B-starts 0,
#    A-starts 1, ends 2: the rank encodes inclusive-end overlap and
#    the a.s==b.s tie counted exactly once, at the A probe); each
#    START probe reads "how many opposite-cohort intervals are active
#    here" off four running sums. Running sums are DISTRIBUTED
#    (operators/prefix.py: range-partition + per-partition offsets),
#    never a one-task global window.
#  * overlap days per calendar month — the day-dimension sweep:
#    activeA(d) * activeB(d) summed per month. The day dimension is
#    bounded by the calendar horizon (~2.5k rows here), NOT by data
#    volume, so its running sum is a legitimately tiny single window
#    at any corpus scale.
#
# Census semantics differ deliberately from j_interval_overlap's
# (which attributes a pair's TOTAL overlap days to the month the
# overlap starts): this one reports overlap days IN each calendar
# month — the per-month concurrent-load view a capacity planner
# wants, and the decomposition that makes the sweep exact. The pair-
# enumerating join remains the serving form when the pairs themselves
# are the output.
# --------------------------------------------------------------------------
@register(
    "j_overlap_census_sweep",
    """
    WITH iv AS (
        SELECT o.o_orderkey AS k, c.c_nationkey AS nat,
               MIN(o.o_orderdate) AS s,
               GREATEST(MIN(o.o_orderdate), MAX(l.l_shipdate)) AS e
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_nationkey IN (0, 1)
        GROUP BY 1, 2
    ),
    a AS (SELECT k, s, e FROM iv WHERE nat = 0),
    b AS (SELECT k, s, e FROM iv WHERE nat = 1),
    pairs AS (
        SELECT GREATEST(a.s, b.s) AS os, LEAST(a.e, b.e) AS oe
        FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
    ),
    startc AS (
        SELECT CAST(date_trunc('month', os) AS DATE) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_pairs_starting
        FROM pairs GROUP BY 1
    ),
    chop AS (
        SELECT CAST(UNNEST(generate_series(
                   date_trunc('month', os), date_trunc('month', oe),
                   INTERVAL 1 MONTH)) AS DATE) AS m,
               os, oe
        FROM pairs
    ),
    dayc AS (
        SELECT m,
               CAST(SUM(date_diff('day', GREATEST(os, m),
                                  LEAST(oe, last_day(m))) + 1) AS BIGINT)
                   AS overlap_days
        FROM chop GROUP BY m
    )
    SELECT COALESCE(s.m, d.m) AS month,
           COALESCE(s.n_pairs_starting, 0) AS n_pairs_starting,
           COALESCE(d.overlap_days, 0) AS overlap_days
    FROM startc s FULL OUTER JOIN dayc d ON s.m = d.m
    ORDER BY month
    """,
    doc="interval-overlap census via sweep-line, NO pair enumeration: "
    "pairs-starting per month from distributed running sums over the "
    "start/end event order (rank encodes inclusive ends + the equal-"
    "start tie), overlap days per calendar month from the bounded "
    "day-dimension concurrency product activeA(d)*activeB(d); the "
    "O(n log n) scale path for the census j_interval_overlap pays "
    "qualifying-pair cost for (86x at 10x data, SCALING.md); oracle "
    "verifies against full pair enumeration",
)
def j_overlap_census_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.prefix import (
        partitioned_running_sum,
    )

    iv = _fulfillment_intervals(spark, sf_dir)

    # ---- Sweep 1: pairs starting per month (row-scale, distributed).
    is_a = F.col("nat") == 0
    starts = iv.select(
        F.col("s").alias("t"),
        F.when(is_a, F.lit(1)).otherwise(F.lit(0)).alias("rank"),
        "k",
        F.when(is_a, 1).otherwise(0).alias("da_s"),
        F.when(is_a, 0).otherwise(1).alias("db_s"),
        F.lit(0).alias("da_e"),
        F.lit(0).alias("db_e"),
    )
    ends = iv.select(
        F.col("e").alias("t"),
        F.lit(2).alias("rank"),
        "k",
        F.lit(0).alias("da_s"),
        F.lit(0).alias("db_s"),
        F.when(is_a, 1).otherwise(0).alias("da_e"),
        F.when(is_a, 0).otherwise(1).alias("db_e"),
    )
    events = starts.unionByName(ends)
    swept = partitioned_running_sum(
        events,
        order_cols=["t", "rank", "k"],
        value_cols=["da_s", "db_s", "da_e", "db_e"],
    )
    # A-start probe (rank 1) sees active B = started(<=row) - ended
    # (<row: B-ends at the same t order at rank 2, after the probe, so
    # inclusive ends are honored); B-start probe (rank 0) sees active
    # A with strictly-earlier starts (A-starts at the same t rank 1).
    new_pairs = swept.where(F.col("rank") < 2).select(
        F.trunc("t", "month").alias("month"),
        F.when(
            F.col("rank") == 1, F.col("cum_db_s") - F.col("cum_db_e")
        ).otherwise(F.col("cum_da_s") - F.col("cum_da_e")).alias("np"),
    )
    startc = new_pairs.groupBy("month").agg(
        F.sum("np").cast("bigint").alias("n_pairs_starting")
    ).where(F.col("n_pairs_starting") > 0)

    # ---- Sweep 2: day-dimension concurrency (bounded by calendar).
    span = iv.agg(F.min("s").alias("lo"), F.max("e").alias("hi"))
    days = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    deltas = (
        iv.select(
            F.col("s").alias("d"),
            F.when(is_a, 1).otherwise(0).alias("dda"),
            F.when(is_a, 0).otherwise(1).alias("ddb"),
        )
        .unionByName(
            iv.select(
                F.date_add("e", 1).alias("d"),
                F.when(is_a, -1).otherwise(0).alias("dda"),
                F.when(is_a, 0).otherwise(-1).alias("ddb"),
            )
        )
        .groupBy("d")
        .agg(F.sum("dda").alias("dda"), F.sum("ddb").alias("ddb"))
    )
    from pyspark.sql import Window

    w_day = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    conc = (
        days.join(deltas, "d", "left")
        .select(
            "d",
            F.coalesce("dda", F.lit(0)).alias("dda"),
            F.coalesce("ddb", F.lit(0)).alias("ddb"),
        )
        .select(
            "d",
            F.sum("dda").over(w_day).alias("act_a"),
            F.sum("ddb").over(w_day).alias("act_b"),
        )
    )
    dayc = (
        conc.groupBy(F.trunc("d", "month").alias("month"))
        .agg(
            F.sum(F.col("act_a") * F.col("act_b")).cast("bigint").alias(
                "overlap_days"
            )
        )
        .where(F.col("overlap_days") > 0)
    )

    return (
        startc.join(dayc, "month", "full_outer")
        .select(
            "month",
            F.coalesce("n_pairs_starting", F.lit(0)).cast("bigint").alias(
                "n_pairs_starting"
            ),
            F.coalesce("overlap_days", F.lit(0)).cast("bigint").alias(
                "overlap_days"
            ),
        )
        .orderBy("month")
    )
