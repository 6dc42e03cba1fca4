"""Streaming-semantics queries, oracle-checked in batch mode.

The transformations in streaming/jobs.py are mode-agnostic; here they
run as batch DataFrames so DuckDB can verify the semantics
(tests/test_streaming.py separately proves stream-mode ≡ batch-mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.queries import register
from listenbrainz_server_spark.streaming.jobs import (
    session_aggregate,
    sliding_trending,
    windowed_counts,
)

# st_session_cdc changelog slice count (trigger dial — see the query).
_CDC_SLICES = 2


# --------------------------------------------------------------------------
# Sliding-window trending top-k — the overlapping-window rank report
# (trending hashtags/entities): each event lands in window/slide
# overlapping windows; the rank orders the count-REDUCED frame per
# window, never raw events. Oracle replicates the overlap explode
# with a 2-element UNNEST (2h window, 1h slide -> every event is in
# exactly two windows).
# --------------------------------------------------------------------------
@register(
    "st_sliding_trending",
    """
    WITH ex AS (
        SELECT event_type,
               UNNEST([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                       date_trunc('hour', ts)]) AS w_start
        FROM events
    ),
    counts AS (
        SELECT w_start, event_type, COUNT(*) AS n
        FROM ex GROUP BY 1, 2
    )
    SELECT w_start, event_type, n, rank FROM (
        SELECT w_start, event_type, n,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY w_start
                   ORDER BY n DESC, event_type) AS BIGINT) AS rank
        FROM counts)
    WHERE rank <= 3
    """,
    doc="sliding-window trending top-3 event types (2h window / 1h "
    "slide overlap explode, rank over the count-reduced frame; "
    "Structured Streaming shape, batch-checked)",
)
def st_sliding_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_trending(
        ev, "ts", "event_type", window="2 hours", slide="1 hour", top_k=3
    )


# --------------------------------------------------------------------------
# Tumbling event-time windows (watermarked in stream mode).
# --------------------------------------------------------------------------
@register(
    "st_windowed_counts",
    """
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="event-time tumbling-window counts (Structured Streaming shape, batch-checked)",
)
def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = windowed_counts(ev, "ts", ["event_type"], window="1 hour")
    return out.select(
        F.col("w.start").alias("w_start"),
        "event_type",
        "n",
        F.round("total_value", 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Native session windows: merge-within-gap semantics (session breaks
# when the next event is >= gap after the previous one).
# --------------------------------------------------------------------------
@register(
    "st_session_window",
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
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    doc="session_window aggregation (applyInPandasWithState-class semantics, batch-checked)",
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = session_aggregate(ev, "ts", "user_id", gap="30 minutes")
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    )


# --------------------------------------------------------------------------
# Streaming exact dedup (dropDuplicatesWithinWatermark in stream mode,
# dropDuplicates in batch): at-least-once delivery is simulated by
# unioning exact copies of every 5th event — identical rows, so the
# surviving representative is deterministic and the result must equal
# the original table. Stream≡batch equivalence is proven in
# tests/test_streaming.py::test_stream_dedup_stream_equals_batch.
# --------------------------------------------------------------------------
@register(
    "st_stream_dedup",
    "SELECT event_id, user_id, event_type FROM events",
    doc="streaming exact dedup of an at-least-once append log "
    "(dropDuplicatesWithinWatermark; ON CONFLICT identity analog)",
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.streaming.jobs import stream_dedup

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    redelivered = ev.unionByName(ev.where(F.col("event_id") % 5 == 0))
    return stream_dedup(redelivered, ["event_id"], "ts").select(
        "event_id", "user_id", "event_type"
    )


# --------------------------------------------------------------------------
# foreachBatch aggregate-state sink, driven end to end: the events
# table streams through read_parquet_stream, each micro-batch combines
# into a Parquet state dir (UNION ALL + re-GROUP BY + atomic swap),
# and the final state is returned. Oracle = the plain batch aggregate
# — the stream must land exactly there.
# --------------------------------------------------------------------------
@register(
    "st_foreach_batch",
    """
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    """,
    doc="foreachBatch incremental upsert sink (partial+combine per "
    "micro-batch, atomic swap), state compared against batch aggregate",
)
def st_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.streaming.jobs import (
        foreach_batch_upsert,
        read_parquet_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # The file stream source monitors a DIRECTORY (an append log);
    # stage the single-file table as one, split so several
    # micro-batches actually exercise the combine.
    root = tempfile.mkdtemp(prefix="st_fb_")
    log_dir, state = root + "/log", root + "/agg"
    ev.repartition(4).write.mode("overwrite").parquet(log_dir)
    # max_files=2 -> two triggers: the second still merges into
    # EXISTING state, so the combine path stays genuinely multi-batch
    # at half the per-trigger overhead (r14 A/B; the additive
    # partial+combine is batch-split-invariant — the same property
    # st_trending_ranked's dial comment pins for LWW).
    stream = read_parquet_stream(
        spark, log_dir, spark.read.parquet(log_dir).schema, max_files=2
    ).withColumn("n", F.lit(1).cast("bigint"))
    foreach_batch_upsert(stream, state, keys=["user_id"], sum_cols=["n"])
    return spark.read.parquet(state)


# --------------------------------------------------------------------------
# Last-write-wins streaming MERGE (the replace-semantics sibling of
# st_foreach_batch's additive combine): the state materializes the
# LATEST event per user across micro-batches — the streaming form of
# the reference's registry upsert (S14, listens/dump.py:188-208) and
# the standard CDC "current snapshot" sink. Argmax over state ∪ batch,
# so out-of-order batches can't clobber newer state and replays are
# idempotent. Oracle = batch argmax per user.
# --------------------------------------------------------------------------
@register(
    "st_upsert_latest",
    """
    SELECT user_id, event_id, event_type
    FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    doc="foreachBatch last-write-wins MERGE sink: latest event per user "
    "across micro-batches (CDC current-snapshot / S14 registry shape), "
    "state compared against the batch argmax",
)
def st_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.streaming.jobs import (
        foreach_batch_merge_latest,
        read_parquet_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    root = tempfile.mkdtemp(prefix="st_lww_")
    log_dir, state = root + "/log", root + "/state"
    ev.repartition(4).write.mode("overwrite").parquet(log_dir)
    # max_files=2: two triggers keep the merge-into-existing-state path
    # live at half the trigger cost (r14 A/B) — argmax over
    # state ∪ batch is batch-split-invariant (the property
    # st_replay_idempotent pins end to end).
    stream = read_parquet_stream(
        spark, log_dir, spark.read.parquet(log_dir).schema, max_files=2
    )
    foreach_batch_merge_latest(
        stream, state, keys=["user_id"], order_cols=["ts", "event_id"]
    )
    return spark.read.parquet(state).select("user_id", "event_id", "event_type")


# --------------------------------------------------------------------------
# In-stream RANKED trending (VERDICT r7 #4): st_sliding_trending's
# streaming branch returns only the stateful (w, key, n) stage because
# row_number is unsupported on streams; trending_rank_sink closes the
# loop by ranking inside a foreachBatch sink (the st_upsert_latest
# LWW-merge pattern, order_cols=[n] — counts are monotone so argmax-n
# is latest-wins). This entry drives the FULL streaming job — parquet
# append log → stateful windowed counts → rank-and-upsert sink — and
# returns the ranked state, which the oracle (identical to
# st_sliding_trending's) must reproduce exactly.
# --------------------------------------------------------------------------
@register(
    "st_trending_ranked",
    """
    WITH ex AS (
        SELECT event_type,
               UNNEST([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                       date_trunc('hour', ts)]) AS w_start
        FROM events
    ),
    counts AS (
        SELECT w_start, event_type, COUNT(*) AS n
        FROM ex GROUP BY 1, 2
    )
    SELECT w_start, event_type, n, rank FROM (
        SELECT w_start, event_type, n,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY w_start
                   ORDER BY n DESC, event_type) AS BIGINT) AS rank
        FROM counts)
    WHERE rank <= 3
    """,
    doc="in-stream ranked trending top-3: foreachBatch rank-and-upsert "
    "sink over the stateful sliding-window counts (LWW merge on "
    "monotone counts, rank over the count-reduced state, atomic swap); "
    "the drained ranked state must equal the batch report",
)
def st_trending_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.streaming.jobs import (
        read_parquet_stream,
        trending_rank_sink,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    root = tempfile.mkdtemp(prefix="st_trend_")
    log_dir = root + "/log"
    counts_path, ranked_path = root + "/counts", root + "/ranked"
    ev.repartition(4).write.mode("overwrite").parquet(log_dir)
    # max_files=2 -> two triggers: still a genuine multi-batch run
    # (the second trigger merges into EXISTING ranked state), at half
    # the per-trigger state-store + swap cost (A/B at sf0.1: 4
    # triggers 5.1 s, 2 triggers 2.8 s, identical 2163-row output --
    # LWW on monotone counts is batch-split-invariant, which is
    # exactly the property tests/test_streaming.py pins).
    stream = read_parquet_stream(
        spark, log_dir, spark.read.parquet(log_dir).schema, max_files=2
    )
    # watermark=None: the parquet log replays in ARBITRARY event-time
    # order (repartition(4)), so any finite watermark would evict
    # state and drop legitimately-replayed rows — the availableNow
    # drain bounds state instead. A live ingest (roughly time-ordered)
    # passes a real watermark; tests/test_streaming.py pins that form.
    # state_partitions=8: state is |windows × event_types| (~hundreds
    # of rows) — the store's per-trigger commit cost tracks partition
    # count, and the exchange feeding it carries only map-side partials
    # (see state_partition_conf). Measured 8.5 → 5.2 s at 4 triggers.
    trending_rank_sink(
        stream, "ts", "event_type", counts_path, ranked_path, top_k=3,
        watermark=None, state_partitions=8,
    )
    return spark.read.parquet(ranked_path).select(
        "w_start", "event_type", "n", "rank"
    )


# --------------------------------------------------------------------------
# Custom stateful streaming operator, driven end to end:
# applyInPandasWithState keeps running per-user (count, sum) state
# across micro-batches (update mode emits a row per key per trigger);
# the LAST emission per user must equal the batch aggregate. The one
# genuinely non-SQL streaming op in the engine — still oracle-checked,
# because its converged output is batch-expressible.
# --------------------------------------------------------------------------
@register(
    "st_stateful_totals",
    """
    SELECT user_id, COUNT(*) AS total_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="applyInPandasWithState running per-user totals across "
    "micro-batches; final state compared against the batch aggregate",
)
def st_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.streaming.jobs import read_parquet_stream
    from listenbrainz_server_spark.streaming.stateful import running_user_totals

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    root = tempfile.mkdtemp(prefix="st_state_")
    log_dir = root + "/log"
    ev.repartition(4).write.mode("overwrite").parquet(log_dir)

    stream = read_parquet_stream(
        spark, log_dir, spark.read.parquet(log_dir).schema, max_files=2
    )
    sink_name = "st_stateful_totals_sink"
    from listenbrainz_server_spark.streaming.jobs import state_partition_conf

    # applyInPandasWithState ships full rows to the state partitioning
    # (no partial agg), so the count must cover the Python stage too:
    # 150 user keys / 8 partitions ≈ 19 keys per Arrow task, vs 32
    # near-empty tasks paying per-trigger store commits.
    with state_partition_conf(spark, 8):
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("update")
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    # Update mode appends one row per key per trigger; the final state
    # per user is the one with the largest running count (monotonic).
    emitted = spark.table(sink_name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("total_events").desc())
    return (
        emitted.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            "user_id",
            "total_events",
            F.round("total_value", 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Streaming corpus quality gate: the d_clean_corpus admission filter
# as an ingest-time stream stage. Stateless (pure column expression),
# so a 100 TB crawl firehose sheds junk before any stateful stage pays
# shuffle or state store for it. Oracle-checked here in batch form
# (per-source pass/fail funnel); stream-mode ≡ batch-mode proven in
# tests/test_streaming.py::test_quality_gate_stream_equals_batch.
# --------------------------------------------------------------------------
@register(
    "st_quality_gate",
    """
    WITH toksq AS (
        SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    uni AS (
        SELECT doc_id, source, w, COUNT(*) AS n
        FROM (SELECT doc_id, source, unnest(ws) AS w FROM toksq)
        GROUP BY 1, 2, 3
    ),
    per_doc AS (
        SELECT doc_id, source, SUM(n) AS total, MAX(n) AS topn
        FROM uni GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) FILTER (WHERE total >= 20 AND topn * 1.0 / total <= 0.25)
               AS n_pass,
           COUNT(*) FILTER (WHERE NOT (total >= 20 AND topn * 1.0 / total <= 0.25))
               AS n_fail
    FROM per_doc GROUP BY source
    """,
    doc="streaming-ingest quality gate (stateless filter stage): "
    "per-source pass/fail counts of the d_clean_corpus admission gate",
)
def st_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.functions.text import quality_flag

    docs = load_table(spark, sf_dir, "documents")
    flag = quality_flag(F.col("text"))
    return docs.groupBy("source").agg(
        F.count(F.when(flag, True)).alias("n_pass"),
        F.count(F.when(~flag, True)).alias("n_fail"),
    )


# --------------------------------------------------------------------------
# Stream-stream interval join (attribution shape): each click pairs
# with the same user's purchases within the following hour. Batch mode
# is oracle-checked here; stream-mode ≡ batch-mode with bounded state
# is proven in tests/test_streaming.py::test_interval_join_stream_equals_batch.
# --------------------------------------------------------------------------
@register(
    "st_interval_join",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_sec
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="stream-stream interval join: click -> purchase attribution "
    "within 1 hour (watermark-bounded state in stream mode)",
)
def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.streaming.jobs import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    out = interval_join(
        clicks, purchases, key=("user_id", "p_user_id"),
        left_ts="c_ts", right_ts="p_ts", upper="1 hour",
    )
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("delay_sec"),
    )


# --------------------------------------------------------------------------
# LEFT OUTER stream-stream interval join: every click is emitted —
# attributed clicks carry their purchase, unattributed ones a NULL
# purchase (the conversion-funnel report needs both). Outer emission
# is watermark-driven in stream mode; batch mode (here) is the
# converged answer and the oracle.
# --------------------------------------------------------------------------
@register(
    "st_interval_join_outer",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_sec,
           (p.event_id IS NULL) AS unattributed
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="LEFT OUTER stream-stream interval join: clicks with their "
    "in-window purchase or NULL (watermark-driven unmatched emission "
    "in stream mode)",
)
def st_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.streaming.jobs import interval_join_outer

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    out = interval_join_outer(
        clicks, purchases, key=("user_id", "p_user_id"),
        left_ts="c_ts", right_ts="p_ts", upper="1 hour",
    )
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("delay_sec"),
        F.col("purchase_id").isNull().alias("unattributed"),
    )


# --------------------------------------------------------------------------
# Watermark sizing — the out-of-orderness profile that decides a
# streaming job's watermark delay: treating the monotone ingest id
# (event_id) as arrival order, lateness(e) = max event-time seen so
# far in the user's arrival stream minus e's own event time. Per-user
# report: event count, worst lateness, and how many events a 5-minute
# watermark would have dropped. One user-keyed window (arrival-order
# running max) + one keyed agg — the same partitioning both stages,
# single exchange. Pure integer microsecond arithmetic on both
# engines, so the verdict is exact.
# --------------------------------------------------------------------------
@register(
    "st_watermark_sizing",
    """
    WITH arr AS (
        SELECT user_id, event_id, ts,
               MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_max
        FROM events
    ),
    late AS (
        SELECT user_id,
               epoch_us(run_max) - epoch_us(ts) AS late_us
        FROM arr
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_late_s,
           CAST(COUNT(*) FILTER (late_us > 300000000) AS BIGINT)
               AS dropped_by_5m_watermark
    FROM late
    GROUP BY user_id
    """,
    doc="watermark sizing: per-user arrival-order lateness profile "
    "(worst lateness + events a 5-minute watermark would drop)",
)
def st_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        "user_id",
        (
            F.unix_micros(F.max("ts").over(w)) - F.unix_micros("ts")
        ).alias("late_us"),
    )
    return late.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(F.max("late_us") / 1000000).cast("bigint").alias("max_late_s"),
        F.sum((F.col("late_us") > 300000000).cast("bigint")).alias(
            "dropped_by_5m_watermark"
        ),
    )


# --------------------------------------------------------------------------
# Time-decay weighted popularity: listen counts where each event
# contributes exp(-age/30d) relative to the corpus anchor (latest
# event) — the recency-aware variant of popularity.popularity. A
# single map-side-combinable agg; the anchor is a 1-row broadcast.
# Ages derive from integer microsecond arithmetic so both engines
# exponentiate identical doubles; the 4dp round absorbs libm ulp
# differences in exp().
# --------------------------------------------------------------------------
@register(
    "a_decayed_popularity",
    """
    WITH a AS (SELECT max(ts) AS anchor FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(EXP(-((epoch_us(a.anchor) - epoch_us(ts))
                           / 86400000000.0) / 30.0)), 4) AS decayed_count
    FROM events, a
    GROUP BY event_type
    """,
    doc="time-decay weighted popularity: per-entity sum of "
    "exp(-age/30d) relative to the latest-event anchor",
)
def a_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("anchor"))
    age_days = (
        F.unix_micros("anchor") - F.unix_micros("ts")
    ) / 86400000000.0
    return (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.exp(-age_days / 30.0)), 4).alias("decayed_count"),
        )
    )


# --------------------------------------------------------------------------
# st_cdc_merge (r8): streaming CDC apply WITH RETRACTIONS — the
# Flink-upsert-stream / Delta-streaming-MERGE shape, and the streaming
# sibling of i_cdc_merge (same declared changelog derivation, same
# final state; tests pin stream ≡ batch).
#
# Composition, not a new sink: the base snapshot is pre-seeded into
# the state, the RAW changelog (every change row, not pre-compacted)
# streams through foreach_batch_merge_latest's LWW merge keyed on
# custkey with (o_orderdate, o_orderkey) as the version — and deletes
# are just rows whose op payload is 'D'. The tombstone is STORED with
# its version rather than dropping the key: an out-of-order or
# replayed micro-batch carrying an older 'U' therefore cannot
# resurrect a deleted key (argmax semantics), which is the part naive
# "delete matched keys" merges get wrong. The read view filters
# op <> 'D'. State is O(|keys|), per-batch work is O(|batch| + |state|)
# keyed exchanges, and every batch is idempotent under replay.
# --------------------------------------------------------------------------
@register(
    "st_cdc_merge",
    """
    WITH base AS (
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM (
            SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate < DATE '1997-01-01'
        ) WHERE rn = 1
    ),
    latest AS (
        SELECT o_custkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
               o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate >= DATE '1997-01-01'
        ) WHERE rn = 1
    )
    SELECT COALESCE(b.o_custkey, c.o_custkey) AS custkey,
           COALESCE(c.o_orderkey, b.o_orderkey) AS last_orderkey,
           ROUND(COALESCE(c.o_totalprice, b.o_totalprice), 6)
               AS last_totalprice,
           CASE WHEN c.o_custkey IS NULL THEN 'base' ELSE 'merged' END
               AS provenance
    FROM base b
    FULL OUTER JOIN latest c ON c.o_custkey = b.o_custkey
    WHERE COALESCE(c.op, '') <> 'D'
    ORDER BY custkey
    """,
    doc="streaming CDC apply with retractions: base snapshot pre-"
    "seeded, raw changelog streamed through the LWW foreachBatch merge "
    "(version = orderdate+orderkey) with tombstones STORED at their "
    "version so replayed/out-of-order older upserts cannot resurrect "
    "deleted keys; read view filters op<>'D'; stream-drained state == "
    "i_cdc_merge's batch answer",
)
def st_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.sources.sinks import atomic_swap_write
    from listenbrainz_server_spark.streaming.jobs import (
        foreach_batch_merge_latest,
        read_parquet_stream,
        state_partition_conf,
    )

    cutoff = F.lit("1997-01-01").cast("date")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.col("o_orderkey").cast("bigint").alias("ok"),
        F.col("o_totalprice").alias("tp"),
        F.col("o_orderdate").alias("od"),
    )
    base = (
        orders.where(F.col("od") < cutoff)
        .groupBy("ck")
        .agg(F.max(F.struct("od", "ok", "tp")).alias("m"))
        .select(
            "ck",
            F.col("m.od").alias("od"),
            F.col("m.ok").alias("ok"),
            F.col("m.tp").alias("tp"),
            F.lit("U").alias("op"),
        )
    )
    # RAW changelog — every post-cutoff change row; the LWW merge does
    # the compaction (op assigned per row, so intermediate versions
    # carry their own op like a real CDC feed).
    changes = orders.where(F.col("od") >= cutoff).select(
        "ck",
        "od",
        "ok",
        "tp",
        F.when(F.col("ok") % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )

    root = tempfile.mkdtemp(prefix="st_cdc_")
    log_dir, state = root + "/log", root + "/state"
    changes.repartition(4).write.mode("overwrite").parquet(log_dir)
    atomic_swap_write(base, state)  # pre-seeded snapshot
    with state_partition_conf(spark, 8):
        # max_files=2: two triggers keep the merge-into-existing-state
        # path live (tombstone semantics pinned batch-wise in tests)
        # at half the trigger cost — same A/B rationale as
        # st_trending_ranked.
        stream = read_parquet_stream(
            spark, log_dir, spark.read.parquet(log_dir).schema, max_files=2
        )
        foreach_batch_merge_latest(
            stream, state, keys=["ck"], order_cols=["od", "ok"]
        )
    return (
        spark.read.parquet(state)
        .where(F.col("op") != "D")
        .select(
            F.col("ck").alias("custkey"),
            F.col("ok").alias("last_orderkey"),
            F.round("tp", 6).alias("last_totalprice"),
            F.when(F.col("od") >= cutoff, F.lit("merged"))
            .otherwise(F.lit("base"))
            .alias("provenance"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# Sessionized CDC with retractions (VERDICT r8 #7): a time-ordered
# changelog of event upserts + deletes streamed through the
# event-granular session operator (streaming/stateful.py session_cdc)
# — deletes retract their event from the open session that holds it
# (shrinking, splitting, or erasing it); sessions emit exactly once
# when the watermark passes session_end. Reference semantics:
# listens/delete.py applies deletions to materialized listen history
# before stats recompute; here the retraction happens IN the
# streaming session aggregation instead of via batch rebuild.
#
# Fixture: every event is an upsert; events with event_id % 13 == 0
# get a delete 15 minutes later (inside the 30-min gap, so the
# retraction always lands while its session is still open — the
# within-watermark policy is exercised, not raced). The changelog is
# written as four ts-range files in mtime order (a real CDC feed is
# time-ordered; the file source replays oldest-first) plus a far-
# future flush sentinel that pushes the watermark past every session
# end. Stream-drained output == batch sessionize of the surviving
# events, which is exactly the oracle SQL (st_session_window's
# LAG-break sessionization over event_id % 13 != 0).
# --------------------------------------------------------------------------
@register(
    "st_session_cdc",
    """
    WITH ev AS (
        SELECT user_id, ts, event_id FROM events WHERE event_id % 13 <> 0
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts >= LAG(ts) OVER w + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    doc="sessionized CDC with retractions: U/D changelog -> "
    "applyInPandasWithState session windows at EVENT granularity "
    "(state = open-session events only, bounded by the watermark "
    "horizon); a delete shrinks/splits/erases the open session "
    "holding its event; sessions emit exactly once (append) when the "
    "watermark passes session_end; stream-drained output == batch "
    "sessionize of surviving events (the oracle)",
)
def st_session_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.streaming.jobs import (
        read_parquet_stream,
        state_partition_conf,
    )
    from listenbrainz_server_spark.streaming.stateful import session_cdc

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    ups = ev.select("user_id", "event_id", "ts", F.lit("U").alias("op"))
    dels = (
        ev.where(F.col("event_id") % 13 == 0)
        .select(
            "user_id",
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("ts"),
            F.lit("D").alias("op"),
        )
    )
    log = ups.unionByName(dels)

    root = tempfile.mkdtemp(prefix="st_session_cdc_")
    log_dir = root + "/log"
    # ts-range changelog files, oldest ts first: the file source
    # replays in mtime order, so time-order across triggers is what
    # makes this a CDC replay. r9 wrote each slice as its own
    # sequential coalesce(1) job (quantile cuts + N single-task
    # writes); r10 writes all slices in ONE distributed job —
    # repartitionByRange(N, ts) assigns ascending ts ranges to
    # ascending partition ids, so the part-file NAME order IS the ts
    # order and an explicit os.utime stamp (2 s apart, safely above
    # the source's mtime granularity) replaces write-order as the
    # replay order. The quantile-bounds job disappears (the range
    # partitioner samples its own cuts); only max(ts) remains, for
    # the watermark-flush sentinel written last (newest mtime).
    import glob as _glob
    import os as _os
    import time as _time

    mx = log.select(F.max("ts").alias("mx")).first()["mx"]
    log.repartitionByRange(_CDC_SLICES, "ts").write.mode("append").parquet(
        log_dir
    )
    base = _time.time() - 60
    data_parts = sorted(_glob.glob(log_dir + "/part-*"))
    for i, f in enumerate(data_parts):
        _os.utime(f, (base + 2 * i, base + 2 * i))
    sentinel = spark.createDataFrame(
        [(0, 0, "F")], "user_id bigint, event_id bigint, op string"
    ).select(
        "user_id",
        "event_id",
        (F.lit(mx) + F.expr("INTERVAL 300 MINUTES")).alias("ts"),
        "op",
    )
    # repartition(1), NOT coalesce(1): createDataFrame parallelizes
    # the local row into defaultParallelism python-serialized slices,
    # and coalesce folds all 32 into one task that pays a worker
    # round-trip per slice (~4.5 s for ONE ROW, measured r10);
    # repartition shuffles them down for ~0.5 s.
    sentinel.repartition(1).write.mode("append").parquet(log_dir)
    # Stamp the sentinel's mtime EXPLICITLY past every data slice
    # (ADVICE r10): its natural write-time mtime (~base + 60) only
    # happens to exceed base + 2*i while _CDC_SLICES < ~30 — above
    # that, later data slices would out-mtime the sentinel and the
    # watermark flush would replay BEFORE them, silently dropping
    # retractions. base + 2*n + 2 is ordered for ANY slice count.
    sentinel_mtime = base + 2 * len(data_parts) + 2
    for f in sorted(set(_glob.glob(log_dir + "/part-*")) - set(data_parts)):
        _os.utime(f, (sentinel_mtime, sentinel_mtime))

    sink = "st_session_cdc_sink"
    with state_partition_conf(spark, 8):
        # max_files=2 with _CDC_SLICES=2: both data slices land in
        # trigger 1 (within a trigger the update sorts ops by ts, so
        # intra-trigger file order is irrelevant), the sentinel lands
        # alone in trigger 2 -- 2 triggers (r10 A/B vs the r9
        # 4-slice/3-trigger form: ~3 s faster same-session at sf0.1,
        # identical stream==batch output). Cross-trigger retraction
        # (a delete arriving a trigger AFTER its upsert entered
        # state) stays pinned by the max_files=1 unit tests.
        stream = read_parquet_stream(
            spark, log_dir, spark.read.parquet(log_dir).schema, max_files=2
        )
        q = (
            session_cdc(stream, watermark="30 minutes")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink).select(
        "user_id", "session_start", "session_end", "n_events"
    )


# --------------------------------------------------------------------------
# st_replay_idempotent (r9): exactly-once-under-redelivery audit for
# the LWW streaming MERGE sink. File-source + checkpoint already give
# each batch exactly-once PROCESSING; what this pins is the stronger
# operational property the sink's design claims (jobs.py
# merge_latest_into_state: "monotone, hence idempotent under
# replay"): after a CHECKPOINT LOSS the whole changelog redelivers,
# and the state must come out byte-identical — argmax over
# state ∪ batch cannot be moved by re-seeing any subset of history,
# in any order. The fixture drains the same changelog TWICE (second
# drain with a fresh checkpoint = total redelivery into warm state)
# and compares states. Registered output is the live post-replay
# state (the LWW compaction the oracle reproduces exactly) plus the
# replay_idempotent boolean inside the hash gate.
# --------------------------------------------------------------------------
@register(
    "st_replay_idempotent",
    """
    SELECT o_custkey AS custkey, o_orderkey AS last_orderkey,
           ROUND(o_totalprice, 6) AS last_totalprice,
           TRUE AS replay_idempotent
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    ) WHERE rn = 1
    ORDER BY custkey
    """,
    doc="exactly-once-under-redelivery audit: the LWW foreachBatch "
    "MERGE state after draining the same changelog TWICE (second "
    "drain = fresh checkpoint, total redelivery into warm state) "
    "must equal the first drain byte-for-byte -- argmax over state "
    "and batch is replay-immune; output is the live state the oracle "
    "reproduces + the idempotence boolean in the hash gate",
)
def st_replay_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from listenbrainz_server_spark.streaming.jobs import (
        merge_latest_into_state,
        read_parquet_stream,
        state_partition_conf,
    )

    cutoff = F.lit("1997-01-01").cast("date")
    changes = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= cutoff)
        .select(
            F.col("o_custkey").cast("bigint").alias("ck"),
            F.col("o_orderdate").alias("od"),
            F.col("o_orderkey").cast("bigint").alias("ok"),
            F.col("o_totalprice").alias("tp"),
        )
    )
    root = tempfile.mkdtemp(prefix="st_replay_")
    log_dir, state = root + "/log", root + "/state"
    changes.repartition(4).write.mode("overwrite").parquet(log_dir)
    schema = spark.read.parquet(log_dir).schema

    def drain(ckpt: str) -> None:
        # foreach_batch_merge_latest pins its checkpoint next to the
        # state; replay needs a FRESH one per drain, so start inline.
        with state_partition_conf(spark, 8):
            q = (
                read_parquet_stream(spark, log_dir, schema, max_files=2)
                .writeStream.foreachBatch(
                    lambda b, _i: merge_latest_into_state(
                        state, b, ["ck"], ["od", "ok"]
                    )
                )
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination(180)

    drain(root + "/ckpt1")
    first = spark.read.parquet(state).localCheckpoint(eager=True)
    # Total redelivery: fresh checkpoint, same log, warm state.
    drain(root + "/ckpt2")
    replayed = spark.read.parquet(state)

    idem = (
        replayed.exceptAll(first)
        .unionByName(first.exceptAll(replayed))
        .agg((F.count(F.lit(1)) == 0).alias("replay_idempotent"))
    )
    return (
        replayed.crossJoin(F.broadcast(idem))
        .select(
            F.col("ck").alias("custkey"),
            F.col("ok").alias("last_orderkey"),
            F.round("tp", 6).alias("last_totalprice"),
            "replay_idempotent",
        )
        .orderBy("custkey")
    )
