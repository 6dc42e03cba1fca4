"""Property-based invariants (hypothesis): the algebraic identities
the engine's scale machinery relies on, checked over randomized
small inputs rather than one fixture.

- combine(partial(A), partial(B)) == aggregate(A ∪ B) for ANY split —
  the incremental engine's soundness condition;
- salted_agg == direct agg for any salt bucket count;
- session ids are non-decreasing per user and break exactly at gaps.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from listenbrainz_server_spark.operators.aggregates import combine_aggregates
from listenbrainz_server_spark.operators.sessionize import with_session_ids
from listenbrainz_server_spark.operators.skew import salted_agg

USERS = ["u1", "u2", "u3"]
ROWS = st.lists(
    st.tuples(
        st.sampled_from(USERS),
        st.integers(min_value=0, max_value=50),  # measure
    ),
    min_size=0,
    max_size=30,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS, split=st.integers(min_value=0, max_value=30))
@SLOW
def test_combine_equals_direct_for_any_split(spark, rows, split):
    df = spark.createDataFrame(rows or [("u1", 0)], "k string, v long")
    if not rows:
        df = df.limit(0)
    part_a = df.limit(min(split, len(rows)))
    # Complement via subtraction on a row id column to keep multiset
    # semantics (exceptAll handles duplicates).
    part_b = df.exceptAll(part_a)

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    direct = {(r.k, r.n, r.s) for r in agg(df).collect()}
    combined = {
        (r.k, r.n, r.s)
        for r in combine_aggregates(agg(part_a), agg(part_b), ["k"], ["n", "s"]).collect()
    }
    assert direct == combined


@given(rows=ROWS, buckets=st.sampled_from([1, 2, 7, 32]))
@SLOW
def test_salted_agg_equals_direct(spark, rows, buckets):
    df = spark.createDataFrame(rows or [("u1", 0)], "k string, v long")
    if not rows:
        df = df.limit(0)
    direct = {
        (r.k, r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k, r.n, r.s)
        for r in salted_agg(
            df, ["k"], {"n": ("*", "count"), "s": ("v", "sum")}, salt_buckets=buckets
        ).collect()
    }
    assert direct == salted


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=4000), min_size=1, max_size=12),
    threshold=st.sampled_from([60, 1800]),
)
@SLOW
def test_session_ids_monotone_and_break_exactly_at_gaps(spark, gaps, threshold):
    from datetime import datetime, timedelta

    t = datetime(2024, 1, 1)
    times, cur = [], t
    for g in gaps:
        cur = cur + timedelta(seconds=g)
        times.append(cur)
    df = spark.createDataFrame([("u", ts) for ts in times], "user string, t timestamp")
    out = (
        with_session_ids(df, "user", "t", gap_seconds=threshold)
        .orderBy("t")
        .collect()
    )
    sids = [r.session_id for r in out]
    # Non-decreasing, steps of ≤1, and a step exactly where gap > threshold.
    expected, sid = [], 0
    for i, g in enumerate(gaps):
        if i > 0 and g > threshold:
            sid += 1
        expected.append(sid)
    assert sids == expected


ASOF_LEFT = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=100),  # ts (seconds)
    ),
    min_size=1,
    max_size=15,
)
ASOF_RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=100),
        st.integers(min_value=0, max_value=9),    # value
    ),
    min_size=0,
    max_size=15,
)


@given(left=ASOF_LEFT, right=ASOF_RIGHT)
@SLOW
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join == 'latest right at-or-before, per key' computed by
    exhaustive Python for ANY input. Right side is deduped to one row
    per (key, ts) — the operator's documented determinism contract."""
    from datetime import datetime, timezone

    from listenbrainz_server_spark.operators.asof import asof_join

    def ts(s):
        return datetime.fromtimestamp(1700000000 + s, tz=timezone.utc).replace(
            tzinfo=None
        )

    # Dedup right per (key, ts): keep max value (deterministic).
    rbest = {}
    for k, t, v in right:
        rbest[(k, t)] = max(rbest.get((k, t), -1), v)

    ldf = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(left)],
        "row_id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, ts(t), float(v)) for (k, t), v in rbest.items()] or [],
        "k long, rts timestamp, val double",
    )
    got = {
        r.row_id: (r.val, r.asof_ts)
        for r in asof_join(ldf, rdf, ["k"], "ts", "rts", ["val"]).collect()
    }

    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in rbest.items() if rk == k and rt <= t]
        if cands:
            bt, bv = max(cands)
            assert got[i] == (float(bv), ts(bt)), (i, k, t)
        else:
            assert got[i] == (None, None), (i, k, t)


@given(left=ASOF_LEFT, right=ASOF_RIGHT, tol=st.one_of(st.none(), st.integers(min_value=1, max_value=50)))
@SLOW
def test_asof_nearest_matches_pandas_merge_asof(spark, left, right, tol):
    """direction='nearest' against pandas.merge_asof — an independent
    production implementation of the same contract (closest either
    side, backward wins exact-distance ties, symmetric tolerance) —
    for ANY input and tolerance."""
    from datetime import datetime, timezone

    import pandas as pd

    from listenbrainz_server_spark.operators.asof import asof_join

    def ts(s):
        return datetime.fromtimestamp(1700000000 + s, tz=timezone.utc).replace(
            tzinfo=None
        )

    rbest = {}
    for k, t, v in right:
        rbest[(k, t)] = max(rbest.get((k, t), -1), v)

    ldf = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(left)],
        "row_id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, ts(t), float(v)) for (k, t), v in rbest.items()] or [],
        "k long, rts timestamp, val double",
    )
    got = {
        r.row_id: (r.val, r.asof_ts)
        for r in asof_join(
            ldf, rdf, ["k"], "ts", "rts", ["val"],
            direction="nearest", tolerance_seconds=tol,
        ).collect()
    }

    lpd = pd.DataFrame(
        {"row_id": range(len(left)),
         "k": [k for k, _ in left],
         "ts": [ts(t) for _, t in left]}
    ).sort_values(["ts", "row_id"]).reset_index(drop=True)
    rpd = pd.DataFrame(
        {"k": pd.array([k for k, _ in rbest], dtype="int64"),
         "rts": pd.to_datetime([ts(t) for _, t in rbest]),
         "val": pd.array([float(v) for v in rbest.values()], dtype="float64")}
    ).sort_values(["rts", "k"]).reset_index(drop=True)
    merged = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k",
        direction="nearest",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    for _, row in merged.iterrows():
        want_val = None if pd.isna(row["val"]) else float(row["val"])
        want_ts = None if pd.isna(row["rts"]) else row["rts"].to_pydatetime()
        assert got[row["row_id"]] == (want_val, want_ts), (
            row["row_id"], got[row["row_id"]], (want_val, want_ts),
        )


WINNOW_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=4, max_size=12
)


@given(
    shared=st.text(alphabet="abcdefgh ", min_size=40, max_size=80),
    pre_a=WINNOW_WORDS,
    post_b=WINNOW_WORDS,
)
@SLOW
def test_winnow_gate_never_drops_guaranteed_runs(spark, shared, pre_a, post_b):
    """The winnowing theorem as a hypothesis property: two documents
    sharing ANY normalized run of length >= k + w - 1 = 31 chars must
    BOTH survive winnow_candidate_docs, whatever surrounds the run —
    i.e. the span-tier prefilter can never drop a guaranteed-
    detectable pair."""
    import re

    from hypothesis import assume

    from listenbrainz_server_spark.operators.dedup import winnow_candidate_docs

    norm_shared = re.sub(r"[^a-z0-9]+", " ", shared.lower()).strip()
    assume(len(norm_shared) >= 31)
    doc_a = " ".join(pre_a) + " " + shared
    doc_b = shared + " " + " ".join(post_b)
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, "unrelated filler words entirely")],
        "doc_id long, text string",
    )
    cand = {r.doc_id for r in winnow_candidate_docs(docs, "doc_id", "text").collect()}
    assert {1, 2} <= cand, (cand, norm_shared)


# ---------------------------------------------------------------------------
# Deletion-neighborhood completeness — the guarantee d_fuzzy_match's
# bucketed join rests on: any two strings within Levenshtein distance
# 1 share at least one member of {s} ∪ {s minus one char}, so the
# variant equi-join can never miss a true match (false positives are
# removed by the exact levenshtein filter afterwards).
# ---------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _variants(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@given(
    st.text(alphabet="abc", min_size=0, max_size=8),
    st.text(alphabet="abc", min_size=0, max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_deletion_neighborhood_covers_distance_one(a, b):
    if _lev(a, b) <= 1:
        assert _variants(a) & _variants(b), (a, b)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),           # user id
            st.integers(min_value=0, max_value=2000),         # spend in cents
        ),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    eps_cents=st.integers(min_value=1, max_value=500),
)
@SLOW
def test_band_join_bucketization_complete(spark, vals, eps_cents):
    """The {b-1, b, b+1} bucket probe is COMPLETE for |a-b| <= eps:
    the bucketized band self-join must equal the naive theta join for
    any values and any eps (the operator's whole claim is that the
    equi-join rewrite changes cost, never results)."""
    from pyspark.sql import functions as F

    eps = eps_cents / 100.0
    df = spark.createDataFrame(
        [(u, c / 100.0) for u, c in vals], "user_id long, sp double"
    )
    bucket = F.floor(F.col("sp") / F.lit(eps))
    left = df.select(
        F.col("user_id").alias("ua"), F.col("sp").alias("sa"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    right = df.select(
        F.col("user_id").alias("ub"), F.col("sp").alias("sb"),
        bucket.alias("bk"),
    )
    got = {
        (r.ua, r.ub)
        for r in left.join(right, "bk")
        .where((F.col("ua") < F.col("ub")) & (F.abs(F.col("sa") - F.col("sb")) <= eps))
        .collect()
    }
    # The oracle must use the SAME IEEE-double predicate the join does:
    # at the boundary (cent diff == eps_cents) exact integer arithmetic
    # and double arithmetic disagree (e.g. 10.88 - 5.91 =
    # 4.970000000000001 > 4.97), and that's a property of the
    # predicate, not of the bucketization. An exhaustive scan of the
    # whole strategy domain (eps 1..500, cents 0..2000) confirms the
    # ±1 probe is complete under double arithmetic: no pair passing
    # the double predicate ever lands 2 buckets apart.
    want = {
        (a, b)
        for a, ca in vals
        for b, cb in vals
        if a < b and abs(ca / 100.0 - cb / 100.0) <= eps
    }
    assert got == want, (sorted(got ^ want), eps)
