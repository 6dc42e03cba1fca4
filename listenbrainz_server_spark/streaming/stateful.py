"""Custom stateful streaming operators via applyInPandasWithState.

The reference's incremental engine keeps explicit per-key state
(partial aggregates) between batch runs (SURVEY.md §2.9); this is the
Structured Streaming native form of the same design: per-key state
lives in the state store, updated per micro-batch, emitted as deltas.

Scale notes: state partitions on the grouping key across the
cluster's state store; a timeout (GroupStateTimeout) bounds state for
keys that go quiet — set it in production so 100 TB of historical
users don't pin state forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, total_events bigint, total_value double"
STATE_SCHEMA = "total_events bigint, total_value double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals across micro-batches: the incremental
    engine's combine(existing, delta) as streaming state."""
    if state.exists:
        (n, v) = state.get
    else:
        n, v = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [n], "total_value": [v]}
    )


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum(value)) emitted every trigger.

    Input needs columns (user_id, value). Batch equivalence: the final
    emitted row per user equals groupBy(user_id).agg(count, sum).
    """
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Sessionized CDC with retractions (VERDICT r8 #7).
#
# The reference applies listen deletions to already-materialized
# per-user history before recomputing stats (listens/delete.py +
# listens/data.py:67-86); the streaming-native form of the same
# problem is a changelog of event upserts AND deletes feeding a
# session-window aggregation: a delete must retract its event from
# the session it landed in — shrinking it, splitting it in two if the
# event was the bridge, or erasing it entirely.
#
# Spark's native session_window cannot retract (its state holds
# merged [start, end, agg] triples — the individual event times are
# gone, so a delete can't split). This operator keeps per-key state
# at EVENT granularity, but ONLY for sessions still open w.r.t. the
# event-time watermark:
#
#   * state per user = alive (event_id, ts) pairs in OPEN sessions;
#   * each invocation applies the batch's U/D ops in ts order, then
#     locally re-sessionizes the alive set (a session is a maximal
#     run of events with consecutive gaps < ``gap``);
#   * a session CLOSES when watermark > last_ts + gap: no future
#     event (all ts >= wm) can merge into it, and no delete targeting
#     its members is honored any more (retract-within-watermark — the
#     only state-bounded policy at 100 TB; a late delete is recorded
#     by upstream compaction, not by reopening emitted sessions).
#     Closed sessions are EMITTED (append mode) and their events
#     dropped from state;
#   * an event-time timeout at the earliest possible close point
#     re-invokes quiet keys so their sessions flush as the watermark
#     passes them.
#
# State is therefore bounded by events inside the watermark horizon
# per key — exactly the open-session working set — while emitted
# output is final (append, no revisions downstream).
# --------------------------------------------------------------------------

SESSION_CDC_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
SESSION_CDC_STATE_SCHEMA = "eids array<bigint>, tss array<bigint>"

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


def _make_session_cdc_update(gap_us: int):
    """Build the per-key state-update closure. Defined as a factory so
    the returned function cloudpickles BY VALUE (the repo's Pandas-UDF
    convention) — a module-level function would pickle by reference
    and require this package on every executor worker's import path."""

    def _sessionize_us(ts_sorted: list) -> list:
        # Ascending ts list -> [start_idx, end_idx) session runs: a new
        # session starts where the gap to the previous event is
        # >= gap_us (the session_window / SQL LAG >= INTERVAL break).
        runs, start = [], 0
        for i in range(1, len(ts_sorted)):
            if ts_sorted[i] - ts_sorted[i - 1] >= gap_us:
                runs.append((start, i))
                start = i
        runs.append((start, len(ts_sorted)))
        return runs

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        alive: dict = {}
        if state.exists:
            eids, tss = state.get
            alive = dict(zip(eids, tss))
        if not state.hasTimedOut:
            rows = []
            for pdf in pdfs:
                for op, eid, ts_ns in zip(
                    pdf["op"], pdf["event_id"], pdf["ts"].astype("int64")
                ):
                    rows.append((int(ts_ns) // 1000, str(op), int(eid)))
            # Apply in event-time order: parquet row order within a
            # trigger is arbitrary. Ties on ts apply U before D ('D'
            # sorts before 'U' lexicographically, which would let the
            # event survive its own retraction when a CDC feed stamps
            # the delete with the upsert's timestamp) — so a
            # same-timestamp delete still wins.
            _OP_RANK = {"U": 0, "D": 1, "F": 2}
            for ts_us, op, eid in sorted(
                rows, key=lambda r: (r[0], _OP_RANK.get(r[1], 3), r[2])
            ):
                if op == "U":
                    alive[eid] = ts_us
                elif op == "D":
                    alive.pop(eid, None)
                # 'F' = flush sentinel: advances the watermark only.

        wm_us = state.getCurrentWatermarkMs() * 1000
        out_rows = []
        if alive:
            order = sorted(alive.items(), key=lambda kv: (kv[1], kv[0]))
            ts_sorted = [t for _, t in order]
            keep: dict = {}
            open_close_us = []
            for s, e in _sessionize_us(ts_sorted):
                last_us = ts_sorted[e - 1]
                if last_us + gap_us < wm_us:  # closed: emit + drop
                    out_rows.append(
                        (key[0], ts_sorted[s], last_us + gap_us, e - s)
                    )
                else:
                    keep.update(order[s:e])
                    open_close_us.append(last_us + gap_us)
            alive = keep
            if alive:
                state.update((list(alive.keys()), list(alive.values())))
                # Wake when the earliest open session could close. Must be
                # strictly beyond the current watermark or Spark rejects it.
                wake_ms = max(min(open_close_us) // 1000 + 1, wm_us // 1000 + 1)
                state.setTimeoutTimestamp(wake_ms)
        if not alive:
            if state.exists:
                state.remove()
        if out_rows:
            uid, ss, se, n = zip(*out_rows)
            yield pd.DataFrame(
                {
                    "user_id": uid,
                    "session_start": pd.to_datetime(list(ss), unit="us"),
                    "session_end": pd.to_datetime(list(se), unit="us"),
                    "n_events": n,
                }
            )

    return _update


def _make_session_cdc_update_vec(gap_us: int):
    """Vectorized form of ``_make_session_cdc_update`` — identical
    semantics, numpy/pandas column ops instead of per-row Python. The
    changelog fold "apply ops in (ts, U-before-D, eid) order" reduces
    to: an event's fate is its LAST batch op in that order (stable
    sort + drop_duplicates keep-last), with any batch op overriding
    the event's state entry; sessionization is a diff/split over the
    sorted alive timestamps. Same-session A/B at sf0.1 (r10): drain
    time UNCHANGED (~4 s, lifecycle/state-store-bound at this per-key
    density of ~10 events/user) — the point is the scale story: the
    per-row form's Python cost grows with rows per key, this form's
    with Arrow batches, so dense keys (hot users at 100 TB) stop
    being a Python floor."""
    import numpy as np

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            eids, tss = state.get
            alive_e = np.asarray(eids, dtype=np.int64)
            alive_t = np.asarray(tss, dtype=np.int64)
        else:
            alive_e = np.empty(0, dtype=np.int64)
            alive_t = np.empty(0, dtype=np.int64)
        if not state.hasTimedOut:
            frames = [p for p in pdfs if len(p)]
            if frames:
                pdf = (
                    pd.concat(frames, ignore_index=True)
                    if len(frames) > 1
                    else frames[0]
                )
                op = pdf["op"].to_numpy()
                ud = (op == "U") | (op == "D")
                if ud.any():
                    b = pd.DataFrame(
                        {
                            "eid": pdf["event_id"].to_numpy(np.int64)[ud],
                            "ts": pdf["ts"].astype("int64").to_numpy()[ud]
                            // 1000,
                            "d": op[ud] == "D",
                        }
                    )
                    # U before D on ts ties (False < True), eid last.
                    last = b.sort_values(
                        ["ts", "d", "eid"], kind="stable"
                    ).drop_duplicates("eid", keep="last")
                    b_eids = last["eid"].to_numpy(np.int64)
                    if alive_e.size:
                        keep = ~np.isin(alive_e, b_eids)
                        alive_e, alive_t = alive_e[keep], alive_t[keep]
                    surv = ~last["d"].to_numpy()
                    alive_e = np.concatenate([alive_e, b_eids[surv]])
                    alive_t = np.concatenate(
                        [alive_t, last["ts"].to_numpy(np.int64)[surv]]
                    )

        wm_us = state.getCurrentWatermarkMs() * 1000
        out_rows = []
        if alive_e.size:
            o = np.lexsort((alive_e, alive_t))
            e_s, ts_s = alive_e[o], alive_t[o]
            brk = np.nonzero(np.diff(ts_s) >= gap_us)[0] + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk, [ts_s.size]))
            last_us = ts_s[ends - 1]
            closed = last_us + gap_us < wm_us
            for s, e in zip(starts[closed], ends[closed]):
                out_rows.append(
                    (key[0], int(ts_s[s]), int(ts_s[e - 1]) + gap_us, e - s)
                )
            keep_elem = np.repeat(~closed, ends - starts)
            alive_e, alive_t = e_s[keep_elem], ts_s[keep_elem]
            if alive_e.size:
                state.update((alive_e.tolist(), alive_t.tolist()))
                open_close = int((last_us[~closed] + gap_us).min())
                wake_ms = max(open_close // 1000 + 1, wm_us // 1000 + 1)
                state.setTimeoutTimestamp(wake_ms)
        if not alive_e.size and state.exists:
            state.remove()
        if out_rows:
            uid, ss, se, n = zip(*out_rows)
            yield pd.DataFrame(
                {
                    "user_id": uid,
                    "session_start": pd.to_datetime(list(ss), unit="us"),
                    "session_end": pd.to_datetime(list(se), unit="us"),
                    "n_events": n,
                }
            )

    return _update


# Vectorized update is the production path; the per-row reference
# implementation stays for the equivalence pin
# (tests/test_streaming.py::test_session_cdc_vec_matches_reference).
_SESSION_CDC_VEC = True


def session_cdc(stream_df: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Session-window aggregation over a (user_id, event_id, ts, op)
    changelog stream with delete retractions. Emits each session
    exactly once (append) when the event-time watermark passes its
    end; state holds only open-session events per user."""
    make = (
        _make_session_cdc_update_vec
        if _SESSION_CDC_VEC
        else _make_session_cdc_update
    )
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make(_GAP_US),
            outputStructType=SESSION_CDC_OUT_SCHEMA,
            stateStructType=SESSION_CDC_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
