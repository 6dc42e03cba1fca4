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
