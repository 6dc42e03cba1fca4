"""Chunked result iteration — the result-sink layer (S12).

The reference streams query results as N-rows-per-message JSON dicts
through toLocalIterator (stats/incremental/user/entity.py:70-97;
chunk sizes 25/5000/10000 per stat family, SURVEY.md §4.3). Our
engine returns DataFrames; this is the thin adapter for callers that
need the message-stream shape.

``toLocalIterator`` pulls one partition at a time — driver memory is
bounded by partition size, not result size, which is the property
that makes it safe for million-row results.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

CHUNK_USER_STATS = 25
CHUNK_LISTENER_STATS = 5000
CHUNK_SIMILARITY = 10000


def iter_message_chunks(
    df: DataFrame, chunk_size: int, message_type: str
) -> Iterator[dict]:
    """Yield {type, data: [row dicts]} messages of ≤chunk_size rows."""
    buf: list[dict] = []
    for row in df.toLocalIterator():
        buf.append(row.asDict(recursive=True))
        if len(buf) >= chunk_size:
            yield {"type": message_type, "data": buf}
            buf = []
    if buf:
        yield {"type": message_type, "data": buf}
