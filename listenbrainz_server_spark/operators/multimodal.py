"""Multimodal (binary) column operators.

Extends the reference's typed nested-column pattern
(listenbrainz_spark/postgres/utils.py:26-27 — one opaque payload
column parsed into a typed struct) to image/audio/video payloads:
opaque ``binary`` columns + typed metadata structs, processed by
Arrow-batched ``mapInPandas`` operators.

The decode step is gated on an OPTIONAL dependency probe
(``pil_available``): when PIL is importable, ``decode_media`` /
``resize_media`` with ``fake=False`` run the real pixel path inside
the same ``mapInPandas`` body; when it is not (this container),
``fake=False`` raises ``NotImplementedError`` and ``fake=True``
substitutes a deterministic byte-level stand-in (documented below).
Everything around the gate — schema, batch iteration, partitioning,
output shape — is identical between the two paths and tested; the
real-path tests auto-enable via ``pytest.mark.skipif`` the moment a
future container ships PIL.

Scale notes:
- Binary payloads ride Arrow buffers end-to-end: no per-row pickling.
- Feature extraction is embarrassingly parallel over partitions; the
  operators add no shuffle. Partition sizing is the only knob that
  matters at 100 TB (spark.sql.files.maxPartitionBytes vs payload
  size — a 4 MB image means ~32 rows per 128 MB split).
- Frame sampling explodes rows; do it AFTER any payload filter so
  pruned files never decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "id bigint, width int, height int, channels int, byte_len bigint"
FRAME_SCHEMA = "id bigint, frame_idx int, frame_md5 string"


def pil_available() -> bool:
    """Optional-dependency probe: True when a real image codec (PIL)
    is importable. The probe runs on the DRIVER at plan-build time;
    executors in this single-container deployment share the same
    environment, so the plan never mixes real and stubbed batches."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def with_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Adapter: treat a string column as an opaque binary payload with
    a typed metadata struct — the multimodal table shape
    (payload BINARY, meta STRUCT<byte_len, format>)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.length(F.col(text_col).cast("binary")).cast("bigint").alias("byte_len"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from payload length (width = len%64+1, height = len//64%64+1,
    channels = 3). Replicable in plain SQL for the oracle."""
    n = len(payload)
    return (n % 64 + 1, (n // 64) % 64 + 1, 3)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to (width, height, channels, byte_len).

    ``fake=False`` is the production path: real PIL decode when the
    probe finds the codec, ``NotImplementedError`` otherwise (this
    container ships no PIL/ffmpeg).
    """
    if not fake and not pil_available():
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg; pass fake=True for "
            "the deterministic byte-level stand-in"
        )

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            dims = [fake_decode_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "byte_len": [len(p) for p in pdf["payload"]],
                }
            )

    def decode_batches_real(batches: Iterator) -> Iterator:
        from io import BytesIO

        import pandas as pd
        from PIL import Image

        for pdf in batches:
            ws, hs, cs = [], [], []
            for payload in pdf["payload"]:
                with Image.open(BytesIO(payload)) as im:
                    ws.append(im.width)
                    hs.append(im.height)
                    cs.append(len(im.getbands()))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": ws,
                    "height": hs,
                    "channels": cs,
                    "byte_len": [len(p) for p in pdf["payload"]],
                }
            )

    body = decode_batches if fake else decode_batches_real
    return df.select("id", "payload").mapInPandas(body, schema=DECODE_SCHEMA)


def sample_frames(
    df: DataFrame, chunk_bytes: int = 16, stride: int = 4
) -> DataFrame:
    """Frame sampling over a binary payload: split into ``chunk_bytes``
    chunks, keep every ``stride``-th, fingerprint each — the video
    frame-sample plumbing with a byte-chunk stand-in for frames."""

    def frame_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                chunks = [
                    payload[off : off + chunk_bytes]
                    for off in range(0, len(payload), chunk_bytes)
                ]
                for i in range(0, len(chunks), stride):
                    ids.append(rid)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunks[i]).hexdigest())
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return df.select("id", "payload").mapInPandas(frame_batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes bigint"
)


def resize_media(df: DataFrame, max_side: int = 32, fake: bool = False) -> DataFrame:
    """Aspect-preserving resize to fit ``max_side`` — the image-resize
    stage of a multimodal ingest pipeline.

    ``fake=False`` (real pixel resampling) runs PIL when the probe
    finds it and raises here otherwise; the stand-in computes the real
    resize GEOMETRY (scale = min(1, max_side/longest side), floor to
    >=1 px) from the fake-decoded dims and the exact output byte size
    w·h·3 — so the Spark-side plumbing (batch shape, schema, Arrow
    round-trip) is fully exercised and oracle-checkable.
    """
    if not fake and not pil_available():
        raise NotImplementedError(
            "real image resampling requires PIL; pass fake=True for the "
            "deterministic geometry stand-in"
        )

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                w, h, c = fake_decode_dims(payload)
                scale = min(1.0, max_side / max(w, h))
                ow = max(1, int(w * scale))
                oh = max(1, int(h * scale))
                rows.append((rid, w, h, ow, oh, ow * oh * c))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "out_width", "out_height", "out_bytes",
                ],
            )

    def resize_batches_real(batches: Iterator) -> Iterator:
        from io import BytesIO

        import pandas as pd
        from PIL import Image

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                with Image.open(BytesIO(payload)) as im:
                    w, h = im.width, im.height
                    c = len(im.getbands())
                    scale = min(1.0, max_side / max(w, h))
                    ow = max(1, int(w * scale))
                    oh = max(1, int(h * scale))
                    resized = im.resize((ow, oh))
                    rows.append(
                        (rid, w, h, ow, oh, len(resized.tobytes()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "out_width", "out_height", "out_bytes",
                ],
            )

    body = resize_batches if fake else resize_batches_real
    return df.select("id", "payload").mapInPandas(body, schema=RESIZE_SCHEMA)


def average_hash(df: DataFrame, bits: int = 16) -> DataFrame:
    """Perceptual average-hash over the raw payload bytes — the aHash
    family every image-dedup pipeline starts from, applied to the
    opaque binary column: the payload is cut into ``bits`` equal
    byte ranges (floor boundaries), bit b is 1 iff
    bits × sum(range_b) >= sum(all bytes) — an integer comparison, so
    the signature is exact in any implementation. One Arrow
    mapInPandas pass (numpy cumsum per batch); output
    (id, phash string, byte_len).

    On real decoded images the same code runs over the resized
    luminance plane instead of raw bytes — the Spark-side shape
    (binary in, fixed-width signature out, bucket downstream) is
    identical, which is what this tier exists to pin.
    """
    from typing import Iterator

    def hash_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                cuts = [(c * n) // bits for c in range(bits + 1)]
                sums = np.array(
                    [b[cuts[c]: cuts[c + 1]].sum() for c in range(bits)]
                )
                total = int(b.sum())
                out.append(
                    "".join(
                        "1" if bits * int(s) >= total else "0" for s in sums
                    )
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "phash": out,
                    "byte_len": [len(p) for p in pdf["payload"]],
                }
            )

    return df.select("id", "payload").mapInPandas(
        hash_batches, schema="id bigint, phash string, byte_len bigint"
    )
