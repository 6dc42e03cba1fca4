"""Optional-codec gate for the multimodal operators (VERDICT r4 #8).

The container ships no PIL/ffmpeg, so the real pixel path is gated on
``pil_available()``: absent codec → ``fake=False`` must raise (honest
stub, never a silent fake), present codec → the real-path test below
auto-enables and drives actual PNG bytes through the same mapInPandas
plumbing the stand-in uses.
"""

from __future__ import annotations

import pytest

from listenbrainz_server_spark.operators.multimodal import (
    decode_media,
    pil_available,
    resize_media,
    with_binary_payload,
)

HAVE_PIL = pil_available()


def _payloads(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "a considerably longer payload string")],
        "doc_id bigint, text string",
    )
    return with_binary_payload(df, "text", "doc_id")


@pytest.mark.skipif(HAVE_PIL, reason="codec present: the raise path is unreachable")
def test_decode_without_codec_raises(spark):
    media = _payloads(spark)
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)
    with pytest.raises(NotImplementedError):
        resize_media(media, fake=False)


def test_fake_decode_works_regardless_of_codec(spark):
    rows = {r.id: r for r in decode_media(_payloads(spark), fake=True).collect()}
    assert rows[1].byte_len == 5
    assert rows[1].channels == 3


@pytest.mark.skipif(not HAVE_PIL, reason="real codec not in this container")
def test_real_decode_roundtrip(spark):
    """Auto-enables when a future container ships PIL: a real PNG's
    bytes go through the same Arrow plumbing and come back with the
    true pixel geometry."""
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (40, 24)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))], "id bigint, payload binary")
    row = decode_media(df, fake=False).collect()[0]
    assert (row.width, row.height, row.channels) == (40, 24, 3)
    rrow = resize_media(df, max_side=16, fake=False).collect()[0]
    assert (rrow.out_width, rrow.out_height) == (16, 9)
    assert rrow.out_bytes == 16 * 9 * 3
