"""Multimodal-column queries: binary payload plumbing over documents
(SURVEY.md §7.5). The text column stands in for an opaque media
payload; decode is the documented deterministic fake
(operators/multimodal.py) and the oracle replicates it from byte
lengths (documents are ASCII, so VARCHAR offsets == byte offsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from listenbrainz_server_spark.catalog import load_table
from listenbrainz_server_spark.operators.multimodal import (
    decode_media,
    sample_frames,
    with_binary_payload,
)
from listenbrainz_server_spark.queries import register


# --------------------------------------------------------------------------
# Binary payload + metadata struct + stubbed decode (mapInPandas).
# --------------------------------------------------------------------------
@register(
    "mm_decode_features",
    """
    SELECT doc_id AS id,
           CAST(strlen(text) % 64 + 1 AS INT)        AS width,
           CAST((strlen(text) // 64) % 64 + 1 AS INT) AS height,
           CAST(3 AS INT)                                   AS channels,
           strlen(text)                               AS byte_len
    FROM documents
    """,
    doc="binary payload decode plumbing (deterministic fake decoder via mapInPandas)",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = with_binary_payload(docs, "text", "doc_id")
    return decode_media(media, fake=True)


# --------------------------------------------------------------------------
# Frame sampling: every 4th 16-byte chunk, md5-fingerprinted.
# --------------------------------------------------------------------------
@register(
    "mm_frame_sample",
    """
    WITH chunks AS (
        SELECT doc_id AS id,
               UNNEST(range(0, CAST(ceil(strlen(text) / 16.0) AS BIGINT), 4)) AS frame_idx
        FROM documents
    )
    SELECT c.id, CAST(c.frame_idx AS INT) AS frame_idx,
           md5(substr(d.text, CAST(c.frame_idx * 16 + 1 AS BIGINT), 16)) AS frame_md5
    FROM chunks c JOIN documents d ON d.doc_id = c.id
    """,
    doc="video-frame-sampling plumbing: strided binary chunks fingerprinted",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = with_binary_payload(docs, "text", "doc_id")
    return sample_frames(media, chunk_bytes=16, stride=4)


# --------------------------------------------------------------------------
# Metadata-only pruning: filter on the typed struct BEFORE any decode
# (column pruning must keep the payload out of the scan).
# --------------------------------------------------------------------------
@register(
    "mm_metadata_prune",
    """
    SELECT source, COUNT(*) AS n, CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents
    WHERE strlen(text) > 256
    GROUP BY source
    """,
    doc="typed-metadata filter without touching payloads",
)
def mm_metadata_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = with_binary_payload(docs, "text", "doc_id").join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    return (
        media.where(F.col("meta.byte_len") > 256)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("meta.byte_len").alias("total_bytes"),
        )
    )


# --------------------------------------------------------------------------
# Resize plumbing: aspect-preserving fit to 32px from the fake-decoded
# dims; geometry + output byte size are exact, so the oracle checks
# the whole pipeline.
# --------------------------------------------------------------------------
@register(
    "mm_resize",
    """
    WITH dims AS (
        SELECT doc_id AS id,
               CAST(strlen(text) % 64 + 1 AS INT) AS width,
               CAST((strlen(text) // 64) % 64 + 1 AS INT) AS height
        FROM documents
    )
    SELECT id, width, height,
           CAST(GREATEST(1, FLOOR(width * LEAST(1.0, 32.0 / GREATEST(width, height))))
                AS INT) AS out_width,
           CAST(GREATEST(1, FLOOR(height * LEAST(1.0, 32.0 / GREATEST(width, height))))
                AS INT) AS out_height,
           CAST(GREATEST(1, FLOOR(width * LEAST(1.0, 32.0 / GREATEST(width, height)))) *
                GREATEST(1, FLOOR(height * LEAST(1.0, 32.0 / GREATEST(width, height))))
                * 3 AS BIGINT) AS out_bytes
    FROM dims
    """,
    doc="image-resize plumbing: aspect-preserving fit geometry + exact "
    "output byte size (mapInPandas, deterministic stand-in)",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    media = with_binary_payload(docs, "text", "doc_id")
    return resize_media(media, max_side=32, fake=True)


# --------------------------------------------------------------------------
# Shard manifest — WebDataset-style random access over packed binary
# shards: each payload is assigned a shard (hash), a record index, and
# a running byte offset inside the shard, so a trainer can seek
# directly to any record without reading the shard head. One shard-
# keyed window (records order by id) — the byte layout a shard writer
# would produce, computed before writing anything. ASCII payloads make
# VARCHAR length == byte length, so the oracle is exact.
# --------------------------------------------------------------------------
@register(
    "mm_shard_manifest",
    """
    WITH sized AS (
        SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT)
               AS record_idx,
           CAST(COALESCE(SUM(n_bytes) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_byte,
           n_bytes
    FROM sized
    """,
    doc="multimodal shard manifest: per-shard record index + running "
    "byte offset for random access into packed binary shards",
)
def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("shard"),
        F.length("text").cast("bigint").alias("n_bytes"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    w_off = w.rowsBetween(Window.unboundedPreceding, -1)
    return sized.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("record_idx"),
        F.coalesce(F.sum("n_bytes").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("start_byte"),
        "n_bytes",
    )


# --------------------------------------------------------------------------
# Perceptual-hash dedup — the media-dedup tier over the opaque binary
# column: average-hash (16 equal byte ranges, bit = range sum >= mean
# as an exact integer comparison) computed in one Arrow pass, then
# hash-bucket groups with a min-id representative — the multimodal
# analog of d_exact_dedup (and the bucket shape simhash/banded tiers
# refine). The oracle replicates the byte math from the ASCII text
# (VARCHAR offsets == byte offsets on this corpus).
# --------------------------------------------------------------------------
@register(
    "mm_phash_dedup",
    """
    WITH sums AS (
        SELECT doc_id,
               strlen(text) AS n,
               list_transform(range(0, 16), c ->
                   list_sum(list_transform(
                       range((c * strlen(text)) // 16 + 1,
                             ((c + 1) * strlen(text)) // 16 + 1),
                       i -> ascii(substr(text, CAST(i AS BIGINT), 1))))) AS cs
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               list_aggregate(list_transform(cs, s ->
                   CASE WHEN 16 * COALESCE(s, 0) >=
                             list_sum(list_transform(cs, x -> COALESCE(x, 0)))
                        THEN '1' ELSE '0' END), 'string_agg', '') AS phash
        FROM sums
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           MIN(doc_id) AS representative
    FROM hashed
    GROUP BY phash
    HAVING COUNT(*) >= 2
    """,
    doc="perceptual-hash (aHash) dedup groups over the binary payload "
    "column: 16-bit byte-range average hash, bucket groups with "
    "min-id representative (multimodal analog of d_exact_dedup)",
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from listenbrainz_server_spark.operators.multimodal import average_hash

    docs = load_table(spark, sf_dir, "documents")
    media = with_binary_payload(docs, "text", "doc_id")
    hashed = average_hash(media, bits=16)
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.min("id").alias("representative"),
        )
        .where(F.col("n_items") >= 2)
    )
