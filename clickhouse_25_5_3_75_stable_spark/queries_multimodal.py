"""Registry entries for the multimodal-column plumbing. The payloads
are UTF-8 bytes of `documents.text` (pure ASCII in the test corpus),
so DuckDB oracles can restate byte-level facts through string
functions. Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_25_5_3_75_stable_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    frame_sample,
)
from clickhouse_25_5_3_75_stable_spark.queries import register, t


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "metadata"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media columns + JVM-side typed metadata
    (octet_length / sha2) — no decode, no Python."""
    docs = t(spark, sf_dir, "documents")
    return attach_payload(docs, "doc_id", "text", "image").select(
        "media_id", "media_type", "n_bytes", "checksum"
    ).orderBy("media_id")


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_aggregate(list_transform(range(1, length(text) + 1),
                i -> ascii(substr(text, i, 1))), 'sum') AS BIGINT) AS byte_sum,
           CAST(list_aggregate(list_transform(range(1, length(text) + 1),
                i -> ascii(substr(text, i, 1))), 'sum') AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS byte_mean,
           CAST(list_max(list_transform(range(1, length(text) + 1),
                i -> ascii(substr(text, i, 1)))) AS INT) AS byte_max
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "decode"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode+feature-extract over Arrow batches (fake
    codec = deterministic byte stats; real codecs slot into
    operators/multimodal._decode_one)."""
    docs = t(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text", "image")
    return decode_media(media, codec="fake").orderBy("media_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, text,
               octet_length(encode(text)) AS n_bytes,
               greatest(CAST(octet_length(encode(text)) // 4 AS INT), 1) AS flen
        FROM documents
    )
    SELECT media_id, frame_no,
           CAST(length(substr(text, frame_no * flen + 1, flen)) AS BIGINT) AS frame_bytes,
           md5(substr(text, frame_no * flen + 1, flen)) AS frame_md5
    FROM media, (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS frame_no)
    WHERE frame_no * flen < n_bytes
    ORDER BY media_id, frame_no
    """,
    tags=("multimodal", "frames"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: payload → 4 contiguous slices with
    per-frame checksums, exploded AFTER the single payload read."""
    docs = t(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text", "video")
    return frame_sample(media, n_frames=4).orderBy("media_id", "frame_no")
