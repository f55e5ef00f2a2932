"""Multimodal query family (split from the entry_queries monolith;
see entry_queries/__init__.py for the assembled registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import _docs, register


# ---------------------------------------------------------------------------
# Multimodal columns (operators/multimodal.py) — binary payload plumbing
# with a deterministic fake decoder (no media libs in this container),
# so the mapInPandas output is oracle-checkable arithmetic.
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_meta",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST((octet_length(encode(text)) * 31) % 480 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS channels,
       'fake' AS format
FROM documents
""",
)
def multimodal_image_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import (
        decode_image_meta,
        text_as_binary,
    )

    return decode_image_meta(text_as_binary(_docs(spark, sf_dir)))


@register(
    "multimodal_frames",
    """
SELECT doc_id,
       CAST(unnest(range(0, octet_length(encode(text)) // 64 + 1)) AS INT) AS frame_index,
       CAST(unnest(range(0, octet_length(encode(text)) // 64 + 1)) * 64 AS BIGINT) AS frame_offset
FROM documents
""",
)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import (
        sample_frames,
        text_as_binary,
    )

    return sample_frames(text_as_binary(_docs(spark, sf_dir)))


@register(
    "multimodal_audio_windows",
    """
WITH w AS (
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS INT) AS window_index,
           text
    FROM documents WHERE length(text) > 0
)
SELECT doc_id, window_index,
       CAST(window_index * 64 AS BIGINT) AS start_offset,
       CAST(length(substring(text, window_index * 64 + 1, 64)) AS INT) AS n_samples,
       round(list_sum(list_transform(string_split(substring(text, window_index * 64 + 1, 64), ''),
                 c -> CAST(ord(c) AS BIGINT)))
             / CAST(length(substring(text, window_index * 64 + 1, 64)) AS DOUBLE), 6)
           AS mean_amplitude
FROM w
""",
)
def multimodal_audio_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-rate sample windowing + per-window amplitude feature."""
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import audio_windows

    return audio_windows(_docs(spark, sf_dir))


@register(
    "multimodal_phash_dedup",
    """
WITH codes_t AS (
    SELECT doc_id,
           list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes,
           CAST(length(text) AS BIGINT) AS ln
    FROM documents
),
h AS (
    SELECT doc_id,
           CASE WHEN ln = 0 THEN 0
                ELSE CAST(list_sum(list_transform(range(0, 12), b ->
                    CASE WHEN ((b + 1) * ln) // 12 - (b * ln) // 12 > 0
                          AND list_sum(list_slice(codes, (b * ln) // 12 + 1, ((b + 1) * ln) // 12))
                              / CAST(((b + 1) * ln) // 12 - (b * ln) // 12 AS DOUBLE)
                              > list_sum(codes) / CAST(ln AS DOUBLE)
                         THEN (1::BIGINT << CAST(b AS INT)) ELSE 0::BIGINT END)) AS BIGINT)
           END AS ahash
    FROM codes_t
)
SELECT ahash, CAST(min(doc_id) AS BIGINT) AS keeper_id, count(*) AS dup_count
FROM h GROUP BY ahash HAVING count(*) > 1
""",
)
def multimodal_phash_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup (LAION-style): average-hash over the
    decoded sample stream (fake decode: code points stand in for
    pixels, per the module contract), then one hash-agg bucketing on
    the full 12-bit hash — the dedup_semantic_pq shape applied to the
    multimodal column, no pairwise stage."""
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import phash_dedup

    return phash_dedup(_docs(spark, sf_dir))


@register(
    "multimodal_resize",
    """
SELECT doc_id,
       CAST(64 AS INT) AS width,
       CAST(64 AS INT) AS height,
       CAST(length(text) % 3 + 1 AS INT) AS channels,
       CAST(length(text) AS BIGINT) AS n_bytes_in,
       CAST(64 * 64 * (length(text) % 3 + 1) AS BIGINT) AS n_bytes_out
FROM documents
""",
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (the last verb of the multimodal
    north-star list: decode / feature-extract / RESIZE / frame-sample):
    Arrow-batched mapInPandas over the binary column, deterministic
    fake decode so the metadata is oracle-checkable — the fixture
    payload is UTF-8 of ASCII text, so byte length == length(text) on
    the SQL side."""
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import (
        resize_images,
        text_as_binary,
    )

    return resize_images(text_as_binary(_docs(spark, sf_dir)))
