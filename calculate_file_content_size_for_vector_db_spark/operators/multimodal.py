"""Multimodal column plumbing (SURVEY.md section 7.4): image/audio/
video as opaque binary columns with typed metadata, decoded /
feature-extracted / frame-sampled through Arrow-batched mapInPandas.

The image/audio libraries are not in this container, so the DECODE
step is stubbed: ``decode_image_meta`` uses PIL when importable and
otherwise a clearly-marked deterministic fake (pure arithmetic on the
byte length). Everything Spark-side — schema, partitioning, UDF
signature, batch shape, frame fan-out — is real and tested; swapping
the fake for a real decoder changes one function.

At 100 TB: binary payloads ride in parquet/binaryFile splits; decode is
a narrow mapInPandas (one Python worker per partition, Arrow batches);
frame sampling fans out rows exactly like PDF page extraction, after
which everything is columnar again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:
    from PIL import Image  # not in this container

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_offset", LongType()),
    ]
)


def fake_image_meta(n_bytes: int) -> tuple[int, int, int, str]:
    """Deterministic FAKE decode: metadata derived arithmetically from
    the payload size. Replace with PIL/libav for real decoding."""
    width = n_bytes % 640 + 1
    height = (n_bytes * 31) % 480 + 1
    channels = n_bytes % 3 + 1
    return width, height, channels, "fake"


def decode_image_meta(
    files: DataFrame, key_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """binary column -> typed image metadata rows (mapInPandas)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for key, content in zip(batch[key_col], batch[content_col]):
                data = bytes(content)
                if HAVE_PIL:
                    import io

                    with Image.open(io.BytesIO(data)) as im:
                        rows.append(
                            (key, len(data), im.width, im.height,
                             len(im.getbands()), im.format or "unknown")
                        )
                else:
                    w, h, c, fmt = fake_image_meta(len(data))
                    rows.append((key, len(data), w, h, c, fmt))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    return spread(files.select(key_col, content_col)).mapInPandas(_decode, IMAGE_META_SCHEMA)


def sample_frames(
    files: DataFrame,
    every_n_bytes: int = 64,
    key_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """'Video' frame sampling stub: one row per sampled frame (every
    ``every_n_bytes`` of payload -> one frame). The row fan-out and
    downstream re-parallelization are the real part; a real decoder
    would emit actual frame tensors per row."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for key, content in zip(batch[key_col], batch[content_col]):
                n = len(bytes(content))
                n_frames = n // every_n_bytes + 1
                for i in range(n_frames):
                    rows.append((key, i, i * every_n_bytes))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    return spread(files.select(key_col, content_col)).mapInPandas(_frames, FRAME_SCHEMA)


def text_as_binary(documents: DataFrame) -> DataFrame:
    """Fixture adapter: synthesize an opaque binary column from text
    (the fixtures ship no real media payloads)."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )


def audio_windows(
    documents: DataFrame,
    window_samples: int = 64,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """'Audio' windowing: cut a sample stream into fixed-rate windows
    and compute one amplitude feature per window — the audio face of
    the multimodal surface (image meta / video frames above).

    The fixtures ship no PCM payloads, so code points of the text
    column stand in for samples; the window semantics (fixed rate,
    offset bookkeeping, per-window feature agg) are the real part, and
    they run as pure Column expressions — sequence/substring fan-out +
    a higher-order mean, zero Python, zero shuffle. A real PCM decode
    would swap the sample source, not the plan shape."""
    c = F.col(text_col)
    n_windows = F.ceil(F.length(c) / F.lit(float(window_samples))).cast("int")
    win = documents.select(
        F.col(key_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_windows - 1),
                lambda i: F.substring(c, i * window_samples + 1, window_samples),
            )
        ).alias("window_index", "seg"),
    ).where(F.length(c) > 0)
    codes = F.transform(F.split(F.col("seg"), ""), lambda ch: F.ascii(ch).cast("bigint"))
    return win.select(
        key_col,
        F.col("window_index"),
        (F.col("window_index") * window_samples).cast("bigint").alias("start_offset"),
        F.length("seg").cast("int").alias("n_samples"),
        F.round(
            F.aggregate(codes, F.lit(0).cast("bigint"), lambda a, x: a + x)
            / F.length("seg"),
            6,
        ).alias("mean_amplitude"),
    )


def image_ahash(
    documents: DataFrame,
    n_bits: int = 12,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key, ahash): average-hash perceptual fingerprint — bit b is set
    when the mean sample value of the b-th contiguous stream segment
    exceeds the global mean (the classic aHash, with the stream's
    natural order standing in for the pixel raster). Near-identical
    payloads produce identical hashes, which is what image-level dedup
    buckets on (LAION-style pipelines run exactly this shape).

    Decode stub per the module contract: code points of the text
    column stand in for decoded pixels (the audio_windows trick); a
    real decoder swaps the sample source, not the hash. Pure Column
    expressions — integer bucket boundaries (b*len/n_bits floor
    arithmetic) and double mean comparisons are bit-reproducible in
    DuckDB for the oracle. Empty payloads hash to 0.
    """
    c = F.col(text_col)
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    ln = F.length(c).cast("bigint")
    gmean = F.aggregate(codes, F.lit(0).cast("bigint"), lambda a, x: a + x) / ln
    value = F.lit(0).cast("bigint")
    for b in range(n_bits):
        start = (F.lit(b) * ln / F.lit(n_bits)).cast("bigint")  # 0-based floor
        blen = ((F.lit(b + 1) * ln / F.lit(n_bits)).cast("bigint") - start)
        seg = F.slice(codes, (start + 1).cast("int"), blen.cast("int"))
        bmean = F.aggregate(seg, F.lit(0).cast("bigint"), lambda a, x: a + x) / blen
        value = value + F.when(
            (blen > 0) & (bmean > gmean), F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return documents.select(
        F.col(key_col),
        F.when(ln > 0, value).otherwise(F.lit(0).cast("bigint")).alias("ahash"),
    )


def phash_dedup(
    documents: DataFrame,
    n_bits: int = 12,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(ahash, keeper_id, dup_count): perceptual-duplicate buckets —
    payloads sharing the full average-hash collapse to one keeper.
    Same 100-TB shape as dedup_semantic_pq: one linear hash pass plus
    one keyed hash-agg on the n_bits-wide key, no pairwise stage."""
    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    hashed = image_ahash(spread(documents), n_bits, key_col, text_col)
    return (
        hashed.groupBy("ahash")
        .agg(
            F.min(key_col).alias("keeper_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
        .where(F.col("dup_count") > 1)
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes_in", LongType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_images(
    files: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    key_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """binary column -> resized-image metadata rows (mapInPandas) —
    the resize face of the multimodal surface (decode_image_meta /
    sample_frames / audio_windows are the others). Decode stub per the
    module contract: channel count derives arithmetically from the
    payload size (fake_image_meta) and the resized byte count is
    target_w * target_h * channels; a real decoder (PIL thumbnail /
    libvips) swaps the per-row body, not the Arrow-batched plumbing,
    schema, or fan-in shape."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for key, content in zip(batch[key_col], batch[content_col]):
                n = len(bytes(content))
                _, _, channels, _ = fake_image_meta(n)
                rows.append(
                    (key, target_w, target_h, channels, n, target_w * target_h * channels)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    return spread(files.select(key_col, content_col)).mapInPandas(_resize, RESIZE_SCHEMA)
