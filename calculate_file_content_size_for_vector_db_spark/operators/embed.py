"""Deterministic chunk embeddings — the vector-db ingestion step the
reference only ESTIMATES capacity for (README.md:4-8: "how much text
will actually be embedded"). ``hash_embedding`` stands in for a model
encoder: a fixed pseudo-random projection of the chunk fingerprint,
reproducible bit-for-bit in SQL so the composed rag_ingest pipeline
stays oracle-checkable. Swapping in a real encoder is a one-line
change (any text -> array<float> column function or Pandas UDF slots
into the same pipeline position).

Scale shape: a narrow map — no shuffle, no Python; dim x 1 integer
mults per chunk inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.operators.textstats import fingerprint

EMBED_MULT = 2654435761  # Knuth multiplicative constant (also used by LSH planes)
EMBED_PRIME = 1000003
EMBED_STEP = 40503


def hash_embedding(col: Column | str, dim: int = 64) -> Column:
    """array<double> of ``dim`` values in [-0.5, 0.5): component j is a
    multiplicative hash of (fingerprint(text), j). Deterministic across
    engines; empty/NULL text embeds as the fingerprint-0 vector."""
    h = fingerprint(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: ((h + j.cast("bigint") * EMBED_STEP) * EMBED_MULT % EMBED_PRIME)
        / F.lit(float(EMBED_PRIME))
        - 0.5,
    )


def rag_ingest_frame(chunks, chunk_text_col: str = "content", dim: int = 64):
    """chunk rows -> (…, bucket, embedding_r): embed + LSH-bucket each
    chunk. Pure narrow Column expressions, so the SAME transform runs
    in batch (the registered ``rag_ingest`` query) and in Structured
    Streaming (readStream -> chunk -> this -> sink; smoke test in
    tests/test_streaming.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        lsh_bucket_expr,
    )

    emb = chunks.withColumn("_v", hash_embedding(chunk_text_col, dim))
    return emb.select(
        *[c for c in chunks.columns],
        lsh_bucket_expr(F.col("_v")).alias("bucket"),
        F.transform("_v", lambda x: F.round(x, 6)).alias("embedding_r"),
    )
