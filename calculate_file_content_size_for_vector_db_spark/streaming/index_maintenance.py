"""Streaming index-maintenance face: the SERVING-artifact counterpart
of the lake face (storage) and the near-dup gate (quality) — each
micro-batch of (doc, text, embedding) rows maintains the two stored
ingest artifacts the round-8 batch queries defined:

- **IVF assignment store** (`sim_ivf_append` semantics): the batch is
  assigned against the FROZEN stored centroids (no retrain — one
  packed-centroid broadcast map, batch-sized at any corpus size) and
  appended to ``{index_dir}/assign``. Cold start trains the centroids
  on trigger 0's batch and freezes them (the store bootstraps itself,
  like the lake face's first append).
- **Bloom pre-gate bitmap** (`dedup_bloom_append` semantics): the
  batch's MinHash band hashes build a bounded delta bitmap (at most
  m_bits/32 rows) that is APPENDED to ``{index_dir}/bloom``. The
  stored bitmap is deliberately append-only deltas, folded on read by
  one word_id-keyed bit_or: because bit_or is idempotent, commutative
  and associative, fold(appended deltas) == union-in == from-scratch
  rebuild — so a checkpoint REPLAY that re-appends a delta changes
  nothing, and no trigger ever rewrites (or even reads) the stored
  bitmap. The fold input is bounded too: deltas are m/32 rows per
  trigger, metadata-scale forever.

State model — identical to the other two faces: ZERO executor/state-
store bytes; foreachBatch holds nothing between triggers, the store
IS the cross-trigger memory. Per-trigger cost: one batch-sized
assignment map + one batch-sized band explode + two bounded writes;
the corpus appears in no plan.

Each trigger also appends an observability row to
``{index_dir}/metrics``: (batch_id, n_vectors, mean_cc_batch,
n_bloom_delta_words). mean_cc_batch is the batch's routing quality
against the frozen quantizer — the per-trigger staleness signal whose
maintenance-cadence big sibling is the full `ivf_staleness` row (a
decaying mean_cc_batch across triggers is the live retrain trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
    BLOOM_BITS,
    BLOOM_HASHES,
    bloom_bitmap,
    minhash_bands,
    minhash_signature,
)
from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
    ivf_append_assign,
    ivf_centroids,
)


def read_bloom_bitmap(spark, index_dir: str) -> DataFrame:
    """(word_id, word): the CURRENT Bloom bitmap — the append-only
    delta store folded by one bit_or hash-agg. Equal to a from-scratch
    `bloom_bitmap` over every band hash ever admitted (the
    dedup_bloom_append equality, through the streaming store)."""
    return (
        spark.read.parquet(f"{index_dir}/bloom")
        .groupBy("word_id")
        .agg(F.bit_or("word").alias("word"))
    )


def maintain_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    key: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> None:
    """One trigger's worth of index maintenance, as a plain batch
    function (the solo face and streaming/composed.py both call exactly
    this, so the composed test pins the composition seam, not a
    reimplementation): frozen-centroid assignment append, Bloom delta
    append, one metrics row."""
    spark = batch_df.sparkSession

    def _read_centroids() -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(f"{index_dir}/centroids")
        except AnalysisException:
            return None

    batch_df = batch_df.persist()
    vec = batch_df.select(F.col(key).alias("vec_id"), F.col(vec_col).alias("embedding"))
    cents = _read_centroids()
    if cents is None:
        # cold start: trigger 0's batch trains the quantizer, then
        # it FREEZES — every later trigger serves the stored one
        ivf_centroids(vec).write.parquet(f"{index_dir}/centroids")
        cents = spark.read.parquet(f"{index_dir}/centroids")
    assigned = ivf_append_assign(vec, cents).persist()
    assigned.write.mode("append").parquet(f"{index_dir}/assign")

    bands = minhash_bands(minhash_signature(batch_df.select(key, text_col)))
    delta = bloom_bitmap(bands, m_bits=m_bits, n_hashes=n_hashes).persist()
    delta.write.mode("append").parquet(f"{index_dir}/bloom")

    stats = assigned.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.avg("cell_cosine"), 6).alias("mean_cc_batch"),
    ).crossJoin(
        F.broadcast(
            delta.agg(F.count("*").cast("long").alias("n_bloom_delta_words"))
        )
    )
    stats.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
        "append"
    ).parquet(f"{index_dir}/metrics")
    assigned.unpersist()
    delta.unpersist()
    batch_df.unpersist()


def index_maintenance_face(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    key: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> StreamingQuery:
    """Start the face. ``stream`` rows carry (key, text, embedding).
    Artifacts live under ``index_dir``: centroids/ (written once, by
    trigger 0), assign/ (appended per trigger), bloom/ (append-only
    delta bitmaps — read via `read_bloom_bitmap`), metrics/ (one row
    per trigger)."""

    def _maintain(batch_df: DataFrame, batch_id: int) -> None:
        # every face trigger body runs under the trigger lock
        # (store_swap.face_scope comment, ADVICE r13): persist-only
        # bodies survive a sweep (lineage recomputes) but must not
        # have their in-flight persists released by a concurrent
        # upsert/takedown trigger's diff mid-body
        from calculate_file_content_size_for_vector_db_spark.streaming.store_swap import face_scope

        with face_scope(batch_df.sparkSession):
            maintain_index_batch(
                batch_df, batch_id, index_dir, key, text_col, vec_col, m_bits, n_hashes
            )

    return (
        stream.writeStream.foreachBatch(_maintain)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
