"""Similarity search over embedding columns (SURVEY.md section 7.4).

Two paths, both native Column expressions (no UDFs — the dot products
run inside whole-stage codegen via higher-order functions):

- Brute-force cosine top-k: query set x corpus join, windowed rank.
  Exact; quadratic. The correctness baseline and the right choice when
  the query set is small (broadcast the queries, scan the corpus once).

- LSH-bucketed ANN (random hyperplanes): each vector gets a 16-bit
  bucket from the signs of 16 deterministic pseudo-random projections;
  candidates are same-bucket only. At 100 TB: bucket assignment is a
  narrow map, the bucket join is an equi-join (shuffle on bucket id,
  bucket sizes ~N/2^16), no quadratic blowup. Recall is tunable by
  bands/probes; this implements single-probe.

Hyperplane weights are integer-arithmetic pseudo-random
(Knuth multiplicative hash mod a prime), so the DuckDB oracle
reproduces them bit-for-bit: w[p][j] = ((p*64+j)*2654435761 % 1000003)
/ 1000003 - 0.5.

Determinism: cosine is rounded to 6 decimals BEFORE ranking, ties
broken by neighbor id — so rank order is reproducible across engines
and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.partitioning import spread

N_PLANES = 16
DIM = 64
LSH_MULT = 2654435761  # Knuth multiplicative constant
LSH_PRIME = 1000003


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(F.try_divide(dot(a, b), norm(a) * norm(b)), decimals)


def topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan shape: broadcast-worthy query side x corpus scan -> one pass;
    rank with a window partitioned by query id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def nearest_neighbor(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-1 neighbor for EVERY vector (the all-pairs variant of
    topk_bruteforce; quadratic — fixture/verification scale only)."""
    # spread the STREAMED (left) side — cross-join output partitioning
    # follows it, so an unspread left side serializes the whole O(N^2)
    # scoring onto one task; broadcast the other side
    a = spread(embeddings).select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    b = embeddings.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    scored = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >=
    threshold). Scale path: run within LSH buckets instead of all-pairs."""
    a = spread(embeddings).select(F.col(id_col).alias("a_id"), as_double(vec_col).alias("av"))
    b = embeddings.select(F.col(id_col).alias("b_id"), as_double(vec_col).alias("bv"))
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine(F.col("av"), F.col("bv")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _plane(p: int) -> Column:
    """Deterministic pseudo-random hyperplane p (values in [-0.5, 0.5))."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: ((j + p * DIM).cast("bigint") * LSH_MULT % LSH_PRIME)
        / F.lit(float(LSH_PRIME))
        - 0.5,
    )


def lsh_buckets(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket): 16-bit random-hyperplane signature per vector."""
    embeddings = spread(embeddings)
    v = as_double(vec_col)
    bucket = F.lit(0).cast("bigint")
    for p in range(N_PLANES):
        bucket = bucket + F.when(
            dot(v, _plane(p)) > 0, F.lit(1 << p).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return embeddings.select(F.col(id_col), bucket.alias("bucket"))


def topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact rank restricted to same-LSH-bucket candidates.
    May return < k rows per query (single-probe recall tradeoff)."""
    buckets = lsh_buckets(embeddings, id_col, vec_col)
    emb_b = embeddings.join(buckets, id_col)
    q = emb_b.join(queries.select(id_col), id_col).select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"), "bucket"
    )
    c = spread(emb_b).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> cell assignment -> search
# within the probed cell. The classic scale path when LSH recall is not
# enough: centroid computation is one narrow explode + hash-agg, cell
# assignment is a small broadcast join (n_cells rows), and search is an
# equi-join on cell id. Here the coarse quantizer uses the fixture's
# label column as the training partition (k-means would drop in the
# same shape: anything that yields (cell, centroid) rows works).
# ---------------------------------------------------------------------------


def ivf_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, centroid): elementwise mean vector per label/cell."""
    e = spread(embeddings).select(
        F.col(label_col).alias("cell"), F.posexplode(as_double(vec_col)).alias("pos", "x")
    )
    per_dim = e.groupBy("cell", "pos").agg(F.avg("x").alias("c"))
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def ivf_assign(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, cell_cosine): nearest centroid per vector (rounded
    cosine, ties -> smallest cell id). Broadcast the tiny centroid set."""
    cents = ivf_centroids(embeddings, label_col, vec_col)
    v = embeddings.select(F.col(id_col), as_double(vec_col).alias("v"))
    scored = v.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cell",
        cosine(F.col("v"), F.col("centroid")).alias("cell_cosine"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_cosine"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "cell", "cell_cosine")
    )


def topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k searching only the query's own IVF cell (single-probe).
    Join shape: equi-join on cell id — candidate count ~ N / n_cells."""
    assign = ivf_assign(embeddings, id_col, label_col, vec_col)
    emb_c = embeddings.join(assign.select(id_col, "cell"), id_col)
    q = emb_c.join(queries.select(id_col), id_col).select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"), "cell"
    )
    c = spread(emb_c).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"), "cell"
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Matrix-block bulk scoring: for ALL-pairs workloads the pair-expansion
# plans above materialize O(N^2) rows before ranking. This path
# broadcasts the corpus as ONE numpy matrix and scores query batches
# with a BLAS matmul inside mapInPandas, emitting only the top-k rows —
# no quadratic row materialization, one Arrow batch per partition.
# Memory bound: corpus matrix (N x dim x 8B) must fit per executor —
# at larger N, shard the corpus (IVF cells / LSH buckets) first.
# ---------------------------------------------------------------------------


def _matrix_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool = True,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    C = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        Cn = np.where(norms > 0, C / norms, 0.0)  # zero-norm -> all-zero row
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((ids, Cn))

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
            StructField("rank", IntegerType()),
        ]
    )

    def _score(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy()
            Q = np.stack(pdf[vec_col].values).astype(np.float64)
            qn = np.linalg.norm(Q, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                Qn = np.where(qn > 0, Q / qn, 0.0)
            S = np.round(Qn @ c_mat.T, 6)
            out = []
            for qi, qid in enumerate(q_ids):
                s = S[qi]
                # rank by (-cosine, neighbor_id); optionally drop self
                order = np.lexsort((c_ids, -s))
                rank = 0
                for j in order:
                    if exclude_self and c_ids[j] == qid:
                        continue
                    rank += 1
                    out.append((int(qid), int(c_ids[j]), float(s[j]), rank))
                    if rank >= k:
                        break
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine", "rank"])

    return spread(queries.select(id_col, vec_col)).mapInPandas(_score, out_schema)


def nearest_neighbor_matrix(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-1 neighbor for every vector via matrix-block scoring —
    same result as nearest_neighbor, linear row count."""
    return _matrix_topk(embeddings, embeddings, 1, id_col, vec_col).select(
        "query_id", "neighbor_id", "cosine"
    )
