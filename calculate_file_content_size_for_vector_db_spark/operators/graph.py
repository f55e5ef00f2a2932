"""Graph operators over edge-list DataFrames (extension surface next
to dedup's connected components): PageRank with unrolled, fixed-count
iterations.

Design for 100 TB: each iteration is one equi-join of the edge list
with the current rank vector plus one keyed aggregation — the standard
distributed PageRank data layout (edges never move; ranks shuffle on
the join key). Iterations are UNROLLED (a fixed small count, like the
IVF/PQ Lloyd chains), so the whole computation stays one lazy Catalyst
plan and is reproducible CTE-for-CTE in the DuckDB oracle.

Determinism: ranks are FIXED-POINT integers (micro-units) and every
step is integer arithmetic (integer division for contributions and
damping), so results are bit-exact across engines, partitionings and
runs — a first float-valued version differed from DuckDB on 2/500
rows where a double sum landed exactly on the 1e-6 round-half
boundary (Spark HALF_UP vs C round-to-even); integers have no such
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGERANK_SCALE = 1_000_000  # rank unit = 1e-6 of total probability mass


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """(node, pagerank_micro): damped PageRank after ``iters`` unrolled
    power iterations, initialized uniform, in micro-units (a node's
    rank as BIGINT millionths; divide by 1e6 for the probability).

    ``nodes`` fixes the vertex set explicitly (isolated or
    dangling-target nodes keep the teleport mass). Contributions are
    pr DIV outdegree over in-edges; nodes without out-edges contribute
    nothing (their mass leaks — the simple variant; kNN graphs have
    uniform out-degree so nothing leaks there). Integer floors lose at
    most outdeg micro-units per node per round — far below any ranking
    use — and buy bit-exact reproducibility.
    """
    teleport_num = (100 - damping_pct) * PAGERANK_SCALE // 100
    n1 = nodes.select(F.col(node))
    count_row = n1.agg(F.count("*").cast("long").alias("_n"))
    deg = edges.groupBy(src).agg(F.count("*").cast("long").alias("_outdeg"))
    pr = n1.crossJoin(F.broadcast(count_row)).select(
        node, F.expr(f"{PAGERANK_SCALE} div _n").cast("long").alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, src)
            .join(pr.withColumnRenamed(node, src), src)
            .groupBy(dst)
            .agg(F.sum(F.expr("pr div _outdeg")).cast("long").alias("_c"))
        )
        pr = (
            n1.join(contrib.withColumnRenamed(dst, node), node, "left")
            .crossJoin(F.broadcast(count_row))
            .select(
                node,
                (
                    F.expr(f"{teleport_num} div _n")
                    + F.expr(f"({damping_pct} * coalesce(_c, 0L)) div 100")
                )
                .cast("long")
                .alias("pr"),
            )
        )
    return pr.select(node, F.col("pr").alias("pagerank_micro"))


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
) -> DataFrame:
    """(node, label, is_seed): semi-supervised label propagation over a
    directed edge list — after ``iters`` unrolled rounds, each
    non-seed node carries the majority label among its out-neighbors'
    labels from the previous round (ties -> smallest label; no labeled
    neighbor -> keep the previous label, NULL until one appears).
    Seeds are clamped to their given label every round, the standard
    semi-supervised variant (Zhu & Ghahramani 2002).

    Design for 100 TB: like pagerank, one equi-join of the edge list
    with the label vector plus one keyed (node, label) count and a
    per-node argmax window per round, all one lazy Catalyst plan;
    edges never move between rounds — only the narrow label vector
    re-shuffles on the join key. Determinism needs no fixed point:
    votes are integer counts and ties break on label value, so the
    result is bit-exact across engines and partitionings."""
    n1 = nodes.select(F.col(node))
    s = seeds.select(F.col(node), F.col(label).alias("_seed"))
    lab = n1.join(s, node, "left").select(node, F.col("_seed").alias("lab"))
    for _ in range(iters):
        votes = (
            edges.join(
                lab.select(F.col(node).alias(dst), F.col("lab").alias("_nl")), dst
            )
            .where(F.col("_nl").isNotNull())
            .groupBy(F.col(src).alias(node), F.col("_nl"))
            .agg(F.count("*").cast("long").alias("_votes"))
        )
        w = Window.partitionBy(node).orderBy(F.desc("_votes"), F.asc("_nl"))
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(node, F.col("_nl").alias("_win"))
        )
        lab = (
            lab.join(winner, node, "left")
            .join(s, node, "left")
            .select(
                node,
                F.coalesce(F.col("_seed"), F.col("_win"), F.col("lab")).alias("lab"),
            )
        )
    return lab.join(s, node, "left").select(
        node,
        F.col("lab").alias(label),
        F.col("_seed").isNotNull().alias("is_seed"),
    )


def clustering_coefficients(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """(node, degree, triangles, clustering_coeff): local clustering
    coefficient over the UNDIRECTED projection of an edge list —
    2T / (deg * (deg - 1)), the per-node density signal that separates
    hub-of-a-clique vectors from bridge vectors in a semantic graph.

    Plan shape: the canonical two-join triangle enumeration — orient
    every undirected edge a < b, join edge (a,b) with (b,c) then
    verify (a,c) exists, so each triangle is found exactly once
    (a < b < c); explode its 3 corners and count per node. All
    equi-joins on node keys; work is sum over nodes of deg^2, the
    standard distributed triangle-count bound (kNN graphs have
    bounded degree, so this is linear there)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias(node))
        .unionAll(und.select(F.col("b").alias(node)))
        .groupBy(node)
        .agg(F.count("*").cast("long").alias("degree"))
    )
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias(node))
        .unionAll(tri.select(F.col("b").alias(node)))
        .unionAll(tri.select(F.col("c").alias(node)))
        .groupBy(node)
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return (
        nodes.select(F.col(node))
        .join(deg, node, "left")
        .join(corners, node, "left")
        .select(
            node,
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                F.round(
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                    6,
                ),
            ).alias("clustering_coeff"),
        )
    )
