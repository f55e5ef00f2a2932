"""Unit tests for operators/graph.py (fixed-point PageRank)."""

from calculate_file_content_size_for_vector_db_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
)


def _frames(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return e, n


def test_pagerank_star_hub_dominates(spark):
    # spokes 1..4 all point at hub 0; hub points back at 1
    e, n = _frames(spark, [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)], [0, 1, 2, 3, 4])
    pr = {r.node: r.pagerank_micro for r in pagerank(e, n).collect()}
    assert pr[0] == max(pr.values())          # the hub collects the mass
    assert pr[1] > pr[2] == pr[3] == pr[4]    # 1 gets the hub's back-edge
    # mass is conserved up to integer-floor losses (nothing dangles)
    assert 0.95 * PAGERANK_SCALE <= sum(pr.values()) <= PAGERANK_SCALE


def test_pagerank_isolated_node_keeps_teleport_mass(spark):
    e, n = _frames(spark, [(0, 1), (1, 0)], [0, 1, 2])
    pr = {r.node: r.pagerank_micro for r in pagerank(e, n).collect()}
    # node 2 has no in-edges: exactly the teleport term 150000 // 3
    assert pr[2] == (100 - 85) * PAGERANK_SCALE // 100 // 3
    assert pr[0] == pr[1] > pr[2]             # symmetric 2-cycle


def test_pagerank_deterministic_across_partitionings(spark):
    import random

    rng = random.Random(47)
    edges = [(i, rng.randrange(30)) for i in range(30) for _ in range(2)]
    edges = [(s, d) for s, d in edges if s != d]
    e, n = _frames(spark, edges, list(range(30)))
    a = sorted(map(tuple, pagerank(e, n).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(7), n.repartition(3)).collect()))
    assert a == b  # fixed-point integers: bit-exact under any partitioning
