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


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

from calculate_file_content_size_for_vector_db_spark.operators.graph import (  # noqa: E402
    label_propagation,
)


def _lp_frames(spark, edges, seeds, nodes):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "node long, label int")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return e, s, n


def test_label_propagation_majority_and_tiebreak(spark):
    # node 3's neighbors: two label-1 seeds and one label-2 seed -> 1;
    # node 4's neighbors: one of each -> tie -> smallest label wins
    e, s, n = _lp_frames(
        spark,
        [(3, 0), (3, 1), (3, 2), (4, 1), (4, 2)],
        [(0, 1), (1, 1), (2, 2)],
        [0, 1, 2, 3, 4],
    )
    out = {r.node: (r.label, r.is_seed) for r in label_propagation(e, s, n, iters=1).collect()}
    assert out[3] == (1, False)
    assert out[4] == (1, False)  # tie between 1 and 2 -> smallest
    assert out[0] == (1, True) and out[2] == (2, True)


def test_label_propagation_seeds_clamped_and_spread(spark):
    # chain 0 -> 1 -> 2 with seed only at the far end; edges point
    # TOWARD the seed (a node reads labels from its out-neighbors)
    e, s, n = _lp_frames(spark, [(1, 2), (0, 1)], [(2, 7)], [0, 1, 2])
    one = {r.node: r.label for r in label_propagation(e, s, n, iters=1).collect()}
    assert one[1] == 7 and one[0] is None  # 0's neighbor was unlabeled in round 1
    two = {r.node: r.label for r in label_propagation(e, s, n, iters=2).collect()}
    assert two == {0: 7, 1: 7, 2: 7}


def test_label_propagation_seed_never_flips(spark):
    # seed 0 (label 5) is pointed at three label-9 seeds: stays 5
    e, s, n = _lp_frames(
        spark,
        [(0, 1), (0, 2), (0, 3)],
        [(0, 5), (1, 9), (2, 9), (3, 9)],
        [0, 1, 2, 3],
    )
    out = {r.node: r.label for r in label_propagation(e, s, n, iters=3).collect()}
    assert out[0] == 5


# ---------------------------------------------------------------------------
# clustering_coefficients
# ---------------------------------------------------------------------------

from calculate_file_content_size_for_vector_db_spark.operators.graph import (  # noqa: E402
    clustering_coefficients,
)


def test_clustering_coeff_triangle_plus_tail(spark):
    # triangle 0-1-2 plus a tail 2-3: nodes 0,1 have cc=1, node 2 sits
    # in 1 triangle of deg 3 -> cc = 2*1/(3*2) = 1/3, tail node cc NULL
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    n = spark.createDataFrame([(i,) for i in range(5)], "node long")
    out = {r.node: r for r in clustering_coefficients(e, n).collect()}
    assert out[0].clustering_coeff == 1.0 and out[1].clustering_coeff == 1.0
    assert out[2].degree == 3 and out[2].triangles == 1
    assert out[2].clustering_coeff == round(1 / 3, 6)
    assert out[3].degree == 1 and out[3].clustering_coeff is None
    assert out[4].degree == 0 and out[4].triangles == 0  # isolated node kept


def test_clustering_coeff_direction_and_duplicate_invariant(spark):
    # same undirected structure written with reversed + duplicated
    # directed edges must give identical results
    e1 = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    e2 = spark.createDataFrame(
        [(1, 0), (0, 1), (2, 1), (0, 2), (2, 0)], "src long, dst long"
    )
    n = spark.createDataFrame([(i,) for i in range(3)], "node long")
    a = sorted(map(tuple, clustering_coefficients(e1, n).collect()))
    b = sorted(map(tuple, clustering_coefficients(e2, n).collect()))
    assert a == b
