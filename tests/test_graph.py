"""Connected components (operators/graph.py): correctness on hand-built
graphs where the fixpoint answer is known by inspection, for BOTH the
min-label-propagation default and the large-star/small-star scale path,
plus randomized cross-algorithm parity."""

import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.operators.graph import (
    connected_components,
    connected_components_star,
)

ALGOS = [connected_components, connected_components_star]


def _run(spark, algo, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "doc1 long, doc2 long"
    )
    if not edge_pairs:
        edges = edges.filter(F.lit(False))
    out = algo(nodes, edges)
    return {r["doc_id"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("algo", ALGOS)
def test_chain_and_isolated(spark, algo):
    # 0-1-2-3 chain (diameter 3, needs >1 propagation round) + isolated 9.
    got = _run(spark, algo, [0, 1, 2, 3, 9], [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 9}


@pytest.mark.parametrize("algo", ALGOS)
def test_two_components_merge_via_bridge(spark, algo):
    # Two triangles bridged through (2, 10): one component, min id wins.
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    got = _run(spark, algo, [0, 1, 2, 10, 11, 12], edges)
    assert got == {i: 0 for i in [0, 1, 2, 10, 11, 12]}


@pytest.mark.parametrize("algo", ALGOS)
def test_no_edges_every_node_is_own_component(spark, algo):
    got = _run(spark, algo, [5, 6, 7], [])
    assert got == {5: 5, 6: 6, 7: 7}


def test_long_chain_converges_star(spark):
    # 30-node path is the worst case for min-label propagation (one hop
    # per round); the star algorithm must collapse it in O(log n) rounds.
    n = 30
    got = _run(spark, connected_components_star, list(range(n)),
               [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_adversarial_10k_chain_logn_rounds(spark):
    """The 100 TB worst case: a 10,000-node path (diameter 9,999).
    Min-label propagation would need ~10k shuffle rounds; the
    large-star/small-star algorithm must collapse it to one component
    in O(log n) rounds. The 24-round cap is the proof: a
    diameter-bounded algorithm could move a label at most 24 hops, so
    converging AND labeling all 10k nodes correctly within the cap is
    only possible with the logarithmic contraction."""
    n = 10_000
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc1 long, doc2 long"
    )
    stats = {}
    out = connected_components_star(nodes, edges, max_iter=24, stats=stats)
    bad = out.filter(F.col("component") != 0).count()
    assert bad == 0, f"{bad} of {n} chain nodes not labeled 0"
    assert stats["rounds"] <= 24, stats


def test_random_graph_parity(spark):
    # 120 nodes, sparse random edges: both algorithms must emit the
    # identical (node, component) labeling.
    rng = random.Random(7)
    nodes = list(range(120))
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(90)
    ]
    a = _run(spark, connected_components, nodes, edges)
    b = _run(spark, connected_components_star, nodes, edges)
    assert a == b
