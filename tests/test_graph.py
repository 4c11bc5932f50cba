"""Connected components (operators/graph.py): correctness on hand-built
graphs where the fixpoint answer is known by inspection."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.operators.graph import connected_components


def _run(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "doc1 long, doc2 long"
    )
    if not edge_pairs:
        edges = edges.filter(F.lit(False))
    out = connected_components(nodes, edges)
    return {r["doc_id"]: r["component"] for r in out.collect()}


def test_chain_and_isolated(spark):
    # 0-1-2-3 chain (diameter 3, needs >1 propagation round) + isolated 9.
    got = _run(spark, [0, 1, 2, 3, 9], [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 9}


def test_two_components_merge_via_bridge(spark):
    # Two triangles bridged through (2, 10): one component, min id wins.
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    got = _run(spark, [0, 1, 2, 10, 11, 12], edges)
    assert got == {i: 0 for i in [0, 1, 2, 10, 11, 12]}


def test_no_edges_every_node_is_own_component(spark):
    got = _run(spark, [5, 6, 7], [])
    assert got == {5: 5, 6: 6, 7: 7}


def test_long_chain_converges(spark):
    # 30-node path: worst case for min-label propagation (label travels
    # one hop per round); must still converge under max_iter=50.
    n = 30
    got = _run(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}
