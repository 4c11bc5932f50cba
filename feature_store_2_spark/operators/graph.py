"""Iterative graph operators for dedup-cluster canonicalization.

Near-dup pair mining (Jaccard / MinHash / SimHash / embedding-SRP — see
``operators.dedup``) emits EDGES, but a curation pipeline needs CLUSTERS:
similarity is not transitive, so "keep one doc per group of mutually-
near documents" is connected components over the pair graph, with the
minimum doc_id as the cluster's canonical representative (deterministic
across engines, retries, and partitionings).

Spark has no recursive SQL, so components are computed as an iterative
min-label propagation driven from the driver — the standard Pregel
shape expressed with DataFrames only:

  labels <- node id
  repeat: label(v) <- min(label(v), min over neighbors u of label(u))

Each round is one equi-join + one groupBy (both AQE-planned), and
``localCheckpoint()`` truncates the plan lineage so iteration N doesn't
re-analyze N stacked joins. Rounds needed = graph diameter, which for
near-dup corpora is tiny (dup clusters are dense cliques-of-cliques; the
sf corpora converge in <= 3 rounds). For adversarially long chains at
100 TB the O(log n)-round alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) drops in behind the same signature; diameter-bounded
propagation is the right default for dedup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc1",
    dst_col: str = "doc2",
    max_iter: int = 50,
) -> DataFrame:
    """(id_col, component) for EVERY node in ``nodes``: component = the
    minimum node id reachable through ``edges`` (undirected); isolated
    nodes are their own component. Deterministic: min-id is a total
    order, independent of partitioning and join order.

    ``nodes`` must contain every id referenced by ``edges``.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        # Both the propagation join (per iteration) and nothing else read
        # this; at 100 TB the symmetric edge list is a materialized table
        # partitioned by "b" so every round's join is co-located.
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "component")
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            # Truncate lineage: without this, round N's plan embeds all
            # N-1 previous joins and Catalyst analysis dominates wall
            # time long before the data does.
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("node").alias(id_col), "component")
