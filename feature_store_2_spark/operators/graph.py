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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def symmetrize(
    df: DataFrame,
    c1: str,
    c2: str,
    out1: str = "a",
    out2: str = "b",
) -> DataFrame:
    """Both orientations of an edge list in ONE pass over ``df``.

    The idiomatic ``df.select(c1,c2).unionAll(df.select(c2,c1))`` runs
    the upstream subtree TWICE — Spark shares no common subexpressions
    across union branches, so an edge list derived from an expensive
    pair-mining join (Jaccard prefix, SRP kNN) pays the whole engine
    once per branch (r12 profile: two identical ~20 CPU-s candidate
    stages inside graph_bfs_distance). Exploding a two-struct array
    emits the same row MULTISET from a single execution: guide §2.4,
    remove duplicated subtrees. Row order differs from the union form,
    which is immaterial to every consumer (groupBy / distinct / join).
    """
    return df.select(
        F.explode(
            F.array(
                F.struct(F.col(c1).alias(out1), F.col(c2).alias(out2)),
                F.struct(F.col(c2).alias(out1), F.col(c1).alias(out2)),
            )
        ).alias("_sym")
    ).select(f"_sym.{out1}", f"_sym.{out2}")


def edge_endpoints(df: DataFrame, c1: str, c2: str, out: str = "v") -> DataFrame:
    """Every edge endpoint (both columns stacked) in ONE pass — the
    degree-count precursor. Same single-execution rationale as
    :func:`symmetrize`; replaces ``select(c1).unionAll(select(c2))``."""
    return df.select(F.explode(F.array(F.col(c1), F.col(c2))).alias(out))


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
        # One-pass symmetrization: the union form computed the (often
        # expensive, un-materialized) caller edge subtree once per
        # branch while BUILDING this cache. Both the propagation join
        # (per iteration) and nothing else read this; at 100 TB the
        # symmetric edge list is a materialized table partitioned by
        # "b" so every round's join is co-located.
        symmetrize(edges, src_col, dst_col).persist()
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


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc1",
    dst_col: str = "doc2",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Same contract as :func:`connected_components`, via alternating
    large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in
    O(log n) rounds regardless of graph DIAMETER, so this is the
    100 TB path for adversarially long chains where min-label
    propagation would need O(diameter) shuffles. Each round is two
    window-min passes over the edge list; the edge set only shrinks
    toward the star fixpoint (every node pointing at its component
    minimum), so per-round cost decreases monotonically.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # Large-star: every neighbor LARGER than u links to the minimum
        # of u's closed neighborhood. Output edges are (big, small).
        sym = symmetrize(e, "u", "v", out1="u", out2="v")
        m_lg = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
        large = (
            sym.withColumn("m", m_lg)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # Small-star on the (big, small)-oriented edges: u and all its
        # smaller neighbors link to the neighborhood minimum.
        sm = large.withColumn("m", F.min("v").over(Window.partitionBy("u")))
        # One-pass emit of both star edges (u->m always, v->m unless
        # v == m): the union form executed the un-materialized window
        # frame ``sm`` once per branch. Same row multiset -> same
        # distinct set.
        new_e = (
            sm.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("u").alias("u"),
                            F.col("m").alias("v"),
                            F.lit(True).alias("k"),
                        ),
                        F.struct(
                            F.col("v").alias("u"),
                            F.col("m").alias("v"),
                            (F.col("v") != F.col("m")).alias("k"),
                        ),
                    )
                ).alias("_e")
            )
            .filter(F.col("_e.k"))
            .select("_e.u", "_e.v")
            .distinct()
            .localCheckpoint()
        )
        converged = (
            new_e.count() == e.count()
            and new_e.join(e, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        e = new_e
        if converged:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # Fixpoint edges are stars: (node, component-min). Isolated nodes
    # (and the roots themselves) label as self.
    labels = e.groupBy("u").agg(F.min("v").alias("c"))
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(labels.withColumnRenamed("u", "node"), "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("c", "node").alias("component"),
        )
    )
