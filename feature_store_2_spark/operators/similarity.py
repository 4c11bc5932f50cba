"""Similarity search over embedding columns.

Two strategies (north-star extension, SURVEY.md §2 Part B "LLM-data"):
  * brute-force top-k — broadcast the (small) query set against the
    candidate corpus, cosine per pair, per-query rank. Exact; the right
    baseline whenever |queries| x |corpus| per executor stays bounded.
  * LSH-bucketed ANN — deterministic signed-random-projection signature
    (hyperplane signs derived from crc32, engine-internal), candidates
    only within matching buckets. The 100 TB path: bucket join instead
    of cross join; recall tunable by bits/tables.

Both use the exact quantized-integer vector math from
functions/vector.py — no UDFs, no Python row path.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from feature_store_2_spark.operators.cache import track_persist as _track_persist
from feature_store_2_spark.functions.vector import (
    vector_exact,
    cosine_from_parts,
    qdot,
    qnorm2,
    quantize,
)


def _prepare(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # Engine contract: a NULL embedding (failed encoder call) does not
    # exist for vector math — filtered at every operator boundary
    # (round-8 NULL-embedding fixture class).
    q = quantize(F.col(vec_col))
    return emb.filter(vector_exact(F.col(vec_col))).select(
        F.col(id_col), q.alias("qvec"), qnorm2(q).alias("qn2")
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Queries are broadcast (small side); candidates stream through — one
    narrow pass over the corpus plus a per-query top-k window. At scale
    the window shuffle is on query_id (tiny), so the heavy side never
    reshuffles.
    """
    cand = _prepare(emb, id_col, vec_col)
    qry = _prepare(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qn2").alias("q_qn2"),
    )
    pairs = cand.join(F.broadcast(qry), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_from_parts(
            qdot(F.col("q_qvec"), F.col("qvec")), F.col("q_qn2"), F.col("qn2")
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _srp_signature(qvec: Column, n_bits: int, dim: int) -> Column:
    """Deterministic signed-random-projection signature: hyperplane
    component (b, d) has sign +1 iff crc32("b:d") is even. Integer-exact
    on quantized vectors, so bucket assignment is reproducible across
    engines, retries, and cluster layouts.

    The sign matrix is precomputed driver-side with zlib.crc32 (verified
    bit-identical to ``F.crc32`` on the same bytes) — the plan then
    carries n_bits*dim integer literals instead of n_bits*dim crc32
    expression nodes, a large analysis/codegen saving."""
    bits = []
    for b in range(n_bits):
        signs = [
            1 if zlib.crc32(f"{b}:{d}".encode()) % 2 == 0 else -1
            for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                qvec,
                F.array(*[F.lit(s).cast("long") for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    sig = bits[0]
    for bit in bits[1:]:
        sig = sig * 2 + bit
    return sig.cast("long")


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP
    bucket, then exact cosine re-rank. Bucket join replaces the cross
    join — per-bucket work is |corpus|/2^n_bits on average, the
    standard ANN trade at 100 TB.

    ``multiprobe`` additionally probes every bucket at hamming distance
    1 from the query's signature (Lv et al., VLDB'07): a near neighbor
    that disagrees on ONE hyperplane is recovered for at most
    (n_bits+1)x the per-query candidate work, with the corpus side
    untouched — the standard recall/cost lever when more hash tables
    are too expensive. Measured on the synthetic corpus it is neutral
    (the low-rank embeddings concentrate into few populated buckets, so
    hamming-1 probes land on empty ones and recall@5 stays 0.34 at
    sf0.001; LSH recall-per-candidate is data-bounded there) — on
    spread bucket distributions the extra probes are what pay."""
    cand = _prepare(emb, id_col, vec_col).withColumn(
        "bucket", _srp_signature(F.col("qvec"), n_bits, dim)
    )
    sig = _srp_signature(F.col("qvec"), n_bits, dim)
    probes = (
        F.array(sig, *[sig.bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)])
        if multiprobe
        else F.array(sig)
    )
    qry = (
        _prepare(queries, id_col, vec_col)
        .withColumn("bucket", F.explode(probes))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("qvec").alias("q_qvec"),
            F.col("qn2").alias("q_qn2"),
            "bucket",
        )
    )
    pairs = (
        cand.join(F.broadcast(qry), on="bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        # A candidate can surface from several probes; it must be scored
        # and ranked once.
        .dropDuplicates(["query_id", id_col])
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_from_parts(
            qdot(F.col("q_qvec"), F.col("qvec")), F.col("q_qn2"), F.col("qn2")
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Deterministic per-label centroids in quantized units:
    (c_label, centroid array<bigint>). floor(sum/cnt) with sums < 2^53
    keeps the division exact — same centroid on every engine/layout."""
    q = _prepare(emb.select(id_col, vec_col, label_col), id_col, vec_col)
    qlab = emb.select(id_col, label_col).join(q, id_col)
    sums = qlab.groupBy(label_col).agg(
        F.array(
            *[F.sum(F.element_at("qvec", d + 1)).alias(f"s{d}") for d in range(dim)]
        ).alias("csum"),
        F.count("*").alias("cnt"),
    )
    return sums.select(
        F.col(label_col).alias("c_label"),
        F.transform(
            "csum", lambda s: F.floor(s.cast("double") / F.col("cnt")).cast("long")
        ).alias("centroid"),
    )


def _dist2(vec: Column, centroid: Column) -> Column:
    return F.aggregate(
        F.zip_with(vec, centroid, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    cells (the inverted file), probe each query's ``nprobe`` nearest
    cells, exact cosine re-rank within the probed candidates only.

    Scale shape: the cell list is a tiny broadcast table; corpus cell
    assignment is one narrow pass; the candidate join hits ~nprobe/k_cells
    of the corpus per query instead of all of it — the standard IVF trade.
    Recall is tunable via nprobe (tests measure it against brute force).
    """
    cents = _centroids(emb, id_col, vec_col, label_col, dim).transform(
        _track_persist
    )

    # Invert: corpus vector -> nearest cell.
    cand = _prepare(emb, id_col, vec_col)
    w_cell = W.partitionBy(id_col).orderBy("d2", "c_label")
    inverted = (
        cand.crossJoin(F.broadcast(cents))
        .select(
            id_col, "qvec", "qn2", "c_label",
            _dist2(F.col("qvec"), F.col("centroid")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") == 1)
        .select(id_col, "qvec", "qn2", F.col("c_label").alias("cell"))
    )

    # Probe: each query -> its nprobe nearest cells.
    qry = _prepare(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qn2").alias("q_qn2"),
    )
    w_probe = W.partitionBy("query_id").orderBy("d2", "c_label")
    probes = (
        qry.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "q_qvec", "q_qn2", "c_label",
            _dist2(F.col("q_qvec"), F.col("centroid")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_qvec", "q_qn2", F.col("c_label").alias("cell"))
    )

    # Search only the probed cells; exact re-rank.
    pairs = inverted.join(F.broadcast(probes), on="cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_from_parts(
            qdot(F.col("q_qvec"), F.col("qvec")), F.col("q_qn2"), F.col("qn2")
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def nearest_centroid_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """One k-means assignment step: per-label centroids, then each
    vector -> nearest centroid by squared L2 (exact integer form).

    Centroid components are floor(sum/cnt) in quantized units (sum <
    2^53 so the double division is exact), making dist^2 pure BIGINT
    arithmetic — deterministic assignments, overflow-safe at any group
    size. Shape: one agg (tiny k x dim result), broadcast back, one
    narrow pass over the corpus."""
    q = _prepare(emb.select(id_col, vec_col, label_col), id_col, vec_col)
    qlab = emb.select(id_col, label_col).join(q, id_col)
    centroids = _centroids(emb, id_col, vec_col, label_col, dim)
    joined = qlab.crossJoin(F.broadcast(centroids))
    w = W.partitionBy(id_col).orderBy("dist2_q", "c_label")
    return (
        joined.select(
            F.col(id_col),
            F.col(label_col),
            F.col("c_label"),
            _dist2(F.col("qvec"), F.col("centroid")).alias("dist2_q"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            F.col(label_col).alias("true_label"),
            F.col("c_label").alias("assigned_label"),
            "dist2_q",
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """Full Lloyd k-means over the corpus: deterministic init (first k
    vectors by id), then assign/update rounds until assignments are
    stable. Every step is the exact fixed-point arithmetic of
    nearest_centroid_assign — quantized BIGINT vectors, floor-mean
    centroids (sums < 2^53 keep the division exact), squared-L2 in
    BIGINT, ties broken by centroid id — so the fit is bit-identical
    across partitionings, retries, and cluster layouts: a retried stage
    can never flip an assignment.

    Scale shape per round: one tiny k x dim aggregate, broadcast back,
    one narrow corpus pass (same as the oracle-checked single-step
    ``emb_centroid_assign``); ``localCheckpoint`` truncates lineage so
    round N doesn't re-analyze N stacked plans. Driver only ever sees
    the k x dim centroid table and a 1-row convergence count.
    """
    q = _prepare(emb.select(id_col, vec_col), id_col, vec_col).localCheckpoint()

    # Deterministic init = first k vectors by id. orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition top-k merged on the driver, k rows
    # moved) — never a global-sort window. The k x dim seed table is bounded
    # driver metadata, re-emitted as a local relation with labels 0..k-1.
    seed_rows = q.select(id_col, "qvec").orderBy(id_col).limit(k).collect()
    centroids = emb.sparkSession.createDataFrame(
        [(i, list(r["qvec"])) for i, r in enumerate(seed_rows)],
        schema="c_label long, centroid array<long>",
    )

    def assign(cents: DataFrame) -> DataFrame:
        j = q.crossJoin(F.broadcast(cents))
        w = W.partitionBy(id_col).orderBy("dist2_q", "c_label")
        return (
            j.select(
                F.col(id_col),
                F.col("c_label"),
                _dist2(F.col("qvec"), F.col("centroid")).alias("dist2_q"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, F.col("c_label").alias("cluster"), "dist2_q")
        )

    labels = assign(centroids).localCheckpoint()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        assigned = q.join(labels.select(id_col, "cluster"), id_col)
        sums = assigned.groupBy("cluster").agg(
            F.array(
                *[F.sum(F.element_at("qvec", d + 1)).alias(f"s{d}") for d in range(dim)]
            ).alias("csum"),
            F.count("*").alias("cnt"),
        )
        centroids = sums.select(
            F.col("cluster").alias("c_label"),
            F.transform(
                "csum", lambda s: F.floor(s.cast("double") / F.col("cnt")).cast("long")
            ).alias("centroid"),
        ).localCheckpoint()
        new_labels = assign(centroids).localCheckpoint()
        moved = (
            new_labels.alias("n")
            .join(labels.alias("o"), id_col)
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if moved == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels


def matryoshka_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 20,
    prefix_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style two-stage top-k (Kusupati et al. 2022: MRL
    embeddings carry a usable coarse representation in their prefix):

      stage 1 — cosine over only the first ``prefix_dims`` components
      prunes the corpus to ``m`` candidates per query (4x cheaper dot
      products here at 64->16 dims; with real MRL vectors the prefix can
      live in a separate, smaller column so the full vector is never
      even SCANNED for non-candidates — the I/O win at 100 TB);
      stage 2 — exact full-dimension re-rank of the m survivors to k.

    Both stages use exact quantized-integer dots with (score DESC, id)
    tie-breaks, so the pipeline is deterministic end-to-end and
    oracle-gateable despite being an approximation of brute force.
    """
    # vector_exact (r10): same intake contract as _prepare — a NaN/Inf
    # component or out-of-envelope magnitude must not reach quantize.
    emb = emb.filter(vector_exact(F.col(vec_col)))
    q_all = quantize(F.col(vec_col))
    q_pre = F.slice(q_all, 1, prefix_dims)
    cand = emb.select(
        F.col(id_col),
        q_all.alias("qvec"),
        qnorm2(q_all).alias("qn2"),
        q_pre.alias("pvec"),
        qnorm2(q_pre).alias("pn2"),
    )
    qry = emb.select(
        F.col(id_col).alias("query_id"),
        q_all.alias("q_qvec"),
        qnorm2(q_all).alias("q_qn2"),
        q_pre.alias("q_pvec"),
        qnorm2(q_pre).alias("q_pn2"),
    ).join(queries.select(F.col(id_col).alias("query_id")), "query_id")
    pairs = cand.join(F.broadcast(qry), F.col(id_col) != F.col("query_id"))
    coarse = pairs.withColumn(
        "t_cosine",
        cosine_from_parts(
            qdot(F.col("q_pvec"), F.col("pvec")), F.col("q_pn2"), F.col("pn2")
        ),
    )
    w_t = W.partitionBy("query_id").orderBy(F.desc("t_cosine"), id_col)
    survivors = coarse.withColumn("t_rank", F.row_number().over(w_t)).filter(
        F.col("t_rank") <= m
    )
    rer = survivors.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_from_parts(
            qdot(F.col("q_qvec"), F.col("qvec")), F.col("q_qn2"), F.col("qn2")
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return rer.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def embedding_covariance_partials(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-batch partial sufficient statistics for the exact corpus
    covariance matrix — the X^T X outer-product accumulation every
    PCA / whitening / ZCA embedding pipeline runs before the (tiny,
    driver-side) eigendecomposition.

    100 TB shape: each Arrow batch collapses to at most a few
    (dim*(dim+1)/2)-row partials — the shuffle moves O(#batches * d^2)
    tiny rows, never vectors. Exactness: vectors are quantized to
    24-bit fixed point (functions/vector.py), chunk sizes are bounded
    so every int64 einsum accumulation provably fits (chunk *
    max|q|^2 < 2^62), and the final reduction happens in
    DECIMAL(38,0) on the Spark side.

    Output columns (one row per chunk per upper-triangle pair):
    i, j (0-based dims, i <= j), s2 = sum q_i*q_j, s1i/s1j = sum q_i /
    sum q_j over the chunk, n = chunk row count. groupBy(i, j) then
    recovers the exact global moments (each chunk contributes exactly
    one row per pair, so summing s1i per (i,j) group never
    double-counts).
    """
    import numpy as np
    import pandas as pd

    # NULL embeddings contribute nothing to the moments (and an
    # inhomogeneous batch crashes np.array) — operator-boundary filter.
    qdf = emb.filter(vector_exact(F.col(vec_col))).select(
        quantize(F.col(vec_col)).alias("qv")
    )

    def acc(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            arr_all = np.array(pdf["qv"].tolist(), dtype=np.int64)
            dim = arr_all.shape[1]
            iu = np.triu_indices(dim)
            maxq = int(np.abs(arr_all).max())
            chunk = 8192 if maxq == 0 else max(1, min(8192, (1 << 62) // (maxq * maxq)))
            for s in range(0, len(arr_all), chunk):
                a = arr_all[s : s + chunk]
                s1 = a.sum(axis=0)
                s2 = a.T @ a
                yield pd.DataFrame(
                    {
                        "i": iu[0].astype("int32"),
                        "j": iu[1].astype("int32"),
                        "s2": s2[iu],
                        "s1i": s1[iu[0]],
                        "s1j": s1[iu[1]],
                        "n": np.int64(len(a)),
                    }
                )

    return qdf.mapInPandas(acc, "i int, j int, s2 long, s1i long, s1j long, n long")
