"""Embedding similarity-search query family over `embeddings`
(SURVEY.md Part B extensions): norms, brute-force cosine top-k, the
full ANN strategy family (SRP-LSH multiprobe, IVF cells + build-health
stats, Matryoshka prefix re-rank, PQ encoding + ADC search), corpus x
corpus k-NN join, k-NN label voting, centroid assignment / k-means,
and int8 quantization.

All vector math is 24-bit fixed-point (functions/vector.py) so dot
products are exact BIGINT sums and cosines are bit-identical across
engines — the DuckDB oracles quantize identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.functions.vector import (
    QUANT_SCALE,
    cosine_from_parts,
    qdot,
    qnorm2,
    quantize,
    vector_exact,
)
from feature_store_2_spark.operators.cache import track_persist as _track_persist
from feature_store_2_spark.operators.graph import symmetrize
from feature_store_2_spark.operators.sizing import adaptive_partitions
from feature_store_2_spark.operators.dedup import (
    SRP_SCORED_MAX_BAND_BITS,
    SRP_SCORED_OCCUPANCY,
    embedding_srp_knn_join_scored,
    embedding_srp_near_pairs_scored,
    embedding_srp_query_topk_scored,
    srp_scored_lookup_rows,
)
from feature_store_2_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    nearest_centroid_assign,
)
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

DIM = 64
_QV = f"list_transform(embedding, x -> CAST(floor(x * {QUANT_SCALE}.0) AS BIGINT))"
_SRP_LOOKUP_ROWS = srp_scored_lookup_rows()


@register(
    "emb_norms",
    f"""
WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
n AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2_q
      FROM qv CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id)
SELECT vec_id, n2_q, sqrt(CAST(n2_q AS DOUBLE)) / {QUANT_SCALE} AS l2_norm
FROM n
""",
    doc="exact quantized squared-norm + L2 norm per embedding",
)
def emb_norms(spark, sf_dir):
    # NULL embeddings do not exist for vector math (operator contract).
    e = load_table(spark, "embeddings", sf_dir).filter(
        vector_exact("embedding")
    )
    q = quantize("embedding")
    n2 = qnorm2(q)
    return e.select(
        "vec_id",
        n2.alias("n2_q"),
        (F.sqrt(n2.cast("double")) / F.lit(QUANT_SCALE)).alias("l2_norm"),
    )


@register(
    "emb_cosine_topk",
    f"""
WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
norms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
          FROM qv CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(sum(q.v[i.i] * c.v[i.i]) AS BIGINT) AS dot
    FROM qv q
    JOIN qv c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
scored AS (
    SELECT query_id, neighbor_id,
           CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
    FROM pairs
    JOIN norms nq ON pairs.query_id = nq.vec_id
    JOIN norms nc ON pairs.neighbor_id = nc.vec_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored)
WHERE rank <= 5
""",
    doc="brute-force cosine top-5 for query vectors (vec_id < 10)",
)
def emb_cosine_topk(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    return brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)


# emb_lsh_ann_topk moved below the shared adaptive-SRP CTE block — it
# rides the same corpus-derived band layout as its six siblings (r8
# verdict ask #2: the last fixed-band ANN entry leaves the scored path).


_IVF_ORACLE = f"""
WITH qv AS (SELECT vec_id, label, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
sums AS (
    SELECT label AS c_label, i.i AS d,
           CAST(sum(v[i.i]) AS BIGINT) AS s, count(*) AS cnt
    FROM qv CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
cent AS (SELECT c_label, d,
                CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT) AS c
         FROM sums),
dists AS (
    SELECT q.vec_id, cent.c_label,
           CAST(sum((q.v[cent.d] - cent.c) * (q.v[cent.d] - cent.c)) AS BIGINT) AS d2
    FROM qv q CROSS JOIN cent
    GROUP BY 1, 2),
inv AS (
    SELECT vec_id, c_label AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, c_label) AS rn
        FROM dists) WHERE rn = 1),
probes AS (
    SELECT vec_id AS query_id, c_label AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, c_label) AS rn
        FROM dists WHERE vec_id < 10) WHERE rn <= 2),
cand AS (
    SELECT p.query_id, i.vec_id AS neighbor_id
    FROM probes p JOIN inv i ON i.cell = p.cell AND i.vec_id <> p.query_id),
norms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
          FROM qv CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id),
dots AS (
    SELECT c.query_id, c.neighbor_id, CAST(sum(a.v[i.i] * b.v[i.i]) AS BIGINT) AS dot
    FROM cand c
    JOIN qv a ON c.query_id = a.vec_id
    JOIN qv b ON c.neighbor_id = b.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           CAST(d.dot AS DOUBLE) /
           (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots d
    JOIN norms na ON d.query_id = na.vec_id
    JOIN norms nb ON d.neighbor_id = nb.vec_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored)
WHERE rank <= 5
"""


@register(
    "emb_ivf_topk",
    _IVF_ORACLE,
    doc="IVF ANN: centroid cells + nprobe=2 cell search + exact re-rank "
    "(the other 100 TB ANN path besides SRP-LSH) — oracle-checked: "
    "integer-exact centroids, deterministic cell assignment tie-breaks, "
    "and the quantized cosine re-rank all reproduce in DuckDB",
)
def emb_ivf_topk(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    return ivf_topk(e, e.filter(F.col("vec_id") < 10), k=5, nprobe=2)


# Shared adaptive-SRP CTE block (r7 verdict ask #3): the oracle derives
# the SAME band layout the Spark side does — band width from count(*)
# via pure-integer min-k logic, band count from the integer lookup
# srp_scored_lookup_rows() (the recall bound evaluated once in Python;
# SQL never touches acos/log). Hyperplanes stay md5-parity-derived, so
# the candidate set is identical at ANY corpus size — the fixed-band
# n^2/16 candidate quadratic (measured exponent 1.52 at 10x,
# BENCH_NOTES.md r7) is gone from the scored path.
_SRP_ADAPTIVE_CTES = f"""
lk(bb, bands, n_bits) AS (VALUES {_SRP_LOOKUP_ROWS}),
prm AS (
    SELECT lk.bb AS band_bits, lk.n_bits AS n_bits FROM lk
    WHERE lk.bb = (SELECT min(k.k)
                   FROM generate_series(4, {SRP_SCORED_MAX_BAND_BITS}) k(k)
                   WHERE (CAST(1 AS BIGINT) << k.k) * {SRP_SCORED_OCCUPANCY}
                         >= (SELECT count(*) FROM embeddings
                             WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0))),
r AS (
    SELECT h.h AS h, i.i AS i,
           CASE WHEN ascii(substr(md5(CAST(h.h AS VARCHAR) || ':' ||
                                       CAST(i.i AS VARCHAR)), 1, 1)) % 2 = 0
                THEN 1 ELSE -1 END AS s
    FROM generate_series(0, 255) h(h)
    CROSS JOIN generate_series(1, {DIM}) i(i)
    WHERE h.h < (SELECT n_bits FROM prm)
),
qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
bits AS (
    SELECT q.vec_id, r.h,
           CASE WHEN sum(r.s * q.v[r.i]) >= 0 THEN 1 ELSE 0 END AS bit
    FROM qv q CROSS JOIN r
    GROUP BY q.vec_id, r.h
),
bands AS (
    SELECT vec_id, h // (SELECT band_bits FROM prm) AS band,
           CAST(sum(bit * (1 << (h % (SELECT band_bits FROM prm))))
                AS BIGINT) AS bkey
    FROM bits GROUP BY 1, 2
),
norms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
          FROM qv CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id)
"""

_ANN_PAIRS_ORACLE = f"""
WITH {_SRP_ADAPTIVE_CTES},
cand AS (
    SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
),
dots AS (
    SELECT c.vec1, c.vec2, CAST(sum(a.v[i.i] * b.v[i.i]) AS BIGINT) AS dot
    FROM cand c
    JOIN qv a ON c.vec1 = a.vec_id
    JOIN qv b ON c.vec2 = b.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY c.vec1, c.vec2
)
SELECT d.vec1, d.vec2,
       CAST(d.dot AS DOUBLE) /
       (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
FROM dots d
JOIN norms na ON d.vec1 = na.vec_id
JOIN norms nb ON d.vec2 = nb.vec_id
WHERE CAST(d.dot AS DOUBLE) /
      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.45
"""


@register(
    "dedup_embedding_ann_pairs",
    _ANN_PAIRS_ORACLE,
    doc="FULL-CORPUS embedding near-dup via SRP-LSH band candidates + "
    "exact quantized-cosine re-rank — the scale path (equi-join on band "
    "buckets, no all-pairs theta join). ADAPTIVE band layout (r8): "
    "band width = min k with 2^k * 64 >= n (pure integer logic both "
    "engines derive from count(*)), band count from the recall-0.9 "
    "bound via an integer lookup — so the fixed-band n^2/16 candidate "
    "quadratic (measured exponent 1.52 at 10x, BENCH_NOTES.md r7) is "
    "gone from the scored path while the md5-parity hyperplanes keep "
    "the oracle's candidate set identical and the approximate "
    "operator value-hash-gateable.",
)
def dedup_embedding_ann_pairs(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    return embedding_srp_near_pairs_scored(e, threshold=0.45)


_KNN_JOIN_ORACLE = f"""
WITH {_SRP_ADAPTIVE_CTES},
cand AS (
    SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id <> b.vec_id
),
dots AS (
    SELECT c.query_id, c.neighbor_id,
           CAST(sum(a.v[i.i] * b.v[i.i]) AS BIGINT) AS dot
    FROM cand c
    JOIN qv a ON c.query_id = a.vec_id
    JOIN qv b ON c.neighbor_id = b.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           CAST(d.dot AS DOUBLE) /
           (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots d
    JOIN norms na ON d.query_id = na.vec_id
    JOIN norms nb ON d.neighbor_id = nb.vec_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored)
WHERE rank <= 5
"""


@register(
    "emb_knn_join_ann",
    _KNN_JOIN_ORACLE,
    doc="corpus x corpus approximate k-NN JOIN (every vector's top-5 "
    "neighbors, not a broadcast query set): SRP band buckets generate "
    "directed candidates via one equi-join, exact quantized cosine "
    "re-ranks, per-query top-k window — the dedup-graph/semantic-"
    "clustering precursor and the last scale-shaped gap in the "
    "similarity family (its exact twin was the intentionally all-pairs "
    "dedup_embedding_cosine). ADAPTIVE band layout (r8, see "
    "dedup_embedding_ann_pairs): both engines derive the width from "
    "count(*) and the band count from the shared integer lookup. "
    "Oracle rebuilds the identical md5-parity "
    "hyperplanes, candidate set, and tie-breaks; recall floor vs "
    "brute_force_topk is pytest-pinned.",
)
def emb_knn_join_ann(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    return embedding_srp_knn_join_scored(e, k=5)


_QUERY_TOPK_ORACLE = f"""
WITH {_SRP_ADAPTIVE_CTES},
cand AS (
    SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id <> b.vec_id
    WHERE a.vec_id < 10
),
dots AS (
    SELECT c.query_id, c.neighbor_id,
           CAST(sum(a.v[i.i] * b.v[i.i]) AS BIGINT) AS dot
    FROM cand c
    JOIN qv a ON c.query_id = a.vec_id
    JOIN qv b ON c.neighbor_id = b.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           CAST(d.dot AS DOUBLE) /
           (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots d
    JOIN norms na ON d.query_id = na.vec_id
    JOIN norms nb ON d.neighbor_id = nb.vec_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored)
WHERE rank <= 5
"""


@register(
    "emb_lsh_ann_topk",
    _QUERY_TOPK_ORACLE,
    doc="query-set ANN top-k (10 probe vectors vs the corpus index) on "
    "the ADAPTIVE SRP band layout (r9 promotion — the last fixed-band "
    "ANN entry): candidates come from band-bucket collisions with the "
    "query side of the band join filtered and broadcast, so the corpus "
    "bands never shuffle for the candidate join and per-query candidate "
    "work is ~bands x occupancy (corpus-size-independent by "
    "srp_scored_params), not the old 16-bucket hamming-1 multiprobe's "
    "constant ~31% corpus fraction. Recall is held by the band-count "
    "bound (recall-0.9 lookup) instead of multiprobe; exact quantized-"
    "cosine re-rank with (cosine DESC, neighbor_id) tie-break keeps the "
    "approximate operator value-hash-gateable. Oracle derives the "
    "identical layout from count(*) via the shared integer lookup CTE.",
)
def emb_lsh_ann_topk(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    return embedding_srp_query_topk_scored(
        e, query_filter=F.col("vid") < 10, k=5
    )


@register(
    "emb_centroid_assign",
    f"""
WITH qv AS (SELECT vec_id, label, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
sums AS (
    SELECT label AS c_label, i.i AS d,
           CAST(sum(v[i.i]) AS BIGINT) AS s, count(*) AS cnt
    FROM qv CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
cent AS (SELECT c_label, d,
                CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT) AS c
         FROM sums),
dists AS (
    SELECT q.vec_id, q.label AS true_label, cent.c_label,
           CAST(sum((q.v[cent.d] - cent.c) * (q.v[cent.d] - cent.c)) AS BIGINT) AS dist2_q
    FROM qv q CROSS JOIN cent
    GROUP BY 1, 2, 3)
SELECT vec_id, true_label, c_label AS assigned_label, dist2_q FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2_q, c_label) AS rn
    FROM dists)
WHERE rn = 1
""",
    doc="k-means assignment step: nearest per-label centroid, exact integer L2",
)
def emb_centroid_assign(spark, sf_dir):
    return nearest_centroid_assign(load_table(spark, "embeddings", sf_dir))


_SILH_ORACLE = f"""
WITH qv AS (SELECT vec_id, label, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
sums AS (
    SELECT label AS c_label, i.i AS d,
           CAST(sum(v[i.i]) AS BIGINT) AS s, count(*) AS cnt
    FROM qv CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
cent AS (SELECT c_label, d,
                CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT) AS c
         FROM sums),
dists AS (
    SELECT q.vec_id, q.label AS own_label, cent.c_label,
           CAST(sum((q.v[cent.d] - cent.c) * (q.v[cent.d] - cent.c))
                AS BIGINT) AS dist2
    FROM qv q CROSS JOIN cent
    GROUP BY 1, 2, 3),
ab AS (
    SELECT vec_id, own_label,
           min(CASE WHEN c_label = own_label THEN dist2 END) AS a2,
           min(CASE WHEN c_label <> own_label THEN dist2 END) AS b2
    FROM dists GROUP BY 1, 2)
SELECT vec_id,
       CAST(own_label AS BIGINT) AS cluster,
       CAST(a2 AS BIGINT) AS dist2_own,
       CAST(b2 AS BIGINT) AS dist2_other,
       CASE WHEN b2 IS NULL THEN NULL
            WHEN a2 = 0 AND b2 = 0 THEN 0.0
            ELSE (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
                 / CASE WHEN a2 >= b2 THEN sqrt(CAST(a2 AS DOUBLE))
                        ELSE sqrt(CAST(b2 AS DOUBLE)) END END AS silhouette
FROM ab
"""


@register(
    "eval_silhouette_simplified",
    _SILH_ORACLE,
    doc="simplified silhouette score per vector (Hruschka et al.'s "
    "centroid form of Rousseeuw 1987): a(i) = distance to the OWN "
    "per-label centroid, b(i) = distance to the nearest OTHER "
    "centroid, s = (b - a)/max(a, b) in (-1, 1] — the cluster-"
    "quality audit the clustering family (kmeans fit / assign / "
    "outlier screen) was missing; the O(nk) centroid form replaces "
    "classic silhouette's O(n^2) all-pairs mean distances, which is "
    "the only form that survives corpus scale. Exactness: centroids "
    "and squared distances are the integer machinery of "
    "emb_centroid_assign (floor-mean quantized BIGINT, sums < 2^53); "
    "sqrt is correctly rounded per IEEE-754 in both engines, so "
    "s is a fixed 3-op double chain — hash-exact. NULL when only "
    "one cluster exists (silhouette undefined; explicit CASE, never "
    "engine-dependent greatest()-with-NULL semantics). Scale: one "
    "k x dim centroid agg broadcast back, one narrow corpus pass — "
    "zero corpus-keyed shuffles beyond the centroid partials.",
)
def eval_silhouette_simplified(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import (
        _centroids,
        _dist2,
        _prepare,
    )

    e = load_table(spark, "embeddings", sf_dir)
    q = _prepare(e.select("vec_id", "embedding"), "vec_id", "embedding")
    qlab = e.select("vec_id", "label").join(q, "vec_id")
    cent = _centroids(e, "vec_id", "embedding", "label", DIM)
    d = qlab.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("own_label"),
        "c_label",
        _dist2(F.col("qvec"), F.col("centroid")).alias("dist2"),
    )
    ab = d.groupBy("vec_id", "own_label").agg(
        F.min(
            F.when(F.col("c_label") == F.col("own_label"), F.col("dist2"))
        ).alias("a2"),
        F.min(
            F.when(F.col("c_label") != F.col("own_label"), F.col("dist2"))
        ).alias("b2"),
    )
    sa = F.sqrt(F.col("a2").cast("double"))
    sb = F.sqrt(F.col("b2").cast("double"))
    return ab.select(
        "vec_id",
        F.col("own_label").cast("long").alias("cluster"),
        F.col("a2").cast("long").alias("dist2_own"),
        F.col("b2").cast("long").alias("dist2_other"),
        F.when(F.col("b2").isNull(), F.lit(None).cast("double"))
        .when((F.col("a2") == 0) & (F.col("b2") == 0), F.lit(0.0))
        .otherwise(
            (sb - sa) / F.when(F.col("a2") >= F.col("b2"), sa).otherwise(sb)
        )
        .alias("silhouette"),
    )


@register(
    "emb_quantize_int8",
    """
WITH mx AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x))) AS m
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
qq AS (
    SELECT vec_id, CAST(m AS DOUBLE) AS scale,
           list_transform(embedding, x ->
               CASE WHEN m = 0 THEN 0
                    ELSE CAST(floor(CAST(x AS DOUBLE) / CAST(m AS DOUBLE)
                                    * 127) AS BIGINT) END) AS qv
    FROM mx)
SELECT vec_id, scale,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
       CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max,
       CAST(list_aggregate(list_transform(qv, v -> abs(v)), 'sum') AS BIGINT)
           AS q_l1,
       list_aggregate(qv, 'min') >= -127 AND list_aggregate(qv, 'max') <= 127
           AS fits_int8
FROM qq
""",
    doc="symmetric int8 quantization of embeddings (per-vector absmax "
    "scale, the layout ANN serving tiers store): q = floor(x/absmax*127). "
    "Every step — float->double widening, one division, one multiply, "
    "floor — is IEEE-exact, so the int8 codes are engine-identical; "
    "summaries are integer aggregates (order-independent). Row-local "
    "codegen projection: zero shuffles at any corpus size",
)
def emb_quantize_int8(spark, sf_dir):
    # vector_exact even though int8 quantization self-normalizes: ONE
    # uniform vector-usability contract across the surface (r10) — a
    # NaN/Inf component otherwise crashes the floor() on both engines.
    e = load_table(spark, "embeddings", sf_dir).filter(
        vector_exact("embedding")
    )
    emb = F.col("embedding")
    m = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    qv = F.transform(
        emb,
        lambda x: F.when(m == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x.cast("double") / m.cast("double") * 127)
        ),
    )
    zero = F.lit(0).cast("long")
    qsum = F.aggregate(qv, zero, lambda acc, v: acc + v)
    ql1 = F.aggregate(qv, zero, lambda acc, v: acc + F.abs(v))
    qmin = F.array_min(qv)
    qmax = F.array_max(qv)
    return e.select(
        "vec_id",
        m.cast("double").alias("scale"),
        qsum.alias("q_sum"),
        qmin.alias("q_min"),
        qmax.alias("q_max"),
        ql1.alias("q_l1"),
        ((qmin >= -127) & (qmax <= 127)).alias("fits_int8"),
    )


_KM_K, _KM_ROUNDS = 8, 3


def _kmeans_oracle(k: int = _KM_K, rounds: int = _KM_ROUNDS) -> str:
    """Unrolled Lloyd oracle (the PageRank technique, r5 verdict ask):
    seed = first k vectors by id, then ``rounds`` update+assign pairs
    as chained CTEs. Exact because every step is the same fixed-point
    arithmetic as emb_centroid_assign's oracle: quantized BIGINT
    vectors, floor-mean centroids (sums < 2^53 keep the double
    division exact), BIGINT squared-L2, (dist2, label) ties."""
    parts = [
        f"""
WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
sel AS (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS c_label
    FROM qv ORDER BY vec_id LIMIT {k}),
cent0 AS (
    SELECT s.c_label, i.i AS d, q.v[i.i] AS c
    FROM sel s JOIN qv q USING (vec_id)
    CROSS JOIN generate_series(1, {DIM}) i(i))"""
    ]
    for r in range(rounds + 1):
        if r > 0:  # update: floor-mean centroids from round r-1 labels
            parts.append(f"""
cent{r} AS (
    SELECT a.cluster AS c_label, i.i AS d,
           CAST(floor(CAST(sum(q.v[i.i]) AS DOUBLE) / count(*)) AS BIGINT)
               AS c
    FROM a{r - 1} a JOIN qv q USING (vec_id)
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2)""")
        parts.append(f"""
d{r} AS (
    SELECT q.vec_id, c.c_label,
           CAST(sum((q.v[c.d] - c.c) * (q.v[c.d] - c.c)) AS BIGINT)
               AS dist2_q
    FROM qv q CROSS JOIN cent{r} c
    GROUP BY 1, 2),
a{r} AS (
    SELECT vec_id, c_label AS cluster, dist2_q FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist2_q, c_label) AS rn
        FROM d{r}) WHERE rn = 1)""")
    return (
        ",".join(parts)
        + f"\nSELECT vec_id, cluster, dist2_q FROM a{rounds}"
    )


@register(
    "emb_kmeans_fit",
    _kmeans_oracle(),
    doc=f"Lloyd k-means fit (k={_KM_K}, fixed {_KM_ROUNDS}-round "
    "budget — the shape large-scale training actually runs) over the "
    "embedding corpus: the iterative loop around the oracle-checked "
    "single assignment step (emb_centroid_assign). Exact fixed-point "
    "arithmetic end-to-end — quantized BIGINT vectors, floor-mean "
    "centroids, BIGINT squared-L2, deterministic ties — so the fit is "
    "bit-identical across partitionings and retries; pytest pins "
    "convergence, monotone inertia, and repartition-invariance on the "
    "run-to-convergence operator. EXACT ORACLE by unrolling the "
    f"{_KM_ROUNDS} rounds into chained CTEs (the PageRank technique); "
    "the operator's converged-early break is sound under a fixed "
    "budget because Lloyd is idempotent at its fixpoint — unchanged "
    "assignments reproduce unchanged centroids, so round r == round "
    f"{_KM_ROUNDS} whenever it converges at r < {_KM_ROUNDS}.",
)
def emb_kmeans_fit(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import kmeans_fit

    return kmeans_fit(
        load_table(spark, "embeddings", sf_dir),
        k=_KM_K,
        max_iter=_KM_ROUNDS,
    )


_MRL_PRE, _MRL_M, _MRL_K = 16, 20, 5


@register(
    "emb_matryoshka_rerank",
    f"""
WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
norms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
          FROM qv CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id),
tnorms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
           FROM qv CROSS JOIN generate_series(1, {_MRL_PRE}) i(i) GROUP BY vec_id),
tpairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(sum(q.v[i.i] * c.v[i.i]) AS BIGINT) AS tdot
    FROM qv q JOIN qv c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
    CROSS JOIN generate_series(1, {_MRL_PRE}) i(i)
    GROUP BY 1, 2),
tcos AS (
    SELECT query_id, neighbor_id,
           CAST(tdot AS DOUBLE)
               / (sqrt(CAST(tq.n2 AS DOUBLE)) * sqrt(CAST(tc.n2 AS DOUBLE)))
               AS t_cosine
    FROM tpairs JOIN tnorms tq ON tpairs.query_id = tq.vec_id
                JOIN tnorms tc ON tpairs.neighbor_id = tc.vec_id),
surv AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY t_cosine DESC, neighbor_id) AS tr
        FROM tcos) WHERE tr <= {_MRL_M}),
fdot AS (
    SELECT s.query_id, s.neighbor_id,
           CAST(sum(q.v[i.i] * c.v[i.i]) AS BIGINT) AS dot
    FROM surv s JOIN qv q ON s.query_id = q.vec_id
                JOIN qv c ON s.neighbor_id = c.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
scored AS (
    SELECT f.query_id, f.neighbor_id,
           CAST(dot AS DOUBLE)
               / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
               AS cosine
    FROM fdot f JOIN norms nq ON f.query_id = nq.vec_id
                JOIN norms nc ON f.neighbor_id = nc.vec_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored)
WHERE rank <= {_MRL_K}
""",
    doc=f"Matryoshka two-stage ANN (MRL, Kusupati et al. 2022): stage 1 "
    f"scores only the first {_MRL_PRE} of {DIM} dims to prune to "
    f"{_MRL_M} candidates per query, stage 2 re-ranks survivors with "
    f"full-dimension exact cosine to top-{_MRL_K}. With real MRL "
    "vectors the prefix lives in its own (4x smaller) column, so "
    "stage 1 never even scans the full vectors — the I/O-side ANN "
    "strategy, complementary to the LSH/IVF bucketing entries. Both "
    "stages are exact quantized-integer dots with (score DESC, id) "
    "tie-breaks, so this approximate operator is still value-hash "
    "oracle-gateable; recall-vs-brute-force is pinned separately in "
    "tests/test_sketches.py.",
)
def emb_matryoshka_rerank(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import matryoshka_topk

    e = load_table(spark, "embeddings", sf_dir)
    return matryoshka_topk(
        e,
        e.filter(F.col("vec_id") < 10),
        k=_MRL_K,
        m=_MRL_M,
        prefix_dims=_MRL_PRE,
    ).select("query_id", "neighbor_id", "cosine", "rank")


@register(
    "emb_knn_label_vote",
    f"""
WITH knn AS ({_KNN_JOIN_ORACLE}),
votes AS (
    SELECT k.query_id, e.label AS cand_label,
           CAST(count(*) AS BIGINT) AS votes
    FROM knn k JOIN embeddings e ON k.neighbor_id = e.vec_id
    WHERE e.label IS NOT NULL
    GROUP BY k.query_id, e.label),
pred AS (
    SELECT query_id, cand_label, votes,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY votes DESC, cand_label) AS rn
    FROM votes)
SELECT p.query_id AS vec_id, q.label AS true_label,
       p.cand_label AS pred_label, p.votes,
       p.cand_label = q.label AS correct
FROM pred p JOIN embeddings q ON p.query_id = q.vec_id
WHERE p.rn = 1
""",
    doc="k-NN label vote — the classic semi-supervised labeling / "
    "label-quality-audit operator (predict each vector's class from "
    "its 5 nearest neighbors' majority, compare to the stored label): "
    "rides the SRP-banded k-NN join (never all-pairs), then one "
    "(query, label) hash agg and a deterministic argmax (votes DESC, "
    "label ASC tie-break). Any disagreement between pred_label and "
    "true_label is exactly the row a training pipeline routes to "
    "relabeling/review. Oracle rebuilds the identical candidate set, "
    "ranking, and vote; integer votes make the argmax engine-exact.",
)
def emb_knn_label_vote(spark, sf_dir):
    from pyspark.sql import Window as W

    e = load_table(spark, "embeddings", sf_dir)
    knn = embedding_srp_knn_join_scored(e, k=5)
    votes = (
        knn.join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("cand_label"),
            ),
            "neighbor_id",
        )
        # unlabeled neighbors don't vote: a NULL cand_label group
        # would win ties on opposite ends cross-engine (Spark orders
        # NULL first, DuckDB last — round-8 NULL-embedding fixture).
        .filter(F.col("cand_label").isNotNull())
        .groupBy("query_id", "cand_label")
        .agg(F.count("*").alias("votes"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("votes"), "cand_label")
    pred = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return pred.join(
        e.select(F.col("vec_id"), F.col("label").alias("true_label")),
        pred["query_id"] == F.col("vec_id"),
    ).select(
        "vec_id",
        "true_label",
        F.col("cand_label").alias("pred_label"),
        "votes",
        (F.col("cand_label") == F.col("true_label")).alias("correct"),
    )


_PQ_M = 4        # subspaces
_PQ_SUB = 16     # dims per subspace (4 x 16 = DIM)
_PQ_K = 16       # codebook entries per subspace

# Shared SQL kernel of PQ encoding and ADC search: quantized vectors,
# the first-{k} codebook, and exact subspace L2 distances (vec x
# subspace x codebook entry). One source of truth — both oracles embed
# this block, mirroring the Spark-side _pq_subspace_dists kernel.
_PQ_DIST_CTE = f"""WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
cb AS (SELECT vec_id AS j, v FROM qv WHERE vec_id < {_PQ_K}),
d AS (
    SELECT q.vec_id, s.s, c.j,
           CAST(sum((q.v[s.s * {_PQ_SUB} + i.i] - c.v[s.s * {_PQ_SUB} + i.i])
                  * (q.v[s.s * {_PQ_SUB} + i.i] - c.v[s.s * {_PQ_SUB} + i.i]))
                AS BIGINT) AS dist2
    FROM qv q
    CROSS JOIN generate_series(0, {_PQ_M - 1}) s(s)
    CROSS JOIN cb c
    CROSS JOIN generate_series(1, {_PQ_SUB}) i(i)
    GROUP BY q.vec_id, s.s, c.j)"""


@register(
    "emb_pq_codes",
    _PQ_DIST_CTE + f""",
best AS (
    SELECT vec_id, s, j, dist2,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY dist2, j) AS rn
    FROM d)
SELECT vec_id,
       CAST(max(CASE WHEN s = 0 THEN j END) AS BIGINT) AS code_0,
       CAST(max(CASE WHEN s = 1 THEN j END) AS BIGINT) AS code_1,
       CAST(max(CASE WHEN s = 2 THEN j END) AS BIGINT) AS code_2,
       CAST(max(CASE WHEN s = 3 THEN j END) AS BIGINT) AS code_3,
       CAST(sum(dist2) AS BIGINT) AS recon_dist2
FROM best WHERE rn = 1 GROUP BY vec_id
""",
    doc=f"product quantization (PQ) encoding — the compression member "
    f"of the ANN family (Jegou et al. 2011), alongside LSH/IVF "
    f"bucketing and MRL prefix pruning: each vector is split into "
    f"{_PQ_M} subspaces of {_PQ_SUB} dims and each sub-vector replaced "
    f"by its nearest codebook entry (argmin exact quantized-integer "
    f"L2, tie-break on code id), shrinking 64 floats to {_PQ_M} bytes "
    f"for asymmetric-distance search. The codebook here is the first "
    f"{_PQ_K} vectors (deterministic stand-in for per-subspace k-means "
    f"— the emb_kmeans_fit loop is the trainer at scale); it is a "
    f"{_PQ_M * _PQ_K}-row broadcast, the corpus scan never shuffles "
    f"for encoding, and the per-(vector, subspace) argmin window is "
    f"high-cardinality. recon_dist2 (total quantization error) rides "
    f"along for the compression-quality pytest.",
)
def emb_pq_codes(spark, sf_dir):
    from pyspark.sql import Window as W

    d = _pq_subspace_dists(spark, sf_dir)
    w = W.partitionBy("vec_id", "s").orderBy("dist2", "j")
    best = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    code = lambda s: F.max(F.when(F.col("s") == s, F.col("j"))).cast("long")
    return best.groupBy("vec_id").agg(
        code(0).alias("code_0"),
        code(1).alias("code_1"),
        code(2).alias("code_2"),
        code(3).alias("code_3"),
        F.sum("dist2").cast("long").alias("recon_dist2"),
    )


_PQ_NQ = 10  # ADC query workload: first 10 vectors


def _pq_subspace_dists(spark, sf_dir):
    """(vec_id, s, j, dist2) for every vector x subspace x codebook entry
    — the shared kernel of PQ encoding and ADC search. dist2 is exact
    quantized-integer L2 on the subspace slice."""
    from feature_store_2_spark.sources.tables import load_table as _lt

    e = _lt(spark, "embeddings", sf_dir)
    # NULL embeddings do not exist for vector math (operator contract).
    qv = e.filter(vector_exact("embedding")).select(
        "vec_id", quantize("embedding").alias("v")
    )
    subs = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("s")
    sub_slice = F.slice(F.col("v"), F.col("s") * _PQ_SUB + 1, _PQ_SUB)
    qsub = qv.select("vec_id", "v", subs).withColumn("sv", sub_slice).drop("v")
    cb = (
        qv.filter(F.col("vec_id") < _PQ_K)
        .select(F.col("vec_id").alias("j"), "v", subs)
        .withColumn("cv", sub_slice)
        .select("j", "s", "cv")
    )
    diff2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return qsub.join(F.broadcast(cb), "s").select(
        "vec_id", "s", "j", diff2.alias("dist2")
    )


@register(
    "emb_pq_adc_topk",
    _PQ_DIST_CTE + f""",
best AS (
    SELECT vec_id, s, j FROM (
        SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist2, j) AS rn
        FROM d) WHERE rn = 1),
lut AS (SELECT vec_id AS query_id, s, j, dist2 FROM d
        WHERE vec_id < {_PQ_NQ}),
adc AS (
    SELECT l.query_id, b.vec_id,
           CAST(sum(l.dist2) AS BIGINT) AS adc_dist2
    FROM best b JOIN lut l ON b.s = l.s AND b.j = l.j
    WHERE b.vec_id <> l.query_id
    GROUP BY l.query_id, b.vec_id)
SELECT query_id, vec_id, adc_dist2, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_dist2, vec_id) AS BIGINT) AS rank
    FROM adc)
WHERE rank <= 5
""",
    doc=f"PQ asymmetric-distance (ADC) top-k search — the query side of "
    f"product quantization (Jegou et al. 2011): each query precomputes "
    f"a {_PQ_M}x{_PQ_K} lookup table of exact subspace distances to "
    f"the codebook, and every encoded corpus vector's distance is just "
    f"{_PQ_M} LUT adds on its codes — no corpus floats touched at "
    f"query time, the I/O win PQ exists for. The LUT "
    f"({_PQ_NQ * _PQ_M * _PQ_K} rows for the {_PQ_NQ}-query workload) "
    f"is the ONLY broadcast; the corpus side moves codes, not vectors. "
    f"All-integer arithmetic end-to-end, so ranking and distances "
    f"hash-match the oracle exactly.",
)
def emb_pq_adc_topk(spark, sf_dir):
    from pyspark.sql import Window as W

    # localCheckpoint, not persist: d is read twice (argmin codes + the
    # query LUT); checkpointing materializes the bounded subspace-dist
    # table once and its blocks are released with the DataFrame itself,
    # instead of a never-unpersisted cache entry accumulating across
    # catalog entries in one driver process (r5 advisor finding).
    d = _pq_subspace_dists(spark, sf_dir).localCheckpoint()
    w = W.partitionBy("vec_id", "s").orderBy("dist2", "j")
    best = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "j")
    )
    lut = d.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), "s", "j", "dist2"
    )
    adc = (
        best.join(F.broadcast(lut), ["s", "j"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dist2").cast("long").alias("adc_dist2"))
    )
    wr = W.partitionBy("query_id").orderBy("adc_dist2", "vec_id")
    return adc.withColumn("rank", F.row_number().over(wr).cast("long")).filter(
        F.col("rank") <= 5
    )


_IVF_INV_PREFIX = _IVF_ORACLE[: _IVF_ORACLE.index("probes AS")].rstrip().rstrip(",")


@register(
    "emb_ivf_cell_stats",
    _IVF_INV_PREFIX
    + """
, counts AS (SELECT cell, CAST(count(*) AS BIGINT) AS n
             FROM inv GROUP BY cell),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(n) AS BIGINT) AS n_vecs FROM counts)
SELECT cell, n,
       CAST(n AS DOUBLE) / n_vecs AS share,
       CAST(n AS DOUBLE) * n_cells / n_vecs AS imbalance
FROM counts CROSS JOIN tot
""",
    doc="IVF index build health — the cell-population audit run after "
    "building an inverted-file ANN index (the ANN twin of "
    "stats_key_skew_profile): per-cell vector count, share, and "
    "imbalance factor vs a perfectly balanced index. A hot cell means "
    "nprobe queries landing there scan a corpus-sized posting list — "
    "the signal to re-train centroids or split cells. Reuses the "
    "centroid-assignment kernel (same argmin, same tie-break — the "
    "oracle literally shares the IVF oracle's CTE prefix), then one "
    "tiny agg + a 1-row totals broadcast. Exact integer counts, exact "
    "single-division doubles.",
)
def emb_ivf_cell_stats(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    cells = nearest_centroid_assign(e).select(
        "vec_id", F.col("assigned_label").alias("cell")
    )
    counts = cells.groupBy("cell").agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.count("*").alias("n_cells"), F.sum("n").cast("long").alias("n_vecs")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n",
        (F.col("n").cast("double") / F.col("n_vecs")).alias("share"),
        (F.col("n").cast("double") * F.col("n_cells") / F.col("n_vecs")).alias(
            "imbalance"
        ),
    )


# ---------------------------------------------------------------------------
# Embedding outlier detection (distance to own-label centroid)
# ---------------------------------------------------------------------------

_OUTLIER_N = 20

_OUTLIER_ORACLE = f"""
WITH qv AS (SELECT vec_id, label, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
sums AS (
    SELECT label AS c_label, i.i AS d,
           CAST(sum(v[i.i]) AS BIGINT) AS s, count(*) AS cnt
    FROM qv CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2),
cent AS (SELECT c_label, d,
                CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT) AS c
         FROM sums),
dists AS (
    SELECT q.vec_id, q.label,
           CAST(sum((q.v[cent.d] - cent.c) * (q.v[cent.d] - cent.c))
                AS BIGINT) AS dist2_q
    FROM qv q JOIN cent ON cent.c_label = q.label
    GROUP BY 1, 2)
SELECT vec_id, label, dist2_q
FROM dists
ORDER BY dist2_q DESC, vec_id
LIMIT {_OUTLIER_N}
"""


@register(
    "emb_outlier_centroid_distance",
    _OUTLIER_ORACLE,
    doc=f"embedding outlier detection: the {_OUTLIER_N} vectors "
    "farthest (exact integer squared L2) from their OWN label's "
    "centroid — the novelty/mislabeling screen run before using "
    "class labels as training signal (contrast with "
    "emb_centroid_assign, which finds the NEAREST centroid). "
    "Centroids are the deterministic floor(sum/cnt) quantized form; "
    "distances are pure BIGINT, the top-N is a "
    "TakeOrderedAndProject with a vec_id tie-break (no global "
    "window, no full sort — each partition keeps N candidates and "
    "the driver merges). Scale: one tiny k x dim centroid aggregate "
    "broadcast back, one narrow corpus pass, top-N combine.",
)
def emb_outlier_centroid_distance(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import (
        _centroids,
        _dist2,
        _prepare,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    q = _prepare(emb, "vec_id", "embedding")
    qlab = emb.select("vec_id", "label").join(q, "vec_id")
    cent = _centroids(emb)
    return (
        qlab.join(cent, F.col("label") == F.col("c_label"))
        .select(
            "vec_id",
            "label",
            _dist2(F.col("qvec"), F.col("centroid")).alias("dist2_q"),
        )
        .orderBy(F.col("dist2_q").desc(), F.col("vec_id"))
        .limit(_OUTLIER_N)
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (nearest different-label neighbor)
# ---------------------------------------------------------------------------

_HN_NQ = 20

_HARD_NEG_ORACLE = f"""
WITH qv AS (SELECT vec_id, label, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
pair AS (
    SELECT q.vec_id AS query_id, q.label AS q_label,
           c.vec_id AS hard_neg_id, c.label AS neg_label,
           CAST(sum((q.v[i.i] - c.v[i.i]) * (q.v[i.i] - c.v[i.i]))
                AS BIGINT) AS dist2_q
    FROM qv q
    JOIN qv c ON c.label <> q.label
    CROSS JOIN generate_series(1, {DIM}) i(i)
    WHERE q.vec_id < {_HN_NQ}
    GROUP BY 1, 2, 3, 4)
SELECT query_id, q_label, hard_neg_id, neg_label, dist2_q FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY dist2_q, hard_neg_id) AS rn
    FROM pair)
WHERE rn = 1
"""


@register(
    "emb_hard_negative_mining",
    _HARD_NEG_ORACLE,
    doc=f"contrastive hard-negative mining: for each of the first "
    f"{_HN_NQ} query vectors, the single nearest neighbor carrying a "
    "DIFFERENT label (exact integer squared L2, vec_id tie-break) — "
    "the pair-construction step for contrastive/triplet training "
    "where the hardest negatives carry the gradient signal. The "
    "query workload broadcasts (documented-small side, same shape "
    "as emb_cosine_topk); candidates stream through one narrow "
    "pass, and the per-query argmin shuffles only (query, best) "
    "rows. At corpus x corpus scale the same semantics ride the "
    "banded ANN candidate join (emb_knn_join_ann) with a "
    "label-mismatch filter — this entry is the exact twin that "
    "verifies that path's recall.",
)
def emb_hard_negative_mining(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import _dist2, _prepare

    emb = load_table(spark, "embeddings", sf_dir)
    q = _prepare(emb, "vec_id", "embedding")
    qlab = emb.select("vec_id", "label").join(q, "vec_id")
    qry = qlab.filter(F.col("vec_id") < _HN_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("qvec").alias("q_qvec"),
    )
    cand = qlab.select(
        F.col("vec_id").alias("hard_neg_id"),
        F.col("label").alias("neg_label"),
        "qvec",
    )
    pairs = cand.join(
        F.broadcast(qry), F.col("neg_label") != F.col("q_label")
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy("dist2_q", "hard_neg_id")
    )
    return (
        pairs.select(
            "query_id",
            "q_label",
            "hard_neg_id",
            "neg_label",
            _dist2(F.col("q_qvec"), F.col("qvec")).alias("dist2_q"),
        )
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance on the k-NN similarity graph
# ---------------------------------------------------------------------------

_BFS_ORACLE = f"""
WITH knn AS ({_KNN_JOIN_ORACLE}),
e AS (SELECT DISTINCT a, b FROM (
    SELECT query_id AS a, neighbor_id AS b FROM knn
    UNION ALL SELECT neighbor_id, query_id FROM knn)),
d0 AS (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0),
d1 AS (SELECT DISTINCT e.b AS vec_id FROM e JOIN d0 ON e.a = d0.vec_id
       WHERE e.b NOT IN (SELECT vec_id FROM d0)),
d2 AS (SELECT DISTINCT e.b AS vec_id FROM e JOIN d1 ON e.a = d1.vec_id
       WHERE e.b NOT IN (SELECT vec_id FROM d0)
         AND e.b NOT IN (SELECT vec_id FROM d1)),
d3 AS (SELECT DISTINCT e.b AS vec_id FROM e JOIN d2 ON e.a = d2.vec_id
       WHERE e.b NOT IN (SELECT vec_id FROM d0)
         AND e.b NOT IN (SELECT vec_id FROM d1)
         AND e.b NOT IN (SELECT vec_id FROM d2)),
lv AS (SELECT vec_id, 0 AS dist FROM d0
       UNION ALL SELECT vec_id, 1 FROM d1
       UNION ALL SELECT vec_id, 2 FROM d2
       UNION ALL SELECT vec_id, 3 FROM d3)
SELECT d.vec_id, CAST(COALESCE(lv.dist, -1) AS INT) AS hop_dist
FROM embeddings d LEFT JOIN lv USING (vec_id)
"""


@register(
    "graph_bfs_distance",
    _BFS_ORACLE,
    doc="Multi-source BFS hop distance over the SRP-ANN k-NN similarity "
    "graph (emb_knn_join_ann's top-5 edges, symmetrized): seeds are "
    "every vec_id divisible by 50, hop_dist is the minimum number of "
    "edges to any seed, exact up to the documented depth bound of 3, "
    "-1 beyond — the 'within k hops of a labeled cluster' predicate "
    "behind semi-supervised label spreading and contamination-"
    "neighborhood quarantine. Spark side is the Pregel frontier "
    "recipe: each round joins the frontier to the edge list on the "
    "edge key, distincts the neighbor set, anti-joins visited, and "
    "localCheckpoints so round N's plan never embeds round N-1's "
    "joins (the connected_components / k-core lineage discipline). "
    "Cost per round is one shuffle on the edge key ~ O(E); "
    "depth-bounded, never all-pairs. The oracle rebuilds the "
    "identical md5-parity kNN edge set and unrolls the three "
    "frontier steps as CTEs. Scale note: the kNN edge set now rides "
    "the ADAPTIVE band layout (r8, see dedup_embedding_ann_pairs), "
    "closing the fixed-band candidate quadratic BENCH_NOTES.md r7j "
    "measured (1.51 fixed vs 0.51 adaptive at 10x). The BFS rounds "
    "themselves are linear in E.",
)
def graph_bfs_distance(spark, sf_dir):
    from feature_store_2_spark.operators.sizing import (
        compact_for_lazy_iteration,
    )

    vecs = load_table(spark, "embeddings", sf_dir)
    # r12 size gate (guide §5 — lineage truncation is only worth it
    # past a threshold): on a compact source the three per-hop
    # localCheckpoints were pure barrier-job tax — each frontier is a
    # KB-scale frame, yet every hop paid an eager job + block
    # materialization. Below the gate the hop frames are persist()ed
    # instead: the single terminal action computes each frontier once
    # and reuses it everywhere it appears (next hop's join, the visited
    # union, the anti-joins), with zero per-hop jobs; plan depth stays
    # bounded because the checkpointed edge list is the only leaf the
    # hops stack on. Past the gate (the 10x-100x rehearsal band and
    # up) the eager localCheckpoint path is unchanged.
    lazy = compact_for_lazy_iteration(vecs)
    barrier = _track_persist if lazy else (lambda d: d.localCheckpoint())
    knn = embedding_srp_knn_join_scored(vecs, k=5).select(
        "query_id", "neighbor_id"
    )
    # One-pass symmetrization (operators/graph.symmetrize): the former
    # unionAll form ran the whole kNN candidate engine once per branch
    # while building this checkpoint (r12 profile: two identical
    # ~20 CPU-s band-join stages). Same row multiset -> same distinct
    # edge set.
    edges = (
        symmetrize(knn, "query_id", "neighbor_id")
        .distinct()
        .localCheckpoint()
    )
    seeds = (
        vecs.select("vec_id")
        .filter(F.col("vec_id") % 50 == 0)
        .withColumn("dist", F.lit(0))
    )
    visited = seeds
    frontier = seeds.select("vec_id")
    for hop in (1, 2, 3):
        nxt = barrier(
            edges.join(frontier.withColumnRenamed("vec_id", "a"), "a", "inner")
            .select(F.col("b").alias("vec_id"))
            .distinct()
            .join(visited.select("vec_id"), "vec_id", "left_anti")
        )
        visited = visited.unionAll(nxt.withColumn("dist", F.lit(hop)))
        frontier = nxt
    return vecs.select("vec_id").join(visited, "vec_id", "left").select(
        "vec_id",
        F.coalesce(F.col("dist"), F.lit(-1)).cast("int").alias("hop_dist"),
    )


# ---------------------------------------------------------------------------
# Modularity of the label partition over the k-NN graph (round 8)
# ---------------------------------------------------------------------------

_MODULARITY_ORACLE = f"""
WITH knn AS ({_KNN_JOIN_ORACLE}),
e AS (SELECT DISTINCT a, b FROM (
    SELECT query_id AS a, neighbor_id AS b FROM knn
    UNION ALL SELECT neighbor_id, query_id FROM knn)),
m AS (SELECT count(*) // 2 AS m, 4 * (count(*) // 2) * (count(*) // 2)
             AS fourm2 FROM e),
lab AS (SELECT vec_id, label FROM embeddings),
deg AS (SELECT a AS vec_id, count(*) AS deg FROM e GROUP BY 1),
degc AS (SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS deg_c,
                CAST(count(*) AS BIGINT) AS n_nodes
         FROM deg d JOIN lab l USING (vec_id) GROUP BY 1),
ein AS (SELECT la.label, CAST(count(*) // 2 AS BIGINT) AS e_in
        FROM e
        JOIN lab la ON la.vec_id = e.a
        JOIN lab lb ON lb.vec_id = e.b
        WHERE la.label = lb.label
        GROUP BY 1)
SELECT CAST(degc.label AS BIGINT) AS label,
       degc.n_nodes,
       degc.deg_c,
       CAST(coalesce(ein.e_in, 0) AS BIGINT) AS e_in,
       CAST(4 * m.m * coalesce(ein.e_in, 0) - degc.deg_c * degc.deg_c
            AS BIGINT) AS q_num_x4m2,
       CAST(m.m AS BIGINT) AS m_edges,
       CAST(4 * m.m * coalesce(ein.e_in, 0) - degc.deg_c * degc.deg_c
            AS DOUBLE) / CAST(m.fourm2 AS DOUBLE) AS q_contribution
FROM degc LEFT JOIN ein USING (label) CROSS JOIN m
"""


@register(
    "graph_modularity_labels",
    _MODULARITY_ORACLE,
    doc="Newman modularity of the LABEL partition over the adaptive-SRP "
    "k-NN similarity graph (Newman & Girvan 2004): per community, "
    "Q_c = e_in/m - (deg_c/2m)^2 — does the ground-truth labeling "
    "explain the similarity structure (the assortativity audit the "
    "graph family's CC/k-core/LPA/PageRank entries don't report; sum "
    "of rows = graph modularity, in [-1/2, 1]). Exactness: each "
    "community's contribution is emitted as the INTEGER numerator "
    "4m*e_in - deg_c^2 over the common denominator 4m^2 (one exact "
    "BIGINT chain; the double ratio is a single division of two "
    "exactly-cast BIGINTs — bit-identical; 4m^2 < 2^53 documented "
    "bound, integers are the durable output past it). Scale: the "
    "edge set dedups once; degrees, community degrees, and "
    "within-community edges are three hash aggs over E — linear, "
    "never per-pair beyond the banded kNN join itself; m is a "
    "bounded metadata scalar (the pagerank move).",
)
def graph_modularity_labels(spark, sf_dir):
    vecs = load_table(spark, "embeddings", sf_dir)
    knn = embedding_srp_knn_join_scored(vecs, k=5).select(
        "query_id", "neighbor_id"
    )
    # One-pass symmetrization — see graph_bfs_distance: the unionAll
    # form ran the kNN engine once per branch. Same distinct edge set.
    edges = (
        symmetrize(knn, "query_id", "neighbor_id")
        .distinct()
        .localCheckpoint()
    )
    # undirected edge count: bounded metadata scalar (the oracle derives
    # the same m via its own count subquery)
    m = edges.count() // 2
    fourm2 = 4 * m * m
    lab = vecs.select("vec_id", "label")
    deg = edges.groupBy(F.col("a").alias("vec_id")).agg(
        F.count("*").alias("deg")
    )
    degc = deg.join(lab, "vec_id").groupBy("label").agg(
        F.sum("deg").cast("long").alias("deg_c"),
        F.count("*").cast("long").alias("n_nodes"),
    )
    ein = (
        edges.join(
            lab.select(F.col("vec_id").alias("a"), F.col("label").alias("la")),
            "a",
        )
        .join(
            lab.select(F.col("vec_id").alias("b"), F.col("label").alias("lb")),
            "b",
        )
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg((F.count("*") / 2).cast("long").alias("e_in"))
    )
    q_num = (
        F.lit(4 * m) * F.coalesce(F.col("e_in"), F.lit(0))
        - F.col("deg_c") * F.col("deg_c")
    ).cast("long")
    return degc.join(ein, "label", "left").select(
        F.col("label").cast("long").alias("label"),
        "n_nodes",
        "deg_c",
        F.coalesce(F.col("e_in"), F.lit(0)).cast("long").alias("e_in"),
        q_num.alias("q_num_x4m2"),
        F.lit(m).cast("long").alias("m_edges"),
        (
            q_num.cast("double") / F.lit(fourm2).cast("long").cast("double")
        ).alias("q_contribution"),
    )


# ---------------------------------------------------------------------------
# Exact corpus covariance matrix (the PCA / whitening feed)
# ---------------------------------------------------------------------------

_QS2 = float(QUANT_SCALE) * float(QUANT_SCALE)

_COV_ORACLE = f"""
WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
x AS (SELECT vec_id, i.i AS i, v[i.i] AS q
      FROM qv CROSS JOIN generate_series(1, {DIM}) i(i)),
s1 AS (SELECT i, CAST(sum(q) AS DECIMAL(38,0)) AS s FROM x GROUP BY i),
s2 AS (SELECT a.i AS ai, b.i AS bi,
              CAST(sum(a.q * b.q) AS DECIMAL(38,0)) AS s2
       FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
       GROUP BY 1, 2),
n AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n FROM embeddings
     WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0)
SELECT CAST(s2.ai - 1 AS INT) AS i, CAST(s2.bi - 1 AS INT) AS j,
       CAST(CAST(n.n * s2.s2 - sa.s * sb.s AS VARCHAR) AS DOUBLE)
           / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) / {_QS2!r} AS cov
FROM s2
CROSS JOIN n
JOIN s1 sa ON sa.i = s2.ai
JOIN s1 sb ON sb.i = s2.bi
"""


@register(
    "emb_covariance_matrix",
    _COV_ORACLE,
    doc="Exact population covariance matrix of the embedding corpus "
    "(upper triangle, 0-based dims) — the sufficient-statistics feed "
    "for PCA / whitening / ZCA, computed as the moment identity "
    "cov = (n*S2(i,j) - S1(i)*S1(j)) / n^2 over 24-bit fixed-point "
    "quantized components. Spark side is the 100 TB shape: mapInPandas "
    "collapses each Arrow chunk to d(d+1)/2 int64 partial rows "
    "(overflow-provable chunk bound), and only those tiny partials "
    "shuffle into one DECIMAL(38,0) hash-agg — vectors never leave "
    "their scan partition. The one division chain runs on "
    "string-routed doubles (the d2d recipe) so both engines emit "
    "bit-identical covariances. Oracle unrolls the same moments via "
    "unnest + pair self-join (quadratic reference form).",
)
def emb_covariance_matrix(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import (
        embedding_covariance_partials,
    )

    vecs = load_table(spark, "embeddings", sf_dir)
    parts = embedding_covariance_partials(vecs)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = parts.groupBy("i", "j").agg(
        F.sum(dec("s2")).alias("S2"),
        F.sum(dec("s1i")).alias("S1i"),
        F.sum(dec("s1j")).alias("S1j"),
        F.sum(dec("n")).alias("N"),
    )
    num = (F.col("N") * F.col("S2") - F.col("S1i") * F.col("S1j")).cast(
        "decimal(38,0)"
    )
    n_d = F.col("N").cast("string").cast("double")
    return agg.select(
        "i",
        "j",
        (
            num.cast("string").cast("double") / (n_d * n_d) / F.lit(_QS2)
        ).alias("cov"),
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: ANN recall@5 audit and per-label MRR@5
# ---------------------------------------------------------------------------

_ANN_RECALL_ORACLE = f"""
WITH knn AS ({_KNN_JOIN_ORACLE}),
qv2 AS (SELECT vec_id, {_QV} AS v FROM embeddings
        WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
nn2 AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
        FROM qv2 CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id),
p2 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              CAST(sum(q.v[i.i] * c.v[i.i]) AS BIGINT) AS dot
       FROM qv2 q
       JOIN qv2 c ON q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id
       CROSS JOIN generate_series(1, {DIM}) i(i)
       GROUP BY 1, 2),
ex AS (SELECT query_id, neighbor_id FROM (
         SELECT p2.query_id, p2.neighbor_id,
                row_number() OVER (PARTITION BY p2.query_id ORDER BY
                    CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                        * sqrt(CAST(nb.n2 AS DOUBLE))) DESC,
                    p2.neighbor_id) AS rnk
         FROM p2
         JOIN nn2 na ON p2.query_id = na.vec_id
         JOIN nn2 nb ON p2.neighbor_id = nb.vec_id)
       WHERE rnk <= 5),
ann AS (SELECT query_id, neighbor_id, 1 AS hit
        FROM knn WHERE query_id % 10 = 0)
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.hit) AS BIGINT) AS n_hits,
       CAST(count(a.hit) AS DOUBLE) / count(*) AS recall_at_5
FROM ex e
LEFT JOIN ann a ON e.query_id = a.query_id
                AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


@register(
    "eval_ann_recall_at_k",
    _ANN_RECALL_ORACLE,
    doc="ANN index-quality audit: recall@5 of the SRP-banded k-NN join "
    "against exact brute-force ground truth, measured on a "
    "deterministic 10% query sample (vec_id % 10 = 0) — the "
    "production recipe for monitoring an ANN index at scale, where "
    "exact ground truth is affordable only on a sample. Both ranked "
    "lists are deterministic (quantized-integer cosine, DESC + "
    "neighbor_id tie-break), so the per-query hit count is exact "
    "integer set intersection; recall is its single division. Scale "
    "shape: ground truth broadcasts only the sampled queries against "
    "the corpus (one narrow pass, per-query top-k window); the ANN "
    "side is the banded equi-join; the audit join keys on (query, "
    "neighbor) pairs — 5 rows per sampled query.",
)
def eval_ann_recall_at_k(spark, sf_dir):
    vecs = load_table(spark, "embeddings", sf_dir)
    sample = F.col("vec_id") % 10 == 0
    exact = brute_force_topk(vecs, vecs.filter(sample), k=5).select(
        "query_id", "neighbor_id"
    )
    ann = (
        embedding_srp_knn_join_scored(vecs, k=5)
        .filter(F.col("query_id") % 10 == 0)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (F.count("hit").cast("double") / F.count("*")).alias(
                "recall_at_5"
            ),
        )
    )


_MRR_ORACLE = f"""
WITH knn AS ({_KNN_JOIN_ORACLE}),
lab AS (SELECT vec_id, label FROM embeddings),
hits AS (SELECT k.query_id, min(k.rank) AS first_rank
         FROM knn k
         JOIN lab q ON k.query_id = q.vec_id
         JOIN lab n ON k.neighbor_id = n.vec_id
         WHERE q.label = n.label
         GROUP BY k.query_id),
per AS (SELECT l.vec_id AS query_id, l.label,
               CAST(COALESCE(60 // h.first_rank, 0) AS BIGINT) AS rr60
        FROM lab l LEFT JOIN hits h ON l.vec_id = h.query_id)
SELECT CAST(label AS INT) AS label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(rr60) AS BIGINT) AS rr60_sum,
       CAST(sum(rr60) AS DOUBLE) / (60.0 * count(*)) AS mrr_at_5
FROM per GROUP BY label
"""


@register(
    "eval_mrr_retrieval",
    _MRR_ORACLE,
    doc="Per-label MRR@5 over the ANN neighbor lists: reciprocal rank "
    "of the FIRST same-label neighbor in each vector's top-5 (0 if "
    "none) — the standard retrieval-eval statistic for embedding "
    "quality by class. Floating-sum hazard dodged by exact rational "
    "arithmetic: reciprocal ranks are accumulated as integer "
    "rr60 = 60/rank (60 = lcm(1..5), so every 1/rank is exact), and "
    "MRR is ONE division of the exact integer sum by 60*n — no sum "
    "of inexact doubles in any order anywhere. Scale shape: the kNN "
    "band join dominates; label lookup is two joins on vec_id; the "
    "final agg is |labels| rows.",
)
def eval_mrr_retrieval(spark, sf_dir):
    vecs = load_table(spark, "embeddings", sf_dir)
    lab = vecs.select("vec_id", "label")
    knn = embedding_srp_knn_join_scored(vecs, k=5).select(
        "query_id", "neighbor_id", "rank"
    )
    hits = (
        knn.join(
            lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql")),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")
            ),
            "neighbor_id",
        )
        .filter(F.col("ql") == F.col("nl"))
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    per = lab.select(F.col("vec_id").alias("query_id"), "label").join(
        hits, "query_id", "left"
    ).select(
        "label",
        F.coalesce(
            F.expr("60 div first_rank"), F.lit(0)
        ).cast("long").alias("rr60"),
    )
    return per.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count("*").alias("n_queries"),
        F.sum("rr60").alias("rr60_sum"),
        (
            F.sum("rr60").cast("double") / (F.lit(60.0) * F.count("*"))
        ).alias("mrr_at_5"),
    )


# ---------------------------------------------------------------------------
# Adaptive-SRP sizing audit (round 8)
# ---------------------------------------------------------------------------

_ANN_SIZING_ORACLE = f"""
WITH {_SRP_ADAPTIVE_CTES},
bucket AS (SELECT band, bkey, CAST(count(*) AS BIGINT) AS c
           FROM bands GROUP BY 1, 2)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0) AS n_vectors,
       CAST((SELECT band_bits FROM prm) AS BIGINT) AS band_bits,
       CAST((SELECT n_bits FROM prm) // (SELECT band_bits FROM prm)
            AS BIGINT) AS n_bands,
       CAST((SELECT n_bits FROM prm) AS BIGINT) AS n_bits,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(c) AS BIGINT) AS max_bucket,
       CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS candidate_pairs
FROM bucket
"""


@register(
    "ann_adaptive_sizing_audit",
    _ANN_SIZING_ORACLE,
    doc="Cross-engine pin of the r8 adaptive-SRP parameter DERIVATION "
    "plus the realized bucket profile — the pre-flight cost check you "
    "run before launching a corpus-scale ANN join: corpus size n, the "
    "derived band width (min k with 2^k * 64 >= n, pure integer logic "
    "on both engines), band count from the shared integer lookup, and "
    "the realized (band, key) bucket census — bucket count, max "
    "occupancy, and the exact raw candidate-pair volume "
    "sum(C(c,2)) the band self-join would enumerate. Any drift "
    "between the Python sizing helper and the oracle's SQL derivation "
    "breaks this 1-row hash, so the six adaptive ANN entries' param "
    "parity is itself driver-gated. Scale shape: one signature pass + "
    "a (band,bkey) hash agg; the audit never materializes candidates.",
)
def ann_adaptive_sizing_audit(spark, sf_dir):
    from feature_store_2_spark.operators.dedup import (
        srp_band_keys_arrow,
        srp_scored_params,
    )
    from feature_store_2_spark.functions.vector import quantize

    # NULL embeddings do not exist for vector math (operator contract):
    # excluded from the corpus count n (the sizing input) AND the
    # signature pass, mirroring the oracle's IS NOT NULL.
    e = load_table(spark, "embeddings", sf_dir).filter(
        vector_exact("embedding")
    )
    n = e.count()
    n_bits, band_bits = srp_scored_params(n)
    n_parts = adaptive_partitions(e)
    bands = (
        e.repartition(n_parts, F.col("vec_id"))
        .select(
            "vec_id",
            F.posexplode(
                srp_band_keys_arrow(n_bits, band_bits, DIM)(
                    quantize(F.col("embedding"))
                )
            ).alias("band", "bkey"),
        )
    )
    bucket = bands.groupBy("band", "bkey").agg(
        F.count("*").cast("long").alias("c")
    )
    return bucket.agg(
        F.lit(n).cast("long").alias("n_vectors"),
        F.lit(band_bits).cast("long").alias("band_bits"),
        F.lit(n_bits // band_bits).cast("long").alias("n_bands"),
        F.lit(n_bits).cast("long").alias("n_bits"),
        F.count("*").cast("long").alias("n_buckets"),
        F.max("c").cast("long").alias("max_bucket"),
        # integer div, not `/2` — c*(c-1) is always even and the double
        # route would lose exactness past 2^53 at corpus scale
        F.sum(F.expr("c * (c - 1) div 2"))
        .cast("long")
        .alias("candidate_pairs"),
    )


_SEMD_TAU = 0.35


@register(
    "dedup_semantic_clusters",
    f"""
WITH assign AS ({{KMEANS}}),
qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
norms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
          FROM qv CROSS JOIN generate_series(1, {DIM}) i(i) GROUP BY vec_id),
pairs AS (
    SELECT a.vec_id AS keep_id, b.vec_id AS drop_id, a.cluster,
           CAST(sum(qa.v[i.i] * qb.v[i.i]) AS BIGINT) AS dot
    FROM assign a JOIN assign b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    JOIN qv qa ON qa.vec_id = a.vec_id
    JOIN qv qb ON qb.vec_id = b.vec_id
    CROSS JOIN generate_series(1, {DIM}) i(i)
    GROUP BY 1, 2, 3),
dropped AS (
    SELECT DISTINCT drop_id
    FROM pairs
    JOIN norms na ON keep_id = na.vec_id
    JOIN norms nb ON drop_id = nb.vec_id
    WHERE CAST(dot AS DOUBLE)
          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          >= {_SEMD_TAU})
SELECT a.vec_id, a.cluster, d.drop_id IS NULL AS is_kept
FROM assign a LEFT JOIN dropped d ON a.vec_id = d.drop_id
""".replace("{KMEANS}", _kmeans_oracle()),
    doc="SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): k-means "
    f"clusters the corpus (the oracle-checked emb_kmeans_fit, k={_KM_K}), "
    "then near-duplicate search runs ONLY WITHIN each cluster — "
    f"intra-cluster exact quantized cosine >= {_SEMD_TAU}, keep the "
    "min-id representative of each epsilon-neighborhood (greedy keep: "
    "a vector is dropped iff a smaller-id same-cluster vector sits "
    "within the threshold). Cost is sum over clusters of |c|^2, "
    "controlled by k (production sizes k ~ n/target_cluster so "
    "per-cluster all-pairs stays bounded — the paper runs 50k clusters "
    "over LAION); cross-cluster near-pairs are missed BY DESIGN (the "
    "approximation SemDeDup trades for never running corpus x corpus). "
    "Oracle nests the unrolled-Lloyd k-means CTE chain and reproduces "
    "the identical clusters, pairs, and keep set.",
)
def dedup_semantic_clusters(spark, sf_dir):
    from feature_store_2_spark.operators.similarity import kmeans_fit

    e = load_table(spark, "embeddings", sf_dir)
    assign = kmeans_fit(e, k=_KM_K, max_iter=_KM_ROUNDS).select(
        "vec_id", "cluster"
    )
    q = (
        e.filter(vector_exact("embedding"))
        .select("vec_id", quantize("embedding").alias("v"))
        .withColumn("n2", qnorm2(F.col("v")))
        .join(assign, "vec_id")
        .transform(_track_persist)  # both sides of the pair join read it
    )
    a = q.select(
        F.col("vec_id").alias("keep_id"),
        F.col("cluster").alias("ca"),
        F.col("v").alias("va"),
        F.col("n2").alias("na"),
    )
    b = q.select(
        F.col("vec_id").alias("drop_id"),
        F.col("cluster").alias("cb"),
        F.col("v").alias("vb"),
        F.col("n2").alias("nb"),
    )
    cos = cosine_from_parts(
        qdot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
    )
    dropped = (
        a.join(
            b,
            (F.col("ca") == F.col("cb")) & (F.col("keep_id") < F.col("drop_id")),
        )
        .filter(cos >= _SEMD_TAU)
        .select("drop_id")
        .distinct()
    )
    return (
        q.select("vec_id", "cluster")
        .join(dropped, q.vec_id == dropped.drop_id, "left")
        .select(
            "vec_id", "cluster", F.col("drop_id").isNull().alias("is_kept")
        )
    )
