"""Sketch-based approximate aggregates (the 100 TB substitutes for exact
distinct/quantile shuffles). Engine-internal approximation layouts
(HLL++) carry no value-exact oracle — the driver records the rows-only
check — but each has an exact twin in the catalog (agg_distinct_exact,
agg_median_quantiles) and a pytest bound check (tests/test_sketches.py)
against the exact answer. GK percentiles were promoted to an EXACT
rank-certification oracle in r11 (see sketch_approx_percentiles); CMS
and Bloom are integer-exact cross-engine from the start.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


@register(
    "sketch_hll_users_per_type",
    None,
    doc="HyperLogLog++ distinct users per event type (vs exact twin "
    "agg_distinct_exact); the sketch is mergeable across partitions",
)
def sketch_hll_users_per_type(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


_GK_ACC = 10000
# (label, numerator, denominator): quantiles as exact fractions so every
# window bound below is pure BIGINT arithmetic — no 0.9*n double slop.
_GK_QUANTILES = (("p50", 1, 2), ("p90", 9, 10))


@register(
    "sketch_approx_percentiles",
    f"""
WITH g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1)
SELECT l_returnflag, quantile, n,
       CAST(((num * {_GK_ACC} - den) * n) // (den * {_GK_ACC})
            AS BIGINT) AS rank_lo,
       CAST(((num * {_GK_ACC} + den) * n + den * {_GK_ACC} - 1)
            // (den * {_GK_ACC}) AS BIGINT) AS rank_hi,
       TRUE AS in_bound
FROM g CROSS JOIN (VALUES ('p50', 1, 2), ('p90', 9, 10))
     AS t(quantile, num, den)
""",
    doc="approx_percentile (Greenwald-Khanna) per return flag, promoted "
    "from rows-only to an EXACT oracle via RANK-BOUND CERTIFICATION "
    "(the r10 verdict's ask #4 — the stream_denial_rate move): the GK "
    "VALUE itself is approximation-valued and stays out of the output "
    "(its element-of-group + rank-error contract is pytest-pinned, "
    "tests/test_sketches.py), but the CONTRACT is checkable — Spark "
    "computes each returned value's exact below/at-or-below counts "
    "against the group and certifies the QuantileSummaries guarantee "
    "floor((q-eps)*n) <= rank(v) <= ceil((q+eps)*n) with eps = "
    "1/accuracy (count(<=v) against the floor, count(<v) against the "
    "ceil — the floor/ceil discreteness is part of Spark's documented "
    "bound and a plain +-eps*n window is measurably one row too "
    "tight); all arithmetic is integer via the (num, den) quantile "
    "fractions. The oracle independently computes the same rank "
    "window (rank_lo, rank_hi) and asserts the certification holds "
    "(in_bound TRUE). A GK merge-order wobble can move the value but "
    "never the boolean — any contract violation hash-mismatches. The "
    "certify pass is one broadcast of the 3-row GK table back over "
    "the scan: no extra shuffle.",
)
def sketch_approx_percentiles(spark, sf_dir):
    from functools import reduce

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_extendedprice"
    )
    gk = li.groupBy("l_returnflag").agg(
        *[
            F.approx_percentile(
                "l_extendedprice", F.lit(num / den), F.lit(_GK_ACC)
            ).alias(f"v_{qn}")
            for qn, num, den in _GK_QUANTILES
        ]
    )
    j = li.join(F.broadcast(gk), "l_returnflag")
    stats = j.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        *[
            c
            for qn, _, _ in _GK_QUANTILES
            for c in (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") < F.col(f"v_{qn}"), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"lt_{qn}"),
                F.sum(
                    F.when(
                        F.col("l_extendedprice") <= F.col(f"v_{qn}"), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"le_{qn}"),
            )
        ],
    )
    parts = []
    for qn, num, den in _GK_QUANTILES:
        scale = num * _GK_ACC - den, num * _GK_ACC + den, den * _GK_ACC
        lo_num, hi_num, denom = scale
        rank_lo = F.expr(f"({lo_num} * n) div {denom}")
        rank_hi = F.expr(f"({hi_num} * n + {denom} - 1) div {denom}")
        parts.append(
            stats.select(
                "l_returnflag",
                F.lit(qn).alias("quantile"),
                "n",
                rank_lo.cast("long").alias("rank_lo"),
                rank_hi.cast("long").alias("rank_hi"),
                (
                    (F.col(f"le_{qn}") >= rank_lo)
                    & (F.col(f"lt_{qn}") <= rank_hi)
                ).alias("in_bound"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), parts)


@register(
    "udaf_mad_quantity",
    """
SELECT l_returnflag,
       mad(l_quantity) AS mad_qty,
       median(l_quantity) AS median_qty
FROM lineitem
GROUP BY l_returnflag
""",
    doc="pandas GROUPED_AGG UDAF surface (SURVEY §2 UDF/UDAF row): "
    "median absolute deviation per return flag, computed by an "
    "Arrow-batched numpy aggregation — the robust-dispersion statistic "
    "that needs a grouped median of deviations from the grouped "
    "median, which built-in aggregates only reach with a two-pass "
    "join. Quantities are integral doubles so medians are exact "
    "binary halves and the oracle (DuckDB's native mad()) matches "
    "bit-for-bit. Plan shows AggregateInPandas, never BatchEvalPython "
    "— the UDAF is the vectorized slow path used ONLY where Catalyst "
    "has no one-pass equivalent.",
)
def udaf_mad_quantity(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        a = v.to_numpy()
        return float(np.median(np.abs(a - np.median(a))))

    @pandas_udf("double")
    def med(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        mad("l_quantity").alias("mad_qty"),
        med("l_quantity").alias("median_qty"),
    )



# --- Count-Min sketch with an EXACT cross-engine oracle -----------------
# Unlike HLL/GK (engine-internal layouts, rows-only checks), CMS is pure
# integer arithmetic: md5-derived row hashes, counter sums, min-over-rows
# estimate — so the sketch itself is bit-identical on both engines.
_CMS_D, _CMS_W = 4, 64


def _cms_idx_spark(j: int) -> F.Column:
    key = F.concat(F.lit(f"{j}:"), F.col("user_id").cast("string"))
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast("long")
        % _CMS_W
    )


def _cms_oracle() -> str:
    from feature_store_2_spark.queries.llm_text import _hex_fold

    idx = {
        j: f"(({_hex_fold(repr(str(j) + ':') + ' || CAST(user_id AS VARCHAR)')}) % {_CMS_W})"
        for j in range(_CMS_D)
    }
    cells = " UNION ALL ".join(
        f"SELECT user_id, true_cnt, {j} AS j, {idx[j]} AS idx FROM counts"
        for j in range(_CMS_D)
    )
    return f"""
WITH counts AS (
    SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id),
cells AS ({cells}),
counters AS (
    SELECT j, idx, CAST(sum(true_cnt) AS BIGINT) AS c
    FROM cells GROUP BY j, idx)
SELECT cells.user_id, CAST(min(true_cnt) AS BIGINT) AS true_cnt,
       min(c) AS cms_est
FROM cells JOIN counters USING (j, idx)
GROUP BY cells.user_id
"""


@register(
    "sketch_countmin_users",
    _cms_oracle(),
    doc="Count-Min sketch (d=4 rows x w=64 counters) of per-user event "
    "frequencies, with an EXACT oracle: the hash rows are md5-derived "
    "integer arithmetic reproduced in SQL, counters are plain sums, "
    "and the estimate is the min over rows — every cell and every "
    "estimate hash-matches across engines (the guarantee the HLL/GK "
    "entries structurally cannot give, which is why they are "
    "rows-only). Output carries the true count next to the estimate; "
    "CMS guarantees est >= true, pinned by pytest. Scale shape: the "
    "sketch is a 256-cell table built in one map-side-combinable "
    "aggregation — mergeable across partitions/streams by cell-wise "
    "addition.",
)
def sketch_countmin_users(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    cells = counts.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_idx_spark(j).alias("idx")
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("user_id", "true_cnt", "cell.j", "cell.idx")
    counters = cells.groupBy("j", "idx").agg(F.sum("true_cnt").alias("c"))
    return (
        cells.join(F.broadcast(counters), ["j", "idx"])
        .groupBy("user_id")
        .agg(
            F.min("true_cnt").alias("true_cnt"),
            F.min("c").alias("cms_est"),
        )
    )


@register(
    "udf_grouped_minmax_scale",
    """
WITH w AS (
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           min(l_quantity) OVER (PARTITION BY l_returnflag) AS mn,
           max(l_quantity) OVER (PARTITION BY l_returnflag) AS mx
    FROM lineitem)
SELECT l_returnflag, l_orderkey, l_linenumber,
       CASE WHEN mx = mn THEN 0.0
            ELSE (l_quantity - mn) / (mx - mn) END AS scaled
FROM w
""",
    doc="pandas GROUPED-MAP surface (applyInPandas — the batch twin of "
    "the streaming applyInPandasWithState path, and the UDF-family row "
    "GROUPED_AGG/mapInPandas entries don't cover): per-return-flag "
    "min-max feature scaling, each group handed to an Arrow-batched "
    "pandas function that returns the transformed rows. Min-max (not "
    "z-score) on purpose: min/max/subtract/divide are single IEEE ops, "
    "so the result is bit-identical to the SQL window oracle — a "
    "variance-based scaler would drift by summation order. Plan shows "
    "FlatMapGroupsInPandas (one shuffle on the group key), never "
    "BatchEvalPython. At 100 TB each group must fit one executor's "
    "Arrow batch — fine for per-category scalers; per-user grains use "
    "the windowed form instead.",
)
def udf_grouped_minmax_scale(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["l_quantity"]
        mn, mx = v.min(), v.max()
        scaled = (v - mn) / (mx - mn) if mx != mn else v * 0.0
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "scaled": scaled,
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        scale,
        "l_returnflag string, l_orderkey long, l_linenumber long, scaled double",
    )


# --- Bloom filter with an EXACT cross-engine oracle ---------------------
# Same portability trick as the Count-Min entry: md5-derived
# Kirsch-Mitzenmacher double hashing, bit positions as pure integer
# arithmetic, the filter as bit_or-aggregated 32-bit words — every step
# reproducible in DuckDB, so even the false positives match exactly.
_BLOOM_BITS, _BLOOM_K = 1024, 4
# 32-bit words: DuckDB range-checks BIGINT << 63 (Spark wraps), so keep
# the shift strictly below the sign bit on both engines.
_BLOOM_WORDS = _BLOOM_BITS // 32


def _bloom_halves_spark():
    m = F.md5(F.col("user_id").cast("string").cast("binary"))
    h1 = F.conv(F.substring(m, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 15, 14), 16, 10).cast("long")
    return h1, h2


def _hex_fold_n(expr: str, n: int) -> str:
    """DuckDB: first ``n`` hex chars of md5(expr) -> BIGINT."""
    v = "CAST(0 AS BIGINT)"
    for k in range(1, n + 1):
        digit = f"(strpos('0123456789abcdef', substring(md5({expr}), {k}, 1)) - 1)"
        v = f"(({v}) * 16 + {digit})"
    return v


def _bloom_oracle() -> str:
    h1 = _hex_fold_n("CAST(user_id AS VARCHAR)", 14)
    h2 = (
        "CAST(0 AS BIGINT)"  # fold chars 15..28
    )
    for k in range(15, 29):
        digit = (
            f"(strpos('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), {k}, 1)) - 1)"
        )
        h2 = f"(({h2}) * 16 + {digit})"
    pos = {
        i: f"(({h1}) + {i} * ({h2})) % {_BLOOM_BITS}" for i in range(_BLOOM_K)
    }
    probes = " UNION ALL ".join(
        f"SELECT user_id, ({pos[i]}) // 32 AS word_idx, ({pos[i]}) % 32 AS bit"
        " FROM all_users"
        for i in range(_BLOOM_K)
    )
    return f"""
WITH members AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
all_users AS (SELECT DISTINCT user_id FROM events),
build_pos AS ({probes.replace("all_users", "members")}),
words AS (
    SELECT word_idx, bit_or(CAST(1 AS BIGINT) << CAST(bit AS INT)) AS w
    FROM build_pos GROUP BY word_idx),
probe_pos AS ({probes}),
checks AS (
    SELECT p.user_id,
           bool_and(coalesce(w.w, 0) & (CAST(1 AS BIGINT) << CAST(p.bit AS INT))
                    <> 0) AS maybe_present
    FROM probe_pos p
    LEFT JOIN words w ON p.word_idx = w.word_idx
    GROUP BY p.user_id)
SELECT c.user_id, c.maybe_present,
       m.user_id IS NOT NULL AS actually_present,
       c.maybe_present AND m.user_id IS NULL AS is_false_positive
FROM checks c LEFT JOIN members m ON c.user_id = m.user_id
"""


@register(
    "sketch_bloom_membership",
    _bloom_oracle(),
    doc=f"Bloom-filter membership with an EXACT oracle (like the "
    f"Count-Min entry, unlike engine-internal HLL/GK): the purchase-"
    f"user set is folded into {_BLOOM_BITS} bits ({_BLOOM_WORDS} "
    f"bit_or-aggregated 32-bit words) via md5 Kirsch-Mitzenmacher "
    f"double hashing, k={_BLOOM_K} probes per key; every user is then "
    "probed against the filter. Pure integer arithmetic end-to-end, so "
    "both engines produce the SAME false positives and the value hash "
    "gates the sketch itself. No-false-negative guarantee pinned by "
    "pytest. At 100 TB this is the pre-join filter shape: the words "
    "table is bytes-sized, broadcast to prune a fact scan before an "
    "expensive shuffle join (Catalyst's runtime bloom pruning does the "
    "same internally; this is the explicit, storable variant).",
)
def sketch_bloom_membership(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    members = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    all_users = ev.select("user_id").distinct()
    h1, h2 = _bloom_halves_spark()
    ks = F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i")
    pos = F.pmod(F.col("h1") + F.col("i") * F.col("h2"), F.lit(_BLOOM_BITS))
    build = (
        members.select("user_id", h1.alias("h1"), h2.alias("h2"))
        .select("user_id", "h1", "h2", ks)
        .select(
            (pos / 32).cast("long").alias("word_idx"),
            F.pmod(pos, F.lit(32)).cast("int").alias("bit"),
        )
    )
    # shiftleft's Python API takes only a literal shift; the SQL form
    # accepts a column expression.
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
    words = build.groupBy("word_idx").agg(F.bit_or(mask).alias("w"))
    probe = (
        all_users.select("user_id", h1.alias("h1"), h2.alias("h2"))
        .select("user_id", "h1", "h2", ks)
        .select(
            "user_id",
            (pos / 32).cast("long").alias("word_idx"),
            F.pmod(pos, F.lit(32)).cast("int").alias("bit"),
        )
    )
    checks = (
        probe.join(F.broadcast(words), "word_idx", "left")
        .select(
            "user_id",
            (F.coalesce(F.col("w"), F.lit(0)).bitwiseAND(mask) != 0).alias(
                "hit"
            ),
        )
        .groupBy("user_id")
        .agg(F.bool_and("hit").alias("maybe_present"))
    )
    mem = members.withColumn("is_member", F.lit(True))
    return checks.join(mem, "user_id", "left").select(
        "user_id",
        "maybe_present",
        F.coalesce(F.col("is_member"), F.lit(False)).alias("actually_present"),
        (F.col("maybe_present") & F.col("is_member").isNull()).alias(
            "is_false_positive"
        ),
    )


_KMV_K = 32
_TWO56 = float(1 << 56)


def _kmv_oracle() -> str:
    h = _hex_fold_n("CAST(user_id AS VARCHAR)", 14)
    return f"""
WITH dh AS (SELECT DISTINCT event_type, {h} AS h FROM events),
rk AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       FROM dh),
kv AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k_used,
              max(h) AS kth_h
       FROM rk WHERE rn <= {_KMV_K} GROUP BY event_type),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS true_ndv
       FROM events GROUP BY event_type)
SELECT kv.event_type, k_used, kth_h,
       CASE WHEN k_used = {_KMV_K}
            THEN ({_KMV_K - 1}.0 * {_TWO56!r}) / kth_h
            ELSE CAST(k_used AS DOUBLE) END AS est_ndv,
       true_ndv
FROM kv JOIN ex ON kv.event_type = ex.event_type
"""


@register(
    "sketch_kmv_distinct",
    _kmv_oracle(),
    doc=f"KMV (k-minimum-values) distinct sketch, k={_KMV_K}: per group "
    "keep the k smallest 56-bit md5 hashes of the key; the kth value "
    "estimates NDV as (k-1)*2^56/h_k (Bar-Yossef et al. 2002). Unlike "
    "HLL++ the whole sketch state is EXACT deterministic integers, so "
    "the DuckDB oracle reproduces it bit-for-bit — including the "
    "estimate, a single correctly-rounded division — making this the "
    "value-hash-gateable member of the distinct-sketch family "
    "(complementing rows-only agg_approx_distinct). Mergeability is "
    "structural: bottom-k of a union == bottom-k of per-partition "
    "bottom-k's, which the implementation exploits with a salted "
    "two-phase bottom-k (32 salt classes, then a final window over "
    "<= k*32 survivors per group) — no low-cardinality window funnel, "
    "same shape a 1000-executor merge would run. true_ndv rides along "
    "for the accuracy pytest.",
)
def sketch_kmv_distinct(spark, sf_dir):
    from feature_store_2_spark.queries.training_data import _md5_bucket

    ev = load_table(spark, "events", sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 14),
        16,
        10,
    ).cast("long")
    dh = ev.select("event_type", h.alias("h")).distinct()
    salted = dh.withColumn("salt", _md5_bucket(F.col("h"), 32))
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    survivors = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _KMV_K)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    kv = (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_h"))
    )
    est = F.when(
        F.col("k_used") == _KMV_K,
        F.lit(float(_KMV_K - 1) * _TWO56) / F.col("kth_h"),
    ).otherwise(F.col("k_used").cast("double"))
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_ndv")
    )
    return kv.join(ex, "event_type").select(
        "event_type", "k_used", "kth_h", est.alias("est_ndv"), "true_ndv"
    )


def _kmv_setops_oracle() -> str:
    h = _hex_fold_n("CAST(user_id AS VARCHAR)", 14)
    k = _KMV_K
    return f"""
WITH dh AS (SELECT DISTINCT event_type, {h} AS h FROM events),
sk AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dh) WHERE rn <= {k}),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
    SELECT a.event_type AS t1, b.event_type AS t2
    FROM types a JOIN types b ON a.event_type < b.event_type),
merged AS (
    SELECT p.t1, p.t2, s.h,
           max(CASE WHEN s.event_type = p.t1 THEN 1 ELSE 0 END) AS in1,
           max(CASE WHEN s.event_type = p.t2 THEN 1 ELSE 0 END) AS in2
    FROM pairs p
    JOIN sk s ON s.event_type IN (p.t1, p.t2)
    GROUP BY 1, 2, 3),
bk AS (
    SELECT t1, t2, h, in1, in2,
           row_number() OVER (PARTITION BY t1, t2 ORDER BY h) AS rn
    FROM merged),
un AS (
    SELECT t1, t2, CAST(count(*) AS BIGINT) AS k_used,
           max(h) AS kth_h,
           CAST(sum(in1 * in2) AS BIGINT) AS n_both
    FROM bk WHERE rn <= {k} GROUP BY 1, 2),
su AS (SELECT DISTINCT event_type, user_id FROM events),
tru AS (
    SELECT p.t1, p.t2,
           CAST(count(DISTINCT s.user_id) AS BIGINT) AS true_union,
           CAST(count(DISTINCT CASE WHEN s1.user_id IS NOT NULL
                                    AND s2.user_id IS NOT NULL
                                    THEN s.user_id END) AS BIGINT)
               AS true_inter
    FROM pairs p
    JOIN su s ON s.event_type IN (p.t1, p.t2)
    LEFT JOIN su s1 ON s1.event_type = p.t1 AND s1.user_id = s.user_id
    LEFT JOIN su s2 ON s2.event_type = p.t2 AND s2.user_id = s.user_id
    GROUP BY 1, 2),
est AS (
    SELECT t1, t2, k_used, n_both,
           CASE WHEN k_used = {k}
                THEN ({k - 1}.0 * {_TWO56!r}) / kth_h
                ELSE CAST(k_used AS DOUBLE) END AS est_union
    FROM un)
SELECT e.t1, e.t2, e.k_used, e.n_both, e.est_union,
       CAST(e.n_both AS DOUBLE) * e.est_union / e.k_used AS est_inter,
       t.true_union, t.true_inter
FROM est e JOIN tru t ON e.t1 = t.t1 AND e.t2 = t.t2
"""


@register(
    "sketch_kmv_set_ops",
    _kmv_setops_oracle(),
    doc=f"KMV sketch SET ALGEBRA (Beyer et al. SIGMOD'07) — the reason "
    f"bottom-k sketches beat HLL for analytics: two per-group sketches "
    f"of k={_KMV_K} smallest hashes merge into the union's sketch "
    f"(bottom-k of the combined hashes), and the intersection is "
    f"estimated from the merged sketch as (|both| / k) * est_union — "
    f"distinct-count algebra over PRE-AGGREGATED {_KMV_K}-row "
    f"sketches, never re-touching events: the shape that answers "
    f"overlap questions between corpus segments at 100 TB from "
    f"kilobytes of state. Deterministic md5 hashing makes sketch "
    f"content, both estimates (fixed IEEE op chain), and the "
    f"ride-along exact truths hash bit-for-bit. Pair spine is "
    f"|event_types| choose 2 — bounded metadata.",
)
def sketch_kmv_set_ops(spark, sf_dir):
    from feature_store_2_spark.queries.training_data import _md5_bucket

    ev = load_table(spark, "events", sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 14),
        16,
        10,
    ).cast("long")
    dh = ev.select("event_type", h.alias("h")).distinct()
    # per-type bottom-k sketch, salted two-phase (same shape as
    # sketch_kmv_distinct)
    salted = dh.withColumn("salt", _md5_bucket(F.col("h"), 32))
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    surv = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _KMV_K)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    sk = (
        surv.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
    )
    types = ev.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
    )
    merged = (
        pairs.join(
            F.broadcast(sk).alias("s"),
            (F.col("s.event_type") == F.col("t1"))
            | (F.col("s.event_type") == F.col("t2")),
        )
        .groupBy("t1", "t2", "h")
        .agg(
            F.max(
                (F.col("s.event_type") == F.col("t1")).cast("int")
            ).alias("in1"),
            F.max(
                (F.col("s.event_type") == F.col("t2")).cast("int")
            ).alias("in2"),
        )
    )
    wbk = Window.partitionBy("t1", "t2").orderBy("h")
    un = (
        merged.withColumn("rn", F.row_number().over(wbk))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("t1", "t2")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.max("h").alias("kth_h"),
            F.sum(F.col("in1") * F.col("in2")).cast("long").alias("n_both"),
        )
    )
    est_union = F.when(
        F.col("k_used") == _KMV_K,
        F.lit(float(_KMV_K - 1) * _TWO56) / F.col("kth_h"),
    ).otherwise(F.col("k_used").cast("double"))
    su = ev.select("event_type", "user_id").distinct()
    s1 = su.select(F.col("event_type").alias("t1"), "user_id")
    s2 = su.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        s1.join(s2, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.countDistinct("user_id").cast("long").alias("true_inter"))
    )
    szs = su.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("nd")
    )
    tru = (
        pairs.join(
            szs.select(F.col("event_type").alias("t1"), F.col("nd").alias("n1")),
            "t1",
        )
        .join(
            szs.select(F.col("event_type").alias("t2"), F.col("nd").alias("n2")),
            "t2",
        )
        .join(inter, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            (
                F.col("n1")
                + F.col("n2")
                - F.coalesce(F.col("true_inter"), F.lit(0))
            )
            .cast("long")
            .alias("true_union"),
            F.coalesce(F.col("true_inter"), F.lit(0))
            .cast("long")
            .alias("true_inter"),
        )
    )
    return (
        un.withColumn("est_union", est_union)
        .select(
            "t1",
            "t2",
            "k_used",
            "n_both",
            "est_union",
            (
                F.col("n_both").cast("double")
                * F.col("est_union")
                / F.col("k_used")
            ).alias("est_inter"),
        )
        .join(tru, ["t1", "t2"])
    )


_HLL_M = 64  # registers (b = 6 bits)
_HLL_WBITS = 50  # 56-bit hash minus 6 bucket bits
# alpha_64 * m^2 * 2^WBITS+1 folded to ONE python-computed double
# literal so both engines perform a single division, never a
# constant-folding chain that could round differently.
_HLL_C = 0.709 * (_HLL_M**2) * float(1 << (_HLL_WBITS + 1))


def _hll_oracle() -> str:
    h = _hex_fold_n("CAST(user_id AS VARCHAR)", 14)
    w = _HLL_WBITS
    return f"""
WITH dh AS (SELECT DISTINCT event_type, {h} AS h FROM events),
parts AS (
    SELECT event_type, h // {1 << w} AS bucket, h % {1 << w} AS wv
    FROM dh),
rho AS (
    SELECT event_type, bucket,
           CASE WHEN wv = 0 THEN {w + 1}
                ELSE {w + 1} - length(bin(wv)) END AS r
    FROM parts),
regs AS (
    SELECT event_type, bucket, CAST(max(r) AS BIGINT) AS m_j
    FROM rho GROUP BY 1, 2),
agg AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_used,
           CAST(sum(1::BIGINT << ({w + 1} - m_j)) AS BIGINT) AS s_obs
    FROM regs GROUP BY 1),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
              AS true_ndv
       FROM events GROUP BY event_type)
SELECT a.event_type, a.n_used,
       CAST({_HLL_M} - a.n_used AS BIGINT) AS n_zero_registers,
       CAST(a.s_obs + ({_HLL_M} - a.n_used) * (1::BIGINT << {w + 1})
            AS BIGINT) AS s_scaled,
       {_HLL_C!r} / CAST(a.s_obs + ({_HLL_M} - a.n_used)
                         * (1::BIGINT << {w + 1}) AS DOUBLE) AS est_raw,
       ex.true_ndv
FROM agg a JOIN ex ON a.event_type = ex.event_type
"""


@register(
    "sketch_hll_exact_registers",
    _hll_oracle(),
    doc=f"HyperLogLog from first principles with an EXACT value-hash "
    f"oracle — the deterministic cousin of the rows-only "
    f"approx_count_distinct entries (Spark's HLL++ register state is "
    f"engine-internal; this one's is the spec): 56-bit md5 hash, top "
    f"6 bits pick one of m={_HLL_M} registers, rho = leading-zero "
    f"rank of the remaining {_HLL_WBITS} bits via base-2 string "
    f"length (identical in both engines, no float log2 at power-of-2 "
    f"boundaries), register = max rho. The harmonic mean is EXACT "
    f"integer arithmetic: sum(2^-M_j) scaled by 2^{_HLL_WBITS + 1} "
    f"is a BIGINT sum (empty registers contribute without a 64-row "
    f"spine: (m - observed) * 2^{_HLL_WBITS + 1}), and the raw "
    f"estimate alpha*m^2/sum is ONE double division by a "
    f"python-folded constant. Raw estimator by design (no "
    f"small-range correction — true_ndv rides along and the pytest "
    f"bounds the error); register state is {_HLL_M} bytes per group "
    f"at any corpus size — THE mergeable-sketch scale story.",
)
def sketch_hll_exact_registers(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = _HLL_WBITS
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 14),
        16,
        10,
    ).cast("long")
    dh = ev.select("event_type", h.alias("h")).distinct()
    parts = dh.select(
        "event_type",
        F.expr(f"h DIV {1 << w}").alias("bucket"),
        F.pmod(F.col("h"), F.lit(1 << w)).alias("wv"),
    )
    rho = parts.select(
        "event_type",
        "bucket",
        F.when(F.col("wv") == 0, F.lit(w + 1))
        .otherwise(
            F.lit(w + 1)
            - F.length(F.conv(F.col("wv").cast("string"), 10, 2))
        )
        .alias("r"),
    )
    regs = rho.groupBy("event_type", "bucket").agg(
        F.max("r").cast("long").alias("m_j")
    )
    agg = regs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - m_j)"))
        .cast("long")
        .alias("s_obs"),
    )
    s_scaled = (
        F.col("s_obs")
        + (F.lit(_HLL_M) - F.col("n_used")) * F.lit(1 << (w + 1))
    ).cast("long")
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("true_ndv")
    )
    return (
        agg.join(ex, "event_type")
        .select(
            "event_type",
            "n_used",
            (F.lit(_HLL_M) - F.col("n_used")).cast("long").alias(
                "n_zero_registers"
            ),
            s_scaled.alias("s_scaled"),
            (F.lit(_HLL_C) / s_scaled.cast("double")).alias("est_raw"),
            "true_ndv",
        )
    )


_CLAMP_CAP_MICRO = 100_000_000  # 100.0 in micro-units

_CLAMPED_BALANCE_ORACLE = f"""
WITH RECURSIVE base AS (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           CAST(COALESCE(CASE WHEN event_type = 'purchase'
                     THEN CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT)
                     WHEN event_type = 'click'
                     THEN -CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT)
                     ELSE 0 END, 0) AS BIGINT) AS delta
    FROM events),
rec AS (
    SELECT user_id, event_id, rn,
           GREATEST(LEAST(delta, {_CLAMP_CAP_MICRO}), 0) AS bal
    FROM base WHERE rn = 1
    UNION ALL
    SELECT b.user_id, b.event_id, b.rn,
           GREATEST(LEAST(r.bal + b.delta, {_CLAMP_CAP_MICRO}), 0)
    FROM rec r JOIN base b ON b.user_id IS NOT DISTINCT FROM r.user_id
                          AND b.rn = r.rn + 1
)
SELECT user_id, event_id, CAST(bal AS BIGINT) AS balance_micro
FROM rec
"""


@register(
    "window_clamped_running_balance",
    _CLAMPED_BALANCE_ORACLE,
    doc="Clamped running balance — the inventory/credit-ledger scan "
    "(balance_t = clamp(balance_t-1 + delta_t, 0, cap)) that NO "
    "window frame can express: the clamp makes each row depend on "
    "the clamped PREVIOUS result, not on any prefix aggregate. This "
    "is the textbook case for the repo's operator hierarchy rule "
    "(SURVEY: composition first, then applyInPandas): Spark side is "
    "an Arrow-batched per-user grouped-map (sort by (ts, event_id), "
    "one Python loop over int64 micro-units — exactly-once per key, "
    "one shuffle on user_id); the DuckDB oracle unrolls the same "
    "recurrence with WITH RECURSIVE over per-user row numbers. "
    "Deltas: purchases credit, clicks debit, floor 0, cap 100.0 "
    "(micro-unit integers end-to-end, zero float drift). At 100 TB "
    "each USER's history must fit an Arrow batch — the per-key "
    "sequential scan's inherent requirement; beyond that, segment "
    "per epoch and carry state like the streaming twin.",
)
def window_clamped_running_balance(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            (F.col("value").try_cast("decimal(18,6)") * 1_000_000).cast("long"),
        )
        .when(
            F.col("event_type") == "click",
            -(F.col("value").try_cast("decimal(18,6)") * 1_000_000).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("delta"),
    )
    # A purchase/click whose value is NULL moves the ledger by 0 — an
    # unknown amount can't move a balance, and NULL would crash the
    # int() in the Arrow scan (round-8 NULL-value fixture find); the
    # oracle COALESCEs identically.
    ev = ev.withColumn("delta", F.coalesce(F.col("delta"), F.lit(0)))

    cap = _CLAMP_CAP_MICRO

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal = 0
        out = []
        for d in pdf["delta"].tolist():
            bal = max(min(bal + int(d), cap), 0)
            out.append(bal)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "balance_micro": pd.Series(out, index=pdf.index, dtype="int64"),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        scan, "user_id long, event_id long, balance_micro long"
    )
