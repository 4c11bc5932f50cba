"""Second relational query family: harder TPC-H-style multi-joins,
subquery shapes, full-outer joins, ordered/statistical aggregates,
sessionization, word explode, portable hash functions, embedding
near-dup pairs (SURVEY.md §2 Part B widening).

Determinism: every double aggregate accumulates in DECIMAL; quantile
outputs are rounded identically on both engines; array-ish results are
folded to strings (sorted, comma-joined) so hashes are representation-
independent.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.operators.sizing import adaptive_partitions
from feature_store_2_spark.functions.vector import (
    vector_exact,
    QUANT_SCALE,
    cosine_from_parts,
    qdot,
    qnorm2,
    quantize,
)
from feature_store_2_spark.operators.cache import track_persist as _track_persist
from feature_store_2_spark.queries import register
from feature_store_2_spark.queries.relational import dec
from feature_store_2_spark.sources.tables import load_table


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 analog: EXISTS decorrelated to a left-semi join + agg",
)
def q4_order_priority(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # EXISTS == left-semi join; the correlated predicate rides in the
    # join condition, so Catalyst plans one shuffle on orderkey and
    # never materializes the duplicated lineitem side.
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_nation_volume",
    """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name < sn.n_name
GROUP BY 1, 2
""",
    doc="TPC-H Q7 analog: 5-way join, two broadcast dims, nation-pair volume",
)
def q7_nation_volume(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    # Fact-fact joins shuffle on their keys; nation x2 (fixed 25 rows)
    # broadcasts by hint, customer/supplier are SF-growing so AQE picks
    # their strategy. The asymmetric nation-pair filter halves the pair
    # space before the agg.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("volume")
        )
    )


@register(
    "q10_returned_revenue",
    """
SELECT c_custkey, c_name, n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 analog: returned-item revenue per customer, top 20",
)
def q10_returned_revenue(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, "nation", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "join_full_outer_nation_counts",
    """
WITH cc AS (SELECT c_nationkey AS nk, count(*) AS n_customers
            FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
ss AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
       FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
SELECT coalesce(cc.nk, ss.nk) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
""",
    doc="full-outer join with null-fill: high-balance customer vs supplier counts",
)
def join_full_outer_nation_counts(spark, sf_dir):
    cc = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count("*").alias("n_customers"))
    )
    ss = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cc.join(ss, cc.cnk == ss.snk, "full_outer").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "subquery_in_bulk_parts",
    """
SELECT p_partkey, p_brand, p_retailprice
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
""",
    doc="IN-subquery shape: decorrelated to a left-semi join on partkey",
)
def subquery_in_bulk_parts(spark, sf_dir):
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") >= 49)
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_semi"
    ).select("p_partkey", "p_brand", "p_retailprice")


@register(
    "agg_median_quantiles",
    """
SELECT l_returnflag,
       round(median(l_quantity), 6) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
       round(quantile_cont(l_discount, 0.25), 6) AS p25_discount
FROM lineitem
GROUP BY l_returnflag
""",
    doc="exact statistical aggregates: median + interpolated quantiles",
)
def agg_median_quantiles(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    # Exact (non-approx) percentile: both engines use linear
    # interpolation at p*(n-1); rounding to 6 decimals absorbs the
    # last-ulp difference of the interpolation arithmetic.
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
        F.round(F.percentile("l_discount", F.lit(0.25)), 6).alias("p25_discount"),
    )


@register(
    "agg_collect_event_types",
    """
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
       count(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
""",
    doc="collect_set materialized portably: sorted distinct set -> csv string",
)
def agg_collect_event_types(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "agg_bool_user_flags",
    """
SELECT user_id,
       bool_and(value > 0.5) AS all_above_half,
       bool_or(event_type = 'error') AS any_error,
       count(*) AS n_events
FROM events
GROUP BY user_id
""",
    doc="boolean aggregates (A12's every/some over per-user rows)",
)
def agg_bool_user_flags(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.bool_and(F.col("value") > 0.5).alias("all_above_half"),
        F.bool_or(F.col("event_type") == "error").alias("any_error"),
        F.count("*").alias("n_events"),
    )


@register(
    "sessionize_events",
    """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                THEN 0 ELSE 1 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS session_start_epoch,
       CAST(epoch_us(max(ts)) // 1000000 AS BIGINT) AS session_end_epoch
FROM sessions
GROUP BY 1, 2
""",
    doc="batch sessionization (30-min gap): the session_window analog via lag+cumsum",
)
def sessionize_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # Both windows carry event_id as total tie-break (ties on ts exist),
    # and the gap test runs on microseconds — second-truncated arithmetic
    # would move events across the 30-minute boundary vs the oracle.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    us = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wcum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.min("ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("session_start_epoch"),
        (F.unix_micros(F.max("ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("session_end_epoch"),
    )


@register(
    "explode_top_words",
    """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word
LIMIT 50
""",
    doc="explode/unnest + global top-k: most common words across documents",
)
def explode_top_words(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    n_parts = adaptive_partitions(docs)
    # Same pre-explode spread as the dedup operators (size-derived),
    # then one partial-aggregated shuffle on word and
    # TakeOrderedAndProject for the top-k.
    return (
        docs.repartition(n_parts, F.col("doc_id"))
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


@register(
    "func_hash_family",
    """
SELECT event_id,
       md5(props) AS props_md5,
       sha256(props) AS props_sha256,
       md5(CAST(event_id AS VARCHAR) || '|' || event_type) AS row_key
FROM events
WHERE props IS NOT NULL
""",
    doc="portable hash family: md5 / sha-256 content hashes + composite row key",
)
def func_hash_family(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(F.col("props").isNotNull())
    return ev.select(
        "event_id",
        F.md5(F.col("props").cast("binary")).alias("props_md5"),
        F.sha2(F.col("props").cast("binary"), 256).alias("props_sha256"),
        F.md5(
            F.concat(
                F.col("event_id").cast("string"), F.lit("|"), F.col("event_type")
            ).cast("binary")
        ).alias("row_key"),
    )


_QV = f"list_transform(embedding, x -> CAST(floor(x * {QUANT_SCALE}.0) AS BIGINT))"
_EMB_DIM = 64


@register(
    "dedup_embedding_cosine",
    f"""
WITH qv AS (SELECT vec_id, {_QV} AS v FROM embeddings
       WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0 AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) < 8191.0),
norms AS (SELECT vec_id, CAST(sum(v[i.i] * v[i.i]) AS BIGINT) AS n2
          FROM qv CROSS JOIN generate_series(1, {_EMB_DIM}) i(i) GROUP BY vec_id),
pairs AS (
    SELECT a.vec_id AS vec1, b.vec_id AS vec2,
           CAST(sum(a.v[i.i] * b.v[i.i]) AS BIGINT) AS dot
    FROM qv a JOIN qv b ON a.vec_id < b.vec_id
    CROSS JOIN generate_series(1, {_EMB_DIM}) i(i)
    GROUP BY 1, 2)
SELECT vec1, vec2,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
FROM pairs
JOIN norms na ON vec1 = na.vec_id
JOIN norms nb ON vec2 = nb.vec_id
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.35
""",
    doc="FULL-CORPUS embedding-cosine near-dup pairs (exact quantized "
    "cosine >= 0.35). An exact theta-threshold join at a low threshold "
    "is inherently all-pairs; this entry keeps exact semantics (and so "
    "an exact oracle), while dedup_embedding_ann_pairs is the "
    "SRP-banded candidate path that replaces it at corpus scale",
)
def dedup_embedding_cosine(spark, sf_dir):
    e = (
        load_table(spark, "embeddings", sf_dir)
        # vector_exact (r10): the all-pairs exact path would otherwise
        # crash on one NaN component or out-of-envelope magnitude
        .filter(vector_exact("embedding"))
        .select("vec_id", quantize("embedding").alias("v"))
        .withColumn("n2", qnorm2(F.col("v")))
        .transform(_track_persist)  # both sides of the pair join read it
    )
    a = e.select(
        F.col("vec_id").alias("vec1"), F.col("v").alias("va"), F.col("n2").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vec2"), F.col("v").alias("vb"), F.col("n2").alias("nb")
    )
    cos = cosine_from_parts(
        qdot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
    )
    return (
        a.join(b, F.col("vec1") < F.col("vec2"))
        .select("vec1", "vec2", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
    )


_OVL_W_US = 1_800_000_000  # 30-minute bin width (>= both interval lengths)
_P_DUR_US = 1_800_000_000  # purchase attention window: 30 minutes
_C_DUR_US = 600_000_000  # click attention window: 10 minutes


@register(
    "join_interval_overlap_binned",
    f"""
WITH p AS (SELECT event_id AS purchase_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS s,
                  CAST(epoch_us(ts) + {_P_DUR_US} AS BIGINT) AS e
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id,
             CAST(epoch_us(ts) AS BIGINT) AS s,
             CAST(epoch_us(ts) + {_C_DUR_US} AS BIGINT) AS e
      FROM events WHERE event_type = 'click')
SELECT p.user_id, purchase_id, click_id,
       CAST(least(p.e, c.e) - greatest(p.s, c.s) AS BIGINT) AS overlap_us
FROM p JOIN c ON p.user_id = c.user_id AND p.s <= c.e AND c.s <= p.e
""",
    doc="interval x interval OVERLAP join (both sides are time RANGES, "
    "not points — the step past join_range_binned's point-in-window "
    "form): per user, 30-min purchase attention windows overlapping "
    "10-min click windows, plus the exact overlap length. Scale "
    "strategy: each interval explodes to the 30-min bins it spans "
    "(<= 2 bins, since bin width >= interval length), the ONLY join "
    "is the (user, bin) equi-join, and each overlapping pair is "
    "counted exactly once by attributing it to the bin containing "
    "greatest(start_a, start_b) — a point both intervals contain, so "
    "completeness is structural. The oracle is the plain theta join; "
    "identical output proves the binned rewrite is lossless. All "
    "arithmetic is BIGINT microseconds.",
)
def join_interval_overlap_binned(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))

    def intervals(etype, dur_us, id_alias):
        return ev.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(id_alias),
            "user_id",
            us.alias("s"),
            (us + F.lit(dur_us)).alias("e"),
        )

    def binned(df):
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / _OVL_W_US), F.floor(F.col("e") / _OVL_W_US)
                )
            ),
        )

    p = binned(intervals("purchase", _P_DUR_US, "purchase_id")).alias("p")
    c = binned(intervals("click", _C_DUR_US, "click_id")).alias("c")
    meet = F.floor(
        F.greatest(F.col("p.s"), F.col("c.s")) / F.lit(_OVL_W_US)
    )
    return (
        p.join(
            c,
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.bin") == F.col("c.bin"))
            & (F.col("p.s") <= F.col("c.e"))
            & (F.col("c.s") <= F.col("p.e"))
            & (F.col("p.bin") == meet),
        )
        .select(
            F.col("p.user_id").alias("user_id"),
            "purchase_id",
            "click_id",
            (
                F.least(F.col("p.e"), F.col("c.e"))
                - F.greatest(F.col("p.s"), F.col("c.s"))
            ).alias("overlap_us"),
        )
    )


@register(
    "dim_scd2_from_events",
    """
WITH s AS (SELECT user_id, event_id AS version_id, ts, value AS attr
           FROM events WHERE event_type = 'signup')
SELECT user_id, version_id, attr,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, version_id)) AS BIGINT)
           AS valid_to_us,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, version_id) IS NULL AS is_current
FROM s
""",
    doc="SCD2 dimension build — turning a change-event stream into the "
    "slowly-changing-dimension type-2 table every warehouse keeps "
    "(one row per version with [valid_from, valid_to) and an "
    "is_current flag): each signup opens a version, lead() over the "
    "per-user timeline closes the previous one — half-open ranges "
    "tile time exactly, no gaps or overlaps BY CONSTRUCTION. One "
    "window on the high-cardinality user key. Facts then join by "
    "the as-of pattern (join_asof_purchase_last_signup is the query "
    "side of this dimension); microsecond BIGINT bounds keep the "
    "oracle exact.",
)
def dim_scd2_from_events(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("version_id"),
        "ts",
        F.col("value").alias("attr"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "version_id")
    nxt = F.lead("ts").over(w)
    return s.select(
        "user_id",
        "version_id",
        "attr",
        F.unix_micros(F.col("ts")).alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


_SKYLINE_ORACLE = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice,
       CAST(p.p_size AS INT) AS p_size
FROM part p
WHERE p.p_brand IS NOT NULL
  AND p.p_retailprice IS NOT NULL
  AND p.p_size IS NOT NULL
  AND NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_retailprice IS NOT NULL AND q.p_size IS NOT NULL
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


@register(
    "skyline_pareto_frontier",
    _SKYLINE_ORACLE,
    doc="Per-brand skyline (Pareto frontier) over part: minimize "
    "p_retailprice, maximize p_size — the classic multi-objective "
    "dominance query (Borzsony/Kossmann/Stocker, ICDE 2001). The "
    "oracle states it as NOT-EXISTS dominance (quadratic); the Spark "
    "plan uses the exact 2-D sweep instead: collapse to one row per "
    "(brand, price) keeping max size, cummax that over the "
    "brand-partitioned price-ordered window, and a part is dominated "
    "iff the cummax over STRICTLY cheaper rows >= its size (lag of "
    "the running cummax) or the cummax over <=-priced rows exceeds "
    "it. O(n log n), no self-join anywhere. Rows with NULL in any "
    "skyline dimension are excluded on both sides (documented "
    "semantics; NULL is incomparable under dominance). Scale shape: "
    "one (brand, price) agg with map-side combine, a window over "
    "DISTINCT prices partitioned by brand (never the raw fact "
    "table), and a broadcastable join of the tiny frontier-threshold "
    "table back onto part.",
)
def skyline_pareto_frontier(spark, sf_dir):
    p = (
        load_table(spark, "part", sf_dir)
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .filter(
            F.col("p_brand").isNotNull()
            & F.col("p_retailprice").isNotNull()
            & F.col("p_size").isNotNull()
        )
    )
    per_price = p.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("gmax")
    )
    w_ord = Window.partitionBy("p_brand").orderBy("p_retailprice")
    cum = per_price.withColumn(
        "cum_le",
        F.max("gmax").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("cum_lt", F.lag("cum_le").over(w_ord))
    dominated = (
        F.col("cum_lt").isNotNull() & (F.col("cum_lt") >= F.col("p_size"))
    ) | (F.col("cum_le") > F.col("p_size"))
    return (
        p.join(
            cum.select("p_brand", "p_retailprice", "cum_le", "cum_lt"),
            ["p_brand", "p_retailprice"],
        )
        .filter(~dominated)
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
    )


_ENTRY_EXIT_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                THEN 0 ELSE 1 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, event_id, event_type,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
ranked AS (
    SELECT user_id, session_id, event_type,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn_asc,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts DESC, event_id DESC) AS rn_desc
    FROM sessions
),
per AS (
    SELECT user_id, session_id,
           min(event_type) FILTER (WHERE rn_asc = 1) AS entry_type,
           min(event_type) FILTER (WHERE rn_desc = 1) AS exit_type,
           count(*) AS n_ev
    FROM ranked GROUP BY 1, 2
)
SELECT entry_type, exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
FROM per GROUP BY 1, 2
"""


@register(
    "path_entry_exit_pages",
    _ENTRY_EXIT_ORACLE,
    doc="Entry/exit analysis — the landing-page x exit-page report: "
    "sessionize (the sessionize_events 30-min-gap recipe, "
    "microsecond arithmetic, (ts, event_id) total order), take each "
    "session's first and last event type via min_by/max_by over the "
    "(ts, event_id) struct (ONE agg pass, no extra window), and fold "
    "to the entry x exit matrix with a bounce count (single-event "
    "sessions). Complements path_transitions (within-session bigram "
    "flow) with the session-boundary view. Scale shape: the "
    "sessionization window on the user key dominates; everything "
    "after runs on one row per session.",
)
def path_entry_exit_pages(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    us = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wcum))
    key = F.struct("ts", "event_id")
    per = sessions.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
        F.count("*").alias("n_ev"),
    )
    return per.groupBy("entry_type", "exit_type").agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounce"),
    )


_SHARE_OF_PARENT_ORACLE = """
WITH rev AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2),
reg AS (SELECT region, CAST(sum(rev_cents) AS BIGINT) AS region_cents
        FROM rev GROUP BY 1),
tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents FROM rev)
SELECT rev.region, rev.nation, rev.rev_cents,
       CAST(rev.rev_cents * 1000000 // reg.region_cents AS BIGINT)
           AS share_of_region_ppm,
       CAST(reg.region_cents * 1000000 // tot.total_cents AS BIGINT)
           AS region_share_of_total_ppm
FROM rev JOIN reg ON rev.region = reg.region CROSS JOIN tot
"""


@register(
    "agg_share_of_parent",
    _SHARE_OF_PARENT_ORACLE,
    doc="Percent-of-parent in a dimension hierarchy — the BI drilldown "
    "staple (each nation's share of its region, each region's share "
    "of the whole): revenue folded to exact integer cents once, then "
    "both shares are integer-ppm floor-DIVs — zero float anywhere. "
    "Scale shape: one fact-side agg (two broadcast dim joins feed "
    "it), a 5-row region rollup, a 1-row total broadcast — the "
    "multi-level share needs no window over the fact table.",
)
def agg_share_of_parent(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("rev_cents")
        )
    )
    reg = rev.groupBy("region").agg(
        F.sum("rev_cents").cast("long").alias("region_cents")
    )
    tot = rev.agg(F.sum("rev_cents").cast("long").alias("total_cents"))
    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "rev_cents",
            F.expr(
                "CAST(rev_cents * 1000000 div region_cents AS BIGINT)"
            ).alias("share_of_region_ppm"),
            F.expr(
                "CAST(region_cents * 1000000 div total_cents AS BIGINT)"
            ).alias("region_share_of_total_ppm"),
        )
    )


_TOPK_TIES_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC) AS rnk
    FROM orders)
WHERE rnk <= 3
"""


@register(
    "window_topk_with_ties",
    _TOPK_TIES_ORACLE,
    doc="Top-k WITH TIES per group (rank() <= k) — the semantic "
    "variant of window_rank_orders_per_customer's row_number form "
    "that keeps EVERY order tied at the boundary value instead of "
    "arbitrarily cutting one (ANSI FETCH FIRST k ROWS WITH TIES; "
    "result size varies by group). rank() is value-determined, so "
    "no tie-break column is needed for cross-engine determinism — "
    "the output SET is identical by construction. Spark plans the "
    "filter as WindowGroupLimit pushdown (top-k per key before full "
    "sort) — same shuffle shape as row_number top-k.",
)
def window_topk_with_ties(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# PageRank over the part-supplier sourcing graph (round 8)
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITER = """
pr{k} AS (
    SELECT d.v, d.deg,
           (SELECT ({scale} * 15) // (100 * n) FROM n)
           + (85 * COALESCE(c.s, 0)) // 100 AS pr
    FROM deg d LEFT JOIN (
        SELECT e.dst AS v, CAST(sum(p.pr // p.deg) AS BIGINT) AS s
        FROM edges e JOIN pr{km1} p ON e.src = p.v GROUP BY 1) c
      ON c.v = d.v)"""

_PAGERANK_ORACLE = (
    f"""
WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
            FROM lineitem),
edges AS (SELECT a AS src, b AS dst FROM e0
          UNION ALL SELECT b, a FROM e0),
deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
pr0 AS (SELECT v, deg, (SELECT {_PR_SCALE} // n FROM n) AS pr FROM deg),"""
    + ",".join(
        _PR_ITER.format(k=k, km1=k - 1, scale=_PR_SCALE)
        for k in (1, 2, 3)
    )
    + f"""
SELECT CASE WHEN v % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       CAST(v // 2 AS BIGINT) AS node_id,
       CAST(deg AS BIGINT) AS degree,
       CAST(pr AS BIGINT) AS pr_micro,
       CAST(pr AS DOUBLE) / {_PR_SCALE}.0 AS pagerank
FROM pr3
"""
)


@register(
    "graph_pagerank_bipartite",
    _PAGERANK_ORACLE,
    doc="PageRank (damping 0.85, 3 unrolled iterations) over the "
    "bipartite part-supplier sourcing graph from lineitem's distinct "
    "(partkey, suppkey) edges, symmetrized — which suppliers/parts "
    "sit at the center of the procurement network (the influence "
    "statistic the graph family's CC/k-core/LPA/triangle entries "
    "don't cover). Exactness: the float-free PageRank — scores live "
    "in 1e12 micro-units, each iteration is teleport (15*SCALE "
    "DIV 100*N) plus 85*sum(pr DIV deg) DIV 100, all floor "
    "divisions on positive integers, identical in both engines; no "
    "libm, no float accumulation, so three iterations stay "
    "hash-exact. Spark side is the Pregel shape: per-round one "
    "edge-key equi-join + dst hash agg (O(E) per round), nodes "
    "carried on the degree table; node ids integer-encoded "
    "(2*part / 2*supp+1) so the join key is a plain BIGINT. Scale: "
    "edges dedup once; each round shuffles contributions by dst — "
    "the standard distributed PageRank plan, depth fixed at 3 "
    "(unrolled, lineage-bounded).",
)
def graph_pagerank_bipartite(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("a"),
        (F.col("l_suppkey") * 2 + 1).alias("b"),
    ).distinct()
    # One-pass symmetrization + checkpoint: the unionAll form ran the
    # lineitem distinct once per branch, and the un-materialized edges
    # frame was re-derived by deg AND by every PageRank round's join
    # (the docstring's "edges dedup once" promise, now actually kept).
    from feature_store_2_spark.operators.graph import symmetrize

    edges = symmetrize(e0, "a", "b", out1="src", out2="dst").localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("deg")
    )
    # node count: bounded metadata scalar (the oracle derives the same
    # n via its own count(*) subquery). max(n,1): an empty edge set
    # yields an empty deg table, so the output is empty either way —
    # but n=0 must not crash the Python-side floor divisions while the
    # oracle quietly projects zero rows.
    n = max(deg.count(), 1)
    teleport = (_PR_SCALE * 15) // (100 * n)
    pr = deg.withColumn("pr", F.lit(_PR_SCALE // n).cast("long"))
    for _ in range(3):
        contrib = (
            edges.join(
                pr.select(
                    F.col("v").alias("src"),
                    F.expr("pr div deg").alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("share").cast("long").alias("s"))
        )
        pr = deg.join(contrib, "v", "left").select(
            "v",
            "deg",
            (
                F.lit(teleport)
                + F.expr("85 * coalesce(s, 0) div 100")
            ).cast("long").alias("pr"),
        )
    return pr.select(
        F.when(F.col("v") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("v div 2").cast("long").alias("node_id"),
        F.col("deg").alias("degree"),
        F.col("pr").alias("pr_micro"),
        (F.col("pr").cast("double") / F.lit(float(_PR_SCALE))).alias(
            "pagerank"
        ),
    )
