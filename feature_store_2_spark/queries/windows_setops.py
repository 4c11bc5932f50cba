"""Window functions, set operations, grouping analytics (SURVEY.md §2
Part B: ranking, lag/lead, running + range frames, ntile/percent_rank,
union/intersect/except, rollup/cube/grouping sets, pivot, conditional &
distinct aggregation, per-group first/last, top-k).

Determinism: every window ORDER BY carries a total tie-break key
(event_id / custkey / orderkey) so ranks are engine-independent; running
sums accumulate DECIMAL. Computed ints are cast to BIGINT on the Spark
side to match DuckDB's default integer width.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feature_store_2_spark.operators.sizing import spread_scan
from feature_store_2_spark.operators.global_window import (
    bucketed_row_number,
    ntile_from_row_number,
)
from feature_store_2_spark.functions.num import is_exact_value, is_finite
from feature_store_2_spark.queries import register
from feature_store_2_spark.queries.relational import dec
from feature_store_2_spark.sources.tables import load_table


@register(
    "window_rank_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders)
WHERE rn <= 3
""",
    doc="per-group top-k via ranking window (one shuffle on the partition key)",
)
def window_rank_orders_per_customer(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_lag_value_delta",
    """
SELECT event_id, user_id, value,
       value - lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS delta
FROM events
""",
    doc="lag/lead analytics: per-user event value delta (grant-change shape, A18)",
)
def window_lag_value_delta(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "window_running_spend",
    """
SELECT event_id, user_id,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(12,2)) END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_spend
FROM events
WHERE event_type = 'purchase'
""",
    doc="running cumulative aggregate (A7 batch analog), exact decimal frame",
)
def window_running_spend(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "purchase")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("cum_spend"),
    )


@register(
    "window_trailing_10min_count",
    """
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
           AS n_last_10min
FROM events
""",
    doc="range frame: trailing 10-minute per-user activity (A16 batch analog)",
)
def window_trailing_10min_count(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_last_10min")
    )


@register(
    "window_ntile_percentrank",
    """
SELECT c_custkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
    doc="ntile + percent_rank over a global order. The SEMANTICS are "
    "the single-partition SQL window (the oracle states them "
    "verbatim); the PLAN is the two-phase prefix "
    "(operators/global_window.py): range-bucket on c_acctbal, "
    "per-bucket row_number in parallel tasks, broadcast bucket "
    "offsets, then closed-form ntile(4) and percent_rank from the "
    "global row number and a 1-row broadcast count — value-identical "
    "(unique (acctbal, custkey) tie-break makes rank == row_number), "
    "property-pinned in tests/test_global_window.py, and never a "
    "single-task sort of the customer corpus.",
)
def window_ntile_percentrank(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    ranked = bucketed_row_number(
        cust.select("c_custkey", "c_acctbal"),
        "c_acctbal",
        ["c_acctbal", "c_custkey"],
        "rn",
    )
    tot = cust.agg(F.count("*").alias("_n"))
    return ranked.join(F.broadcast(tot)).select(
        "c_custkey",
        ntile_from_row_number(F.col("rn"), F.col("_n"), 4).alias("quartile"),
        F.when(F.col("_n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("rn") - 1).cast("double") / (F.col("_n") - 1)
        )
        .alias("pct_rank"),
    )


_HOUSEHOLD = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'HOUSEHOLD'"
_RICH = "SELECT c_custkey FROM customer WHERE c_acctbal > 4000"


@register(
    "setop_union",
    f"{_HOUSEHOLD} UNION {_RICH}",
    doc="UNION (distinct) of two key sets",
)
def setop_union(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "HOUSEHOLD").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 4000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "setop_intersect",
    f"{_HOUSEHOLD} INTERSECT {_RICH}",
    doc="INTERSECT of two key sets",
)
def setop_intersect(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "HOUSEHOLD").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 4000).select("c_custkey")
    return a.intersect(b)


@register(
    "setop_except",
    f"{_HOUSEHOLD} EXCEPT {_RICH}",
    doc="EXCEPT of two key sets",
)
def setop_except(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "HOUSEHOLD").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 4000).select("c_custkey")
    return a.exceptAll(b).distinct()


@register(
    "distinct_user_event_types",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="dedup on a column subset (A5's set semantics)",
)
def distinct_user_event_types(spark, sf_dir):
    return load_table(spark, "events", sf_dir).select("user_id", "event_type").distinct()


@register(
    "agg_first_last_per_user",
    """
SELECT user_id,
       min(event_id) FILTER (WHERE rn_asc = 1)  AS first_event_id,
       min(event_id) FILTER (WHERE rn_desc = 1) AS last_event_id,
       min(value)    FILTER (WHERE rn_asc = 1)  AS first_value,
       min(value)    FILTER (WHERE rn_desc = 1) AS last_value
FROM (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_asc,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_desc
    FROM events)
GROUP BY user_id
""",
    doc="first/last per group via min_by/max_by on a (ts,event_id) total order",
)
def agg_first_last_per_user(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # min/max over a (ts, event_id) struct = deterministic arg-min/arg-max
    # in ONE aggregation pass (no window, no second shuffle).
    key = F.struct("ts", "event_id")
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", key).alias("first_event_id"),
        F.max_by("event_id", key).alias("last_event_id"),
        F.min_by("value", key).alias("first_value"),
        F.max_by("value", key).alias("last_value"),
    )


@register(
    "agg_rollup_lineitem",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    doc="ROLLUP hierarchy totals with GROUPING indicators",
)
def agg_rollup_lineitem(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    # ROLLUP triples the partial-agg work per input row (one copy per
    # grouping set); the conditional spread keeps that off a single
    # core when the scan is one row group. count + exact decimal sum
    # are row-order-independent.
    return spread_scan(li).rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_cube_orders",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE over two dimensions",
)
def agg_cube_orders(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        F.count("*").alias("n"),
    )


@register(
    "agg_grouping_sets",
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc="explicit GROUPING SETS (SQL form through Catalyst)",
)
def agg_grouping_sets(spark, sf_dir):
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_conditional_stats",
    """
SELECT event_type,
       count(*) AS n_total,
       count(CASE WHEN value > 10 THEN 1 END) AS n_high,
       CAST(sum(CASE WHEN value > 10 THEN CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(12,2)) END END) AS DOUBLE) AS sum_high,
       count(CASE WHEN value > 10 THEN 1 END) / count(*) AS share_high
FROM events
GROUP BY event_type
""",
    doc="conditional aggregation (A17's denied-user counting shape)",
)
def agg_conditional_stats(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    high = F.when(F.col("value") > 10, F.lit(1))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.count(high).alias("n_high"),
        F.sum(F.when(F.col("value") > 10, dec("value"))).cast("double").alias("sum_high"),
        (F.count(high) / F.count("*")).alias("share_high"),
    )


@register(
    "agg_distinct_exact",
    """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT CASE WHEN value > 10 THEN user_id END) AS n_high_users
FROM events
GROUP BY event_type
""",
    doc="exact distinct counts, incl. conditional distinct (A6/A16)",
)
def agg_distinct_exact(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.when(F.col("value") > 10, F.col("user_id"))).alias(
            "n_high_users"
        ),
    )


@register(
    "agg_approx_distinct",
    None,  # HLL++ sketches differ across engines — rows-only check
    doc="approx_count_distinct (HLL++): the 100 TB scale path for A16",
)
def agg_approx_distinct(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@register(
    "pivot_event_type_counts",
    """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events
GROUP BY user_id
""",
    doc="pivot with a fixed value list (no extra pass to discover values)",
)
def pivot_event_type_counts(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    # Fixed pivot values skip Spark's distinct-discovery job.
    wide = ev.groupBy("user_id").pivot("event_type", types).count()
    return wide.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@register(
    "topk_orders_global",
    """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
    doc="global top-k -> TakeOrderedAndProject (no full sort/exchange)",
)
def topk_orders_global(spark, sf_dir):
    return (
        load_table(spark, "orders", sf_dir)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "hist_equidepth_price",
    """
WITH b AS (
    SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS b1,
           round(quantile_cont(o_totalprice, 0.50), 6) AS b2,
           round(quantile_cont(o_totalprice, 0.75), 6) AS b3
    FROM orders)
SELECT CAST(CASE WHEN o_totalprice <= b1 THEN 0
                 WHEN o_totalprice <= b2 THEN 1
                 WHEN o_totalprice <= b3 THEN 2
                 ELSE 3 END AS BIGINT) AS bucket,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders, b
GROUP BY bucket
""",
    doc="equi-depth (quartile) histogram the scale-safe way: exact "
    "interpolated quartile boundaries in one aggregate, broadcast back "
    "(1-row cross join), bucket membership by comparison — two narrow "
    "passes. The ntile() alternative is a GLOBAL sort of the fact "
    "table, which is the plan to avoid at 100 TB. Boundaries rounded "
    "to 6 dp on both sides; data points sit >= 0.008 from any "
    "interpolated boundary so membership is stable.",
)
def hist_equidepth_price(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    b = orders.agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("b1"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("b2"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("b3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("b1"), 0)
        .when(F.col("o_totalprice") <= F.col("b2"), 1)
        .when(F.col("o_totalprice") <= F.col("b3"), 2)
        .otherwise(3)
        .cast("long")
    )
    return (
        orders.crossJoin(F.broadcast(b))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
    )


@register(
    "window_nth_value_third_order",
    """
SELECT o_orderkey, o_custkey, o_totalprice,
       nth_value(o_totalprice, 3) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS third_order_price
FROM orders
""",
    doc="nth_value over a full partition frame: every order annotated "
    "with its customer's chronologically third order total (NULL for "
    "customers with fewer than three). Completes the analytic-window "
    "family (first/last/lag/lead/rank were covered; nth_value was "
    "not). Total order via (date, key) tie-break.",
)
def window_nth_value_third_order(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 3).over(w).alias("third_order_price"),
    )


@register(
    "agg_string_concat_ordered",
    """
SELECT user_id,
       string_agg(event_type, '|' ORDER BY ts, event_id) AS journey,
       count(*) AS n_events
FROM events
GROUP BY user_id
""",
    doc="ordered string aggregation (LISTAGG): each user's full "
    "event-type journey in timestamp order. Spark has no ordered "
    "string_agg aggregate, so the journey is collect_list of "
    "(ts, event_id, type) structs -> array_sort (struct comparison = "
    "lexicographic on the leading total-order fields) -> transform + "
    "array_join — same one-shuffle plan, deterministic on both "
    "engines via the (ts, event_id) tie-break.",
)
def agg_string_concat_ordered(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    sorted_types = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s.getField("event_type"),
    )
    return ev.groupBy("user_id").agg(
        F.array_join(sorted_types, "|").alias("journey"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_mode_event_type",
    """
WITH c AS (
    SELECT user_id, event_type, count(*) AS cnt
    FROM events GROUP BY user_id, event_type)
SELECT user_id, event_type AS mode_type, cnt
FROM (SELECT user_id, event_type, cnt,
             row_number() OVER (PARTITION BY user_id
                 ORDER BY cnt DESC, event_type) AS rk
      FROM c) r
WHERE rk = 1
""",
    doc="deterministic mode (most frequent event type per user): "
    "count + rank with an explicit alphabetical tie-break instead of "
    "the native mode() aggregate, whose tie choice is "
    "engine/partitioning-dependent — the difference between a query "
    "that hash-matches across engines and one that flaps.",
)
def agg_mode_event_type(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    rk = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.desc("cnt"), "event_type")
    )
    return (
        c.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "cnt")
    )


@register(
    "agg_bitwise_flags",
    """
SELECT l_returnflag,
       CAST(bit_and(CAST(l_partkey % 16 AS BIGINT)) AS BIGINT) AS and_bits,
       CAST(bit_or(CAST(l_partkey % 16 AS BIGINT)) AS BIGINT) AS or_bits,
       CAST(bit_xor(CAST(l_partkey % 16 AS BIGINT)) AS BIGINT) AS xor_bits
FROM lineitem
GROUP BY l_returnflag
""",
    doc="bitwise aggregate family (bit_and/bit_or/bit_xor): the "
    "flag-set fold used for permission masks and feature bitmaps — "
    "commutative/associative, so partial aggregation applies and the "
    "plan is one map-combined shuffle.",
)
def agg_bitwise_flags(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    bits = F.pmod("l_partkey", F.lit(16)).cast("long")
    return li.select("l_returnflag", bits.alias("b")).groupBy("l_returnflag").agg(
        F.bit_and("b").alias("and_bits"),
        F.bit_or("b").alias("or_bits"),
        F.bit_xor("b").alias("xor_bits"),
    )


@register(
    "window_cume_dist_acctbal",
    """
SELECT c_custkey, c_mktsegment, c_acctbal,
       cume_dist() OVER (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal, c_custkey) AS bal_cume
FROM customer
""",
    doc="cume_dist per market segment: fraction of the segment at or "
    "below each balance — the remaining ranking-family function "
    "(rank/dense_rank/ntile/percent_rank covered earlier). Total order "
    "via (balance, key) tie-break; the ratio is rows/partition-rows, "
    "both integers, so the double is identical on both engines.",
)
def window_cume_dist_acctbal(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.cume_dist().over(w).alias("bal_cume"),
    )


@register(
    "agg_salted_distinct",
    """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
    doc="skew-safe EXACT distinct count: event_type has ~5 values, so a "
    "plain count_distinct funnels every row of the hottest type "
    "through one task's dedup (count-distinct cannot map-side combine "
    "the way sums do). Two-phase form: salt = pmod(hash(user_id), 32) "
    "PARTITIONS the user space into disjoint classes, so per-(type, "
    "salt) exact distinct counts are disjoint and their per-type SUM "
    "is the exact global distinct — 32-way parallel on the skewed "
    "key, bit-identical answer. The aggregation twin of "
    "join_salted_skew; same answer as the naive plan, which is the "
    "oracle.",
)
def agg_salted_distinct(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    per_salt = ev.groupBy(
        "event_type", F.pmod(F.hash("user_id"), F.lit(32)).alias("salt")
    ).agg(F.count_distinct("user_id").alias("d"))
    return per_salt.groupBy("event_type").agg(F.sum("d").alias("n_users"))


@register(
    "agg_trimmed_mean_quantity",
    """
WITH b AS (
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.05), 6) AS lo,
           round(quantile_cont(l_quantity, 0.95), 6) AS hi
    FROM lineitem GROUP BY l_returnflag)
SELECT lineitem.l_returnflag,
       count(*) AS n_kept,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            / count(*) AS DOUBLE) AS trimmed_mean
FROM lineitem JOIN b ON lineitem.l_returnflag = b.l_returnflag
WHERE l_quantity >= lo AND l_quantity <= hi
GROUP BY lineitem.l_returnflag
""",
    doc="5-95% trimmed mean per return flag — the robust-aggregation "
    "complement to median/MAD: exact interpolated percentile bounds "
    "per group (one agg pass), joined back on the group key (a "
    "groups-sized table — bounded, joins map-side), then a "
    "decimal-exact mean over the kept rows. Two passes over the fact "
    "table total, no sort. Bounds rounded to 6 dp on both engines "
    "(same convention as hist_equidepth_price) so boundary membership "
    "is cross-engine stable; quantities are integral so sums are "
    "exact in DECIMAL.",
)
def agg_trimmed_mean_quantity(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    b = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.round(F.expr("percentile(l_quantity, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("hi"),
    )
    return (
        li.join(b, li.l_returnflag == b.rf)
        .filter((F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") <= F.col("hi")))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_kept"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*"))
            .cast("double")
            .alias("trimmed_mean"),
        )
    )


@register(
    "window_running_distinct_types",
    """
SELECT user_id, event_id,
       CAST(count(DISTINCT event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS distinct_types_so_far
FROM events
""",
    doc="running DISTINCT count over a window — a real engine gap: "
    "Spark does not support count(DISTINCT) OVER, so the idiom is "
    "size(collect_set() OVER (...running frame)) — the set dedups "
    "in-frame and size() is the distinct count. (ts, event_id) is a "
    "total order so frames are identical cross-engine. Scale note: "
    "the set is bounded by the event-type DOMAIN (small), so state "
    "per row is tiny; for high-cardinality columns the right tool is "
    "approx_count_distinct over windows or an offline rollup, not "
    "this idiom.",
)
def window_running_distinct_types(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("distinct_types_so_far"),
    )


@register(
    "agg_weighted_median_quantity",
    """
WITH h AS (
    SELECT l_returnflag, l_quantity AS q,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS BIGINT) AS wt
    FROM lineitem GROUP BY l_returnflag, l_quantity),
cum AS (
    SELECT l_returnflag, q, wt,
           sum(wt) OVER (PARTITION BY l_returnflag ORDER BY q
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
           sum(wt) OVER (PARTITION BY l_returnflag) AS tw
    FROM h)
SELECT l_returnflag,
       min(q) AS weighted_median_qty,
       CAST(min(tw) AS BIGINT) AS total_weight_cents
FROM cum WHERE cw * 2 >= tw
GROUP BY l_returnflag
""",
    doc="weighted median — the quantile every importance-sampled "
    "pipeline needs (median quantity weighted by revenue: where does "
    "half the MONEY sit, not half the rows). Scale design: weights "
    "aggregate onto the VALUE HISTOGRAM first (one map-side-combinable "
    "hash agg on (group, value) — the corpus never flows through a "
    "window), then the cumulative scan runs over the tiny histogram "
    "(|groups| x |distinct quantities| rows, metadata-scale; continuous "
    "values would bin first, hist_equidepth-style). Weights are exact "
    "integer cents and the threshold is pure integer arithmetic "
    "(cw*2 >= tw — no float ratio), so both engines select the "
    "identical value.",
)
def agg_weighted_median_quantity(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    h = li.groupBy(
        "l_returnflag", F.col("l_quantity").alias("q")
    ).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("wt")
    )
    win = (
        W.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("l_returnflag")
    cum = h.withColumn("cw", F.sum("wt").over(win)).withColumn(
        "tw", F.sum("wt").over(wtot)
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("q").alias("weighted_median_qty"),
            F.min("tw").cast("long").alias("total_weight_cents"),
        )
    )


@register(
    "func_transpose_metrics",
    """
WITH m AS (
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem GROUP BY l_returnflag)
SELECT 'n_rows' AS key,
       max(CASE WHEN l_returnflag = 'A' THEN n_rows END) AS "A",
       max(CASE WHEN l_returnflag = 'N' THEN n_rows END) AS "N",
       max(CASE WHEN l_returnflag = 'R' THEN n_rows END) AS "R"
FROM m
UNION ALL
SELECT 'n_orders',
       max(CASE WHEN l_returnflag = 'A' THEN n_orders END),
       max(CASE WHEN l_returnflag = 'N' THEN n_orders END),
       max(CASE WHEN l_returnflag = 'R' THEN n_orders END)
FROM m
""",
    doc="DataFrame transpose (df.transpose, new Spark 4 surface): flip "
    "a per-group metrics table so metrics become rows and group values "
    "become columns — the report-layout operation previously hand-"
    "rolled with pivot + stack. Runs on an already-aggregated "
    "metadata-scale table (|groups| x |metrics|), which is the only "
    "place transpose belongs at 100 TB; the oracle reproduces the "
    "layout with conditional aggregation.",
)
def func_transpose_metrics(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    return m.transpose("l_returnflag")


_PYTH_MEANS_ORACLE = """
WITH p AS (
    SELECT event_type, CAST(value AS DOUBLE) AS v
    FROM events WHERE (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL) AND value > 0
), m AS (
    SELECT event_type,
           count(*) AS n,
           sum(CAST(v AS DECIMAL(18,6))) AS s,
           sum(ln(v)) AS slog,
           sum(1.0 / v) AS srecip
    FROM p GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(s AS DOUBLE) / n AS arithmetic_mean,
       round(exp(slog / n), 6) AS geometric_mean,
       round(n / srecip, 6) AS harmonic_mean
FROM m
"""


@register(
    "agg_pythagorean_means",
    _PYTH_MEANS_ORACLE,
    doc="the three Pythagorean means of positive event values per "
    "type: arithmetic (exact — DECIMAL sum, one division), geometric "
    "(exp of the mean log — the right average for ratios/growth "
    "rates), harmonic (n over the reciprocal sum — the right average "
    "for rates, and the mean AM >= GM >= HM inequality makes a "
    "free self-check, pytest-pinned). Geometric and harmonic emit "
    "at 6 dp: their float sums are addition-order-dependent across "
    "partitions and libm ln/exp differ by 1 ulp (doc_word_entropy "
    "recipe); the arithmetic mean stays bit-exact. One hash "
    "aggregate, partial aggs do all the work.",
)
def agg_pythagorean_means(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(is_exact_value(F.col("value")) & (F.col("value") > 0)).select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    m = p.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
        F.sum(F.log("v")).alias("slog"),
        F.sum(F.lit(1.0) / F.col("v")).alias("srecip"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("s").cast("double") / F.col("n")).alias("arithmetic_mean"),
        F.round(F.exp(F.col("slog") / F.col("n")), 6).alias(
            "geometric_mean"
        ),
        F.round(F.col("n") / F.col("srecip"), 6).alias("harmonic_mean"),
    )
