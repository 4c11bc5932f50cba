"""Deeper relational coverage (round 3): TPC-H Q8/Q13/Q14/Q19/Q22
analogs adapted to the driver's star schema (no partsupp table, no
phone/shipmode columns), exact-moment statistics, histogram binning,
and the scale-safe binned interval join.

House determinism rules apply (queries/__init__.py): DECIMAL
accumulation for every SUM over doubles, identical double expression
trees on both engines, BIGINT casts where DuckDB would widen or narrow
differently than Spark.

Reference parity: these extend the relational surface the reference
cannot express at all (it is a per-event Python service,
services/event_processer.py:25-66); they exist for the north-star
"general analytics over the star schema" requirement.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


def dec(col: str, prec: str = "decimal(12,2)") -> F.Column:
    # try_cast: the r10 hostile-magnitude contract (see relational.dec)
    return F.col(col).try_cast(prec)


_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


@register(
    "q8_market_share",
    f"""
WITH rev AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {_REV} AS volume,
           sn.n_name AS supp_nation
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA')
SELECT o_year,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END)
                 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM rev
GROUP BY o_year
""",
    doc="TPC-H Q8 analog: NATION_3 suppliers' share of ASIA-customer "
    "revenue per order year. 6-way join; all dims broadcast, facts "
    "shuffle once on orderkey — the plan a 100 TB run needs.",
)
def q8_market_share(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    # Customer side: restrict to ASIA via broadcast dims (nation/region
    # are fixed-cardinality, 25/5 rows). nation appears twice (customer's
    # and supplier's) — aliased copies, both broadcast. supplier-derived
    # supp_nat grows with SF, so its join is left to AQE.
    cn = nat.alias("cn")
    sn = nat.alias("sn")
    asia_cust = (
        cust.join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(reg), F.col("cn.n_regionkey") == reg.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey")
    ).select("s_suppkey", F.col("sn.n_name").alias("supp_nation"))
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == asia_cust.c_custkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return rev.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))).cast(
                "double"
            )
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q13_customer_distribution",
    """
WITH c_orders AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
""",
    doc="TPC-H Q13 analog: order-count-per-customer distribution — "
    "left outer join preserving orderless customers, then a second "
    "aggregation over the first's result (two narrow shuffles).",
)
def q13_customer_distribution(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # count(o_orderkey) counts only matched rows, so customers with no
    # orders land in the c_count=0 bucket (the point of Q13).
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    f"""
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV} END)
                       AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum({_REV}) AS VARCHAR) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ship_year
""",
    doc="TPC-H Q14 analog: PROMO parts' revenue share per ship year — "
    "conditional aggregation over a fact-dim join (part is broadcastable "
    "until ~SF1k, so the strategy is AQE-chosen, never forced — past "
    "that the partkey-side shuffle join takes over automatically).",
)
def q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    joined = li.join(
        part.select("p_partkey", "p_type"),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        volume.alias("volume"),
        "p_type",
    )
    return joined.groupBy("ship_year").agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("volume"))).cast("double")
            / F.sum("volume").cast("double")
        ).alias("promo_pct")
    )


@register(
    "q19_bracketed_revenue",
    f"""
SELECT p_brand,
       CAST(CAST(sum({_REV}) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 25 AND 50)
GROUP BY p_brand
""",
    doc="TPC-H Q19 analog: OR-of-AND bracket predicates spanning both "
    "join sides — exercises predicate normalization; the single-table "
    "conjuncts still push into each scan.",
)
def q19_bracketed_revenue(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    j = li.join(
        part.select("p_partkey", "p_brand", "p_size"),
        li.l_partkey == F.col("p_partkey"),
    )
    bracket = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(25, 50)
    )
    return (
        j.filter(bracket)
        .groupBy("p_brand")
        .agg(
            F.sum(volume).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q22_idle_customers",
    """
WITH thr AS (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_pos
    FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, thr
WHERE c_acctbal > thr.avg_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_mktsegment
""",
    doc="TPC-H Q22 analog: above-average-balance customers with no "
    "RECENT order (lapsed high-value accounts), per market segment. "
    "Scalar aggregate via 1-row broadcast cross join (no driver "
    "collect), then a left-anti join against the date-filtered orders "
    "scan (filter pushes into parquet before the anti join). "
    "Decimal-exact threshold so both engines agree bit-for-bit.",
)
def q22_idle_customers(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_pos")
    )
    rich = cust.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("avg_pos")
    )
    recent = orders.filter(F.col("o_orderdate") >= "2001-01-01")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


@register(
    "agg_stats_moments",
    """
WITH s AS (
    SELECT l_returnflag,
           count(*) AS n,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS sx,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS sxx,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS sy,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS syy,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS sxy
    FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       CASE WHEN n > 1
            THEN (n * sxx - sx * sx) / (n * (n - 1)) END AS var_qty,
       CASE WHEN n > 1
            THEN sqrt((n * sxx - sx * sx) / (n * (n - 1))) END AS stddev_qty,
       CASE WHEN n > 1
            THEN (n * sxy - sx * sy) / (n * (n - 1)) END AS covar_price_qty,
       (n * sxy - sx * sy)
           / sqrt(nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0))
           AS corr_price_qty
FROM s
""",
    doc="second-moment statistics (variance/stddev/covariance/"
    "correlation) from DECIMAL partial sums: the streaming float "
    "accumulators Spark/DuckDB use internally are addition-order-"
    "dependent, so instead the exact sufficient statistics "
    "(n, Σx, Σx², Σy, Σy², Σxy) are accumulated in decimal — one "
    "map-side-combinable shuffle, bitwise-reproducible at any "
    "parallelism, which is how moments should be computed at 100 TB.",
)
def agg_stats_moments(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)

    # decimal -> STRING -> double on BOTH engines: strtod/parseDouble are
    # correctly rounded (single rounding), while DuckDB's direct
    # decimal->double is int128->double then /10^scale (TWO roundings) —
    # at sf0.001 the A-group's Σy² lands where the paths differ by 1 ulp
    # and the corr chain diverges. The string route pins every moment to
    # the nearest double identically, making the downstream IEEE chain
    # bit-identical structurally, not by fixture luck.
    def d2d(col):
        return col.cast("string").cast("double")

    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        d2d(F.sum(dec("l_quantity"))).alias("sx"),
        d2d(F.sum(dec("l_quantity") * dec("l_quantity"))).alias("sxx"),
        d2d(F.sum(dec("l_extendedprice"))).alias("sy"),
        d2d(F.sum(dec("l_extendedprice") * dec("l_extendedprice"))).alias(
            "syy"
        ),
        d2d(F.sum(dec("l_quantity") * dec("l_extendedprice"))).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    # Degenerate groups pinned identically on both engines: a 1-row group
    # divides by n*(n-1)=0, where Spark yields NULL but DuckDB (IEEE
    # float ops) yields inf/NaN — so both sides guard with n > 1 / nullif
    # and agree on NULL. Same for a zero-variance corr denominator.
    var_q = F.when(n > 1, (n * sxx - sx * sx) / (n * (n - 1)))
    cov = F.when(n > 1, (n * sxy - sx * sy) / (n * (n - 1)))
    corr_den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    corr = (n * sxy - sx * sy) / F.sqrt(F.nullif(corr_den, F.lit(0.0)))
    return s.select(
        "l_returnflag",
        "n",
        var_q.alias("var_qty"),
        F.sqrt(var_q).alias("stddev_qty"),
        cov.alias("covar_price_qty"),
        corr.alias("corr_price_qty"),
    )


@register(
    "hist_order_price_buckets",
    """
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY bucket
""",
    doc="fixed-width histogram binning of order totals (25k buckets): "
    "bucket id is a pure projection so the whole plan is one partial+"
    "final agg shuffle; min/max pick exact stored doubles.",
)
def hist_order_price_buckets(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
    )


@register(
    "join_range_binned",
    """
SELECT c.user_id, c.event_id AS click_id, count(*) AS n_purch_10m
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
GROUP BY c.user_id, c.event_id
""",
    doc="scale-safe interval join: purchases within 10 min after each "
    "click. The naive plan is a theta join (BNLJ — quadratic per user); "
    "here the time axis is bucketed at the window width (600 s) and "
    "each purchase is exploded into its own + preceding bucket, "
    "turning the range join into an EQUI-join on (user_id, bucket) "
    "followed by the exact range filter. Each (click, purchase) pair "
    "meets on exactly one bucket key, so no dedup is needed. This is "
    "the standard interval-join strategy (cf. Flink interval joins) "
    "and the only shape that survives 100 TB of events.",
)
def join_range_binned(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    width = 600  # seconds == the join window, so 2 buckets cover it
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        (F.unix_timestamp("ts") / width).cast("long").alias("bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            (F.unix_timestamp("ts") / width).cast("long").alias("pb"),
        )
        .select(
            "p_user",
            "p_ts",
            F.explode(F.array(F.col("pb"), F.col("pb") - 1)).alias("bucket"),
        )
    )
    return (
        clicks.join(
            purchases,
            (clicks.user_id == purchases.p_user) & (clicks.bucket == purchases.bucket),
        )
        .filter(
            (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .groupBy("user_id", "click_id")
        .agg(F.count("*").alias("n_purch_10m"))
    )


@register(
    "q15_top_supplier",
    f"""
WITH srev AS (
    SELECT l_suppkey,
           CAST(CAST(sum({_REV}) AS VARCHAR) AS DOUBLE) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
    GROUP BY l_suppkey),
mx AS (SELECT max(total_rev) AS m FROM srev)
SELECT s_suppkey, s_name, total_rev
FROM srev JOIN supplier ON s_suppkey = l_suppkey
CROSS JOIN mx
WHERE total_rev = mx.m
""",
    doc="TPC-H Q15 analog: top supplier by quarterly revenue. The max "
    "is a 1-row aggregate broadcast back over the per-supplier revenue "
    "table (never a driver collect); equality on the decimal-exact "
    "double is engine-stable. Ties all surface (no arbitrary pick).",
)
def q15_top_supplier(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    srev = (
        li.filter(
            (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2000-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("total_rev")
        )
    )
    mx = srev.agg(F.max("total_rev").alias("m"))
    return (
        srev.join(supp, srev.l_suppkey == supp.s_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("m"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q17_small_quantity_revenue",
    """
WITH pa AS (
    SELECT l_partkey,
           0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  / count(*)) AS thr
    FROM lineitem GROUP BY l_partkey)
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       count(*) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pa.l_partkey = lineitem.l_partkey
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND l_quantity < thr
GROUP BY p_brand
""",
    doc="TPC-H Q17 analog: revenue locked in small-quantity orders of "
    "selected brands. The correlated per-part average subquery is "
    "decorrelated into a per-part aggregate joined back on partkey "
    "(the only shape that scales — one extra shuffle, no per-row "
    "subquery). Threshold is decimal-exact-sum / count so both engines "
    "select the identical row set.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("thr")
    )
    return (
        li.join(
            part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")),
            li.l_partkey == part.p_partkey,
        )
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("thr"))
        .groupBy("p_brand")
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_small"),
        )
    )


@register(
    "q18_large_volume_customers",
    """
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250.0)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    doc="TPC-H Q18 analog: customers with orders totaling > 250 units. "
    "The HAVING subquery becomes a semi join against the re-aggregated "
    "orderkey set — both aggregations shuffle on the same key "
    "(orderkey), so AQE plans the semi join without a second exchange "
    "of the fact table.",
)
def q18_large_volume_customers(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sq"))
        .filter(F.col("sq") > 250.0)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
    )


_LATERAL_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE customer.c_mktsegment = seg.c_mktsegment
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@register(
    "sql_lateral_topn_per_segment",
    _LATERAL_SQL,
    doc="correlated LATERAL subquery through the ANSI-SQL facade: top-2 "
    "orders per market segment, the SAME SQL text on spark.sql and "
    "DuckDB (like sql_q6_forecast_revenue). Spark decorrelates the "
    "LATERAL into a ranked window under the hood — the declarative "
    "form stays scale-safe while exercising a SQL surface the "
    "DataFrame entries don't (correlated ORDER BY/LIMIT in FROM).",
)
def sql_lateral_topn_per_segment(spark, sf_dir):
    for t in ("customer", "orders"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)
