"""Relational operator surface over the TPC-H-ish tables (SURVEY.md §2
Part B): scans, filters, joins of every flavor, aggregation variants.

Plan-quality notes are inline: which side broadcasts, what pushes down,
where the shuffles are. DECIMAL accumulation (exact, order-independent)
is used for every SUM over doubles so results hash-match the oracle
bit-for-bit; see queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.operators.sizing import spread_scan
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


def dec(col: str, prec: str = "decimal(12,2)") -> F.Column:
    """Exact 2-decimal reading of a money/quantity double.

    try_cast (r10 hostile-magnitude class): under Spark 4's ANSI
    default a finite double beyond the decimal's headroom turns a
    plain cast into a whole-job crash on one corrupt row. The repo
    contract is per-site: a value participates iff it is finite AND
    representable in the entry's declared precision — otherwise it is
    MISSING, exactly like NaN/Inf (DuckDB twin: isfinite() gate +
    TRY_CAST, which NULLs overflow the same way). On curated columns
    (TPC-H money/quantity) try_cast is value-identical to cast.
    """
    return F.col(col).try_cast(prec)


@register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))
                * (1 - CAST(l_discount AS DECIMAL(10,2)))
                * (1 + CAST(l_tax AS DECIMAL(10,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2003-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 analog: scan -> pushed filter -> hash agg (partial+final)",
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    # Filter + 2-column grouping: predicate and column pruning reach the
    # parquet scan; one shuffle (partial agg map-side). The conditional
    # spread parallelizes the decimal-heavy partial agg when the scan
    # has fewer splits than cores (single-row-group files); every
    # aggregate is an exact decimal sum or a count, so row order cannot
    # change any value (measured 1.6 -> 1.1 s at sf0.1; a real
    # many-split scan skips the shuffle entirely).
    return (
        spread_scan(li.filter(F.col("l_shipdate") <= "2003-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice", "decimal(10,2)")
                * (F.lit(1) - dec("l_discount", "decimal(10,2)"))
                * (F.lit(1) + dec("l_tax", "decimal(10,2)"))
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    """
SELECT l_orderkey,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'HOUSEHOLD'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 analog: selective dim filter, two joins, agg, top-k",
)
def q3_top_revenue_orders(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "HOUSEHOLD"
    )
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # customer (segment-filtered) is the small side, but it still grows
    # with SF -> AQE-chosen join (broadcast at test scale, shuffle past
    # ~SF1k), then the orders->lineitem join shuffles on orderkey once.
    # Top-k is TakeOrderedAndProject (no global sort).
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
SELECT n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    doc="TPC-H Q5 analog: 6-way join, dims broadcast, one fact shuffle chain",
)
def q5_region_revenue(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    # region/nation are fixed-cardinality broadcast dims; supplier and
    # customer grow with SF so their joins are AQE-chosen; lineitem-orders
    # is the one unavoidable big shuffle join.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_broadcast_customer_geo",
    """
SELECT r_name,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    doc="fact x broadcast-dim snowflake rollup (zero fact shuffles pre-agg)",
)
def join_broadcast_customer_geo(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "join_semi_customers_with_open_orders",
    """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
    doc="left-semi join (EXISTS) — no row multiplication, early out",
)
def join_semi_customers_with_open_orders(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_pending",
    """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
""",
    doc="left-anti join (NOT EXISTS)",
)
def join_anti_customers_without_pending(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_cross_region_nation",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
    doc="explicit cartesian product (tiny dims only)",
)
def join_cross_region_nation(spark, sf_dir):
    return (
        load_table(spark, "region", sf_dir)
        .crossJoin(load_table(spark, "nation", sf_dir))
        .select("r_name", "n_name")
    )


@register(
    "join_range_event_pairs",
    """
SELECT e1.user_id,
       e1.event_id AS first_id,
       e2.event_id AS next_id,
       CAST(floor(epoch(e2.ts)) - floor(epoch(e1.ts)) AS BIGINT) AS gap_s
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
""",
    doc="non-equi range self-join: pairs of events within 5 minutes per user",
)
def join_range_event_pairs(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    # Equi key on user_id keeps this a hash/sort-merge join (the range
    # predicate is a post-join filter), never a cartesian: scales as
    # sum(per-user pairs), and AQE splits skewed users.
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            F.col("e1.user_id").alias("user_id"),
            F.col("e1.event_id").alias("first_id"),
            F.col("e2.event_id").alias("next_id"),
            (
                F.floor(F.col("e2.ts").cast("double"))
                - F.floor(F.col("e1.ts").cast("double"))
            )
            .cast("long")
            .alias("gap_s"),
        )
    )


@register(
    "join_asof_purchase_last_signup",
    """
SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS last_signup_id,
       s.ts AS last_signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    doc="as-of join: latest signup state at each purchase (union-sort impl)",
)
def join_asof_purchase_last_signup(spark, sf_dir):
    """As-of backward join, Spark-first: instead of a range-exploded join,
    union the state stream (signups) and query stream (purchases), sort
    within user by event time, and carry the last state forward with
    last_value(ignorenulls) — one shuffle, no row explosion, the classic
    scalable as-of pattern (reference analog: grant state at lookup time,
    services/user_feature.py:46-55)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("state_id"), F.lit(None).cast("long").alias("query_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("state_id"), F.col("event_id").alias("query_id")
    )
    # state rows sort before query rows at identical ts (is_q tie-break),
    # matching ASOF's p.ts >= s.ts inclusivity.
    unioned = signups.unionByName(purchases).withColumn(
        "is_q", F.col("query_id").isNotNull().cast("int")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_q", F.coalesce("state_id", "query_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("last_signup_id", F.last("state_id", ignorenulls=True).over(w))
        .withColumn("last_signup_ts", F.last(F.when(F.col("state_id").isNotNull(), F.col("ts")), ignorenulls=True).over(w))
        .filter(F.col("is_q") == 1)
        .select(
            F.col("query_id").alias("purchase_id"),
            "user_id",
            "last_signup_id",
            "last_signup_ts",
        )
    )


# One SQL text, two engines: the catalog is DataFrame-first, but the
# engine also exposes a plain ANSI-SQL surface (spark.sql over temp
# views). Q6 is the canonical "is pushdown working" probe — a single
# scan whose three predicates must all reach the parquet reader.
_Q6_SQL = """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "sql_q6_forecast_revenue",
    _Q6_SQL,
    doc="TPC-H Q6 analog through the ANSI-SQL facade: the SAME SQL text "
    "runs on spark.sql (temp view) and DuckDB — demonstrating the "
    "engine's SQL surface; plan = one scan, all three predicates pushed, "
    "DECIMAL-accumulated global agg",
)
def sql_q6_forecast_revenue(spark, sf_dir):
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_SQL)


_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(month_start) AS (
    SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) FROM orders
    UNION ALL
    SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM spine
    WHERE month_start < (SELECT CAST(date_trunc('month', max(o_orderdate))
                                     AS DATE) FROM orders)
),
m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders GROUP BY 1
)
SELECT spine.month_start AS month_start,
       CAST(coalesce(m.n_orders, 0) AS BIGINT) AS n_orders,
       coalesce(m.total_price, 0.0) AS total_price
FROM spine LEFT JOIN m ON spine.month_start = m.month_start
"""


@register(
    "sql_recursive_month_spine",
    _RECURSIVE_SPINE_SQL,
    doc="WITH RECURSIVE through the ANSI-SQL facade (new engine surface "
    "in Spark 4): a complete monthly calendar spine generated "
    "recursively from min to max order month, left-joined to monthly "
    "order aggregates so gap months appear as explicit zero rows — "
    "the gap-filling shape reports need that a plain GROUP BY cannot "
    "produce. The SAME SQL text runs on spark.sql and DuckDB. The "
    "recursion depth is months-of-history (bounded metadata, ~10^3 at "
    "a century), never data-sized; the fact table is touched once by "
    "the aggregate.",
)
def sql_recursive_month_spine(spark, sf_dir):
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    # depth = months of history; Spark's default
    # spark.sql.cteRecursionLevelLimit (100) would throw past ~8 years
    # of orders while DuckDB recurses unbounded (the stats_survival_km
    # advisor find, same class). 100k levels ~ 8000 years of months.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
    return spark.sql(_RECURSIVE_SPINE_SQL)


@register(
    "sql_pipe_syntax_revenue",
    """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
""",
    doc="SQL PIPE syntax (|>, new Spark 4 surface): the linear "
    "FROM |> WHERE |> AGGREGATE form of a filtered revenue rollup — "
    "reads top-to-bottom in dataflow order like the DataFrame API, "
    "compiles to the identical plan as the nested ANSI form (which is "
    "the oracle, since DuckDB has no pipe parser). Same determinism "
    "contract as every revenue entry: DECIMAL accumulation, one cast "
    "to DOUBLE.",
)
def sql_pipe_syntax_revenue(spark, sf_dir):
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(
        """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
|> AGGREGATE CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE)
                 AS revenue,
             count(*) AS n_rows
   GROUP BY l_returnflag
|> SELECT l_returnflag, revenue, n_rows
"""
    )


_GROUP_BY_ALL_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY ALL
"""


@register(
    "sql_group_by_all_priority",
    _GROUP_BY_ALL_SQL,
    doc="GROUP BY ALL (Spark 4 / modern-SQL surface): the grouping key "
    "list is inferred as every non-aggregate select item, so ad-hoc "
    "rollups can't silently drop a key when the select list is edited "
    "— the SAME SQL text runs verbatim on spark.sql and DuckDB. "
    "Decimal accumulation, one cast to double, as with every revenue "
    "entry.",
)
def sql_group_by_all_priority(spark, sf_dir):
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(_GROUP_BY_ALL_SQL)


_ASOF_FWD_TOL_US = 3_600_000_000  # 1 hour


@register(
    "join_asof_forward_next_purchase",
    f"""
WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
SELECT click_id, user_id, click_ts_us, next_purchase_id, gap_us
FROM (
    SELECT c.click_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
           p.purchase_id AS next_purchase_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us,
           row_number() OVER (PARTITION BY c.click_id
                              ORDER BY p.ts, p.purchase_id) AS rn
    FROM c LEFT JOIN p
      ON c.user_id = p.user_id AND p.ts >= c.ts
     AND epoch_us(p.ts) - epoch_us(c.ts) <= {_ASOF_FWD_TOL_US}
) WHERE rn = 1
""",
    doc="FORWARD as-of join with tolerance — the attribution direction "
    "(first conversion AFTER each exposure, within 1 hour), "
    "complementing join_asof_purchase_last_signup's backward form. "
    "Spark-first shape is the same union-merge trick reversed: tag "
    "clicks and purchases into one per-user timeline, sort query rows "
    "BEFORE state rows at equal ts (inclusive >=), and take "
    "first(purchase, ignorenulls) over the FOLLOWING frame — one "
    "shuffle, no range explosion; the tolerance is a post-filter that "
    "nulls the match (left-join semantics), valid because the first "
    "following purchase past tolerance implies none within it. Oracle "
    "is the explicit range LEFT JOIN + per-click argmin.",
)
def join_asof_forward_next_purchase(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("state_id"),
        F.col("event_id").alias("query_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("state_id"),
        F.lit(None).cast("long").alias("query_id"),
    )
    unioned = clicks.unionByName(purchases).withColumn(
        "pos", F.col("state_id").isNotNull().cast("int")  # queries first at ties
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "pos", F.coalesce("state_id", "query_id"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    us = F.unix_micros(F.col("ts"))
    nxt_id = F.first("state_id", ignorenulls=True).over(w)
    nxt_us = F.first(
        F.when(F.col("state_id").isNotNull(), us), ignorenulls=True
    ).over(w)
    out = (
        unioned.withColumn("next_id_raw", nxt_id)
        .withColumn("gap_raw", nxt_us - us)
        .filter(F.col("query_id").isNotNull())
    )
    within = F.col("gap_raw") <= _ASOF_FWD_TOL_US
    return out.select(
        F.col("query_id").alias("click_id"),
        "user_id",
        us.alias("click_ts_us"),
        F.when(within, F.col("next_id_raw")).alias("next_purchase_id"),
        F.when(within, F.col("gap_raw")).alias("gap_us"),
    )


_LCA_SQL = """
SELECT o_orderkey,
       o_custkey + 1 AS k1,
       k1 * 2 AS k2,
       k2 - o_custkey AS k3
FROM orders
WHERE o_orderkey < 5000
"""


@register(
    "sql_lateral_column_alias",
    _LCA_SQL,
    doc="lateral column aliases (Spark 3.4+/4 surface): a select item "
    "referencing an alias defined earlier in the SAME select list "
    "(k1 -> k2 -> k3 chain), the ergonomic form that previously "
    "required nested subqueries — the SAME SQL text runs verbatim on "
    "spark.sql and DuckDB. Integer arithmetic end-to-end; compiles to "
    "one codegen projection over a pushed-down scan.",
)
def sql_lateral_column_alias(spark, sf_dir):
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(_LCA_SQL)


_ASOF_NEAR_TOL_US = 3_600_000_000  # 1 hour


@register(
    "join_asof_nearest_purchase",
    f"""
WITH c AS (SELECT event_id AS click_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS t FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id,
             CAST(epoch_us(ts) AS BIGINT) AS t FROM events
      WHERE event_type = 'purchase'),
back AS (
    SELECT click_id, purchase_id AS b_id, gap AS b_gap FROM (
        SELECT c.click_id, p.purchase_id, c.t - p.t AS gap,
               row_number() OVER (PARTITION BY c.click_id
                                  ORDER BY p.t DESC, p.purchase_id DESC)
                   AS rn
        FROM c JOIN p ON c.user_id = p.user_id AND p.t <= c.t
                     AND c.t - p.t <= {_ASOF_NEAR_TOL_US}
    ) WHERE rn = 1),
fwd AS (
    SELECT click_id, purchase_id AS f_id, gap AS f_gap FROM (
        SELECT c.click_id, p.purchase_id, p.t - c.t AS gap,
               row_number() OVER (PARTITION BY c.click_id
                                  ORDER BY p.t, p.purchase_id) AS rn
        FROM c JOIN p ON c.user_id = p.user_id AND p.t >= c.t
                     AND p.t - c.t <= {_ASOF_NEAR_TOL_US}
    ) WHERE rn = 1)
SELECT c.click_id, c.user_id, c.t AS click_ts_us,
       CASE WHEN b.b_id IS NOT NULL
                 AND (f.f_id IS NULL OR b.b_gap <= f.f_gap)
            THEN b.b_id ELSE f.f_id END AS nearest_purchase_id,
       CASE WHEN b.b_id IS NOT NULL
                 AND (f.f_id IS NULL OR b.b_gap <= f.f_gap)
            THEN -b.b_gap ELSE f.f_gap END AS signed_gap_us,
       CASE WHEN b.b_id IS NOT NULL
                 AND (f.f_id IS NULL OR b.b_gap <= f.f_gap)
            THEN 'backward'
            WHEN f.f_id IS NOT NULL THEN 'forward' END AS direction
FROM c
LEFT JOIN back b USING (click_id)
LEFT JOIN fwd f USING (click_id)
""",
    doc="NEAREST as-of join with tolerance — the third merge_asof "
    "direction (backward and forward are separate entries): each "
    "click matches its temporally closest purchase within 1 hour in "
    "EITHER direction; ties go backward (the state that already "
    "existed), matching the attribution convention, then "
    "(ts, id)-deterministic within each side. Spark-first shape: the "
    "same union-merge timeline ONCE, carrying last-preceding and "
    "first-following candidates from a single sort (two frames over "
    "one shuffle — not two joins), then a row-local argmin; the "
    "oracle is the explicit pair of ranked range joins. Signed gap "
    "(negative = purchase preceded click) keeps the direction "
    "auditable downstream.",
)
def join_asof_nearest_purchase(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("state_id"),
        F.col("event_id").alias("query_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("state_id"),
        F.lit(None).cast("long").alias("query_id"),
    )
    us = F.unix_micros(F.col("ts"))
    # One per-user timeline, one sort. Backward frame: state rows sort
    # BEFORE query rows at equal ts (inclusive <=) and last() favors
    # the max (ts, id). Forward frame: query rows first at ties
    # (inclusive >=) and first() favors the min (ts, id). is_q serves
    # both: asc puts states first (backward), and the forward frame
    # starting at currentRow still sees same-ts states because they
    # sort AFTER the query row only when is_q is ordered... it is not:
    # states (is_q=0) sort first, so the forward frame anchored at the
    # query row would MISS same-ts states. Solution: order by
    # (ts, is_q DESC) would break backward instead — so the timeline
    # is sorted once by (ts, is_q, id) and the forward candidate uses
    # an unbounded-following frame that starts at the query row; a
    # same-ts state sits BEFORE the query row and is picked up by the
    # backward frame (gap 0), which then always wins the tie — the
    # nearest result is unaffected. Documented equivalence: gap-0
    # matches are backward by definition here.
    unioned = clicks.unionByName(purchases).withColumn(
        "is_q", F.col("query_id").isNotNull().cast("int")
    )
    w_back = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_q", F.coalesce("state_id", "query_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_q", F.coalesce("state_id", "query_id"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    st_us = F.when(F.col("state_id").isNotNull(), us)
    out = (
        unioned.withColumn("b_id", F.last("state_id", ignorenulls=True).over(w_back))
        .withColumn("b_us", F.last(st_us, ignorenulls=True).over(w_back))
        .withColumn("f_id", F.first("state_id", ignorenulls=True).over(w_fwd))
        .withColumn("f_us", F.first(st_us, ignorenulls=True).over(w_fwd))
        .filter(F.col("is_q") == 1)
        .withColumn("b_gap", us - F.col("b_us"))
        .withColumn("f_gap", F.col("f_us") - us)
        .withColumn(
            "b_ok",
            F.col("b_id").isNotNull() & (F.col("b_gap") <= _ASOF_NEAR_TOL_US),
        )
        .withColumn(
            "f_ok",
            F.col("f_id").isNotNull() & (F.col("f_gap") <= _ASOF_NEAR_TOL_US),
        )
    )
    back_wins = F.col("b_ok") & (
        ~F.col("f_ok") | (F.col("b_gap") <= F.col("f_gap"))
    )
    return out.select(
        F.col("query_id").alias("click_id"),
        "user_id",
        us.alias("click_ts_us"),
        F.when(back_wins, F.col("b_id"))
        .when(F.col("f_ok"), F.col("f_id"))
        .alias("nearest_purchase_id"),
        F.when(back_wins, -F.col("b_gap"))
        .when(F.col("f_ok"), F.col("f_gap"))
        .alias("signed_gap_us"),
        F.when(back_wins, F.lit("backward"))
        .when(F.col("f_ok"), F.lit("forward"))
        .alias("direction"),
    )


_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR)
            AS DOUBLE) AS disc_revenue,
       count(*) AS n_items
FROM lineitem
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 2 > 40
GROUP BY l_returnflag
"""


@register(
    "sql_scalar_udf_revenue",
    _SQL_UDF_ORACLE,
    doc="Spark 4 SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN "
    "expr, SPARK-46057): business logic named once in SQL and reused "
    "across queries — discounted-price and a quantity predicate both "
    "defined as SQL UDFs and invoked from a plain aggregate. The "
    "planner INLINES the function body, so the plan is identical to "
    "writing the expression by hand: the expanded predicate reaches "
    "the scan node as a DataFilter (parquet-level pushdown is blocked "
    "by the decimal cast — exactly as the hand-written form), the "
    "read schema prunes to 4 columns, and the decimal product-sum "
    "still partial-aggregates map-side — zero execution cost for the "
    "abstraction (unlike Python UDFs). Oracle states the inlined "
    "form; product sum routes DECIMAL->VARCHAR->DOUBLE (the d2d "
    "2^53-hazard recipe).",
)
def sql_scalar_udf_revenue(spark, sf_dir):
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price("
        "p DECIMAL(12,2), d DECIMAL(12,2)) "
        "RETURNS DECIMAL(26,4) RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_doubled_over("
        "q DECIMAL(12,2), lim INT) RETURNS BOOLEAN RETURN q * 2 > lim"
    )
    return spark.sql(
        """
SELECT l_returnflag,
       CAST(sum(disc_price(CAST(l_extendedprice AS DECIMAL(12,2)),
                           CAST(l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS disc_revenue,
       count(*) AS n_items
FROM lineitem
WHERE qty_doubled_over(CAST(l_quantity AS DECIMAL(12,2)), 40)
GROUP BY l_returnflag
"""
    )
