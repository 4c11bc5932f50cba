"""Coverage widening: bag-semantics set ops, unpivot/melt, positional
explode, join-strategy hints, union-by-name with missing columns,
numeric range frames, arg-max per group (SURVEY.md §2 Part B gaps).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


@register(
    "setop_intersect_all_segments",
    """
SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
INTERSECT ALL
SELECT c_mktsegment FROM customer WHERE c_acctbal < 5000
""",
    doc="INTERSECT ALL (bag semantics: min of per-side multiplicities)",
)
def setop_intersect_all_segments(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    hi = c.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    lo = c.filter(F.col("c_acctbal") < 5000).select("c_mktsegment")
    return hi.intersectAll(lo)


@register(
    "setop_except_all_types",
    """
SELECT event_type FROM events WHERE value > 0.5
EXCEPT ALL
SELECT event_type FROM events WHERE value > 0.9
""",
    doc="EXCEPT ALL (bag difference of multiplicities)",
)
def setop_except_all_types(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    a = ev.filter(F.col("value") > 0.5).select("event_type")
    b = ev.filter(F.col("value") > 0.9).select("event_type")
    return a.exceptAll(b)


@register(
    "unpivot_customer_balances",
    """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS amount FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS amount
FROM customer
""",
    doc="unpivot/melt wide columns to (key, metric, amount) rows",
)
def unpivot_customer_balances(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    # unpivot == stack(): one narrow generate per row, no shuffle.
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
            " AS (metric, amount)"
        ),
    )


@register(
    "posexplode_doc_leading_words",
    """
SELECT doc_id, CAST(i.i - 1 AS BIGINT) AS pos, words[i.i] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
CROSS JOIN generate_series(1, 5) i(i)
WHERE i.i <= len(words)
""",
    doc="positional explode: first five words of each document with index",
)
def posexplode_doc_leading_words(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


@register(
    "join_shuffle_hash_orders",
    """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc="explicit shuffle-hash join strategy (skips SMJ sort, no broadcast)",
)
def join_shuffle_hash_orders(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    # The hint forces hash instead of sort-merge: right choice when one
    # side's per-partition hash table fits in memory but the table is too
    # big to broadcast — saves both sort passes at 100 TB.
    return (
        orders.join(
            cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "union_by_name_event_sources",
    """
SELECT user_id, event_type, value, NULL AS doc_id FROM events WHERE event_type = 'purchase'
UNION ALL BY NAME
SELECT doc_id, user_id, lang AS event_type FROM (
    SELECT doc_id, CAST(doc_id % 150 AS BIGINT) AS user_id, lang FROM documents
)
""",
    doc="unionByName(allowMissingColumns): schema-aligned multi-source merge",
)
def union_by_name_event_sources(spark, sf_dir):
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_type", "value")
    )
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 150).cast("long").alias("user_id"),
        F.col("lang").alias("event_type"),
    )
    return ev.unionByName(docs, allowMissingColumns=True)


@register(
    "window_numeric_range_frame",
    """
SELECT o_orderkey, o_custkey, o_totalprice,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000,
       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                  RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS sum_within_1000
FROM orders
""",
    doc="numeric RANGE frame: trailing $1000 window over order price per customer",
)
def window_numeric_range_frame(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_1000"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .over(w)
        .cast("double")
        .alias("sum_within_1000"),
    )


@register(
    "argmax_latest_event_per_user",
    """
SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
       CAST(epoch_us(ts) AS BIGINT) AS latest_ts_us
FROM (
    SELECT user_id, event_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
""",
    doc="arg-max per group: each user's latest event (deterministic tie-break)",
)
def argmax_latest_event_per_user(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.unix_micros("ts").alias("latest_ts_us"),
        )
    )


@register(
    "join_salted_skew",
    """
WITH dim AS (
    SELECT event_type,
           CAST(CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(28,2)) END) AS DOUBLE)
                / count(value) AS DOUBLE) AS type_avg
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, d.type_avg
FROM events e JOIN dim d ON e.event_type = d.event_type
""",
    doc="salted skew join: events (every row carries one of ~5 hot "
    "event_type keys) joined to a per-type dim with the skewed side "
    "sharded 8 ways by a hash of the unique event id and the dim "
    "replicated per salt — the explicit fallback when one key exceeds "
    "an executor (AQE skew-split can't help hash-partitioned stateful "
    "ops). Oracle = the plain join: salting must be result-invisible",
)
def join_salted_skew(spark, sf_dir):
    from feature_store_2_spark.operators.skew import salted_equi_join

    ev = load_table(spark, "events", sf_dir)
    # Decimal-exact average (order-independent) so both engines emit the
    # identical double.
    dim = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").try_cast("decimal(28,2)")).cast("double")
            / F.count("value")
        )
        .cast("double")
        .alias("type_avg")
    )
    return salted_equi_join(
        ev, dim, on="event_type", salt_src="event_id", n_salts=8
    ).select("event_id", "event_type", "type_avg")


@register(
    "join_null_safe_eq",
    """
WITH a AS (
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
    FROM customer),
b AS (
    SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 'suppressed'
                ELSE lower(c_mktsegment) END AS seg_label
    FROM customer)
SELECT seg_label, count(*) AS n_customers,
       CAST(sum(CAST(a.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
GROUP BY seg_label
""",
    doc="null-safe equi join (Spark `<=>` / SQL IS NOT DISTINCT FROM): "
    "NULL keys match each other instead of silently dropping — the "
    "semantics dimension-join pipelines need when 'unknown' is a "
    "legitimate key (here a suppressed segment). Spark plans eqNullSafe "
    "as a genuine equi-join key (hash/sort-merge, broadcast here), NOT "
    "a theta join — same shuffle shape as a plain equi join at 100 TB.",
)
def join_null_safe_eq(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    a = c.select(
        "c_custkey",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    )
    b = c.select(
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("bseg"),
        F.when(F.col("c_mktsegment") == "BUILDING", "suppressed")
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg_label"),
    ).distinct()
    return (
        a.join(F.broadcast(b), a.seg.eqNullSafe(b.bseg))
        .groupBy("seg_label")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "explode_outer_doc_tail",
    """
WITH t AS (
    SELECT doc_id, string_split(text, ' ')[61:] AS tail
    FROM documents)
SELECT doc_id,
       CAST(u.pos AS BIGINT) AS pos,
       u.word AS word
FROM t LEFT JOIN LATERAL (
    SELECT generate_subscripts(tail, 1) AS pos, unnest(tail) AS word) u
  ON true
""",
    doc="OUTER explode semantics (posexplode_outer): flatten each "
    "document's tail beyond word 60 to one row per word, but PRESERVE "
    "documents with no tail as a single NULL row — plain explode "
    "silently drops them, which breaks 'every input row is accounted "
    "for' audits after flattening. Inner/plain explode is covered by "
    "explode_top_words/posexplode_doc_leading_words; this is the "
    "row-preserving half of the family. Oracle = LEFT JOIN LATERAL "
    "unnest (1-based subscripts on both sides).",
)
def explode_outer_doc_tail(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    t = d.select(
        "doc_id",
        F.expr(
            "slice(split(text, ' '), 61,"
            " greatest(size(split(text, ' ')) - 60, 0))"
        ).alias("tail"),
    )
    return t.select(
        "doc_id", F.posexplode_outer("tail").alias("pos0", "word")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        "word",
    )
