"""Data-quality + time-hierarchy query family (round-4 coverage
widening): the validation pass a 100 TB ingest runs before training-data
jobs trust a table, and the hypertable-style multi-granularity rollup.

Reference parity: the reference validates events at ingest with a strict
Pydantic schema and rejects failures per row
(/root/reference/app.py:17-44, /root/reference/models/event.py:8-25);
`dq_constraint_audit` is the batch analog — one scan scoring every
constraint instead of row-by-row exceptions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.functions.num import is_exact_value, is_finite
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


def dec(col: str, prec: str = "decimal(12,2)") -> F.Column:
    # try_cast: the r10 hostile-magnitude contract (see relational.dec)
    return F.col(col).try_cast(prec)


@register(
    "dq_constraint_audit",
    """
WITH base AS (
    SELECT o.*, c.c_custkey AS fk_hit
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT 'o_orderkey_not_null' AS constraint_name,
       count(*) FILTER (WHERE o_orderkey IS NULL) AS n_violations,
       count(*) AS n_rows
FROM base
UNION ALL
SELECT 'o_totalprice_positive',
       count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0),
       count(*)
FROM base
UNION ALL
SELECT 'o_orderstatus_in_domain',
       count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
       count(*)
FROM base
UNION ALL
SELECT 'o_orderdate_in_range',
       count(*) FILTER (WHERE o_orderdate IS NULL
                           OR o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                           OR o_orderdate >= TIMESTAMP '2026-01-01 00:00:00'),
       count(*)
FROM base
UNION ALL
SELECT 'o_custkey_fk_customer',
       count(*) FILTER (WHERE fk_hit IS NULL),
       count(*)
FROM base
UNION ALL
SELECT 'o_orderkey_unique',
       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
       count(*)
FROM base
""",
    doc="one-pass data-quality constraint audit over orders: null "
    "checks, positivity, domain membership, date range, FK integrity "
    "against customer (left-join null probe = orphan; AQE-chosen "
    "strategy — customer is scale-factor-sized, never force-broadcast), "
    "and key uniqueness — each as a conditional aggregate, so the whole "
    "audit is ONE scan + one FK join + one tiny distinct agg, never a "
    "pass per constraint. The batch analog of the reference's ingest "
    "schema validation/quarantine; at 100 TB this is the gate a table "
    "passes before training jobs may read it.",
)
def dq_constraint_audit(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("fk_hit")
    )
    # FK probe side is customer — a scale-factor table, NOT a bounded dim,
    # so no forced broadcast (r4 verdict weak-spot class): both sides are
    # keyed by custkey and AQE picks broadcast only when it measures small.
    base = orders.join(cust, orders.o_custkey == cust.fk_hit, "left")
    n_rows = F.count("*")

    def violations(cond: F.Column) -> F.Column:
        return F.count_if(cond)

    checks = {
        "o_orderkey_not_null": F.col("o_orderkey").isNull(),
        "o_totalprice_positive": F.col("o_totalprice").isNull()
        | (F.col("o_totalprice") <= 0),
        "o_orderstatus_in_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
        "o_orderdate_in_range": F.col("o_orderdate").isNull()
        | (F.col("o_orderdate") < "1992-01-01")
        | (F.col("o_orderdate") >= "2026-01-01"),
        "o_custkey_fk_customer": F.col("fk_hit").isNull(),
    }
    agg = base.agg(
        n_rows.alias("n_rows"),
        *[violations(c).alias(name) for name, c in checks.items()],
    )
    uniq = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("o_orderkey_unique"),
    )
    long = agg.crossJoin(F.broadcast(uniq)).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint_name"),
                        F.col(name).alias("n_violations"),
                        F.col("n_rows").alias("n_rows"),
                    )
                    for name in [*checks, "o_orderkey_unique"]
                ]
            )
        ).alias("r")
    )
    return long.select("r.constraint_name", "r.n_violations", "r.n_rows")


@register(
    "rollup_time_hierarchy_events",
    """
SELECT CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts) AS BIGINT) AS d,
       CAST(grouping(year(ts)) * 4 + grouping(month(ts)) * 2
            + grouping(day(ts)) AS BIGINT) AS gid,
       count(*) AS n_events,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (year(ts), month(ts), day(ts))
""",
    doc="hypertable-style time-hierarchy rollup: year -> month -> day "
    "materialized in ONE pass via GROUP BY ROLLUP on calendar parts "
    "(Spark computes all grains in a single Expand + hash agg — one "
    "shuffle for every granularity, vs one scan per grain when done "
    "naively). grouping_id disambiguates subtotal rows from genuine "
    "NULL keys. Decimal-exact value sums; the day grain is what "
    "resample_daily_gapfill serves, coarser grains serve dashboards.",
)
def rollup_time_hierarchy_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    y, m, d = F.year("ts"), F.month("ts"), F.dayofmonth("ts")
    return (
        ev.rollup(y.alias("y"), m.alias("m"), d.alias("d"))
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_events"),
            F.sum(dec("value", "decimal(28,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("y").cast("long").alias("y"),
            F.col("m").cast("long").alias("m"),
            F.col("d").cast("long").alias("d"),
            "gid",
            "n_events",
            "total_value",
        )
    )


@register(
    "stats_column_profile",
    """
SELECT 'l_quantity' AS column_name,
       count(*) AS n_rows,
       count(*) FILTER (WHERE l_quantity IS NULL) AS n_null,
       count(DISTINCT l_quantity) AS n_distinct,
       CAST(min(l_quantity) AS DOUBLE) AS min_val,
       CAST(max(l_quantity) AS DOUBLE) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*),
       count(*) FILTER (WHERE l_extendedprice IS NULL),
       count(DISTINCT l_extendedprice),
       CAST(min(l_extendedprice) AS DOUBLE),
       CAST(max(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*),
       count(*) FILTER (WHERE l_discount IS NULL),
       count(DISTINCT l_discount),
       CAST(min(l_discount) AS DOUBLE),
       CAST(max(l_discount) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_orderkey', count(*),
       count(*) FILTER (WHERE l_orderkey IS NULL),
       count(DISTINCT l_orderkey),
       CAST(min(l_orderkey) AS DOUBLE),
       CAST(max(l_orderkey) AS DOUBLE)
FROM lineitem
""",
    doc="ANALYZE-style column statistics (the CBO stats path): per-column "
    "row count, null count, exact NDV, min, max over lineitem in ONE "
    "aggregate pass (Spark expands multi-distinct into a single Expand "
    "+ two-phase agg — still one scan, no pass per column), then "
    "unpivoted to one row per column. These are the statistics "
    "`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` feeds the "
    "cost-based optimizer for join reordering and broadcast decisions; "
    "at 100 TB NDV would switch to approx_count_distinct (HLL), the "
    "exact form is the oracle-able twin.",
)
def stats_column_profile(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_orderkey"]
    agg = li.agg(
        F.count("*").alias("n_rows"),
        *[
            x
            for c in cols
            for x in (
                F.count_if(F.col(c).isNull()).alias(f"{c}__null"),
                F.countDistinct(c).alias(f"{c}__ndv"),
                F.min(F.col(c).cast("double")).alias(f"{c}__min"),
                F.max(F.col(c).cast("double")).alias(f"{c}__max"),
            )
        ],
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__ndv").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_val"),
                        F.col(f"{c}__max").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("r")
    ).select(
        "r.column_name", "r.n_rows", "r.n_null", "r.n_distinct",
        "r.min_val", "r.max_val",
    )


@register(
    "stats_key_skew_profile",
    """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY user_id),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows FROM c)
SELECT user_id, n,
       CAST(n AS DOUBLE) / n_rows AS row_share,
       CAST(n AS DOUBLE) * n_keys / n_rows AS skew_factor
FROM c CROSS JOIN tot
ORDER BY n DESC, user_id NULLS FIRST LIMIT 10
""",
    doc="shuffle-key skew profile — the diagnostic that decides WHEN to "
    "salt (operators/skew.salted_equi_join) or lean on AQE skew-join "
    "before a production run: top-10 hottest keys with their row share "
    "and skew factor (rows vs a perfectly uniform key). One hash agg "
    "+ a 1-row totals broadcast + TakeOrderedAndProject; ratios are "
    "single divisions of exact integers so the doubles hash exactly. "
    "The tie-break pins NULLS FIRST explicitly (r9 find: Spark's ASC "
    "default is NULLS FIRST, DuckDB's is NULLS LAST — an anonymous-"
    "traffic key tying at the top-10 boundary diverged); the NULL "
    "user_id group IS a legitimate hot key for skew planning. "
    "At 100 TB this runs on a sample partition-pruned to a recent "
    "window, but the shape is identical.",
)
def stats_key_skew_profile(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.count("*").alias("n_keys"), F.sum("n").cast("long").alias("n_rows")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("n_rows")).alias("row_share"),
            (F.col("n").cast("double") * F.col("n_keys") / F.col("n_rows")).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@register(
    "stats_join_size_forecast",
    """
WITH a AS (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1),
b AS (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1),
f AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS forecast_rows,
             CAST(count(*) AS BIGINT) AS n_join_keys,
             CAST(max(ca * cb) AS BIGINT) AS max_key_rows
      FROM a JOIN b USING (k)),
act AS (SELECT CAST(count(*) AS BIGINT) AS actual_rows
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
SELECT forecast_rows, n_join_keys, max_key_rows, actual_rows,
       forecast_rows = actual_rows AS exact_match
FROM f CROSS JOIN act
""",
    doc="join-size forecast from per-key frequency statistics — the "
    "CBO calculation (|A join B| = sum over keys of cA*cB) run as a "
    "first-class query BEFORE committing to an expensive join: two "
    "key-count aggs (each a fraction of the join's shuffle) give the "
    "exact output cardinality plus the hottest key's contribution "
    "(max_key_rows — the skew red flag feeding stats_key_skew_profile "
    "/ salting). actual_rows rides along to prove the forecast exact; "
    "at 100 TB you run only the forecast half. Cheap because counts "
    "move, not rows.",
)
def stats_join_size_forecast(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    a = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count("*").alias("ca"))
    b = l.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("cb"))
    f = (
        a.join(b, "k")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("forecast_rows"),
            F.count("*").alias("n_join_keys"),
            F.max(F.col("ca") * F.col("cb")).cast("long").alias("max_key_rows"),
        )
    )
    act = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .agg(F.count("*").alias("actual_rows"))
    )
    return f.crossJoin(F.broadcast(act)).select(
        "forecast_rows",
        "n_join_keys",
        "max_key_rows",
        "actual_rows",
        (F.col("forecast_rows") == F.col("actual_rows")).alias("exact_match"),
    )


@register(
    "dq_distribution_drift",
    """
WITH b AS (
    SELECT event_type,
           CASE WHEN (CASE WHEN isfinite(value)
                           THEN TRY_CAST(value AS DECIMAL(18,6))
                      END IS NOT NULL)
                THEN CAST(floor(value / 20) AS BIGINT) END AS bin,
           CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half
    FROM events),
c AS (
    SELECT event_type, bin,
           CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o_early,
           CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o_late
    FROM b GROUP BY event_type, bin),
tot AS (
    SELECT event_type,
           CAST(sum(o_early) AS BIGINT) AS t_early,
           CAST(sum(o_late) AS BIGINT) AS t_late
    FROM c GROUP BY event_type)
SELECT c.event_type, bin, o_early, o_late,
       CAST(o_late AS DOUBLE)
         - CAST(t_late AS DOUBLE) * o_early / NULLIF(t_early, 0) AS excess,
       CASE WHEN o_early > 0 THEN
            (CAST(o_late AS DOUBLE)
               - CAST(t_late AS DOUBLE) * o_early / NULLIF(t_early, 0))
          * (CAST(o_late AS DOUBLE)
               - CAST(t_late AS DOUBLE) * o_early / NULLIF(t_early, 0))
          / (CAST(t_late AS DOUBLE) * o_early / NULLIF(t_early, 0))
       END AS drift_term
FROM c JOIN tot ON c.event_type = tot.event_type
""",
    doc="distribution drift monitor — the retraining/rollback trigger "
    "every production feature pipeline watches: the value distribution "
    "(fixed-width bins) of the LATE half of the stream compared "
    "against the EARLY half's as baseline, chi-square-style per-bin "
    "drift terms (observed-late vs expected-from-early scaled to late "
    "volume). Emitted PER BIN deliberately: each term is a fixed chain "
    "of correctly-rounded int64->double ops (hash-exact), whereas a "
    "summed statistic over float terms would be addition-order-"
    "dependent — the consumer sums the handful of bin rows. Two hash "
    "aggs on (type, bin) — counts move, never events; new-in-late "
    "bins surface with NULL drift (o_early=0), the strongest drift "
    "signal of all.",
)
def dq_distribution_drift(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    b = ev.select(
        "event_type",
        # non-finite values bin as NULL alongside NULLs (the garbage
        # bin) — both engines agree; a bare floor/cast diverges (r9
        # non-finite class)
        F.when(
            is_exact_value(F.col("value")),
            F.floor(F.col("value") / 20).cast("long"),
        ).alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
    )
    c = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("o_early"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("o_late"),
    )
    tot = c.groupBy("event_type").agg(
        F.sum("o_early").cast("long").alias("t_early"),
        F.sum("o_late").cast("long").alias("t_late"),
    )
    # NULLIF-guard t_early: an event_type with no early-half rows makes
    # Spark (non-ANSI) return NULL for the double div-by-zero where
    # DuckDB's IEEE mode returns Infinity — guard both engines to NULL
    # so the hash gate is data-independent (r5 advisor finding).
    e = (
        F.col("t_late").cast("double")
        * F.col("o_early")
        / F.nullif(F.col("t_early"), F.lit(0))
    )
    excess = F.col("o_late").cast("double") - e
    return c.join(tot, "event_type").select(
        "event_type",
        "bin",
        "o_early",
        "o_late",
        excess.alias("excess"),
        # nullif e as well: a type with NO late-half rows has
        # t_late=0 -> e=0, where DuckDB's double /0 yields NULL but
        # Spark's ANSI `/` throws — both engines must agree on NULL
        # (same guard family as t_early above).
        F.when(
            F.col("o_early") > 0, excess * excess / F.nullif(e, F.lit(0.0))
        ).alias("drift_term"),
    )


@register(
    "dq_referential_integrity",
    """
WITH checks AS (
    SELECT 'orders.o_custkey->customer' AS fk_name,
           CAST(count(*) AS BIGINT) AS n_child_rows,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey)
SELECT fk_name, n_child_rows, n_orphans,
       (n_orphans = 0) AS fk_holds,
       CAST(n_child_rows - n_orphans AS DOUBLE) / n_child_rows
           AS match_ratio
FROM checks
""",
    doc="referential-integrity audit across the star schema's four FK "
    "edges (orders->customer, lineitem->{orders,part,supplier}) — the "
    "DQ check that gates every downstream join's correctness (an "
    "orphan FK silently drops rows from inner joins): per edge, child "
    "cardinality, orphan count via left-join null-probe (one "
    "pass per edge, counts move not rows), a boolean verdict, and the "
    "match ratio as one exact division. The four probes are "
    "independent equi-joins on their natural keys — at 100 TB each is "
    "a shuffle join on the FK, orphan counting is map-side after the "
    "join, and the output is 4 rows of metadata.",
)
def dq_referential_integrity(spark, sf_dir):
    def probe(child, ckey, parent, pkey, name):
        j = child.join(parent, child[ckey] == parent[pkey], "left")
        return j.agg(
            F.lit(name).alias("fk_name"),
            F.count("*").cast("long").alias("n_child_rows"),
            F.sum(parent[pkey].isNull().cast("int"))
            .cast("long")
            .alias("n_orphans"),
        )

    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    checks = (
        probe(orders, "o_custkey", customer, "c_custkey",
              "orders.o_custkey->customer")
        .unionByName(
            probe(lineitem, "l_orderkey", orders, "o_orderkey",
                  "lineitem.l_orderkey->orders")
        )
        .unionByName(
            probe(lineitem, "l_partkey", part, "p_partkey",
                  "lineitem.l_partkey->part")
        )
        .unionByName(
            probe(lineitem, "l_suppkey", supplier, "s_suppkey",
                  "lineitem.l_suppkey->supplier")
        )
    )
    return checks.select(
        "fk_name",
        "n_child_rows",
        "n_orphans",
        (F.col("n_orphans") == 0).alias("fk_holds"),
        (
            (F.col("n_child_rows") - F.col("n_orphans")).cast("double")
            / F.col("n_child_rows")
        ).alias("match_ratio"),
    )


_BENFORD_ORACLE = """
WITH cents AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM orders
), digit AS (
    SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS d FROM cents
), counts AS (
    SELECT d, count(*) AS n FROM digit GROUP BY d
), tot AS (SELECT sum(n) AS t FROM counts)
SELECT d AS digit,
       CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / t AS share,
       round(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS benford_expected
FROM counts CROSS JOIN tot
"""


@register(
    "stats_benford_distribution",
    _BENFORD_ORACLE,
    doc="Benford first-significant-digit audit on order totals - the "
    "classic fraud/data-fabrication screen: organic monetary values "
    "follow P(d) = log10(1 + 1/d); a fabricated or truncated feed "
    "shows a flat or spiked digit histogram. Exactness: the first "
    "digit is extracted from the DECIMAL(18,2) cents integer "
    "rendered as a string (never via floating log10, whose 1-ulp "
    "error flips the digit at exact powers of ten); share is one "
    "exact BIGINT division; the Benford reference curve is rounded "
    "to 6 dp (libm ln 1-ulp, same recipe as doc_word_entropy). "
    "Scale: a 9-row hash aggregate over one column - partial aggs "
    "do all the work, the 1-row total is a broadcast scalar.",
)
def stats_benford_distribution(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    digit = o.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    counts = digit.groupBy("d").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    return counts.join(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("t")).alias("share"),
        # nullif d: a zero/negative total has first digit 0, where
        # Benford's log(1 + 1/d) is undefined — DuckDB's 1/0 yields
        # NULL (NULL expected-share on the audit row) while Spark's
        # ANSI `/` throws; both engines must agree on NULL.
        F.round(
            F.log(
                F.lit(1.0) + F.lit(1.0) / F.nullif(F.col("d"), F.lit(0))
            )
            / F.log(F.lit(10.0)),
            6,
        ).alias("benford_expected"),
    )


_ROC_THRESHOLDS = (0, 1000, 2000, 3000, 4000)

_ROC_ORACLE = f"""
WITH f AS (
    SELECT doc_id,
           CAST(50 * len(string_split(text, ' '))
                + 30 * len(list_distinct(string_split(text, ' ')))
                - 2 * n_chars AS BIGINT) AS score,
           lang = 'en' AS truth
    FROM documents),
thr AS (SELECT unnest([{', '.join(str(t) for t in _ROC_THRESHOLDS)}]) AS threshold),
cell AS (
    SELECT t.threshold,
           count(CASE WHEN f.score > t.threshold AND f.truth THEN 1 END) AS tp,
           count(CASE WHEN f.score > t.threshold AND NOT f.truth THEN 1 END) AS fp,
           count(CASE WHEN f.score <= t.threshold AND f.truth THEN 1 END) AS fn,
           count(CASE WHEN f.score <= t.threshold AND NOT f.truth THEN 1 END) AS tn
    FROM f CROSS JOIN thr t
    GROUP BY t.threshold)
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS tpr,
       CAST(fp AS DOUBLE) / nullif(fp + tn, 0) AS fpr
FROM cell
"""


@register(
    "eval_roc_points",
    _ROC_ORACLE,
    doc="ROC operating points for a classifier sweep: the fixed "
    "integer-weight linear quality score (same features as "
    "udf_model_score_linear) evaluated against an independent truth "
    "column (lang='en') at five literal thresholds — TP/FP/FN/TN "
    "counts plus TPR/FPR per point, the curve a curation team reads "
    "before picking a filter cut. Exactness: the score is pure "
    "integer, every cell is a conditional count, and each rate is "
    "ONE division of two exact integers (NULLIF-guarded for the "
    "degenerate all-one-class corpus). Scale: the threshold spine "
    "is a 5-row broadcast against one corpus pass — counts move to "
    "the driver, never rows; adding thresholds widens the spine, "
    "not the scan count.",
)
def eval_roc_points(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    w = F.split("text", " ")
    score = (
        F.lit(50) * F.size(w)
        + F.lit(30) * F.size(F.array_distinct(w))
        - F.lit(2) * F.col("n_chars")
    ).cast("long")
    f = d.select(score.alias("score"), (F.col("lang") == "en").alias("truth"))
    thr = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t).cast("long") for t in _ROC_THRESHOLDS])
        ).alias("threshold")
    )
    cell = (
        f.join(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.count(
                F.when((F.col("score") > F.col("threshold")) & F.col("truth"), 1)
            ).alias("tp"),
            F.count(
                F.when(
                    (F.col("score") > F.col("threshold")) & ~F.col("truth"), 1
                )
            ).alias("fp"),
            F.count(
                F.when(
                    (F.col("score") <= F.col("threshold")) & F.col("truth"), 1
                )
            ).alias("fn"),
            F.count(
                F.when(
                    (F.col("score") <= F.col("threshold")) & ~F.col("truth"), 1
                )
            ).alias("tn"),
        )
    )
    return cell.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")).cast("long"), F.lit(0))
        ).alias("tpr"),
        (
            F.col("fp").cast("double")
            / F.nullif((F.col("fp") + F.col("tn")).cast("long"), F.lit(0))
        ).alias("fpr"),
    )


_KANON_ORACLE = """
WITH g AS (
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           count(DISTINCT CAST(c_acctbal >= 0 AS INT)) AS l_diversity
    FROM customer
    GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment,
       CAST(group_size AS BIGINT) AS group_size,
       group_size >= 5 AS k_anonymous,
       CAST(l_diversity AS INT) AS l_diversity,
       l_diversity >= 2 AS l_diverse
FROM g
"""


@register(
    "dq_k_anonymity",
    _KANON_ORACLE,
    doc="k-anonymity / l-diversity privacy audit: customers grouped by "
    "their quasi-identifier tuple (nation, market segment) — a group "
    "smaller than k=5 is re-identifiable and must be generalized or "
    "suppressed before the table ships as training data; l-diversity "
    "additionally requires >= 2 distinct values of the sensitive "
    "attribute (account-balance sign) inside each group, or the "
    "quasi-identifiers alone REVEAL the sensitive value even at "
    "k>=5. One hash aggregate with a distinct-count — the privacy "
    "twin of dq_constraint_audit, and the pre-release gate an "
    "LLM-training pipeline runs before user-derived tables enter a "
    "corpus. Exact integer counts; booleans derive from them.",
)
def dq_k_anonymity(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("group_size"),
        F.countDistinct(
            (F.col("c_acctbal") >= 0).cast("int")
        ).alias("l_diversity"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("group_size").cast("long").alias("group_size"),
        (F.col("group_size") >= 5).alias("k_anonymous"),
        F.col("l_diversity").cast("int").alias("l_diversity"),
        (F.col("l_diversity") >= 2).alias("l_diverse"),
    )


_LEDGER_ORACLE = """
WITH li AS (
    SELECT l_orderkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS line_total,
           count(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
), rec AS (
    SELECT o.o_orderkey,
           CAST(o.o_totalprice AS DECIMAL(18,6)) AS header_total,
           li.line_total,
           CAST(li.n_lines AS INT) AS n_lines,
           abs(CAST(o.o_totalprice AS DECIMAL(18,6)) - li.line_total)
               AS abs_diff
    FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT o_orderkey,
       CAST(header_total AS DOUBLE) AS header_total,
       CAST(line_total AS DOUBLE) AS line_total,
       n_lines,
       CAST(abs_diff AS DOUBLE) AS abs_diff
FROM rec
ORDER BY abs_diff DESC, o_orderkey
LIMIT 20
"""


@register(
    "dq_ledger_reconciliation",
    _LEDGER_ORACLE,
    doc="ledger reconciliation: per order, the header total vs the sum "
    "of its line items — the 20 worst absolute discrepancies, the "
    "daily close-of-books audit every billing pipeline runs (and a "
    "denormalization-drift detector for any header/detail pair). "
    "Exactness: both sides accumulate in DECIMAL(18,6); the "
    "difference and its abs stay decimal, doubles appear only in "
    "the final reporting casts; top-20 via TakeOrdered with an "
    "orderkey tie-break. Scale: one partial-agg shuffle of lineitem "
    "on its join key, then an equi-join at order grain — the "
    "header side never re-shuffles the detail side.",
)
def dq_ledger_reconciliation(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    li = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias(
                "line_total"
            ),
            F.count("*").cast("int").alias("n_lines"),
        )
    )
    header = F.col("o_totalprice").cast("decimal(18,6)")
    rec = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey",
        header.alias("header_total"),
        "line_total",
        "n_lines",
        F.abs(header - F.col("line_total")).alias("abs_diff"),
    )
    return (
        rec.orderBy(F.col("abs_diff").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "o_orderkey",
            F.col("header_total").cast("double").alias("header_total"),
            F.col("line_total").cast("double").alias("line_total"),
            "n_lines",
            F.col("abs_diff").cast("double").alias("abs_diff"),
        )
    )


_DISTINCT_ROLLUP_ORACLE = """
WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d
    FROM events),
um AS (SELECT DISTINCT user_id, y, m FROM ud),
uy AS (SELECT DISTINCT user_id, y FROM um)
SELECT 'day' AS grain, y, m, d, count(*) AS n_users
FROM ud GROUP BY y, m, d
UNION ALL
SELECT 'month', y, m, CAST(NULL AS BIGINT), count(*) FROM um GROUP BY y, m
UNION ALL
SELECT 'year', y, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), count(*)
FROM uy GROUP BY y
"""


@register(
    "rollup_distinct_users_time",
    _DISTINCT_ROLLUP_ORACLE,
    doc="Exact distinct active users at every time grain (day -> month "
    "-> year) — the DAU/MAU/YAU board metric. DISTINCT does not "
    "roll up through GROUP BY ROLLUP (a user active 3 days in a "
    "month is ONE monthly active), so the plan pays the expensive "
    "dedup once at the finest (user, day) grain and re-dedups the "
    "already-collapsed output per coarser grain: shuffle sizes "
    "shrink geometrically (|user x day| >> |user x month| >> "
    "|user x year|), vs three full scans with COUNT(DISTINCT) per "
    "grain. All keys BIGINT; counts exact.",
)
def rollup_distinct_users_time(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    ud = ev.select(
        "user_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).distinct()
    um = ud.select("user_id", "y", "m").distinct()
    uy = um.select("user_id", "y").distinct()
    nul = F.lit(None).cast("long")
    day = ud.groupBy("y", "m", "d").agg(F.count("*").alias("n_users")).select(
        F.lit("day").alias("grain"), "y", "m", "d", "n_users"
    )
    month = um.groupBy("y", "m").agg(F.count("*").alias("n_users")).select(
        F.lit("month").alias("grain"), "y", "m", nul.alias("d"), "n_users"
    )
    year = uy.groupBy("y").agg(F.count("*").alias("n_users")).select(
        F.lit("year").alias("grain"),
        "y",
        nul.alias("m"),
        nul.alias("d"),
        "n_users",
    )
    return day.unionByName(month).unionByName(year)


_PATTERN_ORACLE = """
WITH sigs AS (
    SELECT 'c_name' AS column_name,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
               '[0-9]', '9', 'g') AS pattern
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment',
           regexp_replace(regexp_replace(regexp_replace(
               c_mktsegment, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
               '[0-9]', '9', 'g')
    FROM customer)
SELECT column_name, pattern, CAST(count(*) AS BIGINT) AS n_values
FROM sigs GROUP BY 1, 2
"""


@register(
    "dq_value_pattern_profile",
    _PATTERN_ORACLE,
    doc="Value-pattern (shape) profiling — the DQ-tool staple that "
    "surfaces mixed formats before they break parsers: every string "
    "folds to a character-class signature (uppercase->A, "
    "lowercase->a, digit->9; punctuation kept verbatim), then "
    "signatures are counted per column. A healthy column shows ONE "
    "dominant pattern; stragglers are the malformed rows. Plain "
    "character-class regexes behave identically in Spark (Java "
    "regex) and DuckDB (RE2), so the fold is engine-exact. Scale "
    "shape: per-column narrow projections unioned, one hash agg — "
    "pattern cardinality is tiny by construction.",
)
def dq_value_pattern_profile(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)

    def sig(col):
        x = F.regexp_replace(F.col(col), "[A-Z]", "A")
        x = F.regexp_replace(x, "[a-z]", "a")
        return F.regexp_replace(x, "[0-9]", "9")

    sigs = c.select(
        F.lit("c_name").alias("column_name"), sig("c_name").alias("pattern")
    ).unionAll(
        c.select(F.lit("c_mktsegment"), sig("c_mktsegment"))
    )
    return sigs.groupBy("column_name", "pattern").agg(
        F.count("*").alias("n_values")
    )


_AGING_ORACLE = """
WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders),
open_orders AS (
    SELECT o_orderkey, o_orderstatus, o_orderdate,
           CAST(datediff('day', o_orderdate, anchor.a) AS BIGINT) AS age_days
    FROM orders CROSS JOIN anchor
    WHERE o_orderstatus IN ('O', 'P'))
SELECT o_orderstatus,
       CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 60 THEN '31-60'
            WHEN age_days <= 90 THEN '61-90'
            ELSE '90+' END AS age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(age_days) AS BIGINT) AS min_age_days,
       CAST(max(age_days) AS BIGINT) AS max_age_days
FROM open_orders
GROUP BY 1, 2
"""


@register(
    "dq_open_order_aging",
    _AGING_ORACLE,
    doc="Open-order aging report — the ops backlog view (how stale is "
    "the unfulfilled book, by status and age bucket). Snapshot "
    "anchor = global max order date (1-row broadcast scalar, the "
    "collect-free pattern every aging/recency entry uses); ages are "
    "exact day diffs; fixed 30/60/90 buckets. Scale shape: pushed "
    "status filter, one scan, 1-row cross-joined anchor, one tiny "
    "hash agg.",
)
def dq_open_order_aging(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    anchor = o.agg(F.max("o_orderdate").alias("a"))
    aged = (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_orderstatus",
            F.datediff(F.col("a"), F.col("o_orderdate"))
            .cast("long")
            .alias("age_days"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 60, "31-60")
        .when(F.col("age_days") <= 90, "61-90")
        .otherwise("90+")
    )
    return aged.groupBy("o_orderstatus", bucket.alias("age_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.min("age_days").alias("min_age_days"),
        F.max("age_days").alias("max_age_days"),
    )


# ---------------------------------------------------------------------------
# Source freshness lag (round 9)
# ---------------------------------------------------------------------------

_FRESHNESS_ORACLE = """
WITH g AS (SELECT max(ts) AS gmax FROM events),
per AS (
    SELECT event_type,
           max(ts) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_total
    FROM events GROUP BY 1
)
SELECT p.event_type,
       epoch_us(p.last_ts) AS last_ts_us,
       (epoch_us(g.gmax) - epoch_us(p.last_ts)) // 1000000
           AS lag_seconds,
       p.n_total,
       (SELECT CAST(count(*) AS BIGINT) FROM events e
        WHERE e.event_type = p.event_type
          AND e.ts > g.gmax - INTERVAL 24 HOUR) AS n_last_24h
FROM per p CROSS JOIN g
"""


@register(
    "dq_freshness_lag",
    _FRESHNESS_ORACLE,
    doc="per-source freshness audit: each event type's last-seen "
    "timestamp, its lag behind the corpus high-water mark in whole "
    "seconds, and trailing-24h volume — the staleness page every "
    "ingestion SLA dashboard runs before anyone trusts a feature "
    "refresh (a source whose lag grows while others advance is a "
    "stuck producer, invisible to row-count checks alone). "
    "Exactness: microsecond timestamps differenced as integers; no "
    "floats anywhere. Scale: one conditional hash agg over the "
    "stream (the 24h flag folds into the same pass as max/count) "
    "plus a 1-row high-water broadcast — type-grain metadata out.",
)
def dq_freshness_lag(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    g = ev.agg(F.max("ts").alias("gmax"))
    per = (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_total"),
            F.sum(
                F.when(
                    F.col("ts") > F.col("gmax") - F.expr("INTERVAL 24 HOURS"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_last_24h"),
            F.max("gmax").alias("gmax"),
        )
    )
    return per.select(
        "event_type",
        F.unix_micros("last_ts").alias("last_ts_us"),
        # integral div, not double division: exact whole-second floor
        # (DuckDB's date_diff('second') counts boundary crossings — off
        # by one on sub-second remainders; the oracle floors micros too)
        F.call_function(
            "div",
            F.unix_micros("gmax") - F.unix_micros("last_ts"),
            F.lit(1_000_000),
        ).alias("lag_seconds"),
        "n_total",
        "n_last_24h",
    )


# ---------------------------------------------------------------------------
# Duplicate event-id audit (round 9)
# ---------------------------------------------------------------------------

_DUP_EVENT_ORACLE = """
WITH c AS (
    SELECT event_id, CAST(count(*) AS BIGINT) AS copies
    FROM events GROUP BY 1
), s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_ids,
           CAST(sum(copies) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_ids,
           CAST(sum(CASE WHEN copies > 1 THEN copies ELSE 0 END) AS BIGINT)
               AS n_dup_rows,
           CAST(max(copies) AS BIGINT) AS max_copies
    FROM c
)
SELECT n_rows, n_distinct_ids, n_dup_ids, n_dup_rows, max_copies,
       CAST(n_rows - n_distinct_ids AS DOUBLE) / n_rows AS replay_share
FROM s
"""


@register(
    "dq_duplicate_event_audit",
    _DUP_EVENT_ORACLE,
    doc="event-id replay audit: distinct ids, ids appearing more than "
    "once, rows those duplicates contribute, the worst replay "
    "multiplicity, and the share of rows that uuid-dedup (A5/A7) "
    "will drop — the upstream-health readout that tells you whether "
    "a spike in raw volume is traffic or an at-least-once delivery "
    "storm replaying the same ids across files. Exactness: pure "
    "integer counting, one final double division. Scale: one "
    "id-grain hash agg (map-side combinable) folded to a 1-row "
    "summary — the id-grain table is the same shuffle the dedup "
    "pipeline already pays.",
)
def dq_duplicate_event_audit(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    c = ev.groupBy("event_id").agg(F.count("*").alias("copies"))
    return c.agg(
        F.sum("copies").cast("long").alias("n_rows"),
        F.count("*").alias("n_distinct_ids"),
        F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_ids"),
        F.sum(F.when(F.col("copies") > 1, F.col("copies")).otherwise(0))
        .cast("long")
        .alias("n_dup_rows"),
        F.max("copies").alias("max_copies"),
    ).select(
        "n_rows",
        "n_distinct_ids",
        "n_dup_ids",
        "n_dup_rows",
        "max_copies",
        (
            (F.col("n_rows") - F.col("n_distinct_ids")).cast("double")
            / F.col("n_rows")
        ).alias("replay_share"),
    )
