"""TPC-H shape completion (round 5): analogs for Q2/Q9/Q11/Q12/Q16/Q20/
Q21 — the seven query SHAPES the catalog didn't yet cover. With these,
all 22 TPC-H query shapes have an oracle-checked entry.

The driver schema has no partsupp table and no shipmode/commitdate/
receiptdate columns, so each analog keeps the original query's SHAPE
(the part Catalyst must plan well) while adapting the predicates to the
available columns — same policy as tpch_deep.py's Q8/Q13/Q14/Q19/Q22:

  Q2  correlated-min subquery decorrelated to (groupBy min + join back)
  Q9  profit expression over a 4-way fact/dim join, grouped nation-year
  Q11 group HAVING against a global scalar aggregate (1-row broadcast)
  Q12 conditional priority counts over a date-arithmetic bucket
  Q16 NOT-IN-excluded supplier variety (distinct pairs + anti join)
  Q20 nested semi-join chain (parts -> qualifying pairs -> suppliers)
  Q21 EXISTS / NOT-EXISTS multi self-reference, decorrelated to aggs

House determinism rules (queries/__init__.py): DECIMAL accumulation for
every SUM over doubles, one cast to DOUBLE at the end, identical double
expression trees on both engines, BIGINT casts where the engines widen
differently.

Reference parity: like tpch_deep.py, these extend the relational surface
the reference (a per-event Python service, services/event_processer.py)
cannot express; they exist for the "general analytics over the star
schema" requirement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.queries.tpch_deep import _REV, dec
from feature_store_2_spark.sources.tables import load_table


@register(
    "q2_min_cost_supplier",
    """
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem GROUP BY 1, 2),
eur AS (
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'),
ec AS (
    SELECT c.l_partkey, c.unit_cost, eur.s_name, eur.n_name
    FROM cost c JOIN eur ON c.l_suppkey = eur.s_suppkey),
mn AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM ec GROUP BY 1)
SELECT p_partkey, p_brand, s_name, n_name, unit_cost
FROM ec JOIN mn ON ec.l_partkey = mn.l_partkey
               AND ec.unit_cost = mn.min_cost
        JOIN part ON ec.l_partkey = p_partkey
WHERE p_size <= 10
""",
    doc="TPC-H Q2 analog (no partsupp: unit cost is derived as the "
    "min observed extendedprice/quantity per part-supplier pair): "
    "cheapest EUROPE supplier per small part. The correlated MIN "
    "subquery is decorrelated into a per-part aggregate joined back on "
    "(partkey, cost) — the only shape that scales; ties keep every "
    "minimal supplier on both engines. unit_cost is a single IEEE "
    "division of identical doubles, so the equality join is "
    "bit-stable cross-engine.",
)
def q2_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    part = load_table(spark, "part", sf_dir)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eur = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    ec = cost.join(eur, cost.l_suppkey == eur.s_suppkey).select(
        "l_partkey", "unit_cost", "s_name", "n_name"
    )
    # mn derives from ec (self-join): alias its columns so the join-back
    # keys are unambiguous.
    mn = ec.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        ec.join(
            mn,
            (ec.l_partkey == mn.pk) & (ec.unit_cost == mn.min_cost),
        )
        .join(
            part.filter(F.col("p_size") <= 10),
            ec.l_partkey == F.col("p_partkey"),
        )
        .select("p_partkey", "p_brand", "s_name", "n_name", "unit_cost")
    )


@register(
    "q9_product_profit",
    f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum({_REV}) AS VARCHAR) AS DOUBLE)
           - CAST(CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
           AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 analog (no ps_supplycost: cost is retailprice * "
    "quantity): profit on red parts per supplier nation and order "
    "year. 5-way join; the two decimal sums are order-independent and "
    "each casts to DOUBLE once before the subtraction, so the profit "
    "double is bit-identical cross-engine (a sum over per-row double "
    "differences would not be).",
)
def q9_product_profit(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    cost = dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                F.sum(rev).cast("double") - F.sum(cost).cast("double")
            ).alias("profit")
        )
    )


@register(
    "q11_important_parts",
    f"""
WITH pv AS (
    SELECT l_partkey, sum({_REV}) AS value_dec
    FROM lineitem GROUP BY 1),
tot AS (SELECT sum({_REV}) AS total_dec FROM lineitem)
SELECT l_partkey, CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS part_value
FROM pv, tot
WHERE CAST(CAST(value_dec AS VARCHAR) AS DOUBLE)
      > 0.0005 * CAST(CAST(total_dec AS VARCHAR) AS DOUBLE)
""",
    doc="TPC-H Q11 analog (no partsupp: 'inventory value' is revenue "
    "value per part): parts whose revenue exceeds a fraction of the "
    "GLOBAL total — the group-HAVING-against-a-scalar-subquery shape. "
    "The total is a 1-row aggregate broadcast back (BNLJ build side of "
    "one row — the collect-free way to apply a global scalar at any "
    "scale); both engines compare identical doubles so the boundary "
    "decision matches bit-for-bit.",
)
def q11_important_parts(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    pv = li.groupBy("l_partkey").agg(F.sum(rev).alias("value_dec"))
    tot = li.agg(F.sum(rev).alias("total_dec"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_dec").cast("double")
            > F.lit(0.0005) * F.col("total_dec").cast("double")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "q12_ship_delay_priority",
    """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90 THEN 'mid'
            ELSE 'slow' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
    doc="TPC-H Q12 analog (no shipmode/commitdate: the bucket is "
    "order-to-ship delay in days): high- vs low-priority line counts "
    "per delay bucket — the conditional-aggregation-over-a-join shape. "
    "One orderkey shuffle join + one 3-group agg; day arithmetic on "
    "DATE-cast timestamps is integer-exact on both engines.",
)
def q12_ship_delay_priority(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 90, "mid").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(high.cast("long")).alias("high_priority_count"),
            F.sum((~high).cast("long")).alias("low_priority_count"),
        )
    )


@register(
    "q16_supplier_variety",
    """
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ok AS (
    SELECT l_partkey, l_suppkey FROM pairs
    WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM ok JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
GROUP BY 1, 2
""",
    doc="TPC-H Q16 analog (no partsupp: part-supplier pairs are the "
    "DISTINCT pairs observed in lineitem): supplier variety per "
    "(brand, size), excluding complained-about suppliers (negative "
    "acctbal) — the NOT-IN-subquery + COUNT DISTINCT shape. The NOT IN "
    "plans as a left-anti join (no per-row subquery); the distinct "
    "pair derivation is one hash agg on the fact table.",
)
def q16_supplier_variety(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ok = pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
    return (
        ok.join(
            part.filter(F.col("p_type") != "PROMO"),
            ok.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shipments",
    """
WITH small_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
pair_qty AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM lineitem JOIN small_parts ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1997
    GROUP BY 1, 2),
part_avg AS (
    SELECT l_partkey, CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_qty
    FROM pair_qty GROUP BY 1),
heavy AS (
    SELECT DISTINCT pq.l_suppkey
    FROM pair_qty pq JOIN part_avg pa ON pq.l_partkey = pa.l_partkey
    WHERE pq.qty > 1.5 * pa.avg_qty)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
  AND n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
""",
    doc="TPC-H Q20 analog (no ps_availqty: 'excess' is shipping >1.5x "
    "the part's average per-supplier quantity in 1997): EUROPE "
    "suppliers that over-shipped small parts — the NESTED-IN semi-join "
    "chain shape (parts -> qualifying pairs -> suppliers -> region). "
    "Every IN plans as a semi join; quantities accumulate in DECIMAL "
    "and the avg divides once as DOUBLE so the 1.5x threshold decision "
    "is bit-identical cross-engine.",
)
def q20_excess_shipments(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    small = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    pair_qty = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(small, li.l_partkey == small.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("qty"))
    )
    part_avg = pair_qty.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("qty").cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("avg_qty")
    )
    heavy = (
        pair_qty.join(part_avg, pair_qty.l_partkey == part_avg.pk)
        .filter(F.col("qty") > F.lit(1.5) * F.col("avg_qty"))
        .select("l_suppkey")
        .distinct()
    )
    eur_keys = region.filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(eur_keys, nation.n_regionkey == eur_keys.r_regionkey, "left_semi")
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_orders",
    """
WITH l AS (
    SELECT l_orderkey, l_suppkey, l_shipdate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'),
o AS (
    SELECT l_orderkey, max(l_shipdate) AS mx,
           count(DISTINCT l_suppkey) AS ns
    FROM l GROUP BY 1),
last AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM l JOIN o ON l.l_orderkey = o.l_orderkey AND l.l_shipdate = o.mx
    WHERE o.ns >= 2),
single AS (
    SELECT l_orderkey FROM last GROUP BY 1 HAVING count(*) = 1)
SELECT s_name, count(*) AS numwait
FROM last JOIN single ON last.l_orderkey = single.l_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
""",
    doc="TPC-H Q21 analog (no commitdate/receiptdate: 'kept the order "
    "waiting' = sole supplier on the strictly latest ship date of a "
    "finished multi-supplier order). The original's EXISTS (another "
    "supplier shipped) + NOT EXISTS (another supplier equally late) "
    "pair is decorrelated into per-order aggregates joined back — "
    "correlated-exists per row is the plan that dies at 100 TB, the "
    "agg+join form shuffles the fact table twice on orderkey and "
    "nothing else.",
)
def q21_waiting_orders(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, "supplier", sf_dir)
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("mx"),
        F.count_distinct("l_suppkey").alias("ns"),
    )
    last = (
        lines.join(
            per_order,
            (lines.l_orderkey == per_order.ok) & (lines.l_shipdate == per_order.mx),
        )
        .filter(F.col("ns") >= 2)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    single = (
        last.groupBy(F.col("l_orderkey").alias("sok"))
        .agg(F.count("*").alias("n_last"))
        .filter(F.col("n_last") == 1)
        .select("sok")
    )
    return (
        last.join(single, last.l_orderkey == single.sok, "left_semi")
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
