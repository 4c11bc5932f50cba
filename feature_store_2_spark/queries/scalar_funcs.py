"""Scalar function families (SURVEY.md §2 Part B): string, date/time,
math, array, JSON, null-handling and conditional expressions.

All built-in pyspark.sql.functions — JVM-side, whole-stage-codegen'd;
no Python in the row path. Libm-dependent functions (ln/exp/pow) are
avoided in oracle-matched outputs because their last-ulp behavior is
engine-specific; sqrt is IEEE-exact and safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.queries.relational import dec
from feature_store_2_spark.sources.tables import load_table


@register(
    "func_string_part",
    """
SELECT p_partkey,
       lower(p_name) AS lname,
       upper(p_brand) AS ubrand,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_name, 1, 5) AS prefix5,
       CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS BIGINT) AS brand_num,
       concat(p_brand, '-', p_type) AS brand_type,
       string_split(p_name, ' ')[1] AS first_word,
       replace(p_name, ' ', '_') AS snake_name,
       p_type LIKE '%ECONOMY%' AS is_econ,
       p_name SIMILAR TO '.*(ring|widget).*' AS is_rw
FROM part
""",
    doc="string family: case, length, substring, regex extract/match, split, concat (A15's regex validation shape)",
)
def func_string_part(spark, sf_dir):
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).cast("long").alias("brand_num"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.col("p_type").like("%ECONOMY%").alias("is_econ"),
        F.col("p_name").rlike("(ring|widget)").alias("is_rw"),
    )


@register(
    "func_date_orders",
    """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS o_day,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
           AS days_since_95
FROM orders
""",
    doc="date/time family: extract, trunc, interval arithmetic, datediff (A16's window math)",
)
def func_date_orders(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_95"),
    )


@register(
    "func_math_lineitem",
    """
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 1000) AS absdev,
       CAST(floor(l_quantity) AS BIGINT) AS fq,
       CAST(ceil(l_quantity) AS BIGINT) AS cq,
       round(l_extendedprice, 0) AS rp,
       sqrt(l_quantity) AS sq,
       l_quantity * l_quantity AS qty_sq,
       CAST(l_partkey % 7 AS BIGINT) AS pm,
       greatest(l_discount, l_tax) AS gmax,
       least(l_discount, l_tax) AS lmin
FROM lineitem
""",
    doc="math family: abs/floor/ceil/round/sqrt/mod/greatest/least (A10's ratio math)",
)
def func_math_lineitem(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000).alias("absdev"),
        F.floor("l_quantity").alias("fq"),
        F.ceil("l_quantity").alias("cq"),
        F.round("l_extendedprice", 0).alias("rp"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.pmod("l_partkey", F.lit(7)).cast("long").alias("pm"),
        F.greatest("l_discount", "l_tax").alias("gmax"),
        F.least("l_discount", "l_tax").alias("lmin"),
    )


@register(
    "func_array_embeddings",
    """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       embedding[1] AS first_elem,
       embedding[-1] AS last_elem,
       list_min(embedding) AS amin,
       list_max(embedding) AS amax
FROM embeddings
""",
    doc="array family: size, element_at (incl. negative index), array min/max",
)
def func_array_embeddings(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", -1).alias("last_elem"),
        F.array_min("embedding").alias("amin"),
        F.array_max("embedding").alias("amax"),
    )


@register(
    "func_json_events",
    """
WITH x AS (
    SELECT event_id,
           CASE WHEN regexp_matches(
                    regexp_replace(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g'),
                    '^[+-]?[0-9]+$')
                THEN TRY_CAST(regexp_replace(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g')
                              AS BIGINT) END AS k
    FROM events
)
SELECT event_id, k,
       CAST(k % 10 AS BIGINT) AS k_mod,
       k IS NOT NULL AS has_k
FROM x
""",
    doc="JSON family: path extraction + typing (A2's semi-structured "
    "parse). Strict-integer field contract (r9 props-envelope class): "
    "try_cast so a '{\"k\": \"zip-987\"}' row extracts NULL instead of "
    "killing the job under ANSI; the oracle's regex gate mirrors "
    "Spark's strict integer parse (DuckDB TRY_CAST alone rounds "
    "'1.5' to 2 where Spark nulls it); has_k means an integer k "
    "exists on BOTH engines.",
)
def func_json_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.pmod(k, F.lit(10)).cast("long").alias("k_mod"),
        k.isNotNull().alias("has_k"),
    )


@register(
    "func_case_bucket_customers",
    """
SELECT c_mktsegment,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bucket,
       count(*) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY 1, 2
""",
    doc="CASE WHEN bucketing + grouped agg (A10's conditional expressions)",
)
def func_case_bucket_customers(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    bucket = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.withColumn("bucket", bucket)
        .groupBy("c_mktsegment", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


@register(
    "func_null_handling",
    """
SELECT l_orderkey, l_linenumber,
       nullif(l_discount, 0.0) AS disc_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
       nullif(l_discount, 0.0) IS NULL AS no_discount
FROM lineitem
""",
    doc="null predicates: nullif/coalesce/isNull (A8's missing-field semantics)",
)
def func_null_handling(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_null.alias("disc_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_filled"),
        disc_null.isNull().alias("no_discount"),
    )


def _morton_terms(xexpr: str, yexpr: str, bits: int, div: str) -> str:
    """Bit-interleave (Morton / Z-order) as pure integer arithmetic:
    ((x / 2^i) % 2) * 2^(2i) summed over bits — the interleaved bits are
    disjoint so + is |, and div/mod arithmetic is portable to engines
    without shift operators. ``div`` is the integer-division operator
    spelling ('div' for Spark SQL, '//' for DuckDB)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({xexpr} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({yexpr} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_ZORDER_DUCK = f"""
SELECT o_orderkey,
       o_custkey,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
       CAST({_morton_terms('o_custkey',
                           "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))",
                           16, '//')} AS BIGINT) AS zkey
FROM orders
"""


@register(
    "func_zorder_key",
    _ZORDER_DUCK,
    doc="Z-order (Morton) clustering key over (custkey, order-day): the "
    "data-layout primitive behind multi-dimensional clustering — sort "
    "or range-partition by zkey and scans filtered on EITHER dimension "
    "prune to contiguous key ranges. Pure projection (zero shuffle); "
    "the interleave is div/mod integer arithmetic so both engines "
    "compute identical keys bit-for-bit. 16 bits/dim covers the "
    "testdata; widen per-dimension bits with key cardinality.",
)
def func_zorder_key(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    day = "datediff(o_orderdate, DATE '1995-01-01')"
    z = _morton_terms("o_custkey", day, 16, "div")
    return orders.selectExpr(
        "o_orderkey",
        "o_custkey",
        f"CAST({day} AS BIGINT) AS day_num",
        f"CAST({z} AS BIGINT) AS zkey",
    )


@register(
    "func_regexp_extract_all",
    """
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS tok
FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]{5,}') AS toks
      FROM documents) t,
LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) u
""",
    doc="regexp_extract_all + posexplode: every >=5-letter token with "
    "its position — the extract-all/lateral-unnest surface "
    "(func_string_part covers single-match extraction). Generator "
    "runs inside codegen; no Python.",
)
def func_regexp_extract_all(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.posexplode(F.expr("regexp_extract_all(text, '[a-z]{5,}', 0)")).alias(
            "pos", "tok"
        ),
    )


@register(
    "func_array_higher_order",
    """
WITH t AS (
    -- length() (CHARACTER count), not strlen() (BYTE count): Spark's
    -- length() is codepoint semantics, and on non-ASCII tokens the two
    -- diverge ('café' = 4 chars / 5 bytes) — caught by the crafted
    -- unicode doc in tests/test_adversarial_fixtures.py.
    SELECT doc_id,
           list_transform(string_split(text, ' '), w -> length(w)) AS lens
    FROM documents)
SELECT doc_id,
       CAST(len(lens) AS BIGINT) AS n_words,
       CAST(len(list_filter(lens, x -> x > 3)) AS BIGINT) AS n_long,
       len(list_filter(lens, x -> x > 8)) > 0 AS has_very_long,
       CAST(list_aggregate(lens, 'sum') AS BIGINT) AS total_chars
FROM t
""",
    doc="higher-order array lambdas (transform / filter / exists / "
    "aggregate): per-document word-length vector folded without "
    "exploding — the lambda pipeline runs inside codegen on the array "
    "in place, no shuffle and no row multiplication (the explode "
    "alternative multiplies rows by words before re-aggregating). "
    "Integer arithmetic end-to-end so both engines agree exactly.",
)
def func_array_higher_order(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    lens = F.transform(F.split("text", " "), lambda w: F.length(w))
    t = d.select("doc_id", lens.alias("lens"))
    return t.select(
        "doc_id",
        F.size("lens").cast("long").alias("n_words"),
        F.size(F.filter("lens", lambda x: x > 3)).cast("long").alias("n_long"),
        F.exists("lens", lambda x: x > 8).alias("has_very_long"),
        F.aggregate(
            "lens", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_chars"),
    )


@register(
    "func_try_arithmetic",
    """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0.0 THEN NULL
            ELSE l_extendedprice / l_discount END AS price_per_disc,
       TRY_CAST(substring(l_returnflag, 1, 1) AS BIGINT) AS flag_as_int,
       CASE WHEN l_discount = 0.0 THEN -1.0
            ELSE l_extendedprice / l_discount END AS price_per_disc_filled
FROM lineitem
""",
    doc="error-safe arithmetic (A10's total-division semantics as "
    "functions): try_divide nulls instead of raising on zero "
    "denominators and try_cast nulls on unparseable input — at 100 TB "
    "one malformed row must cost itself, not a 10-hour job (the "
    "ANSI-mode failure shape). DuckDB has no try_divide, so the oracle "
    "spells the identical total semantics with CASE.",
)
def func_try_arithmetic(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    td = F.try_divide(F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0)))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        td.alias("price_per_disc"),
        F.try_to_number(F.substring("l_returnflag", 1, 1), F.lit("9"))
        .cast("long")
        .alias("flag_as_int"),
        F.coalesce(td, F.lit(-1.0)).alias("price_per_disc_filled"),
    )


@register(
    "func_map_higher_order",
    """
WITH c AS (
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY user_id, event_type)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_types,
       coalesce(string_agg(
           CASE WHEN n * 2 > 4 THEN event_type || ':' || CAST(n * 2 AS VARCHAR) END,
           ',' ORDER BY event_type), '') AS hot_summary
FROM c GROUP BY user_id
""",
    doc="map higher-order lambdas, the map half of the lambda family "
    "(func_array_higher_order covers arrays): per-user event-type "
    "counts materialized as a map<string,bigint> via map_from_entries("
    "collect_list(struct)), then transform_values (scale), map_filter "
    "(keep hot types), map_entries sorted BY KEY -> 'k:v' rendering. "
    "All map ops fold in-place per row — zero extra shuffles beyond "
    "the count agg. The oracle reproduces the RESULT relationally "
    "(string_agg ordered by key); entries are sorted as structs BEFORE "
    "rendering, so both engines order by key — no prefix-freeness "
    "assumption on the key domain (r4 advisor finding: sorting the "
    "rendered 'k:v' strings diverges when one key is a prefix of "
    "another with next char below ':').",
)
def func_map_higher_order(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("em")
    )
    doubled = F.transform_values("em", lambda _k, v: v * 2)
    hot = F.map_filter(doubled, lambda _k, v: v > 4)
    # Sort the entry structs by key FIRST (struct order = field order,
    # key leads; map keys are unique so no tie-break needed), then
    # render — key order survives any key domain.
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(hot)),
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
        ",",
    )
    return m.select(
        "user_id",
        F.size("em").cast("long").alias("n_types"),
        rendered.alias("hot_summary"),
    )


@register(
    "func_interval_calendar",
    """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_day,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_month,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE))
            AS BIGINT) AS days_to_month_end
FROM orders
WHERE o_orderkey <= 2000
""",
    doc="calendar-interval arithmetic pinned cross-engine — the "
    "date-family corner where engines classically diverge: +1 MONTH "
    "end-of-month clamping (Jan 31 -> Feb 29), last_day, quarter "
    "truncation, ISO week numbers, day differences. Spark add_months "
    "and DuckDB + INTERVAL 1 MONTH both clamp to month end; both "
    "weekofyear implementations are ISO-8601 — asserted by the value "
    "hash over six years of order dates, so any engine upgrade that "
    "changes a calendar rule trips the gate. Pure projection, "
    "pushdown-friendly.",
)
def func_interval_calendar(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_day"),
        F.add_months(d, 1).alias("plus_month"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.datediff(F.last_day(d), d).cast("long").alias("days_to_month_end"),
    )


@register(
    "func_variant_semistructured",
    """
WITH x AS (
    SELECT event_id,
           json_type(TRY_CAST(props AS JSON), '$.k') AS kt,
           json_extract_string(TRY_CAST(props AS JSON), '$.k') AS ks
    FROM events
), v AS (
    SELECT event_id,
           CASE
             WHEN kt IN ('BIGINT', 'UBIGINT') THEN TRY_CAST(ks AS BIGINT)
             WHEN kt = 'DOUBLE'
               THEN TRY_CAST(trunc(TRY_CAST(ks AS DOUBLE)) AS BIGINT)
             WHEN kt = 'BOOLEAN'
               THEN CASE WHEN ks = 'true' THEN 1 ELSE 0 END
             WHEN kt = 'VARCHAR' AND regexp_matches(regexp_replace(ks, '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g'), '^[+-]?[0-9]+$')
               THEN TRY_CAST(regexp_replace(ks, '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g') AS BIGINT)
             ELSE NULL
           END AS k_val
    FROM x
)
SELECT event_id, k_val, k_val * k_val AS k_sq,
       k_val IS NOT NULL AS has_k
FROM v
""",
    doc="VARIANT semi-structured type (new Spark 4 surface): "
    "parse_json(props) -> open-schema VARIANT, typed extraction via "
    "try_variant_get(v, '$.k', 'bigint') — the shredded-JSON path "
    "that replaces schema-rigid from_json when event payloads evolve "
    "freely. try_, not variant_get (r9 props-envelope class): a "
    "string field 'zip-987' would otherwise throw "
    "INVALID_VARIANT_CAST and one bad producer row kills the job. "
    "The oracle mirrors Spark's variant->bigint cast lattice per "
    "JSON type (integers pass through, doubles truncate toward "
    "zero, booleans map to 1/0, integer-literal strings parse, "
    "everything else is NULL) via DuckDB json_type; the DOUBLE branch "
    "is TRY_CAST on the outside too, so an out-of-int64 magnitude "
    "like 1e30 degrades to NULL in both engines instead of crashing "
    "the oracle (r10 ADVICE find) — so the typed "
    "values plus an arithmetic use of them hash-match exactly, "
    "proving the variant decode value-faithful on hostile "
    "envelopes, not just parse-successful.",
)
def func_variant_semistructured(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # try_parse_json too: a malformed envelope (pre-quarantine read)
    # degrades to NULL exactly like the oracle's TRY_CAST(... AS JSON).
    k = F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k * k).alias("k_sq"),
        k.isNotNull().alias("has_k"),
    )


@register(
    "func_xml_events",
    """
SELECT event_id, user_id AS u,
       trim(event_type, ' ' || chr(9) || chr(13) || chr(10)) AS t,
       TRUE AS roundtrip_ok
FROM events
""",
    doc="XML parse (from_xml, new NATIVE Spark 4 surface — previously a "
    "separate spark-xml package): each event is rendered to an XML "
    "fragment and parsed back through from_xml with a typed schema; "
    "the output is the extracted fields plus a roundtrip_ok flag the "
    "query itself computes by comparing parsed values to the source "
    "columns. The oracle states the expected fixpoint directly (u = "
    "user_id, t = event_type, TRUE), so any parse/extraction "
    "infidelity — encoding, whitespace, numeric coercion — breaks the "
    "value hash. Pure codegen + one ParseXml expression per row, zero "
    "shuffles.",
)
def func_xml_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # coalesce: a NULL user_id would NULL the whole concat (and so the
    # whole XML document) — render an empty <u/> instead, which
    # from_xml parses back to NULL; the roundtrip checks are null-safe
    # so an anonymous event roundtrips TRUE like every other row
    # (round-8 anonymous-events fixture find).
    parsed = F.expr(
        "from_xml(concat('<e><u>', coalesce(CAST(user_id AS STRING), ''), "
        "'</u><t>', event_type, '</t></e>'), 'u BIGINT, t STRING')"
    )
    out = ev.select("event_id", "user_id", "event_type", parsed.alias("x"))
    # The XML fixpoint is the WHITESPACE-TRIMMED value: from_xml trims
    # the XML whitespace class [ \t\r\n] at text-node edges (measured;
    # NBSP/zero-width survive) — standard XML text handling, surfaced
    # by the r11 hostile-key fixture's trailing-space event_type. The
    # roundtrip contract (and the oracle's t) compare against the same
    # trim, so whitespace-edged values are a documented non-identity.
    xml_trimmed = F.expr("trim(BOTH ' \t\r\n' FROM event_type)")
    return out.select(
        "event_id",
        F.col("x.u").alias("u"),
        F.col("x.t").alias("t"),
        (
            F.col("x.u").eqNullSafe(F.col("user_id"))
            & F.col("x.t").eqNullSafe(xml_trimmed)
        ).alias("roundtrip_ok"),
    )


@register(
    "func_collation_case_insensitive",
    """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
aw AS (
    SELECT doc_id, word FROM w
    WHERE NOT regexp_matches(word, '[^\\x00-\\x7F]')),
mixed AS (
    SELECT CASE WHEN doc_id % 2 = 0 THEN upper(word) ELSE word END AS mw,
           word
    FROM aw)
SELECT lower(mw) AS term,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT mw) AS BIGINT) AS n_case_variants
FROM mixed GROUP BY lower(mw)
""",
    doc="collation-aware grouping (new Spark 4 surface): half the "
    "corpus is deterministically uppercased, then grouped under the "
    "UTF8_LCASE collation — the engine-level case-insensitive "
    "semantics that replace sprinkling lower() through every "
    "predicate. The oracle groups on explicit lower(), so the hash "
    "proves collate-grouping == normalize-then-group; "
    "n_case_variants (distinct raw spellings per collation group, "
    "here 2 for words present in both halves) shows the collation is "
    "genuinely merging distinct binary strings. One explode + one "
    "hash agg. The entry scopes itself to ASCII tokens IN-QUERY (r9): "
    "collate==lower() equivalence only holds for simple case mapping "
    "(upper('ß')/'U+0130' full-mappings diverge between Java and "
    "DuckDB), so non-ASCII words are filtered on both sides — the "
    "entry is now total over ANY corpus instead of relying on an "
    "ASCII-only-corpus pytest precondition (the r9 unicode fixture "
    "broke that precondition by design).",
)
def func_collation_case_insensitive(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    w = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(~F.col("word").rlike("[^\\x00-\\x7F]"))
    mixed = w.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("word"))
        .otherwise(F.col("word"))
        .alias("mw")
    )
    grouped = mixed.groupBy(
        F.expr("collate(mw, 'UTF8_LCASE')").alias("cterm")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct(F.expr("collate(mw, 'UTF8_BINARY')")).alias(
            "n_case_variants"
        ),
    )
    # render the collation group key in canonical lower form so the
    # output column is a plain binary-collation string for the driver
    return grouped.select(
        F.lower(F.col("cterm")).cast("string").alias("term"),
        "n",
        "n_case_variants",
    )


_ARRAY_SETOPS_ORACLE = """
WITH u AS (
    SELECT user_id,
           list_sort(list_distinct(list(event_type))) AS types
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(types) AS INT) AS n_types,
       -- DuckDB array_to_string is NULL on an empty list where Spark
       -- array_join is '' — coalesce so both engines render ''
       coalesce(array_to_string(
           list_sort(list_intersect(types, ['view', 'click'])), ','),
           '') AS browse_types,
       CAST(len(list_filter(types,
                t -> NOT list_contains(['view', 'click'], t))) AS INT)
           AS n_non_browse,
       list_contains(types, 'error') AS saw_error
FROM u
"""


@register(
    "func_array_set_ops",
    _ARRAY_SETOPS_ORACLE,
    doc="array set algebra on collected sets: each user's distinct "
    "event-type array intersected / differenced against a constant "
    "browse set, plus membership — array_intersect, array_except "
    "(as a filtered cardinality, the form both engines order "
    "identically), array_contains over one collect_set aggregate. "
    "Arrays are sorted then rendered via array_join so the output "
    "column is a plain string — the driver's hash gate cannot "
    "factorize array-typed columns (CORRECTNESS_r07 err). "
    "One shuffle; per-user arrays bounded by the 5-type domain.",
)
def func_array_set_ops(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    u = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    browse = F.array(F.lit("view"), F.lit("click"))
    return u.select(
        "user_id",
        F.size("types").cast("int").alias("n_types"),
        F.array_join(
            F.array_sort(F.array_intersect("types", browse)), ","
        ).alias("browse_types"),
        F.size(F.array_except("types", browse)).cast("int").alias(
            "n_non_browse"
        ),
        F.array_contains("types", "error").alias("saw_error"),
    )


_BIZDAYS_ORACLE = """
WITH o AS (
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
           isodow(CAST(o_orderdate AS DATE)) AS dw
    FROM orders
)
SELECT o_orderkey, d AS order_date,
       CAST(dw AS INT) AS iso_dow,
       dw >= 6 AS placed_on_weekend,
       -- next business day: Fri(5)->+3, Sat(6)->+2, else +1
       d + CASE WHEN dw = 5 THEN 3 WHEN dw = 6 THEN 2 ELSE 1 END
           AS next_business_day,
       -- order date + 5 business days = +7 calendar days from a
       -- weekday start; weekend starts roll forward to Monday first
       CASE WHEN dw = 6 THEN d + 2 + 7
            WHEN dw = 7 THEN d + 1 + 7
            ELSE d + 7 END AS sla_5bd
FROM o
"""


@register(
    "func_business_days",
    _BIZDAYS_ORACLE,
    doc="business-day calendar arithmetic, closed-form: next business "
    "day and a 5-business-day SLA deadline per order, from pure "
    "ISO-weekday integer CASE arithmetic — no calendar table, no "
    "UDF, no loop (5 business days from a weekday is exactly 7 "
    "calendar days; weekend starts roll forward to Monday first). "
    "The Mon=1 ISO convention is made explicit on both engines "
    "(Spark weekday()+1 vs DuckDB isodow), the same mapping "
    "ts_seasonality_dow_profile pins. Zero-shuffle codegen pass.",
)
def func_business_days(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    d = F.to_date("o_orderdate")
    dw = F.weekday(d) + F.lit(1)
    nbd = F.date_add(
        d,
        F.when(dw == 5, 3).when(dw == 6, 2).otherwise(1),
    )
    sla = F.date_add(
        d,
        F.when(dw == 6, 9).when(dw == 7, 8).otherwise(7),
    )
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        dw.cast("int").alias("iso_dow"),
        (dw >= 6).alias("placed_on_weekend"),
        nbd.alias("next_business_day"),
        sla.alias("sla_5bd"),
    )


_TZ_ZONES = ("America/New_York", "Europe/Berlin", "Asia/Kolkata")

_TZ_ORACLE = f"""
WITH z AS (SELECT unnest(['{_TZ_ZONES[0]}', '{_TZ_ZONES[1]}',
                          '{_TZ_ZONES[2]}']) AS zone),
conv AS (
    SELECT e.event_id, z.zone,
           (e.ts AT TIME ZONE 'UTC') AT TIME ZONE z.zone AS lts,
           e.ts
    FROM events e CROSS JOIN z
    WHERE e.event_type = 'purchase'
)
SELECT event_id, zone,
       CAST(lts AS DATE) AS local_date,
       CAST(hour(lts) AS INT) AS local_hour,
       CAST((epoch_us(lts) - epoch_us(ts)) // 60000000 AS INT)
           AS utc_offset_min
FROM conv
"""


@register(
    "func_timezone_convert",
    _TZ_ORACLE,
    doc="timezone conversion with real tzdb semantics: every purchase "
    "timestamp (stored UTC) rendered in three business zones — "
    "including Asia/Kolkata's +05:30 half-hour offset — with local "
    "date, local hour, and the derived UTC offset in minutes "
    "(epoch-difference of the wall-clock shift, so the offset is "
    "what the tz database actually applied, not a hardcoded "
    "constant). Both engines defer to the IANA tzdb (Spark "
    "from_utc_timestamp / DuckDB ICU AT TIME ZONE), so agreement "
    "checks the DST rules themselves; the DST spring-forward "
    "boundary is pinned on crafted March data in pytest. "
    "Zero-shuffle codegen pass; the 3-zone spine is a literal "
    "explode (x3 row expansion, no join).",
)
def func_timezone_convert(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase")
    z = F.explode(F.array(*[F.lit(z) for z in _TZ_ZONES])).alias("zone")
    conv = p.select("event_id", "ts", z).withColumn(
        "lts", F.from_utc_timestamp(F.col("ts"), F.col("zone"))
    )
    return conv.select(
        "event_id",
        "zone",
        F.to_date("lts").alias("local_date"),
        F.hour("lts").cast("int").alias("local_hour"),
        F.expr(
            "CAST((unix_micros(lts) - unix_micros(ts)) div 60000000 AS INT)"
        ).alias("utc_offset_min"),
    )
