"""Statistical-inference query family (round 7 continuation).

The tests an experimentation / model-quality platform runs ON TOP of the
feature store: exact ROC AUC (the rank-sum identity), a chi-square
independence audit over a contingency table, Kaplan-Meier survival with
real interleaved censoring (exact integer cumulative product via
recursive CTE — both engines recurse), an equi-depth histogram (the CBO
statistic `stats_column_profile` stops short of), and weighted
importance sampling (A-Res) for training-data selection. Reference
parity: the reference's rules engine consumes per-user aggregates
(/root/reference/models/aggregate.py:41-83); these are the inferential
consumers of the same aggregates, generalized to what a 100 TB
experimentation pipeline ships.

Exactness doctrine (repo standard): every statistic is integer/decimal
arithmetic until ONE final division; the KM survival product is an
integer micro-unit DIV chain (never exp(sum(ln)) — no libm in the
value path); sampling randomness is md5(id)-derived, never rand().
The single libm use (A-Res ln) affects ORDERING only, never an output
value, and every ordering carries a total doc_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.operators.global_window import (
    bucketed_running_sums,
)
from feature_store_2_spark.functions.num import is_exact_value, is_finite
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

_HEXD = "0123456789abcdef"


def _spread_for_fanout(df):
    """Ensure a CPU-bound fan-out (explode x N -> md5 per row) has at
    least defaultParallelism upstream partitions. The sf parquet files
    are single row groups, so the scan is ONE partition and the whole
    hash stage would serialize in one task (measured 14.2s -> 1.28s on
    stats_poisson_bootstrap at sf0.1). Conditional on the plan's actual
    partition count: a 100 TB scan already has thousands of splits and
    must NOT pay a base-wide round-robin shuffle just to fan out."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Exact ROC AUC via the rank-sum (Mann-Whitney) identity
# ---------------------------------------------------------------------------

_AUC_DIGIT = (
    "(CAST(position(substr(md5(CAST(event_id AS VARCHAR)), {i}, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1)"
)
_AUC_SCORE = " + ".join(
    f"{_AUC_DIGIT.format(i=i)} * {16 ** (4 - i)}" for i in range(1, 5)
)

_AUC_ORACLE = f"""
WITH scored AS (
    SELECT ({_AUC_SCORE}) AS s,
           event_type = 'purchase' AS y
    FROM events
), hist AS (
    SELECT s,
           sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
           sum(CASE WHEN y THEN 0 ELSE 1 END) AS cn
    FROM scored GROUP BY s
), cum AS (
    SELECT cp, cn,
           sum(cn) OVER (ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - cn AS cn_below
    FROM hist
)
SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
       CAST(sum(cn) AS BIGINT) AS n_neg,
       CAST(sum(cp * (2 * cn_below + cn)) AS DOUBLE)
           / (2.0 * CAST(sum(cp) AS DOUBLE) * CAST(sum(cn) AS DOUBLE))
           AS auc
FROM cum
"""


@register(
    "eval_auc_exact",
    _AUC_ORACLE,
    doc="exact ROC AUC without enumerating thresholds: the rank-sum "
    "identity AUC = U/(P*N) with the tie convention U = sum over "
    "scores of pos_s*(neg_below + neg_s/2), kept integer as "
    "2U = sum(pos_s*(2*neg_below + neg_s)) so the only division is "
    "the final one. Score = md5(event_id)-derived 16-bit uniform "
    "(the eval_calibration_bins stand-in; the operator is the "
    "statistic, not the model), label = purchase. Complements "
    "eval_roc_points: that entry emits the curve, this one the "
    "exact scalar a training gate thresholds on. Scale: the "
    "cumulative runs over the SCORE HISTOGRAM (bounded domain "
    "<= 65536 rows), never the raw events — one hash agg plus a "
    "metadata-scale window; counts lift to DECIMAL(38,0) before "
    "the 2U product at corpus scale.",
)
def eval_auc_exact(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    m = F.md5(F.col("event_id").cast("string").cast("binary"))

    def digit(i: int) -> F.Column:
        return (
            F.position(F.substring(m, i, 1), F.lit(_HEXD)).cast("long")
            - 1
        )

    s = sum(
        (digit(i) * (16 ** (4 - i)) for i in range(1, 5)), F.lit(0)
    )
    scored = ev.select(
        s.alias("s"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("cn"),
    )
    wcum = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "cp",
        "cn",
        (F.sum("cn").over(wcum) - F.col("cn")).alias("cn_below"),
    )
    return cum.agg(
        F.sum("cp").cast("long").alias("n_pos"),
        F.sum("cn").cast("long").alias("n_neg"),
        (
            F.sum(
                F.col("cp") * (2 * F.col("cn_below") + F.col("cn"))
            ).cast("double")
            # nullif: with an empty class (no positives or no
            # negatives) 2*P*N = 0 and Spark's IEEE division yields
            # NaN where DuckDB yields NULL — guard so both emit NULL
            / F.nullif(
                F.lit(2.0)
                * F.sum("cp").cast("double")
                * F.sum("cn").cast("double"),
                F.lit(0.0),
            )
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence audit (contingency table)
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
    SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
           count(*) AS obs
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
), tot AS (
    SELECT segment, priority,
           CAST(obs AS HUGEINT) AS obs,
           CAST(sum(obs) OVER (PARTITION BY segment) AS HUGEINT)
               AS row_tot,
           CAST(sum(obs) OVER (PARTITION BY priority) AS HUGEINT)
               AS col_tot,
           CAST(sum(obs) OVER () AS HUGEINT) AS n
    FROM cells
)
SELECT segment, priority,
       CAST(obs AS BIGINT) AS n_obs,
       CAST((row_tot * col_tot * 1000000) // n AS BIGINT)
           AS expected_micro,
       CAST(((n * obs - row_tot * col_tot)
             * (n * obs - row_tot * col_tot) * 1000000)
            // (n * row_tot * col_tot) AS BIGINT) AS contrib_micro
FROM tot
"""


@register(
    "stats_chi2_independence",
    _CHI2_ORACLE,
    doc="chi-square independence audit over the (market segment x "
    "order priority) contingency table: per-cell observed count, "
    "expected count E = row*col/N, and the chi-square contribution "
    "(O-E)^2/E — the test a feature platform runs before trusting "
    "a categorical feature not to leak the segmentation. Exactness: "
    "contribution rewritten over a common denominator as "
    "(N*obs - row*col)^2 / (N*row*col), all-integer with the "
    "micro-unit floor-DIV (the clustering_micro recipe) — no "
    "floating sum anywhere; summing contrib_micro reproduces the "
    "statistic to 1e-6 per cell in BOTH engines identically. "
    "Scale: one fact-side hash agg onto |seg|x|prio| cells; the "
    "marginals are windows over that metadata-scale grid; the "
    "orders-customer equi-join is left to AQE (customer scales "
    "with the corpus — never force-broadcast it) and the products "
    "lift to DECIMAL(38,0) past ~1e9 rows (DuckDB's HUGEINT twin).",
)
def stats_chi2_independence(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("obs"))
    )
    # All products in DECIMAL(38,0) (DuckDB's HUGEINT twin): diff^2 *
    # 1e6 exceeds int64 already at sf0.1. The DIV quotients (micro
    # expected count, micro chi2 contribution) fit int64 at any
    # realistic scale — decimal DIV is exact floor there, verified
    # identical to DuckDB's hugeint // in both engines.
    tot = cells.select(
        "segment",
        "priority",
        F.col("obs").cast("decimal(38,0)").alias("obs"),
        F.sum("obs")
        .over(Window.partitionBy("segment"))
        .cast("decimal(38,0)")
        .alias("row_tot"),
        F.sum("obs")
        .over(Window.partitionBy("priority"))
        .cast("decimal(38,0)")
        .alias("col_tot"),
        F.sum("obs")
        .over(Window.partitionBy())
        .cast("decimal(38,0)")
        .alias("n"),
    )
    return tot.select(
        "segment",
        "priority",
        F.col("obs").cast("long").alias("n_obs"),
        F.expr("(row_tot * col_tot * 1000000) DIV n")
        .cast("long")
        .alias("expected_micro"),
        F.expr(
            "((n * obs - row_tot * col_tot) "
            " * (n * obs - row_tot * col_tot) * 1000000) "
            "DIV (n * row_tot * col_tot)"
        )
        .cast("long")
        .alias("contrib_micro"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival with interleaved censoring
# ---------------------------------------------------------------------------

# Cohort: per user, days from first event to first ERROR (the "death");
# users whose first purchase precedes their first error are censored at
# that purchase day (competing risk treated as censoring); users with
# neither are censored at their last observed day. Error-vs-purchase
# same-day ties resolve to the event, identically in both engines.
_KM_ORACLE = """
WITH RECURSIVE per_user AS (
    SELECT user_id,
           CAST(min(ts) AS DATE) AS first_d,
           CAST(min(CASE WHEN event_type = 'error' THEN ts END)
                AS DATE) AS err_d,
           CAST(min(CASE WHEN event_type = 'purchase' THEN ts END)
                AS DATE) AS pur_d,
           CAST(max(ts) AS DATE) AS last_d
    FROM events GROUP BY user_id
), obs AS (
    SELECT user_id,
           CASE
             WHEN err_d IS NOT NULL
                  AND datediff('day', first_d, err_d)
                      <= coalesce(datediff('day', first_d, pur_d),
                                  datediff('day', first_d, err_d))
               THEN datediff('day', first_d, err_d)
             WHEN pur_d IS NOT NULL THEN datediff('day', first_d, pur_d)
             ELSE datediff('day', first_d, last_d)
           END AS t,
           err_d IS NOT NULL
           AND datediff('day', first_d, err_d)
               <= coalesce(datediff('day', first_d, pur_d),
                           datediff('day', first_d, err_d)) AS ev
    FROM per_user
), hist AS (
    SELECT t,
           count(*) AS c_all,
           sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d
    FROM obs GROUP BY t
), risk AS (
    SELECT t, d,
           (SELECT count(*) FROM obs) -
           (sum(c_all) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - c_all) AS n_risk
    FROM hist
), steps AS (
    SELECT t, d, n_risk,
           row_number() OVER (ORDER BY t) AS k
    FROM risk WHERE d > 0
), km(k, t, n_risk, d, s_micro) AS (
    SELECT k, t, n_risk, d, ((n_risk - d) * 1000000) // n_risk
    FROM steps WHERE k = 1
    UNION ALL
    SELECT s.k, s.t, s.n_risk, s.d,
           (km.s_micro * (s.n_risk - s.d)) // s.n_risk
    FROM km JOIN steps s ON s.k = km.k + 1
)
SELECT CAST(t AS BIGINT) AS t_day,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(s_micro AS BIGINT) AS survival_micro,
       CAST(s_micro AS DOUBLE) / 1e6 AS survival
FROM km
"""

_KM_SPARK_RECURSE = """
WITH RECURSIVE km(k, t, n_risk, d, s_micro) AS (
    SELECT k, t, n_risk, d, ((n_risk - d) * 1000000) DIV n_risk
    FROM fs2s_km_steps WHERE k = 1
    UNION ALL
    SELECT s.k, s.t, s.n_risk, s.d,
           (km.s_micro * (s.n_risk - s.d)) DIV s.n_risk
    FROM km JOIN fs2s_km_steps s ON s.k = km.k + 1
)
SELECT CAST(t AS BIGINT) AS t_day,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(s_micro AS BIGINT) AS survival_micro,
       CAST(s_micro AS DOUBLE) / 1e6 AS survival
FROM km
"""


@register(
    "stats_survival_km",
    _KM_ORACLE,
    doc="Kaplan-Meier survival estimate of time-to-first-error with "
    "REAL interleaved censoring (first purchase censors; neither "
    "censors at last-observed): per event-day t, the risk set "
    "n_t = #users with observed time >= t, deaths d_t, and "
    "S(t) = prod_{t'<=t} (n_t'-d_t')/n_t'. The cumulative product "
    "is the hard part cross-engine: exp(sum(ln)) would put libm in "
    "the value path, so S is an INTEGER micro-unit DIV chain "
    "computed by a recursive CTE over the step table — Spark 4's "
    "WITH RECURSIVE (the sql_recursive_month_spine surface) and "
    "DuckDB's recurse bit-identically. Scale: the recursion depth "
    "is DISTINCT EVENT DAYS (calendar-bounded metadata, never "
    "data-sized); the per-user reduce and the day histogram are "
    "the only fact-scale passes, both map-side-combining hash "
    "aggs. Risk sets come from the day histogram's cumulative, "
    "not a per-user theta join. Spark's default "
    "cteRecursionLevelLimit is 100 — one step per distinct death "
    "day, so a year-long corpus would hit it; the entry raises the "
    "limit explicitly to keep the calendar-bounded claim true "
    "(r7 advisor finding).",
)
def stats_survival_km(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d"),
        F.min(
            F.when(
                F.col("event_type") == "error", F.col("ts").cast("date")
            )
        ).alias("err_d"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.col("ts").cast("date"),
            )
        ).alias("pur_d"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
    )
    t_err = F.datediff("err_d", "first_d")
    t_pur = F.datediff("pur_d", "first_d")
    is_ev = F.col("err_d").isNotNull() & (
        t_err <= F.coalesce(t_pur, t_err)
    )
    obs = per_user.select(
        F.when(is_ev, t_err)
        .when(F.col("pur_d").isNotNull(), t_pur)
        .otherwise(F.datediff("last_d", "first_d"))
        .alias("t"),
        is_ev.alias("ev"),
    )
    hist = obs.groupBy("t").agg(
        F.count("*").alias("c_all"),
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).alias("d"),
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("c_all").over(
        Window.orderBy("t").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    risk = hist.select(
        "t",
        "d",
        (total - (F.sum("c_all").over(wcum) - F.col("c_all"))).alias(
            "n_risk"
        ),
    )
    steps = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        F.row_number().over(Window.orderBy("t")).alias("k"),
    )
    steps.createOrReplaceTempView("fs2s_km_steps")
    # Recursion depth = distinct death days. Spark's default
    # spark.sql.cteRecursionLevelLimit (100) would throw
    # RECURSION_LEVEL_LIMIT_EXCEEDED on ~100+ event days (one year of
    # data) while DuckDB recurses unbounded; 100k levels covers ~270
    # years of daily steps.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
    return spark.sql(_KM_SPARK_RECURSE)


# ---------------------------------------------------------------------------
# Equi-depth histogram (CBO-style quantile bins)
# ---------------------------------------------------------------------------

_EDH_ORACLE = """
WITH base AS (
    SELECT CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT) AS v
    FROM events WHERE (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL)
), hist AS (
    SELECT v, count(*) AS c FROM base GROUP BY v
), cum AS (
    SELECT v, c,
           sum(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cm,
           sum(c) OVER () AS n
    FROM hist
), edges AS (
    SELECT CAST(t.k AS BIGINT) AS bucket, v, cm
    FROM cum, unnest(range(CAST((cm - c) * 10 // n + 1 AS BIGINT),
                           CAST(cm * 10 // n + 1 AS BIGINT)))
         AS t(k)
)
SELECT bucket,
       CAST(v AS DOUBLE) / 1e6 AS upper_value,
       CAST(cm AS BIGINT) AS n_le
FROM edges
"""


@register(
    "stats_equidepth_histogram",
    _EDH_ORACLE,
    doc="equi-depth (equi-height) 10-bucket histogram over the value "
    "column — the CBO selectivity statistic `stats_column_profile` "
    "stops short of: bucket k's upper edge is the least value whose "
    "cumulative count reaches ceil(k*n/10), reported with the exact "
    "cumulative at the edge. One pass, no per-quantile scan: each "
    "VALUE-HISTOGRAM row emits exactly the bucket indices its "
    "cumulative range covers via sequence((prev*10 DIV n)+1, "
    "cum*10 DIV n) — 10 rows total exploded across the whole "
    "histogram, all-integer rank arithmetic (no interpolation, so "
    "any quantile is exact cross-engine). Scale: the cumulative "
    "runs over the micro-unit value domain, never the raw fact, "
    "and the ordered pass itself RUNS as range-partitioned "
    "partials + broadcast prefix offsets "
    "(operators/global_window.py) with the grand total as a 1-row "
    "broadcast — a fully-continuous domain (distinct ~ n) never "
    "funnels into one sort task.",
)
def stats_equidepth_histogram(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # Only FINITE values enter a value histogram (r8 NULL find; r9
    # non-finite class — engines can't even agree to cast NaN) —
    # excluded on BOTH engines.
    ev = ev.filter(is_exact_value(F.col("value")))
    base = ev.select(
        (F.col("value").try_cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("v")
    )
    hist = base.groupBy("v").agg(F.count("*").alias("c"))
    tot = hist.agg(F.sum("c").alias("n"))
    cum = bucketed_running_sums(
        hist, "v", ["v"], [(F.col("c"), "cm")]
    ).join(F.broadcast(tot)).select("v", "c", "cm", "n")
    # sequence(a, b) DESCENDS when a > b (unlike DuckDB range's empty
    # result) — keep only histogram rows whose cumulative range covers
    # at least one bucket index.
    return cum.filter(
        F.expr("cm * 10 DIV n >= (cm - c) * 10 DIV n + 1")
    ).select(
        F.explode(
            F.expr("sequence((cm - c) * 10 DIV n + 1, cm * 10 DIV n)")
        ).alias("bucket"),
        F.col("v"),
        F.col("cm"),
    ).select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("v").cast("double") / 1e6).alias("upper_value"),
        F.col("cm").cast("long").alias("n_le"),
    )


# ---------------------------------------------------------------------------
# Weighted importance sampling (A-Res) per source
# ---------------------------------------------------------------------------

_ARES_DIGIT = (
    "(CAST(position(substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1)"
)
_ARES_U = " + ".join(
    f"{_ARES_DIGIT.format(i=i)} * {16 ** (8 - i)}" for i in range(1, 9)
)

_ARES_ORACLE = f"""
WITH keyed AS (
    SELECT source, doc_id, n_chars,
           ln((({_ARES_U}) + 1.0) / 4294967297.0)
               / CAST(n_chars AS DOUBLE) AS k
    FROM documents WHERE n_chars > 0
), ranked AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY k DESC, doc_id) AS rk
    FROM keyed
)
SELECT source, doc_id,
       CAST(n_chars AS BIGINT) AS weight,
       CAST(rk AS BIGINT) AS sample_rank
FROM ranked WHERE rk <= 20
"""


@register(
    "sample_weighted_importance",
    _ARES_ORACLE,
    doc="weighted sampling without replacement (Efraimidis-Spirakis "
    "A-Res): per source, the 20 docs with the largest u^(1/w) — "
    "computed as ln(u)/w — where w = n_chars and u is the "
    "md5(doc_id)-derived 32-bit uniform in (0,1]; the length-"
    "proportional document sampler a training-mixture pipeline "
    "runs per domain (deterministic twin of doc_mixture_"
    "temperature_sample's category-level mixing, at document "
    "grain). The one libm call (ln) decides ORDERING only — no "
    "float reaches the output, and the ORDER BY carries a doc_id "
    "tie-break, so a 1-ulp cross-engine divergence would need two "
    "keys within 1 ulp at the rank-20 boundary to matter. Scale: "
    "A-Res is one-pass — per-partition top-k partials then a "
    "per-source top-k merge (the window here; at corpus scale the "
    "per-group top-k pre-aggregates per partition before the "
    "shuffle, never a global sort).",
)
def sample_weighted_importance(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("n_chars") > 0
    )
    m = F.md5(F.col("doc_id").cast("string").cast("binary"))

    def digit(i: int) -> F.Column:
        return (
            F.position(F.substring(m, i, 1), F.lit(_HEXD)).cast("long")
            - 1
        )

    u = sum(
        (digit(i) * (16 ** (8 - i)) for i in range(1, 9)), F.lit(0)
    )
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (
            F.log((u + 1).cast("double") / F.lit(4294967297.0))
            / F.col("n_chars").cast("double")
        ).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("k").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(
            "source",
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.col("rk").cast("long").alias("sample_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence replicates
# ---------------------------------------------------------------------------

# floor(CDF_Poisson(1)(k) * 2^32) for k = 0..8, computed offline from
# e^-1/k! — embedded as INTEGER literals so the per-row draw is pure
# integer comparison in both engines (no libm anywhere). A row's copy
# count in replicate b is #thresholds <= u32, capped at 9 (tail mass
# ~4e-7, identically truncated cross-engine).
_POIS_T = [
    1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
    4292415291, 4294609777, 4294923276, 4294962463,
]
_N_REPLICATES = 100

_BOOT_DIGIT = (
    "(CAST(position(substr(h, {i}, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1)"
)
_BOOT_U32 = " + ".join(
    f"{_BOOT_DIGIT.format(i=i)} * {16 ** (8 - i)}" for i in range(1, 9)
)
_BOOT_COUNT_SQL = " + ".join(
    f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
)

_BOOT_ORACLE = f"""
WITH base AS (
    SELECT event_id,
           CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT) AS v
    FROM events
), fan AS (
    SELECT v, t.b,
           md5(CAST(event_id AS VARCHAR) || ':' ||
               CAST(t.b AS VARCHAR)) AS h
    FROM base, unnest(range(0, {_N_REPLICATES})) AS t(b)
), keyed AS (
    SELECT b, v, ({_BOOT_U32}) AS u FROM fan
), drawn AS (
    SELECT b, v, ({_BOOT_COUNT_SQL}) AS c FROM keyed
)
SELECT CAST(b AS BIGINT) AS replicate,
       CAST(sum(c) AS BIGINT) AS n_eff,
       CAST(sum(c * v) AS DOUBLE) / CAST(sum(c) AS DOUBLE) / 1e6
           AS boot_mean
FROM drawn GROUP BY b
"""


@register(
    "stats_poisson_bootstrap",
    _BOOT_ORACLE,
    doc="Poisson bootstrap of the mean event value: each of 100 "
    "replicates re-weights every row by an independent Poisson(1) "
    "copy count, the one-pass bootstrap that needs NO resampling "
    "shuffle — the n-out-of-n multinomial converges to independent "
    "Poisson(1) weights, so replicate b is just a weighted "
    "aggregate (the scalable-bootstrap construction used for CIs "
    "over corpus-scale means). Determinism: the draw is "
    "md5(event_id:replicate) -> 32-bit integer compared against "
    "PRECOMPUTED integer CDF thresholds (e^-1/k! folded into "
    "literals) — pure integer arithmetic, zero libm, tail capped "
    "at 9 copies identically in both engines; each replicate mean "
    "is exact micro-unit sums with ONE final division. Scale: the "
    "replicate fan-out is map-side explode feeding a 100-group "
    "hash agg with map-side partials — shuffle traffic is "
    "#partitions x 100 partial rows, independent of corpus size; "
    "percentile edges over the 100 replicate means are a "
    "metadata-scale follow-up (rank-pick, stats_equidepth_"
    "histogram's move). The 100x fan-out is CPU-bound (one md5 per "
    "row-replicate), so the base is spread to defaultParallelism "
    "IF the scan is narrower — a single-row-group parquet scan "
    "would otherwise run the whole hash stage in ONE task (measured "
    "14.2s -> 1.28s at sf0.1, identical values; shuffle moved is "
    "the pre-fan-out base, 1/100th of the exploded volume, and a "
    "wide 100 TB scan skips the shuffle entirely) — and the u32 "
    "extraction is one conv(hex,16,10) instead of eight "
    "position/substring chains.",
)
def stats_poisson_bootstrap(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    base = _spread_for_fanout(
        ev.select(
            "event_id",
            (F.col("value").try_cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("v"),
        )
    )
    fan = base.select(
        "event_id",
        "v",
        F.explode(
            F.expr(f"sequence(0, {_N_REPLICATES - 1})")
        ).alias("b"),
    )
    hashed = fan.select(
        "v",
        "b",
        F.md5(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ).cast("binary")
        ).alias("h"),
    )
    # one conv() == the oracle's 8-digit positional sum (md5 hex is
    # lowercase base-16; first 8 chars < 2^32 so the long cast is exact)
    u = F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
    c = sum(
        (
            F.when(F.col("u") >= t, 1).otherwise(0)
            for t in _POIS_T
        ),
        F.lit(0),
    )
    drawn = hashed.select("v", "b", u.alias("u")).select(
        "v", "b", c.alias("c")
    )
    return drawn.groupBy("b").agg(
        F.sum("c").cast("long").alias("n_eff"),
        (
            F.sum(F.col("c") * F.col("v")).cast("double")
            / F.sum("c").cast("double")
            / F.lit(1e6)
        ).alias("boot_mean"),
    ).select(
        F.col("b").cast("long").alias("replicate"),
        "n_eff",
        "boot_mean",
    )


# ---------------------------------------------------------------------------
# Monte-Carlo randomization (permutation) test
# ---------------------------------------------------------------------------

_PERM_N = 100

_PERM_DIGIT = (
    "(CAST(position(substr(h, {i}, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1)"
)
_PERM_U32 = " + ".join(
    f"{_PERM_DIGIT.format(i=i)} * {16 ** (8 - i)}" for i in range(1, 9)
)

_PERM_ORACLE = f"""
WITH base AS (
    SELECT event_id,
           CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT) AS v,
           event_type = 'click' AS is_a
    FROM events WHERE event_type IN ('click', 'purchase')
), obs AS (
    SELECT CAST(sum(CASE WHEN is_a THEN v END) AS HUGEINT) AS sa,
           CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS HUGEINT) AS na,
           CAST(sum(CASE WHEN NOT is_a THEN v END) AS HUGEINT) AS sb,
           CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS HUGEINT)
               AS nb
    FROM base
), thr AS (
    SELECT CAST((na * 4294967296) // (na + nb) AS BIGINT) AS t FROM obs
), fan AS (
    SELECT v, p.b,
           md5(CAST(event_id AS VARCHAR) || ':' ||
               CAST(p.b AS VARCHAR)) AS h
    FROM base, unnest(range(0, {_PERM_N})) AS p(b)
), drawn AS (
    SELECT b, v, ({_PERM_U32}) < (SELECT t FROM thr) AS a
    FROM fan
), per_perm AS (
    SELECT b,
           CAST(sum(CASE WHEN a THEN v END) AS HUGEINT) AS sa,
           CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS na,
           CAST(sum(CASE WHEN NOT a THEN v END) AS HUGEINT) AS sb,
           CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS HUGEINT) AS nb
    FROM drawn GROUP BY b
), verdicts AS (
    SELECT p.b,
           abs(p.sa * p.nb - p.sb * p.na) * o.na * o.nb
           >= abs(o.sa * o.nb - o.sb * o.na) * p.na * p.nb AS extreme
    FROM per_perm p CROSS JOIN obs o
    WHERE p.na > 0 AND p.nb > 0
)
SELECT CAST(o.na AS BIGINT) AS n_a,
       CAST(o.nb AS BIGINT) AS n_b,
       CAST(o.sa AS DOUBLE) / CAST(o.na AS DOUBLE) / 1e6
           - CAST(o.sb AS DOUBLE) / CAST(o.nb AS DOUBLE) / 1e6
           AS diff_obs,
       CAST(1 + (SELECT sum(CASE WHEN extreme THEN 1 ELSE 0 END)
                 FROM verdicts) AS DOUBLE)
           / CAST(1 + (SELECT count(*) FROM verdicts) AS DOUBLE)
           AS p_value
FROM obs o
"""


@register(
    "stats_permutation_test",
    _PERM_ORACLE,
    doc="Monte-Carlo randomization test for the click-vs-purchase mean "
    "value difference: 100 deterministic relabelings (each row "
    "independently reassigned to group A with probability n_a/n — "
    "the large-n binomial approximation to exact permutation; the "
    "threshold floor(n_a*2^32/(n_a+n_b)) is integer arithmetic "
    "derived from the data, compared against the md5(event_id:perm) "
    "32-bit draw), add-one p-value = (1+#extreme)/(1+#perms) — the "
    "A/B significance gate run where SciPy can't reach the data. "
    "Exactness: 'extreme' is decided WITHOUT any division — "
    "|sa*nb - sb*na| * na_o*nb_o >= |sa_o*nb_o - sb_o*na_o| * na*nb "
    "cross-multiplied in DECIMAL(38,0)/HUGEINT — and the two output "
    "doubles are single IEEE-exact divisions. Scale: same shape as "
    "stats_poisson_bootstrap — map-side explode into a 100-group "
    "hash agg (shuffle = #partitions x 100 partials), one 1-row "
    "observed-stat broadcast, degenerate all-one-side permutations "
    "excluded identically in both engines. Same fan-out treatment "
    "as stats_poisson_bootstrap: base spread to defaultParallelism "
    "when the scan is narrower (a single-row-group scan would "
    "serialize the 100x md5 stage in one task) and the u32 draw "
    "extracted with one conv(hex,16,10).",
)
def stats_permutation_test(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    base = _spread_for_fanout(
        ev.filter(
            F.col("event_type").isin("click", "purchase")
        ).select(
            "event_id",
            (F.col("value").try_cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("v"),
            (F.col("event_type") == "click").alias("is_a"),
        )
    )
    d38 = "decimal(38,0)"
    obs = base.agg(
        F.sum(F.when(F.col("is_a"), F.col("v"))).cast(d38).alias("sa"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast(d38)
        .alias("na"),
        F.sum(F.when(~F.col("is_a"), F.col("v"))).cast(d38).alias("sb"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast(d38)
        .alias("nb"),
    )
    fan = base.select(
        "v",
        F.explode(F.expr(f"sequence(0, {_PERM_N - 1})")).alias("b"),
        F.md5(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ).cast("binary")
        ).alias("h"),
    )
    # one conv() == the oracle's 8-digit positional sum (see
    # stats_poisson_bootstrap)
    u = F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
    drawn = fan.join(
        F.broadcast(
            obs.select(
                F.expr("(na * 4294967296) DIV (na + nb)")
                .cast("long")
                .alias("t")
            )
        )
    ).select("b", "v", (u < F.col("t")).alias("a"))
    per_perm = drawn.groupBy("b").agg(
        F.sum(F.when(F.col("a"), F.col("v"))).cast(d38).alias("psa"),
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast(d38).alias("pna"),
        F.sum(F.when(~F.col("a"), F.col("v"))).cast(d38).alias("psb"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0))
        .cast(d38)
        .alias("pnb"),
    )
    verdicts = (
        per_perm.filter((F.col("pna") > 0) & (F.col("pnb") > 0))
        .join(F.broadcast(obs))
        .select(
            (
                F.abs(
                    F.col("psa") * F.col("pnb")
                    - F.col("psb") * F.col("pna")
                )
                * F.col("na")
                * F.col("nb")
                >= F.abs(
                    F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")
                )
                * F.col("pna")
                * F.col("pnb")
            ).alias("extreme")
        )
        .agg(
            F.sum(F.when(F.col("extreme"), 1).otherwise(0)).alias("ne"),
            F.count("*").alias("np"),
        )
    )
    return obs.join(F.broadcast(verdicts)).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (
            F.col("sa").cast("double") / F.col("na").cast("double") / 1e6
            - F.col("sb").cast("double")
            / F.col("nb").cast("double")
            / 1e6
        ).alias("diff_obs"),
        (
            (1 + F.col("ne")).cast("double")
            / (1 + F.col("np")).cast("double")
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test + Sen's slope
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, count(*) AS v
    FROM events GROUP BY 1
), idx AS (
    SELECT v,
           datediff('day', (SELECT min(d) FROM daily), d) AS t
    FROM daily
), pairs AS (
    SELECT a.t AS ti, b.t AS tj, a.v AS vi, b.v AS vj
    FROM idx a JOIN idx b ON b.t > a.t
), stat AS (
    SELECT sum(CASE WHEN vj > vi THEN 1
                    WHEN vj < vi THEN -1 ELSE 0 END) AS s,
           count(*) AS n_pairs
    FROM pairs
), slopes AS (
    SELECT CAST(vj - vi AS DOUBLE) / CAST(tj - ti AS DOUBLE) AS m,
           row_number() OVER (ORDER BY
               CAST(vj - vi AS DOUBLE) / CAST(tj - ti AS DOUBLE),
               ti, tj) AS r,
           count(*) OVER () AS np
    FROM pairs
), sen AS (
    SELECT avg(m) AS sen_slope
    FROM slopes
    WHERE r IN ((np + 1) // 2, (np + 2) // 2)
), ties AS (
    SELECT sum(CAST(c * (c - 1) * (2 * c + 5) AS BIGINT)) AS tie_term
    FROM (SELECT count(*) AS c FROM idx GROUP BY v) g
), n AS (SELECT count(*) AS n FROM idx)
SELECT CAST(stat.s AS BIGINT) AS s,
       CAST(stat.n_pairs AS BIGINT) AS n_pairs,
       CAST(n.n AS BIGINT) AS n_days,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5)
            - coalesce(ties.tie_term, 0) AS BIGINT) AS var_num18,
       sen.sen_slope AS sen_slope
FROM stat, sen, ties, n
"""


@register(
    "stats_mann_kendall",
    _MK_ORACLE,
    doc="Mann-Kendall trend test + Sen's slope on the daily event "
    "volume: S = sum of sign(v_j - v_i) over all day pairs i<j "
    "(pure integer), the tie-corrected variance NUMERATOR "
    "n(n-1)(2n+5) - sum t(t-1)(2t+5) kept as an exact integer "
    "(consumers divide by 18 and sqrt — both engine-independent), "
    "and Sen's slope = median of the pairwise slopes "
    "(v_j-v_i)/(t_j-t_i). The slope is an IEEE-exact single "
    "division (correctly rounded, so bit-identical cross-engine — "
    "no libm), the median is rank-picked with a (slope, ti, tj) "
    "total order, and the even-case average of two doubles is "
    "deterministic. Scale: the pairwise self-join runs on the "
    "DAILY AGGREGATE (calendar-bounded metadata, ~365 rows/year = "
    "~66k pairs at a century), never the raw fact — the only "
    "fact-scale pass is the one hash agg onto days.",
)
def stats_mann_kendall(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("v")
    )
    wmin = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "v", F.datediff("d", F.min("d").over(wmin)).alias("t")
    )
    a = idx.select(F.col("t").alias("ti"), F.col("v").alias("vi"))
    b = idx.select(F.col("t").alias("tj"), F.col("v").alias("vj"))
    pairs = a.join(b, F.col("tj") > F.col("ti"))
    stat = pairs.agg(
        F.sum(
            F.when(F.col("vj") > F.col("vi"), 1)
            .when(F.col("vj") < F.col("vi"), -1)
            .otherwise(0)
        ).alias("s"),
        F.count("*").alias("n_pairs"),
    )
    m = (F.col("vj") - F.col("vi")).cast("double") / (
        F.col("tj") - F.col("ti")
    ).cast("double")
    wr = Window.orderBy(m, "ti", "tj")
    wnp = Window.orderBy(m, "ti", "tj").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    slopes = pairs.select(
        m.alias("m"),
        F.row_number().over(wr).alias("r"),
        F.count("*").over(wnp).alias("np"),
    )
    # floor-div rank pick, matching the oracle's (np+1)//2, (np+2)//2:
    # Spark's `/` is double division, so (np+1)/2 lands on x.5 for even
    # np and matches NO rank — the even case must floor or it silently
    # averages one element instead of two (invisible whenever the
    # fixture's C(n_days, 2) happens to be odd).
    sen = slopes.filter(
        (F.col("r") == F.floor((F.col("np") + 1) / 2))
        | (F.col("r") == F.floor((F.col("np") + 2) / 2))
    ).agg(F.avg("m").alias("sen_slope"))
    ties = (
        idx.groupBy("v")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(
                (
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ).cast("long")
            ).alias("tie_term")
        )
    )
    n = idx.agg(F.count("*").alias("n"))
    return (
        stat.join(F.broadcast(sen))
        .join(F.broadcast(ties))
        .join(F.broadcast(n))
        .select(
            F.col("s").cast("long").alias("s"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n").cast("long").alias("n_days"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            )
            .cast("long")
            .alias("var_num18"),
            F.col("sen_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's two-sample t-test (round 8)
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH base AS (
    SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS side,
           CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT) AS v
    FROM events WHERE event_type IN ('click', 'purchase')
), m AS (
    SELECT
        CAST(count(CASE WHEN side = 'a' THEN 1 END) AS BIGINT) AS na,
        CAST(count(CASE WHEN side = 'b' THEN 1 END) AS BIGINT) AS nb,
        CAST(sum(CASE WHEN side = 'a' THEN v ELSE 0 END) AS HUGEINT) AS sa,
        CAST(sum(CASE WHEN side = 'b' THEN v ELSE 0 END) AS HUGEINT) AS sb,
        CAST(sum(CASE WHEN side = 'a' THEN CAST(v AS HUGEINT) * v
                      ELSE 0 END) AS HUGEINT) AS qa,
        CAST(sum(CASE WHEN side = 'b' THEN CAST(v AS HUGEINT) * v
                      ELSE 0 END) AS HUGEINT) AS qb
    FROM base
), d AS (
    SELECT na, nb,
           CAST(CAST(sa AS VARCHAR) AS DOUBLE) AS sad,
           CAST(CAST(sb AS VARCHAR) AS DOUBLE) AS sbd,
           CAST(CAST(na * qa - sa * sa AS VARCHAR) AS DOUBLE) AS vna,
           CAST(CAST(nb * qb - sb * sb AS VARCHAR) AS DOUBLE) AS vnb
    FROM m
), v AS (
    SELECT na, nb,
           sad / na AS ma, sbd / nb AS mb,
           vna / (CAST(na AS DOUBLE) * (na - 1) * na) AS wa,
           vnb / (CAST(nb AS DOUBLE) * (nb - 1) * nb) AS wb
    FROM d WHERE na >= 2 AND nb >= 2
)
SELECT na AS n_a, nb AS n_b,
       (ma - mb) / 1000000.0 AS mean_diff,
       (ma - mb) / nullif(sqrt(wa + wb), 0.0) AS t_stat,
       (wa + wb) * (wa + wb)
           / nullif(wa * wa / (na - 1) + wb * wb / (nb - 1), 0.0)
           AS df_welch
FROM v
"""


@register(
    "stats_welch_ttest",
    _WELCH_ORACLE,
    doc="Welch's two-sample t-test (unequal variances) between click "
    "and purchase event values — the A/B-test statistic the "
    "permutation test approximates by simulation, here in closed "
    "form with the Welch-Satterthwaite df. Exactness: one "
    "conditional-aggregation pass collects integer micro-unit "
    "moments (n, S, Q per side; Q in DECIMAL(38,0) — v^2 sums pass "
    "2^53 at corpus scale), variance numerators n*Q - S^2 stay "
    "exact integers and cross to double via the string route (d2d), "
    "then t and df are short identical IEEE chains on those agreed "
    "doubles; sqrt is IEEE-correctly-rounded so it is hash-safe "
    "(the repo's libm ban covers ln/exp/pow). wa = vna/(na*(na-1)*na) "
    "is s_a^2/n_a in one division (variance and the /n fused), so "
    "the t denominator is sqrt(wa+wb) directly. Guards: sides with "
    "n < 2 drop the row (df undefined); zero pooled variance -> "
    "NULL via nullif on BOTH engines (never Spark Inf vs DuckDB "
    "NULL — the r7 advisor's empty-class lesson, fixture-enrolled). "
    "Scale shape: one map-side-combining hash agg over the filtered "
    "scan; the test itself is a 1-row projection.",
)
def stats_welch_ttest(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    v = (F.col("value").try_cast("decimal(18,6)") * 1_000_000).cast("long")
    side_a = F.col("event_type") == "click"
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        side_a.alias("is_a"), v.alias("v")
    )
    dec = F.col("v").cast("decimal(38,0)")
    m = base.agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
        F.sum(F.when(F.col("is_a"), dec).otherwise(F.lit(0))).alias("sa"),
        F.sum(F.when(~F.col("is_a"), dec).otherwise(F.lit(0))).alias("sb"),
        F.sum(
            F.when(F.col("is_a"), dec * F.col("v")).otherwise(F.lit(0))
        ).alias("qa"),
        F.sum(
            F.when(~F.col("is_a"), dec * F.col("v")).otherwise(F.lit(0))
        ).alias("qb"),
    )

    def d2d(c):
        return c.cast("string").cast("double")

    d = m.select(
        "na",
        "nb",
        d2d(F.col("sa")).alias("sad"),
        d2d(F.col("sb")).alias("sbd"),
        d2d(F.col("na") * F.col("qa") - F.col("sa") * F.col("sa")).alias(
            "vna"
        ),
        d2d(F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb")).alias(
            "vnb"
        ),
    )
    vv = d.filter((F.col("na") >= 2) & (F.col("nb") >= 2)).select(
        "na",
        "nb",
        (F.col("sad") / F.col("na")).alias("ma"),
        (F.col("sbd") / F.col("nb")).alias("mb"),
        (
            F.col("vna")
            / (
                F.col("na").cast("double")
                * (F.col("na") - 1)
                * F.col("na")
            )
        ).alias("wa"),
        (
            F.col("vnb")
            / (
                F.col("nb").cast("double")
                * (F.col("nb") - 1)
                * F.col("nb")
            )
        ).alias("wb"),
    )
    se = F.col("wa") + F.col("wb")
    return vv.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        ((F.col("ma") - F.col("mb")) / F.lit(1_000_000.0)).alias(
            "mean_diff"
        ),
        (
            (F.col("ma") - F.col("mb"))
            / F.nullif(F.sqrt(se), F.lit(0.0))
        ).alias("t_stat"),
        (
            se
            * se
            / F.nullif(
                F.col("wa") * F.col("wa") / (F.col("na") - 1)
                + F.col("wb") * F.col("wb") / (F.col("nb") - 1),
                F.lit(0.0),
            )
        ).alias("df_welch"),
    )


_CUPED_ORACLE = """
WITH mid AS (
    SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS m FROM events),
pu AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'
                          AND epoch_us(ts) < (SELECT m FROM mid)
                     THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase'
                          AND epoch_us(ts) >= (SELECT m FROM mid)
                     THEN CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000
                               AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY user_id),
v AS (
    SELECT user_id, x, y,
           CASE WHEN ((strpos('0123456789abcdef',
                              substring(md5(CAST(user_id AS VARCHAR)), 1, 1))
                       - 1) % 2) = 0
                THEN 'control' ELSE 'treatment' END AS variant
    FROM pu),
pool AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
    FROM v),
th AS (
    SELECT n, sx,
           CAST(CAST(CAST(n AS HUGEINT) * sxy
                     - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
             / nullif(CAST(CAST(CAST(n AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx AS VARCHAR)
                           AS DOUBLE), 0.0) AS theta
    FROM pool),
vg AS (
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(x) AS BIGINT) AS vsx,
           CAST(sum(y) AS BIGINT) AS vsy
    FROM v GROUP BY variant)
SELECT vg.variant, vg.n_users, vg.vsx AS sum_x_pre, vg.vsy AS sum_y_micro,
       CAST(vg.vsy AS DOUBLE) / CAST(vg.n_users AS DOUBLE) AS mean_y_micro,
       th.theta AS theta,
       CAST(vg.vsy AS DOUBLE) / CAST(vg.n_users AS DOUBLE)
         - th.theta * (CAST(vg.vsx AS DOUBLE) / CAST(vg.n_users AS DOUBLE)
                       - CAST(th.sx AS DOUBLE) / CAST(th.n AS DOUBLE))
           AS mean_y_cuped_micro
FROM vg, th
"""


@register(
    "stats_cuped_adjustment",
    _CUPED_ORACLE,
    doc="CUPED variance-reduced experiment readout (Deng/Xu/Kohavi/"
    "Walker WSDM'13 'Improving the Sensitivity of Online Controlled "
    "Experiments') — THE standard A/B-test adjustment every "
    "experimentation platform applies on top of a feature store: "
    "per-user pre-period covariate x (clicks before the corpus "
    "midpoint) and post-period metric y (purchase micro-units after "
    "it), deterministic md5-parity variant assignment, pooled "
    "theta = cov(x,y)/var(x), adjusted per-variant mean "
    "y - theta*(x - pooled mean x). Exactness: the midpoint is an "
    "integer micros floor-half (both engines agree); x/y/moment sums "
    "are exact integers (Sxy/Sxx in DECIMAL(38,0)/HUGEINT); theta's "
    "numerator/denominator cross to double via the string route "
    "(d2d) with a nullif(var,0) guard (zero pre-period variance -> "
    "NULL on BOTH engines); the adjusted mean is then one fixed "
    "IEEE chain on agreed doubles. Shape: one hash agg to the user "
    "grain, a 1-row moment agg broadcast back over the 2-row variant "
    "rollup — nothing wider than the user table ever shuffles, and "
    "the user rollup is the same shuffle the feature store's "
    "aggregates already pay.",
)
def stats_cuped_adjustment(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    mid = ev.agg(
        F.expr(
            "CAST((unix_micros(min(ts)) + unix_micros(max(ts))) DIV 2"
            " AS BIGINT)"
        ).alias("m")
    )
    pu = (
        ev.join(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.unix_micros("ts") < F.col("m")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.unix_micros("ts") >= F.col("m")),
                    (F.col("value").try_cast("decimal(18,6)") * 1_000_000).cast(
                        "long"
                    ),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    hexd = "0123456789abcdef"
    par = (
        F.position(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1),
            F.lit(hexd),
        )
        - 1
    ) % 2
    v = pu.select(
        "x",
        "y",
        F.when(par == 0, "control").otherwise("treatment").alias("variant"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    pool = v.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(xd * F.col("y")).alias("sxy"),
    )

    def d2d(c):
        return c.cast("string").cast("double")

    th = pool.select(
        "n",
        "sx",
        (
            d2d(
                F.col("n").cast("decimal(38,0)") * F.col("sxy")
                - F.col("sx").cast("decimal(38,0)") * F.col("sy")
            )
            / F.nullif(
                d2d(
                    F.col("n").cast("decimal(38,0)") * F.col("sxx")
                    - F.col("sx").cast("decimal(38,0)") * F.col("sx")
                ),
                F.lit(0.0),
            )
        ).alias("theta"),
    )
    vg = v.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("vsx"),
        F.sum("y").cast("long").alias("vsy"),
    )
    return vg.join(F.broadcast(th)).select(
        "variant",
        "n_users",
        F.col("vsx").alias("sum_x_pre"),
        F.col("vsy").alias("sum_y_micro"),
        (F.col("vsy").cast("double") / F.col("n_users").cast("double")).alias(
            "mean_y_micro"
        ),
        "theta",
        (
            F.col("vsy").cast("double") / F.col("n_users").cast("double")
            - F.col("theta")
            * (
                F.col("vsx").cast("double") / F.col("n_users").cast("double")
                - F.col("sx").cast("double") / F.col("n").cast("double")
            )
        ).alias("mean_y_cuped_micro"),
    )
