"""Feature-engineering + model-evaluation query family (round 7).

The transforms a training pipeline applies between the raw event store
and the model: missing-value imputation, leave-one-out target encoding,
the hashing trick, score-calibration audit, and a two-sample KS test
for covariate shift. Reference parity: the reference computes per-user
aggregates that feed scalar rules (/root/reference/models/aggregate.py:
41-83, /root/reference/models/rules.py:25-75); these entries are the
same per-key-aggregate → per-row-derived-feature shape, generalized to
the encodings a 100 TB feature pipeline actually ships.

Exactness doctrine (repo standard): monetary doubles go through the
DECIMAL(18,6) micro-unit cast, all accumulation is integer/decimal, and
every double in the output is ONE division (or a chain of per-row
deterministic ops) over exactly-agreed operands — so driver value
hashes match bit-for-bit. All sampling/bucketing randomness is
md5(id)-derived (the training_data.py idiom), never rand().
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


def _v_micro(col: str = "value") -> F.Column:
    """DECIMAL(18,6) round-half-up micro-units (the agg_gini_spend
    recipe) — never floor-on-double."""
    return (F.col(col).try_cast("decimal(18,6)") * 1_000_000).cast("long")


_V_MICRO_SQL = "CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT)"


# ---------------------------------------------------------------------------
# Mean imputation
# ---------------------------------------------------------------------------

_IMPUTE_ORACLE = f"""
WITH base AS (
    SELECT event_id, user_id,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE {_V_MICRO_SQL} END AS v_micro
    FROM events
), per_user AS (
    SELECT user_id,
           sum(v_micro) AS s,
           count(v_micro) AS n
    FROM base GROUP BY user_id
), overall AS (
    SELECT sum(v_micro) AS gs, count(v_micro) AS gn FROM base
)
SELECT b.event_id,
       b.user_id,
       b.v_micro IS NULL AS was_missing,
       CASE
         WHEN b.v_micro IS NOT NULL THEN CAST(b.v_micro AS DOUBLE)
         WHEN u.n > 0 THEN CAST(u.s AS DOUBLE) / CAST(u.n AS DOUBLE)
         ELSE CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE)
       END / 1e6 AS value_filled
FROM base b
JOIN per_user u ON b.user_id = u.user_id
CROSS JOIN overall g
"""


@register(
    "feat_mean_impute",
    _IMPUTE_ORACLE,
    doc="missing-value imputation: 'error' events' value is treated as "
    "unobserved and filled with the user's mean over observed rows, "
    "falling back to the global mean for users with no observed "
    "values — the imputer every tabular training pipeline runs "
    "before a model that can't take NULLs. Exactness: observed "
    "values go through micro-units; each mean is division of an "
    "exact BIGINT sum by an exact count (then one /1e6), identical "
    "on both engines. Scale: one per-user partial agg (map-side "
    "combine), the global mean is a 1-row broadcast, and the "
    "join-back is on the pre-aggregated user table — per-row work "
    "stays JVM-side, no window over the raw fact.",
)
def feat_mean_impute(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            _v_micro()
        ).alias("v_micro"),
    )
    per_user = base.groupBy("user_id").agg(
        F.sum("v_micro").alias("s"), F.count("v_micro").alias("n")
    )
    glob = base.agg(
        F.sum("v_micro").alias("gs"), F.count("v_micro").alias("gn")
    )
    user_mean = (
        F.col("s").cast("double") / F.col("n").cast("double")
    )
    glob_mean = F.col("gs").cast("double") / F.col("gn").cast("double")
    return (
        base.join(per_user, "user_id")
        .join(F.broadcast(glob))
        .select(
            "event_id",
            "user_id",
            F.col("v_micro").isNull().alias("was_missing"),
            (
                F.when(
                    F.col("v_micro").isNotNull(),
                    F.col("v_micro").cast("double"),
                )
                .when(F.col("n") > 0, user_mean)
                .otherwise(glob_mean)
                / 1e6
            ).alias("value_filled"),
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------

_TE_ORACLE = f"""
WITH base AS (
    SELECT event_id, event_type, {_V_MICRO_SQL} AS y
    FROM events
), cat AS (
    SELECT event_type, sum(y) AS s, count(*) AS n
    FROM base GROUP BY event_type
)
SELECT b.event_id,
       b.event_type,
       CAST(c.n AS BIGINT) AS n_category,
       CASE WHEN c.n > 1
            THEN CAST(c.s - b.y AS DOUBLE) / CAST(c.n - 1 AS DOUBLE) / 1e6
       END AS te_loo
FROM base b JOIN cat c ON b.event_type = c.event_type
"""


@register(
    "feat_target_encoding_loo",
    _TE_ORACLE,
    doc="leave-one-out target encoding: each row's category "
    "(event_type) is replaced by the mean target (value) of the "
    "OTHER rows in that category — (sum_c - y_i)/(n_c - 1) — the "
    "leakage-safe form of mean encoding (plain per-category mean "
    "leaks each row's own label into its feature; LOO is the "
    "standard fix, NULL for singleton categories). Exactness: "
    "targets in micro-units, the encoding is one division of "
    "exact BIGINTs per row. Scale: the category table is tiny "
    "(distinct event types) — one partial agg then a BROADCAST "
    "join-back; no per-category window over the raw fact, so a "
    "skewed category costs nothing extra.",
)
def feat_target_encoding_loo(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    base = ev.select("event_id", "event_type", _v_micro().alias("y"))
    cat = base.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count("*").alias("n")
    )
    return base.join(F.broadcast(cat), "event_type").select(
        "event_id",
        "event_type",
        F.col("n").cast("long").alias("n_category"),
        F.when(
            F.col("n") > 1,
            (F.col("s") - F.col("y")).cast("double")
            / (F.col("n") - 1).cast("double")
            / 1e6,
        ).alias("te_loo"),
    )


# ---------------------------------------------------------------------------
# Calibration bins
# ---------------------------------------------------------------------------

_CALIB_DIGIT = (
    "(CAST(position(substr(md5(CAST(event_id AS VARCHAR)), {i}, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1)"
)
_CALIB_SCORE = " + ".join(
    f"{_CALIB_DIGIT.format(i=i)} * {16 ** (4 - i)}" for i in range(1, 5)
)

_CALIB_ORACLE = f"""
WITH scored AS (
    SELECT ({_CALIB_SCORE}) AS s,
           event_type = 'purchase' AS y
    FROM events
), binned AS (
    SELECT (s * 10) // 65536 AS bin, s, y FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 65536
           AS mean_score,
       CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS frac_positive
FROM binned GROUP BY bin
"""


@register(
    "eval_calibration_bins",
    _CALIB_ORACLE,
    doc="calibration-curve bins (reliability diagram): scores bucketed "
    "into 10 equal-width bins, each reporting mean predicted score "
    "vs realized positive rate — the audit that catches a model "
    "whose 0.9 scores hit 60% of the time. The score here is the "
    "md5(event_id)-derived uniform in [0,1) (16 bits parsed from "
    "hex digits — the repo's deterministic stand-in for a model "
    "score; the operator is the binning/audit, not the model), "
    "label = purchase events. Exactness: scores and bin ids are "
    "pure integer arithmetic, the two ratios are divisions of "
    "exact BIGINTs. Scale: one hash agg onto ≤10 groups with "
    "map-side partials — the cheapest possible shape.",
)
def eval_calibration_bins(spark, sf_dir):
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
    binned = scored.select(
        F.expr("(s * 10) DIV 65536").alias("bin"), "s", "y"
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        (
            F.sum("s").cast("double") / F.count("*").cast("double") / 65536
        ).alias("mean_score"),
        (
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("frac_positive"),
    )


# ---------------------------------------------------------------------------
# Hashing trick
# ---------------------------------------------------------------------------

_HASH_FEAT_DIGIT = (
    "(CAST(position(substr(md5(f), 1, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1)"
)

# The k feature follows the repo-wide strict-integer props contract
# (r9): k participates only as a clean integer, rendered canonically
# (CAST(BIGINT AS VARCHAR)) on both engines. Hashing the RAW extracted
# text is not portable — Spark's get_json_object re-renders scientific
# notation ('1e30' -> '1.0E30') while DuckDB preserves the source text
# (r10 fixture find), so raw-text md5 buckets diverge cross-engine.
_K_TRIMMED = (
    "regexp_replace(json_extract_string(props, '$.k'), "
    "'^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g')"
)

_HASHING_ORACLE = f"""
WITH feats AS (
    SELECT user_id, 'et=' || event_type AS f FROM events
    UNION ALL
    SELECT user_id,
           'k=' || CAST(TRY_CAST({_K_TRIMMED} AS BIGINT) AS VARCHAR) AS f
    FROM events
    WHERE regexp_matches({_K_TRIMMED}, '^[+-]?[0-9]+$')
      AND TRY_CAST({_K_TRIMMED} AS BIGINT) IS NOT NULL
)
SELECT user_id,
       {_HASH_FEAT_DIGIT} AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM feats
GROUP BY user_id, bucket
"""


@register(
    "feat_hashing_trick",
    _HASHING_ORACLE,
    doc="the hashing trick: categorical features (event type, the "
    "props.k attribute) are folded into a FIXED 16-slot space by "
    "hashing the feature string — the unbounded-vocabulary encoder "
    "(no fitted dictionary, new categories at serving time just "
    "hash somewhere) every large-scale linear/FM model uses. "
    "Bucket = first md5 hex digit, identical on both engines; "
    "collisions are the accepted trade. The k feature is the "
    "strict-integer contract value rendered canonically — hashing "
    "the raw JSON text diverges cross-engine on scientific "
    "notation (Spark get_json_object re-renders 1e30 as 1.0E30; "
    "r10 fixture find). Scale: explode to 2 "
    "feature rows per event JVM-side, one hash agg on "
    "(user, bucket) with map-side combine; output is bounded by "
    "users x 16 — the dimensionality cap is the point.",
)
def feat_hashing_trick(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    k_long = F.get_json_object("props", "$.k").try_cast("long")
    feats = ev.select(
        "user_id",
        F.explode(
            F.array_compact(
                F.array(
                    F.concat(F.lit("et="), F.col("event_type")),
                    F.when(
                        k_long.isNotNull(),
                        F.concat(F.lit("k="), k_long.cast("string")),
                    ),
                )
            )
        ).alias("f"),
    )
    bucket = (
        F.position(
            F.substring(F.md5(F.col("f").cast("binary")), 1, 1),
            F.lit(_HEXD),
        ).cast("long")
        - 1
    )
    return feats.groupBy(
        "user_id", bucket.alias("bucket")
    ).agg(F.count("*").cast("long").alias("n"))


# ---------------------------------------------------------------------------
# Two-sample KS test
# ---------------------------------------------------------------------------

_KS_ORACLE = f"""
WITH a AS (
    SELECT {_V_MICRO_SQL} AS v FROM events
    WHERE event_type = 'click' AND (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL)
), b AS (
    SELECT {_V_MICRO_SQL} AS v FROM events
    WHERE event_type = 'purchase' AND (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL)
), hist AS (
    SELECT v,
           sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
    FROM (SELECT v, 'a' AS side FROM a
          UNION ALL SELECT v, 'b' FROM b)
    GROUP BY v
), cum AS (
    SELECT v,
           sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
           sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
    FROM hist
), n AS (
    SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb
)
SELECT CAST(n.na AS BIGINT) AS n_a,
       CAST(n.nb AS BIGINT) AS n_b,
       CAST(max(abs(CAST(cuma AS DECIMAL(38,0)) * n.nb
                  - CAST(cumb AS DECIMAL(38,0)) * n.na)) AS DOUBLE)
           / (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE)) AS ks_d
FROM cum CROSS JOIN n
GROUP BY n.na, n.nb
"""


@register(
    "stats_ks_test",
    _KS_ORACLE,
    doc="two-sample Kolmogorov-Smirnov statistic between the value "
    "distributions of click vs purchase events — the unbinned "
    "covariate-shift test (dq_distribution_drift is the binned-PSI "
    "sibling; KS is what you run when the binning itself is in "
    "question). D = sup|ECDF_a - ECDF_b|, computed EXACTLY by "
    "cross-multiplication: at each distinct value, |cumA*nB - "
    "cumB*nA| in DECIMAL(38,0) (the counts' product overflows "
    "int64 at 100 TB), one final division of exact operands. "
    "Scale: both ECDFs collapse onto the micro-unit VALUE "
    "HISTOGRAM first (the agg_gini_spend move) so the running sum "
    "ranges over the distinct-value domain, never the row count; "
    "and the ordered CDF pass itself RUNS as range-partitioned "
    "partials + broadcast prefix offsets "
    "(operators/global_window.py), so even a fully-continuous "
    "value domain (distinct ~ n) never funnels into one sort task.",
)
def stats_ks_test(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # NULL values carry no position in an ECDF — excluded on BOTH
    # engines (they also rank on opposite ends: Spark ASC first,
    # DuckDB last — the round-8 NULL-value fixture find).
    sides = ev.filter(
        F.col("event_type").isin("click", "purchase")
        & is_exact_value(F.col("value"))
    ).select(
        _v_micro().alias("v"),
        F.when(F.col("event_type") == "click", "a")
        .otherwise("b")
        .alias("side"),
    )
    hist = sides.groupBy("v").agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("cb"),
    )
    cum = bucketed_running_sums(
        hist, "v", ["v"], [(F.col("ca"), "cuma"), (F.col("cb"), "cumb")]
    ).select("cuma", "cumb")
    # NOTE (r12, measured rejection): deriving (na, nb) as sum(ca),
    # sum(cb) over the persisted hist is value-identical and avoids a
    # second fact scan — but interleaved A/B read it SLOWER at sf0.1
    # (1.63 vs 1.49 min-of-5, 4/5 pairs): the hist-cache read
    # serializes behind the cache build, while this independent
    # parquet-scan agg overlaps other jobs as a broadcast future.
    n = sides.agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("nb"),
    )
    d = cum.join(F.broadcast(n)).select(
        "na",
        "nb",
        F.abs(
            F.col("cuma").cast("decimal(38,0)") * F.col("nb")
            - F.col("cumb").cast("decimal(38,0)") * F.col("na")
        ).alias("dnum"),
    )
    return d.groupBy("na", "nb").agg(F.max("dnum").alias("m")).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (
            F.col("m").cast("double")
            # nullif: with an empty class (no click or no purchase
            # rows) na*nb = 0 and Spark's IEEE division yields NaN/Inf
            # where DuckDB yields NULL — guard so both emit NULL
            / F.nullif(
                F.col("na").cast("double") * F.col("nb").cast("double"),
                F.lit(0.0),
            )
        ).alias("ks_d"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization
# ---------------------------------------------------------------------------

_QNORM_ORACLE = f"""
WITH base AS (
    SELECT event_id, event_type, {_V_MICRO_SQL} AS v FROM events
    WHERE (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL)
), ranked AS (
    SELECT event_id, event_type,
           rank() OVER (PARTITION BY event_type ORDER BY v) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM base
)
SELECT event_id, event_type,
       CAST(r AS BIGINT) AS value_rank,
       CAST(r AS DOUBLE) / CAST(n + 1 AS DOUBLE) AS quantile
FROM ranked
"""


@register(
    "feat_quantile_normalize",
    _QNORM_ORACLE,
    doc="quantile normalization: each row's value replaced by its "
    "empirical quantile within its event type — rank/(n+1), the "
    "distribution-free feature transform that makes heavy-tailed "
    "columns comparable across types (min rank on ties, so equal "
    "values get equal quantiles deterministically). Exactness: "
    "ranks are pure integers, the quantile is one division. Scale: "
    "NOT a per-type window over the raw fact (5 types = 5 window "
    "partitions = skew): rows collapse onto the micro-unit VALUE "
    "HISTOGRAM per type first (the agg_gini_spend move), the "
    "cumulative count runs over that distinct-value domain (and "
    "RUNS as range-partitioned partials + broadcast prefix offsets "
    "— operators/global_window.py — so a fully-continuous domain "
    "never funnels into one task per type), and rank = cum_prev + 1 "
    "joins back on (type, value). The ORACLE keeps the textbook "
    "per-row rank() form: matching hashes prove the histogram "
    "identity cross-engine.",
)
def feat_quantile_normalize(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # Only FINITE values rank (NULLs disagree on placement — the r8
    # find; NaN/Inf disagree on rank by design — the r9 non-finite
    # class): excluded on BOTH engines.
    ev = ev.filter(is_exact_value(F.col("value")))
    base = ev.select("event_id", "event_type", _v_micro().alias("v"))
    hist = base.groupBy("event_type", "v").agg(
        F.count("*").alias("c")
    )
    cum = bucketed_running_sums(
        hist, "v", ["v"], [(F.col("c"), "cum")],
        partition_cols=["event_type"],
    )
    tot = hist.groupBy("event_type").agg(F.sum("c").alias("n"))
    ranks = cum.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "v",
        (F.col("cum") - F.col("c") + 1).alias("r"),
        "n",
    )
    return base.join(ranks, ["event_type", "v"]).select(
        "event_id",
        "event_type",
        F.col("r").cast("long").alias("value_rank"),
        (
            F.col("r").cast("double") / (F.col("n") + 1).cast("double")
        ).alias("quantile"),
    )


# ---------------------------------------------------------------------------
# Percentile winsorization (outlier clipping at exact p05/p95)
# ---------------------------------------------------------------------------

_WINSORIZE_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_totalprice IS NOT NULL),
h AS (SELECT o_orderpriority AS pri, o_totalprice AS v, count(*) AS c
      FROM base GROUP BY 1, 2),
r AS (SELECT pri, v,
             sum(c) OVER (PARTITION BY pri ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY pri) AS n
      FROM h),
t AS (SELECT pri,
             min(CASE WHEN cum >= (5 * n + 99) // 100 THEN v END) AS p05,
             min(CASE WHEN cum >= (95 * n + 99) // 100 THEN v END) AS p95
      FROM r GROUP BY pri)
SELECT b.o_orderkey, b.o_orderpriority, b.o_totalprice, t.p05, t.p95,
       CASE WHEN b.o_totalprice < t.p05 THEN t.p05
            WHEN b.o_totalprice > t.p95 THEN t.p95
            ELSE b.o_totalprice END AS winsorized
FROM base b JOIN t ON t.pri = b.o_orderpriority
"""


@register(
    "feat_winsorize_clip",
    _WINSORIZE_ORACLE,
    doc="Percentile winsorization: clip o_totalprice to its per-priority "
    "exact [p05, p95] band — the standard heavy-tail tamer applied "
    "before scaling/regression features. Thresholds by exact rank "
    "arithmetic on the (group, value) histogram (rank ceil(q*n) via "
    "integer (q*n+99) DIV 100 — no double quantiles, no division in "
    "any output), so every emitted column stays DECIMAL and both "
    "engines agree bit-for-bit, ties included. Scale shape: one "
    "histogram agg with map-side combine, the per-group cumulative "
    "count as range-partitioned partials + broadcast prefix offsets "
    "(operators/global_window.py — never one task per priority even "
    "on a continuous value domain), and a broadcast join of the "
    "tiny per-group threshold table back onto orders.",
)
def feat_winsorize_clip(spark, sf_dir):
    base = (
        load_table(spark, "orders", sf_dir)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .filter(F.col("o_totalprice").isNotNull())
    )
    hist = base.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("v"),
    ).agg(F.count("*").alias("c"))
    cumdf = bucketed_running_sums(
        hist, "v", ["v"], [(F.col("c"), "cum")], partition_cols=["pri"]
    )
    tot = hist.groupBy("pri").agg(F.sum("c").alias("n"))
    ranks = cumdf.join(F.broadcast(tot), "pri").select(
        "pri", "v", "cum", "n"
    )
    thr = (
        ranks.withColumn("k05", F.expr("(5 * n + 99) div 100"))
        .withColumn("k95", F.expr("(95 * n + 99) div 100"))
        .groupBy("pri")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("k05"), F.col("v"))).alias("p05"),
            F.min(F.when(F.col("cum") >= F.col("k95"), F.col("v"))).alias("p95"),
        )
    )
    return base.join(
        F.broadcast(thr), base["o_orderpriority"] == thr["pri"]
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        "p05",
        "p95",
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice"))
        .alias("winsorized"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval (round 8)
# ---------------------------------------------------------------------------

_CONF_PAR_SQL = (
    "(CAST(position(substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN "
    f"'{_HEXD}') AS BIGINT) - 1) % 2"
)

_CONFORMAL_ORACLE = f"""
WITH base AS (
    SELECT event_id, event_type, {_V_MICRO_SQL} AS v,
           {_CONF_PAR_SQL} AS par
    FROM events WHERE (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL)),
cal AS (SELECT * FROM base WHERE par = 0),
tst AS (SELECT * FROM base WHERE par = 1),
mu AS (SELECT event_type,
              CAST(sum(v) AS BIGINT) // count(*) AS m
       FROM cal GROUP BY 1),
g AS (SELECT count(*) AS n_cal,
             CASE WHEN count(*) = 0 THEN NULL
                  ELSE CAST(sum(v) AS BIGINT) // count(*) END AS gm
      FROM cal),
calr AS (SELECT abs(c.v - m.m) AS r
         FROM cal c JOIN mu m USING (event_type)),
hist AS (SELECT r, count(*) AS cnt FROM calr GROUP BY r),
cum AS (SELECT r, sum(cnt) OVER (ORDER BY r
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist),
k AS (SELECT LEAST((9 * (n_cal + 1) + 9) // 10, n_cal) AS k FROM g),
q AS (SELECT min(r) AS q_hat FROM cum, k WHERE cum.cum >= k.k),
cov AS (SELECT count(*) AS n_test,
               CAST(sum(CASE WHEN abs(t.v - coalesce(m.m, g.gm))
                                  <= q.q_hat THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cov
        FROM tst t
        LEFT JOIN mu m USING (event_type)
        CROSS JOIN q CROSS JOIN g)
SELECT CAST(g.n_cal AS BIGINT) AS n_cal,
       CAST(cov.n_test AS BIGINT) AS n_test,
       CAST(q.q_hat AS BIGINT) AS q_hat_micro,
       cov.n_cov AS n_covered,
       CAST((1000000 * cov.n_cov) // cov.n_test AS BIGINT)
           AS coverage_ppm
FROM g CROSS JOIN q CROSS JOIN cov
WHERE g.n_cal > 0 AND cov.n_test > 0
"""


@register(
    "eval_conformal_interval",
    _CONFORMAL_ORACLE,
    doc="split-conformal prediction interval + coverage audit (Vovk's "
    "inductive conformal / Lei et al. 2018): md5-parity halves the "
    "corpus into calibration and test, the 'model' is the per-type "
    "calibration mean (floor-div micro-units; global-mean fallback "
    "for types unseen in calibration), q_hat is the "
    "ceil(0.9*(n+1))-th smallest absolute calibration residual — the "
    "distribution-free 90% interval half-width — and realized test "
    "coverage is reported in integer ppm (the finite-sample "
    "guarantee coverage >= 1-alpha is pytest-pinned with a tolerance "
    "band). Exactness: residuals/quantile/coverage are pure integer "
    "arithmetic; the k-th order statistic is a rank-pick on the "
    "residual HISTOGRAM, never a corpus sort. The cumulative pass "
    "over the distinct-residual domain RUNS as range-partitioned "
    "partials + broadcast prefix offsets "
    "(operators/global_window.py — the stats_ks_test / "
    "stats_equidepth_histogram move, no single-task sort even on a "
    "continuous residual domain). Degenerate shapes (empty "
    "calibration or test half) yield an empty result on BOTH "
    "engines, never a crash.",
)
def eval_conformal_interval(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    par = (
        F.position(
            F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 1),
            F.lit(_HEXD),
        ).cast("long")
        - 1
    ) % 2
    base = ev.filter(is_exact_value(F.col("value"))).select(
        "event_id", "event_type", _v_micro().alias("v"), par.alias("par")
    )
    cal = base.filter(F.col("par") == 0)
    tst = base.filter(F.col("par") == 1)
    mu = cal.groupBy("event_type").agg(
        F.expr("sum(v) div count(*)").alias("m")
    )
    g = cal.agg(
        F.count("*").alias("n_cal"),
        F.when(
            F.count("*") == 0, F.lit(None).cast("long")
        ).otherwise(F.expr("sum(v) div count(*)")).alias("gm"),
    )
    calr = cal.join(F.broadcast(mu), "event_type").select(
        F.abs(F.col("v") - F.col("m")).alias("r")
    )
    hist = calr.groupBy("r").agg(F.count("*").alias("cnt"))
    cum = bucketed_running_sums(
        hist, "r", ["r"], [(F.col("cnt"), "cum")]
    ).select("r", "cum")
    k = g.select(
        F.least(
            F.expr("(9 * (n_cal + 1) + 9) div 10"), F.col("n_cal")
        ).alias("k")
    )
    q = (
        cum.join(F.broadcast(k))
        .filter(F.col("cum") >= F.col("k"))
        .agg(F.min("r").alias("q_hat"))
    )
    cov = (
        tst.join(F.broadcast(mu), "event_type", "left")
        .join(F.broadcast(q))
        .join(F.broadcast(g.select("gm")))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(
                        F.col("v") - F.coalesce(F.col("m"), F.col("gm"))
                    )
                    <= F.col("q_hat"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_cov"),
        )
    )
    return (
        g.join(F.broadcast(q))
        .join(F.broadcast(cov))
        .filter((F.col("n_cal") > 0) & (F.col("n_test") > 0))
        .select(
            F.col("n_cal").cast("long").alias("n_cal"),
            F.col("n_test").cast("long").alias("n_test"),
            F.col("q_hat").cast("long").alias("q_hat_micro"),
            F.col("n_cov").alias("n_covered"),
            F.expr("1000000 * n_cov div n_test")
            .cast("long")
            .alias("coverage_ppm"),
        )
    )
