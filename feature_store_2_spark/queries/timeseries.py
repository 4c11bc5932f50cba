"""Time-series & marketing analytics over the event log: EWMA and
rolling-median smoothing, CUSUM change-point detection, OLS trend
slopes, day-of-week seasonality, lag-7 autocorrelation, Pareto revenue
concentration, RFM segmentation, time-decay attribution, rate limiting,
sequence-pattern matching (MATCH_RECOGNIZE analog), interval
coalescing, and activity bitmaps.

These are the classic "operational analytics" reads a platform layers on
the same event stream the reference ingests (reference ingest path:
/root/reference/services/ingest.py; its per-user aggregate state is the
only analytic it ships — everything here is the surface a warehouse team
would bolt on next).

Determinism contract (repo-wide recipe): weighted sums use exact
binary-fraction DECIMAL literals or integer weights (2^k), money sums
accumulate in DECIMAL(18,6), and every DOUBLE is produced by ONE final
division of two exactly-agreed numbers — so addition order can never
perturb the driver's value hash. Ordered outputs carry total tie-break
keys (ts, event_id) / (metric, user_id).

Scale notes per entry are in each docstring; the shared shape is:
aggregate the 100-TB event table down to a per-day / per-user grain
FIRST (one shuffle, map-side partial aggs), then run the analytic on
the aggregate, which is metadata-scale (days x types) or user-scale.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feature_store_2_spark.operators.global_window import (
    bucketed_row_number,
    bucketed_running_sum,
    bucketed_running_sums,
    ntile_from_row_number,
)
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# EWMA of daily event volume
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
)
SELECT cur.event_type,
       cur.d,
       CAST(sum(past.c * (1 << (9 - date_diff('day', past.d, cur.d))))
            AS DOUBLE)
       / CAST(sum(1 << (9 - date_diff('day', past.d, cur.d))) AS DOUBLE)
           AS ewma,
       CAST(count(*) AS INT) AS n_days
FROM daily cur
JOIN daily past
  ON past.event_type = cur.event_type
 AND past.d BETWEEN cur.d - 9 AND cur.d
GROUP BY cur.event_type, cur.d
"""


@register(
    "ts_ewma_daily_volume",
    _EWMA_ORACLE,
    doc="exponentially-weighted moving average (alpha=1/2) of daily "
    "event volume per type over a trailing 10-day window. Exactness: "
    "weights are integer powers of two (2^(9-lag)), so numerator and "
    "denominator are exact BIGINTs and the single final division is "
    "bit-identical on both engines. Scale: the raw 100-TB scan "
    "collapses to per-(type, day) counts in ONE partial-agg shuffle; "
    "the windowed self-join then runs on the metadata-scale daily "
    "aggregate (days x types rows), so the quadratic-looking join is "
    "O(types x days x 10) — never touches raw events twice.",
)
def ts_ewma_daily_volume(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    cur = daily.select(
        F.col("event_type").alias("t"), F.col("d").alias("cd")
    )
    past = daily.select(
        F.col("event_type").alias("pt"),
        F.col("d").alias("pd"),
        F.col("c").alias("pc"),
    )
    w = F.expr("CAST(shiftleft(1, 9 - datediff(cd, pd)) AS BIGINT)")
    return (
        cur.join(
            past,
            (F.col("pt") == F.col("t"))
            & (F.col("pd") >= F.date_sub(F.col("cd"), 9))
            & (F.col("pd") <= F.col("cd")),
        )
        .groupBy(F.col("t").alias("event_type"), F.col("cd").alias("d"))
        .agg(
            (
                F.sum(F.col("pc") * w).cast("double")
                / F.sum(w).cast("double")
            ).alias("ewma"),
            F.count("*").cast("int").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
), cum AS (
    SELECT event_type, d,
           sum(c) OVER (PARTITION BY event_type ORDER BY d) AS prefix,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                AS BIGINT) AS idx,
           sum(c) OVER (PARTITION BY event_type) AS total,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM daily
), scored AS (
    SELECT event_type, d,
           CAST(n * prefix - idx * total AS BIGINT) AS cusum_scaled,
           n AS n_days,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(n * prefix - idx * total) DESC, d ASC
           ) AS rk
    FROM cum
)
SELECT event_type, d AS change_day, cusum_scaled,
       CAST(n_days AS INT) AS n_days
FROM scored WHERE rk = 1
"""


@register(
    "ts_cusum_changepoint",
    _CUSUM_ORACLE,
    doc="CUSUM change-point detection on daily event volume: the day "
    "maximizing |running deviation from the per-type mean|. Exactness: "
    "the statistic is scaled by n (S_t = n*prefix_t - t*total), which "
    "keeps everything in BIGINT — no mean division ever happens, so "
    "no float drift is possible. Scale: one partial-agg shuffle to "
    "daily grain; both windows and the argmax run per event_type on "
    "the metadata-scale daily table. The argmax tie-breaks to the "
    "earliest day for determinism.",
)
def ts_cusum_changepoint(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    wall = W.partitionBy("event_type")
    word = wall.orderBy("d")
    cum = daily.select(
        "event_type",
        "d",
        F.sum("c").over(word).alias("prefix"),
        F.row_number().over(word).cast("long").alias("idx"),
        F.sum("c").over(wall).alias("total"),
        F.count("*").over(wall).cast("long").alias("n"),
    )
    s = F.col("n") * F.col("prefix") - F.col("idx") * F.col("total")
    scored = cum.select(
        "event_type",
        "d",
        s.alias("cusum_scaled"),
        F.col("n").alias("n_days"),
        F.row_number()
        .over(wall.orderBy(F.abs(s).desc(), F.col("d").asc()))
        .alias("rk"),
    )
    return scored.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("d").alias("change_day"),
        "cusum_scaled",
        F.col("n_days").cast("int").alias("n_days"),
    )


# ---------------------------------------------------------------------------
# Pareto (80/20) revenue concentration
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH rev AS (
    SELECT c.c_custkey, r.r_name,
           sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS crev
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
), ranked AS (
    SELECT r_name,
           sum(crev) OVER (PARTITION BY r_name
                           ORDER BY crev DESC, c_custkey
                           ROWS UNBOUNDED PRECEDING) AS running,
           sum(crev) OVER (PARTITION BY r_name) AS total,
           row_number() OVER (PARTITION BY r_name
                              ORDER BY crev DESC, c_custkey) AS rk,
           count(*) OVER (PARTITION BY r_name) AS n_customers
    FROM rev
)
SELECT r_name AS region,
       CAST(min(CASE WHEN running * 5 >= total * 4 THEN rk END) AS INT)
           AS n_customers_80pct,
       CAST(max(n_customers) AS INT) AS n_customers,
       CAST(max(total) AS DOUBLE) AS region_revenue
FROM ranked
GROUP BY r_name
"""


@register(
    "pareto_revenue_concentration",
    _PARETO_ORACLE,
    doc="Pareto concentration: per region, the minimum number of "
    "top customers whose cumulative revenue reaches 80% of the "
    "region's total. Exactness: revenue accumulates in DECIMAL(18,6) "
    "and the 80% threshold is the integer comparison running*5 >= "
    "total*4 — no float enters until the final reporting cast. "
    "Scale: one shuffle to per-customer revenue (partial aggs), "
    "dims broadcast (customer->nation->region), then the running "
    "window partitions by region over the customer-grain aggregate. "
    "Tie-break (crev DESC, custkey) makes the rank total. The "
    "running sum and rank RUN as the two-phase prefix "
    "(operators/global_window.py, range-bucketed on -revenue per "
    "region) with per-region totals broadcast — a region's "
    "customers never funnel through one window task; value-"
    "identical by boundary-independence.",
)
def pareto_revenue_concentration(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("c_custkey", "r_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("crev")
        )
    )
    rev2 = rev.withColumn("negcrev", -F.col("crev"))
    cum = bucketed_running_sums(
        rev2,
        "negcrev",
        ["negcrev", "c_custkey"],
        [(F.col("crev"), "running"), (F.lit(1).cast("long"), "rk")],
        partition_cols=["r_name"],
        # DESC-via-negation: DESC is NULLS LAST in both engines (crev
        # is non-null here, but the ordering contract stays explicit).
        nulls="last",
    )
    tots = rev.groupBy("r_name").agg(
        F.sum("crev").alias("total"),
        F.count("*").alias("n_customers"),
    )
    ranked = cum.join(F.broadcast(tots), "r_name").select(
        "r_name", "running", "total", "rk", "n_customers"
    )
    hit = F.when(
        F.col("running") * 5 >= F.col("total") * 4, F.col("rk")
    )
    return ranked.groupBy(F.col("r_name").alias("region")).agg(
        F.min(hit).cast("int").alias("n_customers_80pct"),
        F.max("n_customers").cast("int").alias("n_customers"),
        F.max("total").cast("double").alias("region_revenue"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH p AS (
    SELECT user_id,
           max(CAST(ts AS DATE)) AS last_d,
           count(*) AS freq,
           sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END) AS monetary
    FROM events WHERE event_type = 'purchase' GROUP BY 1
), coh AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY 1
), anchor AS (
    SELECT max(CAST(ts AS DATE)) AS g FROM events
), m AS (
    SELECT p.user_id, coh.cohort_week,
           date_diff('day', last_d, (SELECT g FROM anchor))
               AS recency_days,
           freq, monetary
    FROM p JOIN coh ON p.user_id = coh.user_id
)
SELECT user_id, cohort_week,
       CAST(recency_days AS INT) AS recency_days,
       CAST(freq AS INT) AS frequency,
       CAST(monetary AS DOUBLE) AS monetary,
       CAST(ntile(5) OVER (PARTITION BY cohort_week
                           ORDER BY recency_days ASC, user_id) AS INT)
           AS r_score,
       CAST(ntile(5) OVER (PARTITION BY cohort_week
                           ORDER BY freq DESC, user_id) AS INT)
           AS f_score,
       CAST(ntile(5) OVER (PARTITION BY cohort_week
                           ORDER BY monetary DESC, user_id) AS INT)
           AS m_score
FROM m
"""


@register(
    "rfm_segmentation",
    _RFM_ORACLE,
    doc="cohort-relative RFM (recency/frequency/monetary) quintile "
    "segmentation of purchasers: quintiles are assigned WITHIN each "
    "signup-week cohort, the form CRM teams actually use (a 2019 "
    "signup and a 2024 signup shouldn't share a recency scale). "
    "Exactness: recency is integer days from the global max event "
    "date, monetary sums in DECIMAL(18,6); every ntile ordering "
    "carries a user_id tie-break so the quintile assignment is "
    "total. Scale: one shuffle to per-user purchase aggregates; the "
    "anchor date is a 1-row broadcast scalar (no collect); the "
    "three quintile ranks are PARTITIONED by cohort week AND "
    "range-bucketed within each cohort (two-phase prefix, "
    "operators/global_window.py) with closed-form exact ntile from "
    "the global row number — so neither corpus age (many cohorts) "
    "nor a viral signup week (one huge cohort) ever serializes "
    "into a single sort task.",
)
def rfm_segmentation(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_d"),
            F.count("*").alias("freq"),
            F.sum(F.col("value").try_cast("decimal(18,6)")).alias("monetary"),
        )
    )
    coh = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    anchor = ev.agg(F.max(F.to_date("ts")).alias("g"))
    m = (
        p.join(coh, "user_id")
        .join(F.broadcast(anchor))
        .select(
            "user_id",
            "cohort_week",
            F.datediff(F.col("g"), F.col("last_d")).alias("recency_days"),
            "freq",
            "monetary",
        )
    )
    # Three per-cohort global ranks via the two-phase prefix
    # (operators/global_window.py): a viral signup week is a skew bomb
    # for a plain per-cohort window (one sort task per cohort); the
    # range-bucketed row_number keeps even a 100M-user cohort parallel.
    # DESC orderings range-bucket on the negated key (double cast is
    # monotone, so bucket order respects the exact decimal order; ties
    # share a bucket by construction) with nulls='last' — DESC defaults
    # to NULLS LAST in both engines, and -NULL is NULL, which plain ASC
    # would flip to first (a user whose purchases all carry NULL value
    # has monetary = sum(value) = NULL; review finding, round 8).
    m2 = m.withColumn("negf", -F.col("freq")).withColumn(
        "negm", -F.col("monetary")
    )
    r1 = bucketed_row_number(
        m2, "recency_days", ["recency_days", "user_id"], "rn_r",
        partition_cols=["cohort_week"],
    )
    r2 = bucketed_row_number(
        r1, "negf", ["negf", "user_id"], "rn_f",
        partition_cols=["cohort_week"], nulls="last",
    )
    r3 = bucketed_row_number(
        r2, "negm", ["negm", "user_id"], "rn_m",
        partition_cols=["cohort_week"], nulls="last",
    )
    tot = m.groupBy("cohort_week").agg(F.count("*").alias("_n"))
    return r3.join(F.broadcast(tot), "cohort_week").select(
        "user_id",
        "cohort_week",
        F.col("recency_days").cast("int").alias("recency_days"),
        F.col("freq").cast("int").alias("frequency"),
        F.col("monetary").cast("double").alias("monetary"),
        ntile_from_row_number(F.col("rn_r"), F.col("_n"), 5)
        .cast("int")
        .alias("r_score"),
        ntile_from_row_number(F.col("rn_f"), F.col("_n"), 5)
        .cast("int")
        .alias("f_score"),
        ntile_from_row_number(F.col("rn_m"), F.col("_n"), 5)
        .cast("int")
        .alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Time-decay attribution
# ---------------------------------------------------------------------------

# 2^-d for d = 0..7 as exact decimal literals (7 fractional digits is
# exactly enough for 2^-7): element d of this table is the credit a
# touch d days before the purchase earns. Literal table keeps both
# engines bit-identical without any decimal division.
_DECAY = (
    "1.0000000",
    "0.5000000",
    "0.2500000",
    "0.1250000",
    "0.0625000",
    "0.0312500",
    "0.0156250",
    "0.0078125",
)

_DECAY_CASE = "CASE date_diff('day', CAST(t.ts AS DATE), CAST(p.ts AS DATE)) " + " ".join(
    f"WHEN {d} THEN CAST({w} AS DECIMAL(9,7))" for d, w in enumerate(_DECAY)
) + " END"

_ATTR_ORACLE = f"""
SELECT t.event_type,
       CAST(CAST(sum({_DECAY_CASE}) AS VARCHAR) AS DOUBLE) AS credit,
       CAST(count(*) AS INT) AS n_touches
FROM events p
JOIN events t
  ON t.user_id = p.user_id
 AND t.ts < p.ts
 AND t.ts >= p.ts - INTERVAL 7 DAY
WHERE p.event_type = 'purchase'
  AND t.event_type IN ('view', 'click')
GROUP BY t.event_type
"""


@register(
    "attribution_time_decay",
    _ATTR_ORACLE,
    doc="time-decay marketing attribution: every view/click touch in "
    "the 7 days before a purchase earns credit 2^-(days before), "
    "summed per touch channel. Exactness: the decay weights are a "
    "literal DECIMAL(9,7) lookup table (2^-d is exact in 7 decimal "
    "digits for d<=7), so the credit sum is pure decimal addition; "
    "ONE final cast to DOUBLE. Scale: purchases and touches equi-join "
    "on user_id (the high-cardinality key carries the shuffle); the "
    "time-range predicate is a residual filter on the hash join, not "
    "a cartesian — per-user fan-out is bounded by a user's own 7-day "
    "touch density, the same skew profile as any sessionization.",
)
def attribution_time_decay(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    d = F.datediff(F.to_date("p_ts"), F.to_date("t_ts"))
    weight = F.element_at(
        F.array(*[F.lit(w).cast("decimal(9,7)") for w in _DECAY]), d + 1
    )
    return (
        p.join(
            t,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (
                F.col("t_ts")
                >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum(weight).cast("double").alias("credit"),
            F.count("*").cast("int").alias("n_touches"),
        )
    )


# ---------------------------------------------------------------------------
# Shapley-value channel attribution (round 8)
# ---------------------------------------------------------------------------

# (channel, bit, subset-without-channel, 6x Shapley weight |S|!(c-|S|-1)!
# / c! for c=3: |S|=0 -> 2, |S|=1 -> 1, |S|=2 -> 2). Pure literals so
# both engines share the identical coalition algebra.
_SHAP_MAP = [
    ("view", 1, 0, 2), ("view", 1, 2, 1), ("view", 1, 4, 1),
    ("view", 1, 6, 2),
    ("click", 2, 0, 2), ("click", 2, 1, 1), ("click", 2, 4, 1),
    ("click", 2, 5, 2),
    ("signup", 4, 0, 2), ("signup", 4, 1, 1), ("signup", 4, 2, 1),
    ("signup", 4, 3, 2),
]

_SHAP_MAP_SQL = ",".join(
    f"('{ch}',{bit},{s},{w})" for ch, bit, s, w in _SHAP_MAP
)

_SHAPLEY_ORACLE = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
fp AS (SELECT user_id, min(ts) AS pts
       FROM events WHERE event_type = 'purchase' GROUP BY 1),
expo AS (
    SELECT u.user_id,
           CAST(max(CASE WHEN f.pts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS conv,
           CAST(coalesce(max(CASE WHEN t.event_type = 'view'
                                  THEN 1 END), 0)
              + coalesce(max(CASE WHEN t.event_type = 'click'
                                  THEN 2 END), 0)
              + coalesce(max(CASE WHEN t.event_type = 'signup'
                                  THEN 4 END), 0) AS BIGINT) AS mask
    FROM users u
    LEFT JOIN fp f ON f.user_id = u.user_id
    LEFT JOIN events t
      ON t.user_id = u.user_id
     AND t.event_type IN ('view', 'click', 'signup')
     AND (f.pts IS NULL OR t.ts < f.pts)
    GROUP BY u.user_id),
seg AS (SELECT mask, count(*) AS n, sum(conv) AS c
        FROM expo GROUP BY mask),
v AS (SELECT mask, (1000000 * c) // n AS v_ppm FROM seg),
m(channel, bit, s, w) AS (VALUES {_SHAP_MAP_SQL}),
shap AS (
    SELECT m.channel,
           CAST(sum(m.w * (coalesce(vw.v_ppm, 0)
                           - coalesce(vo.v_ppm, 0))) AS BIGINT)
               AS shapley_x6_ppm
    FROM m
    LEFT JOIN v vo ON vo.mask = m.s
    LEFT JOIN v vw ON vw.mask = m.s + m.bit
    GROUP BY 1),
ch(channel, bit) AS (VALUES ('view', 1), ('click', 2), ('signup', 4)),
exposed AS (
    SELECT ch.channel,
           CAST(coalesce(sum(seg.n), 0) AS BIGINT) AS n_exposed,
           CAST(coalesce(sum(seg.c), 0) AS BIGINT) AS n_conv_exposed
    FROM ch LEFT JOIN seg ON (seg.mask & ch.bit) <> 0
    GROUP BY 1)
SELECT s.channel, s.shapley_x6_ppm, e.n_exposed, e.n_conv_exposed
FROM shap s JOIN exposed e ON e.channel = s.channel
"""


@register(
    "attribution_shapley",
    _SHAPLEY_ORACLE,
    doc="exact Shapley-value channel attribution (Shapley 1953 as "
    "operationalized for marketing by Dalessandro et al. 2012): "
    "coalition = the SET of channels (view/click/signup) a user was "
    "exposed to before their first purchase (all exposure counts for "
    "non-converters), v(S) = conversion rate of the users exposed to "
    "exactly S, channel credit = the Shapley average of marginal "
    "contributions v(S+i)-v(S) over all orderings — the "
    "game-theoretic attribution the time-decay entry's heuristic "
    "family doesn't cover. Exactness: rates in ppm by integer floor "
    "division, the 3-channel coalition weights 2/1/1/2 are 6x the "
    "exact factorials (output is Shapley x 6 in ppm — an integer), "
    "unobserved coalitions contribute v = 0 (documented estimator "
    "choice; credits can legitimately go negative). Scale: ONE "
    "corpus pass builds per-user exposure masks (conditional-max "
    "agg on the user grain — the feature-store aggregate shuffle), "
    "the 8-row segment table and 12-row coalition map are metadata; "
    "everything after the first agg is broadcast arithmetic.",
)
def attribution_shapley(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    users = ev.select("user_id").distinct()
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    touches = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("t_type"),
        F.col("ts").alias("t_ts"),
    )
    base = users.join(fp, "user_id", "left")
    joined = base.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("pts").isNull() | (F.col("t_ts") < F.col("pts"))),
        "left",
    )
    expo = joined.groupBy("user_id").agg(
        F.max(
            F.when(F.col("pts").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("conv"),
        (
            F.coalesce(
                F.max(F.when(F.col("t_type") == "view", 1)), F.lit(0)
            )
            + F.coalesce(
                F.max(F.when(F.col("t_type") == "click", 2)), F.lit(0)
            )
            + F.coalesce(
                F.max(F.when(F.col("t_type") == "signup", 4)), F.lit(0)
            )
        ).cast("long").alias("mask"),
    )
    seg = expo.groupBy("mask").agg(
        F.count("*").alias("n"), F.sum("conv").alias("c")
    )
    v = seg.select("mask", F.expr("1000000 * c div n").alias("v_ppm"))
    m = spark.createDataFrame(_SHAP_MAP, "channel string, bit long, s long, w long")
    shap = (
        m.join(
            F.broadcast(v.withColumnRenamed("mask", "mo")),
            F.col("mo") == F.col("s"),
            "left",
        )
        .withColumnRenamed("v_ppm", "vo")
        .join(
            F.broadcast(
                v.select(
                    F.col("mask").alias("mw"), F.col("v_ppm").alias("vw")
                )
            ),
            F.col("mw") == F.col("s") + F.col("bit"),
            "left",
        )
        .groupBy("channel")
        .agg(
            F.sum(
                F.col("w")
                * (
                    F.coalesce(F.col("vw"), F.lit(0))
                    - F.coalesce(F.col("vo"), F.lit(0))
                )
            )
            .cast("long")
            .alias("shapley_x6_ppm")
        )
    )
    ch = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], "channel string, bit long"
    )
    exposed = (
        ch.join(
            F.broadcast(seg),
            F.expr("(mask & bit) <> 0"),
            "left",
        )
        .groupBy("channel")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_exposed"),
            F.coalesce(F.sum("c"), F.lit(0))
            .cast("long")
            .alias("n_conv_exposed"),
        )
    )
    return shap.join(exposed, "channel")


# ---------------------------------------------------------------------------
# Rate limiting / throttling
# ---------------------------------------------------------------------------

_THROTTLE_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_id,
           row_number() OVER (
               PARTITION BY user_id, epoch_us(ts) // 600000000
               ORDER BY ts, event_id
           ) AS rk
    FROM events
)
SELECT user_id,
       CAST(count(CASE WHEN rk = 1 THEN 1 END) AS INT) AS n_kept,
       CAST(count(CASE WHEN rk > 1 THEN 1 END) AS INT) AS n_suppressed,
       CAST(sum(CASE WHEN rk = 1 THEN event_id END) AS BIGINT)
           AS kept_id_checksum
FROM ranked
GROUP BY user_id
"""


@register(
    "rate_limit_throttle",
    _THROTTLE_ORACLE,
    doc="rate limiter: at most one event per user per 10-minute "
    "tumbling window — the earliest (ts, event_id) in each window is "
    "kept, the rest counted as suppressed. The kept_id_checksum "
    "(sum of surviving event ids) pins WHICH events were kept, not "
    "just how many. This is the batch analog of the reference's "
    "access-throttle concern (reference circuit breaker: "
    "/root/reference/services/circuit_breaker.py). Scale: window id "
    "is computed row-side (epoch//600s, no session state), so the "
    "whole operator is one shuffle on (user_id, window) — "
    "embarrassingly parallel, and the per-key row_number frame is "
    "bounded by a single user's 10-minute burst.",
)
def rate_limit_throttle(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    win = F.expr("unix_micros(ts) div 600000000")
    rk = F.row_number().over(
        W.partitionBy("user_id", "win").orderBy("ts", "event_id")
    )
    ranked = ev.select(
        "user_id", "event_id", "ts", win.alias("win")
    ).withColumn("rk", rk)
    return ranked.groupBy("user_id").agg(
        F.count(F.when(F.col("rk") == 1, 1)).cast("int").alias("n_kept"),
        F.count(F.when(F.col("rk") > 1, 1))
        .cast("int")
        .alias("n_suppressed"),
        F.sum(F.when(F.col("rk") == 1, F.col("event_id"))).alias(
            "kept_id_checksum"
        ),
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching (MATCH_RECOGNIZE analog)
# ---------------------------------------------------------------------------

_SEQ_ORACLE = """
WITH seqs AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
    FROM events
    GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS INT) AS seq_len,
       CAST((length(seq) - length(replace(seq, 'cp', ''))) // 2
            AS INT) AS n_click_then_purchase,
       regexp_matches(seq, 'p.*e') AS purchase_then_error
FROM seqs
"""


@register(
    "seq_pattern_match",
    _SEQ_ORACLE,
    doc="MATCH_RECOGNIZE-style sequence pattern matching: each user's "
    "event-type timeline becomes a character string (one char per "
    "event, ordered by ts with event_id tie-break) and patterns are "
    "regexes over it — 'cp' counts click-immediately-then-purchase "
    "adjacencies, 'p.*e' flags purchase-eventually-followed-by-error. "
    "Exactness: adjacency count via length-delta of replace() (the "
    "pattern is 2 distinct chars so matches can't overlap), identical "
    "on both engines; ordering is total. Scale: ONE shuffle "
    "(groupBy user), per-user state is the user's own event count; "
    "a pathological user's string is bounded by their events, the "
    "same skew exposure as collect_list sessionization. The regex "
    "runs per user row, JVM-side, codegen'd — no Python.",
)
def seq_pattern_match(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    timeline = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    seq = F.array_join(
        F.transform(timeline, lambda x: F.substring(x["event_type"], 1, 1)),
        "",
    )
    seqs = ev.groupBy("user_id").agg(seq.alias("seq"))
    return seqs.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        F.expr(
            "(length(seq) - length(replace(seq, 'cp', ''))) div 2"
        )
        .cast("int")
        .alias("n_click_then_purchase"),
        F.col("seq").rlike("p.*e").alias("purchase_then_error"),
    )


# ---------------------------------------------------------------------------
# Interval coalescing (merge overlapping activity intervals)
# ---------------------------------------------------------------------------

_COALESCE_ORACLE = """
WITH iv AS (
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS s,
           CAST(epoch_us(ts) AS BIGINT) + 300000000 AS e
    FROM events
), m AS (
    SELECT user_id, s, e,
           max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
    FROM iv
), fl AS (
    SELECT user_id, s, e,
           CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nf
    FROM m
), isl AS (
    SELECT user_id, s, e,
           sum(nf) OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS UNBOUNDED PRECEDING) AS island
    FROM fl
), g AS (
    SELECT user_id, island, min(s) AS st, max(e) AS en
    FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS INT) AS n_intervals,
       CAST(sum(en - st) AS BIGINT) AS total_span_us,
       CAST(max(en - st) AS BIGINT) AS longest_us
FROM g GROUP BY user_id
"""


@register(
    "window_interval_coalesce",
    _COALESCE_ORACLE,
    doc="interval coalescing: each event opens a 5-minute activity "
    "interval; overlapping intervals per user merge into maximal "
    "islands (the gaps-and-islands running-max recipe: an interval "
    "starts a new island iff its start exceeds the max end of ALL "
    "preceding intervals, then islands are running sums of the "
    "new-island flags). Reports interval count, total coalesced "
    "span and the longest island per user — the generalized form "
    "of sessionization when events carry durations (media plays, "
    "meetings, locks). Exactness: all arithmetic is BIGINT "
    "microseconds; the (s, e) ordering is total within a user "
    "because equal (s, e) rows merge either way. Scale: both "
    "windows and the final agg partition by user_id — per-key "
    "frames are a user's own events, one shuffle total.",
)
def window_interval_coalesce(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("e"),
    )
    word = W.partitionBy("user_id").orderBy("s", "e")
    m = iv.withColumn(
        "pmax",
        F.max("e").over(word.rowsBetween(W.unboundedPreceding, -1)),
    )
    fl = m.withColumn(
        "nf",
        F.when(
            F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
        ).otherwise(0),
    )
    isl = fl.withColumn(
        "island",
        F.sum("nf").over(word.rowsBetween(W.unboundedPreceding, 0)),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    return g.groupBy("user_id").agg(
        F.count("*").cast("int").alias("n_intervals"),
        F.sum(F.col("en") - F.col("st")).alias("total_span_us"),
        F.max(F.col("en") - F.col("st")).alias("longest_us"),
    )


# ---------------------------------------------------------------------------
# Per-type daily-volume trend (exact OLS slope)
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
), base AS (
    SELECT event_type, d, c,
           -- BIGINT x (r10 timestamp-pathology find): a multi-century
           -- corpus span makes x*x overflow 32-bit day counts
           CAST(date_diff('day', min(d) OVER (PARTITION BY event_type),
                          d) AS BIGINT) AS x
    FROM daily
), s AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(c) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(x * c) AS BIGINT) AS sxy
    FROM base GROUP BY event_type
)
SELECT event_type,
       CAST(n AS INT) AS n_days,
       -- nullif (r11 hostile-key fixture find): a type active on ONE
       -- day has den = 0 — slope is undefined, and Spark's ANSI `/`
       -- would kill the whole job on that one group
       CAST(n * sxy - sx * sy AS DOUBLE)
           / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS slope,
       CAST(sy * sxx - sx * sxy AS DOUBLE)
           / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS intercept
FROM s
"""


@register(
    "ts_daily_trend_slope",
    _TREND_ORACLE,
    doc="per-event-type volume trend: exact OLS slope + intercept of "
    "daily counts against day index (x = days since the type's first "
    "active day, so calendar gaps keep their true spacing). "
    "Exactness: all five sufficient statistics (n, Σx, Σy, Σx², Σxy) "
    "are BIGINT; slope and intercept are each ONE division of two "
    "exact integers — the same normal-equations recipe as "
    "stats_ols_user_spend, here grouped per key (many small models "
    "in one pass, the feature-engineering shape). Scale: one "
    "partial-agg shuffle to daily grain; the per-type regression is "
    "a second tiny hash agg. No windows over raw events.",
)
def ts_daily_trend_slope(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    # cast to long (r10 timestamp-pathology find): datediff returns
    # int32, and x*x overflows it — an ANSI job-killer — once the
    # corpus spans > ~46k days' worth of x; sufficient statistics must
    # accumulate in BIGINT end-to-end.
    base = daily.withColumn(
        "x",
        F.datediff(
            F.col("d"), F.min("d").over(W.partitionBy("event_type"))
        ).cast("long"),
    )
    s = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("c")).alias("sxy"),
    )
    # nullif (r11 hostile-key fixture find): one single-active-day
    # event type makes den = 0 and ANSI division kills the JOB, not
    # the row — undefined regressions must be NULL, like the oracle.
    den = F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ),
        F.lit(0.0),
    )
    return s.select(
        "event_type",
        F.col("n").cast("int").alias("n_days"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / den
        ).alias("slope"),
        (
            (
                F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
            ).cast("double")
            / den
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile
# ---------------------------------------------------------------------------

_DOW_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
), dow AS (
    SELECT event_type, d, c, isodow(d) AS dw FROM daily
), base AS (
    SELECT event_type, dw,
           CAST(sum(c) AS BIGINT) AS dow_total,
           CAST(count(*) AS BIGINT) AS dow_days
    FROM dow GROUP BY 1, 2
)
SELECT o.event_type, o.d,
       CAST(o.dw AS INT) AS iso_dow,
       CAST(o.c AS BIGINT) AS n_events,
       CAST(o.c * b.dow_days AS DOUBLE) / b.dow_total AS seasonal_ratio
FROM dow o JOIN base b ON o.event_type = b.event_type AND o.dw = b.dw
"""


@register(
    "ts_seasonality_dow_profile",
    _DOW_ORACLE,
    doc="day-of-week seasonality: each (type, day)'s volume as a ratio "
    "to that type's average volume on the SAME weekday — the "
    "deseasonalized view that stops Monday peaks from tripping "
    "volume alerts (compose with ts_cusum_changepoint / "
    "anomaly_daily_event_volume, which see raw counts). Exactness: "
    "ratio = c * dow_days / dow_total is ONE division of two exact "
    "BIGINTs (the weekday mean is never materialized as a float); "
    "ISO weekday numbering (Mon=1) matches dayofweek conventions on "
    "both engines via explicit iso mapping. Scale: daily grain "
    "(one partial-agg shuffle), then a 7-row-per-type baseline "
    "joined back — metadata-scale both sides.",
)
def ts_seasonality_dow_profile(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    # Spark dayofweek: Sun=1..Sat=7; ISO (Mon=1..Sun=7) via weekday()+1.
    dow = daily.withColumn("dw", F.weekday("d") + F.lit(1))
    base = dow.groupBy("event_type", "dw").agg(
        F.sum("c").alias("dow_total"),
        F.count("*").alias("dow_days"),
    )
    return dow.join(base, ["event_type", "dw"]).select(
        "event_type",
        "d",
        F.col("dw").cast("int").alias("iso_dow"),
        F.col("c").cast("long").alias("n_events"),
        (
            (F.col("c") * F.col("dow_days")).cast("double")
            / F.col("dow_total")
        ).alias("seasonal_ratio"),
    )


# ---------------------------------------------------------------------------
# Rolling median (robust smoother)
# ---------------------------------------------------------------------------

_ROLLMED_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
)
SELECT event_type, d,
       CAST(c AS BIGINT) AS n_events,
       quantile_cont(c, 0.5) OVER (
           PARTITION BY event_type ORDER BY d
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median,
       CAST(count(*) OVER (
           PARTITION BY event_type ORDER BY d
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS INT) AS n_in_frame
FROM daily
"""


@register(
    "ts_rolling_median_volume",
    _ROLLMED_ORACLE,
    doc="trailing 7-day rolling MEDIAN of daily event volume per type — "
    "the robust smoother that shrugs off single-day spikes which pull "
    "ts_ewma_daily_volume's mean (compose: spike detection = raw vs "
    "rolling median). Exactness: the frame holds <= 7 BIGINT counts; "
    "an odd frame's median is an exact element and an even frame's is "
    "the mean of two BIGINTs — one exact double op, the same "
    "binary-exact-interpolation argument as funnel_time_to_convert "
    "(only the 0.5 quantile has this property). Scale: one "
    "partial-agg shuffle to daily grain, then a 7-row frame per "
    "type on the metadata-scale daily table.",
)
def ts_rolling_median_volume(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    frame = (
        W.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "d",
        F.col("c").cast("long").alias("n_events"),
        F.expr("percentile(c, 0.5)")
        .over(frame)
        .alias("rolling_median"),
        F.count("*").over(frame).cast("int").alias("n_in_frame"),
    )


# ---------------------------------------------------------------------------
# Activity bitmaps (roaring-bitmap-style day encoding)
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
WITH anchor AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
days AS (
    SELECT DISTINCT user_id,
           date_diff('day', (SELECT d0 FROM anchor), CAST(ts AS DATE))
               AS day_idx
    FROM events
), masks AS (
    SELECT user_id,
           bit_or(CAST(1 AS BIGINT) << day_idx) AS mask,
           count(*) AS n_active_days,
           min(day_idx) AS first_day,
           max(day_idx) AS last_day
    FROM days GROUP BY user_id
)
SELECT user_id,
       mask,
       CAST(n_active_days AS INT) AS n_active_days,
       CAST(first_day AS INT) AS first_day,
       CAST(last_day AS INT) AS last_day,
       CAST(last_day - first_day + 1 - n_active_days AS INT)
           AS n_gap_days
FROM masks
"""


@register(
    "agg_activity_bitmap",
    _BITMAP_ORACLE,
    doc="activity bitmaps: each user's active-day set packed into one "
    "BIGINT (bit i = active on day i since corpus start) via bit_or "
    "of shifted ones — the roaring-bitmap idea that turns day-list "
    "set operations (retention overlap, churn windows, cohort "
    "intersections) into single-word bitwise ops. One distinct pass "
    "+ one bit_or hash agg; the 64-bit word covers this corpus's "
    "30-day span, and the documented scale form is an array of words "
    "keyed by (user, epoch_week) — same aggregation shape, unbounded "
    "horizon. Gap-day count (span minus active) falls out in integer "
    "arithmetic. The corpus-start anchor is a 1-row broadcast "
    "scalar.",
)
def agg_activity_bitmap(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    anchor = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    days = (
        ev.join(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.col("d0")).alias("day_idx"),
        )
        .distinct()
    )
    # Enforce the single-word horizon LOUDLY: DuckDB raises Out of
    # Range for shift >= 64 while Spark shiftleft silently wraps the
    # shift amount mod 64 (day N aliases onto day N-64). assert_true
    # inside a pass-through filter (coalesce(NULL, true)) cannot be
    # pruned by Catalyst, so both engines now fail the same way; the
    # documented scale form past 64 days is words keyed by
    # (user, epoch_week).
    days = days.filter(
        F.coalesce(
            F.assert_true(
                F.col("day_idx") <= F.lit(63),
                F.lit(
                    "agg_activity_bitmap: corpus spans > 64 days — "
                    "use the (user, epoch_week) word-array form"
                ),
            ),
            F.lit(True),
        )
    )
    masks = days.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), day_idx)")).alias(
            "mask"
        ),
        F.count("*").alias("n_active_days"),
        F.min("day_idx").alias("first_day"),
        F.max("day_idx").alias("last_day"),
    )
    return masks.select(
        "user_id",
        "mask",
        F.col("n_active_days").cast("int").alias("n_active_days"),
        F.col("first_day").cast("int").alias("first_day"),
        F.col("last_day").cast("int").alias("last_day"),
        (
            F.col("last_day") - F.col("first_day") + 1 - F.col("n_active_days")
        )
        .cast("int")
        .alias("n_gap_days"),
    )


# ---------------------------------------------------------------------------
# Weekly autocorrelation (seasonality strength)
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
), pair AS (
    SELECT a.event_type, a.c AS y, b.c AS x
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND b.d = a.d - 7
), m AS (
    SELECT event_type,
           CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(x * x) AS HUGEINT) AS sxx,
           CAST(sum(y * y) AS HUGEINT) AS syy,
           CAST(sum(x * y) AS HUGEINT) AS sxy
    FROM pair GROUP BY event_type
)
SELECT event_type,
       CAST(n AS INT) AS n_pairs,
       CAST(CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END AS INT)
           AS r_sign,
       CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
       / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)
           AS r_squared
FROM m
"""


@register(
    "ts_autocorr_weekly",
    _AUTOCORR_ORACLE,
    doc="lag-7 autocorrelation of daily volume per event type — the "
    "seasonality-strength statistic that decides whether "
    "ts_seasonality_dow_profile's weekday baseline is even "
    "justified. Exactness: the five raw moments accumulate in "
    "DECIMAL(38)/HUGEINT (their products overflow int64, the "
    "stats_ols_user_spend recipe), r² is ONE division of two "
    "exactly-agreed values, and the correlation sign is pure "
    "integer — sqrt never happens. Scale: daily grain (one "
    "partial-agg shuffle), self-join on (type, day-7) over the "
    "metadata-scale daily table, one tiny moment aggregate.",
)
def ts_autocorr_weekly(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    a = daily.select(
        F.col("event_type").alias("t"),
        F.col("d").alias("da"),
        F.col("c").alias("y"),
    )
    b = daily.select(
        F.col("event_type").alias("tb"),
        F.col("d").alias("db"),
        F.col("c").alias("x"),
    )
    pair = a.join(
        b,
        (F.col("t") == F.col("tb"))
        & (F.col("db") == F.date_sub(F.col("da"), 7)),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    # Lift each factor to DECIMAL BEFORE multiplying and sum in
    # decimal (the feat_interarrival_stats recipe) — summing x*x in
    # BIGINT silently overflows int64 once daily counts reach ~3e9,
    # while the oracle accumulates in HUGEINT.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = pair.groupBy(F.col("t").alias("event_type")).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        dec(F.sum(xd)).alias("sx"),
        dec(F.sum(yd)).alias("sy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    # nullif the denominator: a type with a single lag pair (n=1) or a
    # constant series has zero variance, where DuckDB's double x/0
    # yields NULL but Spark's ANSI `/` throws DIVIDE_BY_ZERO — both
    # engines must agree on NULL (the agg_stats_moments guard).
    return m.select(
        "event_type",
        F.col("n").cast("int").alias("n_pairs"),
        F.when(num >= 0, 1).otherwise(-1).cast("int").alias("r_sign"),
        (
            (num * num).cast("double")
            / F.nullif(den.cast("double"), F.lit(0.0))
        ).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# Cumulative share (market share over time)
# ---------------------------------------------------------------------------

_CUMSHARE_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
), cum AS (
    SELECT event_type, d, c,
           sum(c) OVER (PARTITION BY event_type ORDER BY d
                        ROWS UNBOUNDED PRECEDING) AS running,
           sum(c) OVER (PARTITION BY event_type) AS total
    FROM daily
)
SELECT event_type, d,
       CAST(c AS BIGINT) AS n_events,
       CAST(running AS BIGINT) AS running_total,
       CAST(running AS DOUBLE) / total AS pct_complete
FROM cum
"""


@register(
    "window_cumulative_share",
    _CUMSHARE_ORACLE,
    doc="cumulative completion share: each (type, day)'s running event "
    "total as a fraction of the type's whole-period volume — the "
    "'how much of the quarter's traffic had arrived by day d' read "
    "behind pacing dashboards and backfill progress bars. Exactness: "
    "running and total are BIGINT window sums over the daily "
    "aggregate; the share is one exact division per row. Scale: "
    "daily grain first (one partial-agg shuffle), windows on the "
    "metadata-scale daily table partitioned by type.",
)
def window_cumulative_share(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    wall = W.partitionBy("event_type")
    run = F.sum("c").over(
        wall.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    )
    tot = F.sum("c").over(wall)
    return daily.select(
        "event_type",
        "d",
        F.col("c").cast("long").alias("n_events"),
        run.cast("long").alias("running_total"),
        (run.cast("double") / tot).alias("pct_complete"),
    )


# ---------------------------------------------------------------------------
# Daily value bands (exact discrete quantiles)
# ---------------------------------------------------------------------------

_BANDS_ORACLE = """
WITH p AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT) AS vm,
           event_id
    FROM events WHERE event_type = 'purchase' AND (CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END IS NOT NULL)
), rk AS (
    SELECT d, vm,
           row_number() OVER (PARTITION BY d ORDER BY vm, event_id) AS r,
           count(*) OVER (PARTITION BY d) AS n
    FROM p
)
SELECT d,
       CAST(max(n) AS INT) AS n_purchases,
       max(CASE WHEN r = CAST(ceil(0.1 * n) AS BIGINT) THEN vm END)
           AS p10_micro,
       max(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT) THEN vm END)
           AS p50_micro,
       max(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT) THEN vm END)
           AS p90_micro
FROM rk GROUP BY d
"""


@register(
    "ts_value_band_profile",
    _BANDS_ORACLE,
    doc="daily purchase-value bands: exact DISCRETE P10/P50/P90 per "
    "day in fixed-point micro-units — the percentile ribbons behind "
    "'typical order value' dashboards. Discrete semantics (the "
    "element at rank ceil(q*n), (value, event_id) total order) "
    "means NO interpolation ever happens, so any quantile is exact "
    "BIGINT — the general-q complement to funnel_time_to_convert's "
    "median-only interpolated form. ceil(q*n) is computed on "
    "doubles whose inputs are small integers (exact in binary for "
    "q = 0.1/0.5/0.9 times any n < 2^50... the CASE rank-pick makes "
    "engine agreement structural, not numeric: both engines pick "
    "the SAME rank or the hash fails loudly). One window + one "
    "conditional agg per day partition.",
)
def ts_value_band_profile(spark, sf_dir):
    from feature_store_2_spark.functions.num import is_exact_value

    ev = load_table(spark, "events", sf_dir)
    # is_exact_value (r10): an unrepresentable magnitude has no place
    # in a rank-picked quantile — NULL vm rows rank differently on the
    # two engines, so they are excluded at intake like NaN/Inf.
    p = ev.filter(
        (F.col("event_type") == "purchase")
        & is_exact_value(F.col("value"))
    ).select(
        F.to_date("ts").alias("d"),
        (F.col("value").try_cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("vm"),
        "event_id",
    )
    w = W.partitionBy("d")
    rk = p.select(
        "d",
        "vm",
        F.row_number().over(w.orderBy("vm", "event_id")).alias("r"),
        F.count("*").over(w).alias("n"),
    )

    def pick(q):
        target = F.ceil(F.lit(q) * F.col("n")).cast("long")
        return F.max(F.when(F.col("r") == target, F.col("vm")))

    return rk.groupBy("d").agg(
        F.max("n").cast("int").alias("n_purchases"),
        pick(0.1).alias("p10_micro"),
        pick(0.5).alias("p50_micro"),
        pick(0.9).alias("p90_micro"),
    )


# ---------------------------------------------------------------------------
# Peak interval concurrency (sweep line)
# ---------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
WITH b AS (
    SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
    UNION ALL
    SELECT event_type, epoch_us(ts) + 1800000000 AS t, -1 AS d
    FROM events
), net AS (
    SELECT event_type, t, sum(d) AS nd FROM b GROUP BY event_type, t
), run AS (
    SELECT event_type,
           sum(nd) OVER (PARTITION BY event_type ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS conc
    FROM net
)
SELECT event_type,
       CAST(max(conc) AS BIGINT) AS peak_concurrency,
       CAST(count(*) AS BIGINT) AS n_boundaries
FROM run GROUP BY event_type
"""


@register(
    "window_max_concurrency",
    _CONCURRENCY_ORACLE,
    doc="peak interval concurrency via the sweep line: each event opens "
    "a 30-minute activity interval [ts, ts+30m); +1/-1 boundary "
    "deltas are NETTED per distinct timestamp first (so intra-tie "
    "ordering can never matter — the half-open convention lands "
    "both deltas of a touching pair on one timestamp and they "
    "cancel in the group), then one running sum per event type "
    "gives live-interval count and its max is the peak — the "
    "capacity-planning number (max concurrent sessions/locks/"
    "streams) interval_coalesce's islands can't express. Exactness: "
    "pure BIGINT microsecond arithmetic. Scale: boundaries collapse "
    "onto DISTINCT timestamps before the window (the value-"
    "histogram move), and the per-type running sum RUNS as "
    "range-partitioned partials + broadcast prefix offsets "
    "(operators/global_window.py) — ~n distinct boundary "
    "timestamps scan in parallel bucket tasks instead of one task "
    "per event type; value-identical by boundary-independence "
    "(tests/test_global_window.py).",
)
def window_max_concurrency(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    t = F.unix_micros("ts")
    starts = ev.select(
        "event_type", t.alias("t"), F.lit(1).alias("d")
    )
    ends = ev.select(
        "event_type",
        (t + F.lit(1_800_000_000)).alias("t"),
        F.lit(-1).alias("d"),
    )
    net = (
        starts.unionByName(ends)
        .groupBy("event_type", "t")
        .agg(F.sum("d").alias("nd"))
    )
    run = bucketed_running_sum(
        net,
        "t",
        ["t"],
        F.col("nd"),
        "conc",
        partition_cols=["event_type"],
    ).select("event_type", "conc")
    return run.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.count("*").cast("long").alias("n_boundaries"),
    )


_SNAIVE_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
    FROM events GROUP BY 1, 2)
SELECT a.event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(a.c - f.c)) AS BIGINT) AS sum_abs_err,
       CAST(sum(abs(a.c - f.c)) AS DOUBLE) / count(*) AS mae,
       CAST(sum(a.c - f.c) AS DOUBLE) / count(*) AS mean_err
FROM daily a
JOIN daily f ON a.event_type = f.event_type
            AND a.d = f.d + INTERVAL 7 DAY
GROUP BY a.event_type
"""


@register(
    "eval_seasonal_naive_backtest",
    _SNAIVE_ORACLE,
    doc="Forecast-baseline backtest: the seasonal-naive predictor "
    "(forecast for day d = actual at d-7, the week-periodic "
    "no-skill baseline every real forecaster must beat) scored "
    "per event type with MAE and signed bias. Errors are integer "
    "(daily counts), so the sums are exact and each reported "
    "metric is ONE division — no floating accumulation. Days "
    "without a d-7 observation are excluded on both sides by the "
    "equi-join (well-defined gap semantics). Scale shape: one "
    "daily pre-agg with map-side combine, a self-equi-join on "
    "(type, date) — the joined frame is |types| x |days|, already "
    "thousands of times smaller than the fact table.",
)
def eval_seasonal_naive_backtest(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("c"))
    f = daily.select(
        "event_type",
        F.date_add("d", 7).alias("d"),
        F.col("c").alias("fc"),
    )
    j = daily.join(f, ["event_type", "d"])
    err = F.col("c") - F.col("fc")
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum(F.abs(err)).alias("sum_abs_err"),
        (F.sum(F.abs(err)).cast("double") / F.count("*")).alias("mae"),
        (F.sum(err).cast("double") / F.count("*")).alias("mean_err"),
    )


_NEW_RETURNING_ORACLE = """
WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
firsts AS (SELECT user_id, min(d) AS first_d FROM ud GROUP BY 1)
SELECT ud.d,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN ud.d = f.first_d THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(sum(CASE WHEN ud.d > f.first_d THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returning
FROM ud JOIN firsts f ON ud.user_id = f.user_id
GROUP BY ud.d
"""


@register(
    "ts_new_vs_returning_daily",
    _NEW_RETURNING_ORACLE,
    doc="New-vs-returning decomposition of daily actives — the growth "
    "accounting behind every DAU chart (is growth acquisition or "
    "retention?). First-activity date per user from the deduped "
    "(user, day) grain, then each active day splits into new "
    "(first day) and returning; n_new + n_returning = n_active by "
    "construction. Scale shape: one (user, day) dedup (the "
    "rollup_distinct_users_time shuffle), a per-user min over the "
    "collapsed output, and a user-keyed join of two already-small "
    "frames. All counts exact integers.",
)
def ts_new_vs_returning_daily(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    j = ud.join(firsts, "user_id")
    return j.groupBy("d").agg(
        F.count("*").alias("n_active"),
        F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("d") > F.col("first_d"), 1).otherwise(0))
        .cast("long")
        .alias("n_returning"),
    )


_STICKINESS_ORACLE = """
WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
daily AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
monthly AS (
    SELECT CAST(year(d) AS BIGINT) AS y, CAST(month(d) AS BIGINT) AS m,
           CAST(sum(dau) AS BIGINT) AS dau_sum,
           CAST(count(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1, 2),
mau AS (
    SELECT CAST(year(d) AS BIGINT) AS y, CAST(month(d) AS BIGINT) AS m,
           CAST(count(DISTINCT user_id) AS BIGINT) AS mau
    FROM ud GROUP BY 1, 2)
SELECT y, m, dau_sum, n_days, mau,
       CAST(dau_sum AS DOUBLE) / n_days AS avg_dau,
       CAST(dau_sum AS DOUBLE) / (n_days * mau) AS stickiness
FROM monthly JOIN mau USING (y, m)
"""


@register(
    "ts_stickiness_dau_mau",
    _STICKINESS_ORACLE,
    doc="DAU/MAU stickiness per month — the engagement ratio every "
    "growth team tracks (what fraction of the monthly audience shows "
    "up on an average day). avg_dau and stickiness are each ONE "
    "division of exact integer operands (the denominator n_days*mau "
    "is multiplied as integers first), so both engines emit "
    "bit-identical doubles. Scale shape: the (user, day) dedup "
    "shuffle dominates (shared with rollup_distinct_users_time); "
    "everything downstream runs on day- and month-grain frames.",
)
def ts_stickiness_dau_mau(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    daily = ud.groupBy("d").agg(F.count("*").alias("dau"))
    monthly = daily.groupBy(
        F.year("d").cast("long").alias("y"),
        F.month("d").cast("long").alias("m"),
    ).agg(
        F.sum("dau").cast("long").alias("dau_sum"),
        F.count("*").alias("n_days"),
    )
    mau = ud.groupBy(
        F.year("d").cast("long").alias("y"),
        F.month("d").cast("long").alias("m"),
    ).agg(F.countDistinct("user_id").alias("mau"))
    j = monthly.join(mau, ["y", "m"])
    return j.select(
        "y",
        "m",
        "dau_sum",
        "n_days",
        "mau",
        (F.col("dau_sum").cast("double") / F.col("n_days")).alias("avg_dau"),
        (
            F.col("dau_sum").cast("double") / (F.col("n_days") * F.col("mau"))
        ).alias("stickiness"),
    )


_ACTIVITY_HIST_ORACLE = """
WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
per_user AS (
    SELECT CAST(year(d) AS BIGINT) AS y, CAST(month(d) AS BIGINT) AS m,
           user_id, CAST(count(*) AS BIGINT) AS active_days
    FROM ud GROUP BY 1, 2, 3)
SELECT y, m, active_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1, 2, 3
"""


@register(
    "ts_activity_histogram",
    _ACTIVITY_HIST_ORACLE,
    doc="Power-user curve (the L28-style activity histogram): per "
    "month, how many users were active exactly k days — the "
    "engagement-depth distribution behind habit metrics, plotted as "
    "the classic smile/frown curve. Two exact hash aggs over the "
    "deduped (user, day) grain: per-(month, user) day counts, then "
    "the k-bucket fold; every shuffle after the dedup runs on "
    "already-collapsed frames. All-integer output.",
)
def ts_activity_histogram(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    per_user = ud.groupBy(
        F.year("d").cast("long").alias("y"),
        F.month("d").cast("long").alias("m"),
        "user_id",
    ).agg(F.count("*").alias("active_days"))
    return per_user.groupBy("y", "m", "active_days").agg(
        F.count("*").alias("n_users")
    )


_HOUR_DOW_ORACLE = """
WITH cells AS (
    SELECT event_type,
           CAST(isodow(ts) AS BIGINT) AS iso_dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2, 3),
tot AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total
        FROM cells GROUP BY 1)
SELECT c.event_type, c.iso_dow, c.hod, c.n_events,
       CAST(c.n_events * 1000000 // t.total AS BIGINT) AS share_ppm
FROM cells c JOIN tot t ON c.event_type = t.event_type
"""


@register(
    "ts_seasonality_hour_dow",
    _HOUR_DOW_ORACLE,
    doc="Hour-of-day x day-of-week seasonality heatmap per event type — "
    "the 24x7 activity fingerprint behind staffing/alerting "
    "baselines (complements ts_seasonality_dow_profile's daily "
    "grain). Cell share is integer ppm via floor-DIV (the repo's "
    "zero-division idiom); ISO weekday numbering on both engines "
    "(Spark weekday()+1 == DuckDB isodow). Scale shape: one "
    "conditional-free hash agg straight off the scan (at most "
    "types x 168 cells survive), then a broadcastable per-type "
    "total join-back.",
)
def ts_seasonality_hour_dow(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        "event_type",
        (F.weekday("ts") + F.lit(1)).cast("long").alias("iso_dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count("*").alias("n_events"))
    tot = cells.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("total")
    )
    return cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "iso_dow",
        "hod",
        "n_events",
        F.expr("CAST(n_events * 1000000 div total AS BIGINT)").alias(
            "share_ppm"
        ),
    )


_PV_DECOMP_ORACLE = """
WITH monthly AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS vol,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS rev
    FROM orders GROUP BY 1, 2),
seq AS (
    SELECT *,
           lag(vol) OVER w AS vol_p,
           lag(rev) OVER w AS rev_p
    FROM monthly WINDOW w AS (ORDER BY y, m))
SELECT y, m, vol, rev,
       rev - rev_p AS d_rev,
       (vol - vol_p) * (rev_p / vol_p) AS volume_effect,
       vol * (rev / vol - rev_p / vol_p) AS price_effect
FROM seq WHERE vol_p IS NOT NULL AND vol_p > 0
"""


@register(
    "stats_revenue_price_volume_decomp",
    _PV_DECOMP_ORACLE,
    doc="Price/volume decomposition of month-over-month revenue change "
    "— the FP&A waterfall (how much of the revenue move came from "
    "MORE orders vs PRICIER orders): volume_effect = dVol * "
    "avg_price_prev, price_effect = vol * d(avg_price); the two sum "
    "to d_rev exactly by algebraic identity (pytest-pinned). "
    "Exactness: monthly revenue is a DECIMAL sum string-routed to "
    "double ONCE (the d2d recipe), then every downstream value is a "
    "short identical IEEE chain on those agreed doubles — no float "
    "accumulation anywhere. Scale shape: one month-grain agg with "
    "map-side combine, a 1-row-per-month lag window.",
)
def stats_revenue_price_volume_decomp(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.count("*").alias("vol"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .cast("double")
        .alias("rev"),
    )
    w = W.orderBy("y", "m")
    seq = monthly.withColumn("vol_p", F.lag("vol").over(w)).withColumn(
        "rev_p", F.lag("rev").over(w)
    )
    avg_p = F.col("rev_p") / F.col("vol_p")
    avg_c = F.col("rev") / F.col("vol")
    return seq.filter(
        F.col("vol_p").isNotNull() & (F.col("vol_p") > 0)
    ).select(
        "y",
        "m",
        "vol",
        "rev",
        (F.col("rev") - F.col("rev_p")).alias("d_rev"),
        ((F.col("vol") - F.col("vol_p")) * avg_p).alias("volume_effect"),
        (F.col("vol") * (avg_c - avg_p)).alias("price_effect"),
    )


_WAU_OVERLAP_ORACLE = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS DATE) AS week_start
    FROM events),
weeks AS (SELECT week_start, CAST(count(*) AS BIGINT) AS wau
          FROM uw GROUP BY 1),
ret AS (
    SELECT a.week_start, CAST(count(*) AS BIGINT) AS n_retained
    FROM uw a JOIN uw b
      ON a.user_id = b.user_id
     AND b.week_start = a.week_start + 7
    GROUP BY 1)
SELECT w.week_start,
       w.wau,
       nxt.wau AS wau_next,
       COALESCE(r.n_retained, 0) AS n_retained,
       CAST(COALESCE(r.n_retained, 0) AS DOUBLE) / w.wau AS wow_retention
FROM weeks w
JOIN weeks nxt ON nxt.week_start = w.week_start + 7
LEFT JOIN ret r ON r.week_start = w.week_start
"""


@register(
    "ts_weekly_audience_overlap",
    _WAU_OVERLAP_ORACLE,
    doc="Week-over-week audience retention — of this week's active "
    "users, how many return NEXT week (the unbounded-cohort "
    "complement to cohort_retention's signup cohorts; the curve "
    "every WAU chart hides). (user, week) dedup once, then a "
    "user-keyed self-join shifted by exactly one week-start; "
    "retention is ONE division of exact counts. Weeks are keyed "
    "DIRECTLY by their Monday date (date_trunc week on both "
    "engines) — never by (year, weekofyear), which collides two "
    "distinct ISO weeks whose Mondays share a calendar year (ISO "
    "week 1 of 2024 starts 2024-01-01 and ISO week 1 of 2025 "
    "starts 2024-12-30; both map to (2024, 1) — the r7 advisor "
    "finding, pinned by the Dec/Jan adversarial fixture). "
    "Consecutive weeks matched by date arithmetic. Scale shape: "
    "the dedup shuffle dominates; the shifted self-join runs on "
    "the collapsed (user, week) frame.",
)
def ts_weekly_audience_overlap(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    uw = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
    ).distinct()
    weeks = uw.groupBy("week_start").agg(F.count("*").alias("wau"))
    b = uw.select(
        F.col("user_id").alias("user_id_b"),
        F.col("week_start").alias("next_start"),
    )
    ret = (
        uw.join(
            b,
            (uw["user_id"] == b["user_id_b"])
            & (b["next_start"] == F.date_add(uw["week_start"], 7)),
        )
        .groupBy(uw["week_start"])
        .agg(F.count("*").alias("n_retained"))
    )
    nxt = weeks.select(
        F.col("week_start").alias("ws_next"), F.col("wau").alias("wau_next")
    )
    j = (
        weeks.join(nxt, nxt["ws_next"] == F.date_add(weeks["week_start"], 7))
        .join(ret, "week_start", "left")
    )
    return j.select(
        "week_start",
        "wau",
        "wau_next",
        F.coalesce(F.col("n_retained"), F.lit(0)).alias("n_retained"),
        (
            F.coalesce(F.col("n_retained"), F.lit(0)).cast("double")
            / F.col("wau")
        ).alias("wow_retention"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of revenue concentration (round 9)
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH rev AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS crev
    FROM orders GROUP BY 1
), rk AS (
    SELECT crev,
           row_number() OVER (ORDER BY crev, o_custkey) AS rn
    FROM rev
), s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(crev) AS total,
           sum(rn * crev) AS weighted
    FROM rk
)
SELECT n AS n_customers,
       CAST(CAST(total AS VARCHAR) AS DOUBLE) AS total_revenue,
       CAST(CAST(2 * weighted - (n + 1) * total AS VARCHAR) AS DOUBLE)
       / CAST(CAST(n * total AS VARCHAR) AS DOUBLE) AS gini
FROM s
"""


@register(
    "stats_gini_revenue",
    _GINI_ORACLE,
    doc="Gini coefficient of customer revenue concentration — the "
    "single-number inequality complement to pareto_revenue_"
    "concentration's top-k form (G = 2*Sum(i*x_i)/(n*Sum x) - "
    "(n+1)/n over ascending-sorted revenues). Exactness: revenue and "
    "the rank-weighted sum accumulate in DECIMAL (rn*crev stays "
    "exact; permuting tied revenues cannot change the sum, so the "
    "(crev, custkey) tie-break is deterministic AND value-"
    "irrelevant); the numerator 2W-(n+1)T and denominator nT are "
    "exact decimals cast to double via the varchar round-trip "
    "(the q1 idiom — DuckDB's direct decimal->double cast can be "
    "1 ulp off Spark's), and the only double op is their final "
    "division. Scale: one shuffle to customer grain, then the "
    "global ascending rank RUNS as the two-phase prefix "
    "(bucketed_row_number — no single-task corpus sort), and the "
    "rank-weighted sum is a map-side-combinable agg.",
)
def stats_gini_revenue(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("crev")
    )
    ranked = bucketed_row_number(
        rev, "crev", ["crev", "o_custkey"], out_col="rn"
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("crev").alias("total"),
        F.sum(F.col("rn") * F.col("crev")).alias("weighted"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("total").cast("double").alias("total_revenue"),
        (
            (2 * F.col("weighted") - (F.col("n") + 1) * F.col("total")).cast(
                "double"
            )
            / (F.col("n") * F.col("total")).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# ABC / XYZ inventory classification (round 9)
# ---------------------------------------------------------------------------

_ABC_XYZ_ORACLE = """
WITH pr AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev
    FROM lineitem GROUP BY 1
), cum AS (
    SELECT l_partkey, rev,
           sum(rev) OVER (ORDER BY rev DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS crun,
           sum(rev) OVER () AS total
    FROM pr
), wk AS (
    SELECT l_partkey, date_trunc('week', l_shipdate) AS w,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * 100) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
), cv AS (
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_weeks,
           sum(q) AS s1, sum(q * q) AS s2
    FROM wk GROUP BY 1
)
SELECT c.l_partkey AS partkey,
       CAST(CAST(c.rev AS VARCHAR) AS DOUBLE) AS revenue,
       CASE WHEN c.crun * 5 <= c.total * 4 THEN 'A'
            WHEN c.crun * 20 <= c.total * 19 THEN 'B'
            ELSE 'C' END AS abc_class,
       v.n_weeks,
       CASE WHEN v.n_weeks < 2 THEN 'Z'
            WHEN (v.n_weeks * v.s2 - v.s1 * v.s1) * 4
                 < v.s1 * v.s1 * (v.n_weeks - 1) THEN 'X'
            WHEN v.n_weeks * v.s2 - v.s1 * v.s1
                 < v.s1 * v.s1 * (v.n_weeks - 1) THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM cum c JOIN cv v ON c.l_partkey = v.l_partkey
"""


@register(
    "abc_xyz_part_classes",
    _ABC_XYZ_ORACLE,
    doc="ABC/XYZ inventory classification per part: ABC by cumulative "
    "revenue share (A until 80%, B until 95%, C past that — the "
    "classic Pareto cut on the revenue-DESC running sum) crossed "
    "with XYZ demand-variability classes from the coefficient of "
    "variation of weekly shipped quantity (X: cv < 0.5, Y: cv < 1, "
    "Z: else or <2 observed weeks). Exactness: every class boundary "
    "is an integer/decimal cross-multiplication — the ABC cut "
    "compares crun*5 <= total*4 on exact DECIMAL(12,2) money, and "
    "the XYZ cut works on centi-unit BIGINT quantities, comparing "
    "cv^2 via (n*s2-s1^2)*4 < s1^2*(n-1) so no sqrt or float "
    "division ever decides a class; the revenue double reports via "
    "the varchar round-trip (the q1 idiom) for bit parity. "
    "Scale: two part-grain hash aggs (revenue, weekly moments) and "
    "the global revenue-DESC running sum rides the two-phase "
    "prefix, never one sort task.",
)
def abc_xyz_part_classes(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)"))
        ).alias("rev")
    )
    pr2 = pr.withColumn("negrev", -F.col("rev"))
    cum = bucketed_running_sum(
        pr2,
        "negrev",
        ["negrev", "l_partkey"],
        F.col("rev"),
        "crun",
    ).drop("negrev")
    tot = pr.agg(F.sum("rev").alias("total"))
    wk = li.groupBy(
        "l_partkey", F.date_trunc("week", "l_shipdate").alias("w")
    ).agg(
        # centi-units: 2-decimal quantities scale to exact BIGINTs, so
        # the XYZ moment sums (s1, s2) are pure integer arithmetic with
        # no decimal-precision ceiling on q*q
        F.sum(F.col("l_quantity").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("q")
    )
    cv = wk.groupBy("l_partkey").agg(
        F.count("*").alias("n_weeks"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    var_num = F.col("n_weeks") * F.col("s2") - F.col("s1") * F.col("s1")
    mean_sq = F.col("s1") * F.col("s1")
    xyz = (
        F.when(F.col("n_weeks") < 2, "Z")
        .when(var_num * 4 < mean_sq * (F.col("n_weeks") - 1), "X")
        .when(var_num < mean_sq * (F.col("n_weeks") - 1), "Y")
        .otherwise("Z")
    )
    abc = (
        F.when(F.col("crun") * 5 <= F.col("total") * 4, "A")
        .when(F.col("crun") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
    )
    return (
        cum.join(F.broadcast(tot))
        .join(cv, "l_partkey")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("rev").cast("double").alias("revenue"),  # oracle: varchar roundtrip
            abc.alias("abc_class"),
            "n_weeks",
            xyz.alias("xyz_class"),
        )
    )


# ---------------------------------------------------------------------------
# First-touch / last-touch channel attribution (round 9)
# ---------------------------------------------------------------------------

_FIRST_LAST_TOUCH_ORACLE = """
WITH purchases AS (
    SELECT event_id AS pid, user_id, ts AS p_ts
    FROM events
    WHERE event_type = 'purchase' AND user_id IS NOT NULL
), touches AS (
    SELECT p.pid,
           min(struct_pack(t := e.ts, eid := e.event_id,
                           ch := e.event_type)) AS ft,
           max(struct_pack(t := e.ts, eid := e.event_id,
                           ch := e.event_type)) AS lt
    FROM purchases p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.event_type NOT IN ('purchase')
     AND e.ts >= p.p_ts - INTERVAL 7 DAY AND e.ts < p.p_ts
    GROUP BY 1
), credit AS (
    SELECT ft.ch AS channel, count(*) AS n_first,
           0 AS n_last
    FROM touches GROUP BY 1
    UNION ALL
    SELECT lt.ch AS channel, 0 AS n_first, count(*) AS n_last
    FROM touches GROUP BY 1
), tot AS (SELECT CAST(count(*) AS BIGINT) AS np FROM touches)
SELECT channel,
       CAST(sum(n_first) AS BIGINT) AS n_first_touch,
       CAST(sum(n_last) AS BIGINT) AS n_last_touch,
       CAST(sum(n_first) AS DOUBLE) / (SELECT np FROM tot)
           AS first_share,
       CAST(sum(n_last) AS DOUBLE) / (SELECT np FROM tot)
           AS last_share
FROM credit GROUP BY 1
"""


@register(
    "attribution_first_last_touch",
    _FIRST_LAST_TOUCH_ORACLE,
    doc="first-touch vs last-touch channel attribution: for every "
    "purchase with an identified user, the earliest and latest "
    "non-purchase event in the 7-day lookback window claims the "
    "credit; output is per-channel conversion counts and shares "
    "under both rules — the two bookends every marketing mix sits "
    "between (time-decay and Shapley are the catalog's middle "
    "points). Exactness: argmin/argmax via min/max over a (ts, "
    "event_id, channel) struct — total order, engine-identical "
    "ties; shares are one integer/integer double division. "
    "Anonymous purchases (NULL user_id) are excluded explicitly: "
    "they can claim no journey. Scale: the range join is per-user "
    "(events within 7 days), the same bounded-interval shape as "
    "join_range_event_pairs; everything after is channel-grain "
    "metadata.",
)
def attribution_first_last_touch(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts")
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_id").alias("eid"),
        F.col("event_type").alias("ch"),
    )
    touch = F.struct(F.col("t_ts").alias("t"), F.col("eid"), F.col("ch"))
    touches = (
        p.join(
            t,
            (p["user_id"] == t["user_id"])
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("t_ts") < F.col("p_ts")),
        )
        .groupBy("pid")
        .agg(F.min(touch).alias("ft"), F.max(touch).alias("lt"))
    )
    tot = touches.agg(F.count("*").alias("np"))
    first = touches.groupBy(F.col("ft.ch").alias("channel")).agg(
        F.count("*").alias("n_first_touch")
    )
    last = touches.groupBy(F.col("lt.ch").alias("channel")).agg(
        F.count("*").alias("n_last_touch")
    )
    return (
        first.join(last, "channel", "full")
        .join(F.broadcast(tot))
        .select(
            "channel",
            F.coalesce("n_first_touch", F.lit(0)).alias("n_first_touch"),
            F.coalesce("n_last_touch", F.lit(0)).alias("n_last_touch"),
            (
                F.coalesce("n_first_touch", F.lit(0)).cast("double")
                / F.col("np")
            ).alias("first_share"),
            (
                F.coalesce("n_last_touch", F.lit(0)).cast("double")
                / F.col("np")
            ).alias("last_share"),
        )
    )
