"""Behavioral analytics over the event stream: ordered funnels, cohort
retention, time-decayed features, gap-filled resampling.

These are the aggregate "user journey" reads a feature platform serves on
top of the same event log the reference ingests (its per-user aggregate
state machine is services/aggregates.py; these are the offline/batch
analyses of the identical data). All four are single-digit-shuffle plans
built from codegen'd expressions — no Python in any hot path.

Determinism: week truncation is Monday-based in both engines but DuckDB
returns DATE while Spark returns TIMESTAMP (cast to DATE on the Spark
side); week offsets divide exact multiples of 7 so int casts agree; the
decay weight 0.5^k (k <= 6 weeks) is an exact DECIMAL(8,6), so decayed
sums are all-decimal and addition order cannot perturb the value hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")

_FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
s4 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN s3 ON e.user_id = s3.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN s4.user_id IS NOT NULL THEN 4
                 WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
LEFT JOIN s4 ON u.user_id = s4.user_id
"""


@register(
    "funnel_conversion",
    _FUNNEL_ORACLE,
    doc="ordered conversion funnel signup->view->click->purchase: each "
    "stage must occur STRICTLY after the first completion of the "
    "previous stage. Spark side is ONE shuffle: collect+sort each "
    "user's (ts, type) events, then a codegen'd aggregate() fold walks "
    "the timeline — equivalent to the oracle's 4-level chained-min "
    "CTE but without its four self-joins. At 100 TB the fold stays "
    "one shuffle regardless of stage count; per-user state is 2 "
    "fields, and skewed users cost O(their events), not O(n^2)",
)
def funnel_conversion(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # Sorted timeline per user; struct sort = (ts, event_type), which
    # matches the chained-min semantics for equal-ts events (proven
    # equivalent: strict '>' excludes same-ts transitions either way).
    timeline = F.array_sort(F.collect_list(F.struct("ts", "event_type")))
    stage_of = F.array(*[F.lit(s) for s in _FUNNEL_STAGES])
    fold = F.aggregate(
        timeline,
        F.struct(
            F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
        ),
        lambda acc, e: F.when(
            (acc.stage < len(_FUNNEL_STAGES))
            & (e.event_type == F.element_at(stage_of, acc.stage + F.lit(1)))
            & ((acc.stage == 0) | (e.ts > acc.t)),
            F.struct((acc.stage + F.lit(1)).alias("stage"), e.ts.alias("t")),
        ).otherwise(acc),
    )
    return (
        ev.groupBy("user_id")
        .agg(fold.alias("acc"))
        .select("user_id", F.col("acc.stage").cast("int").alias("funnel_stage"))
    )


_COHORT_ORACLE = """
WITH first_ev AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
    FROM events)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS INT)
           AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM first_ev f JOIN activity a ON f.user_id = a.user_id
GROUP BY 1, 2
"""


@register(
    "cohort_retention",
    _COHORT_ORACLE,
    doc="weekly cohort retention triangle: cohort = Monday-truncated "
    "week of a user's first event; n_users = distinct users from that "
    "cohort active k weeks later. Two shuffles (per-user min, then the "
    "distinct-count over (cohort, offset)); the per-user first-event "
    "table is users-cardinality — smaller than the log but UNBOUNDED, "
    "so the enrich join is a plain equi-join on user_id (AQE broadcasts "
    "it only when it measures small; a forced broadcast would OOM at "
    "billions of users)",
)
def cohort_retention(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    first_ev = ev.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_week"))
    activity = ev.select("user_id", wk(F.col("ts")).alias("act_week")).distinct()
    return (
        activity.join(first_ev, "user_id")
        .select(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_DECAY_REF = "2024-02-15"

_DECAY_ORACLE = f"""
SELECT user_id,
       count(*) AS n_purchases,
       CAST(sum(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,2)) AS DECIMAL(25,2)) END
                * CAST(power(0.5, greatest(0,
                         date_diff('day', CAST(ts AS DATE),
                                   DATE '{_DECAY_REF}') // 7))
                       AS DECIMAL(8,6))) AS DOUBLE) AS decayed_value
FROM events WHERE event_type = 'purchase' GROUP BY user_id
"""


@register(
    "feat_time_decay",
    _DECAY_ORACLE,
    doc="half-life time-decayed purchase value per user (weekly "
    "half-life steps, weight = 0.5^weeks_before_ref). ALL-decimal "
    "arithmetic: value in exact cents DECIMAL(18,2), weight 0.5^k for "
    "k<=6 is exactly DECIMAL(8,6), so every product and the sum are "
    "exact and order-independent — casting a double term to a "
    "high-scale decimal instead differs between engines in the last "
    "ulp (observed), which is why the weight must be decimal-exact. "
    "One pushed-filter scan + one partial+final agg — the canonical "
    "recency feature at any scale",
)
def feat_time_decay(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    days = F.datediff(F.lit(_DECAY_REF).cast("date"), F.to_date("ts"))
    # greatest(0, ...): a FUTURE-dated purchase (producer clock skew)
    # would otherwise anti-decay — 0.5^-k explodes to inf at large skew
    # (Spark's decimal cast nulls it, DuckDB's errors; r10 timestamp-
    # pathology find). Contract: events from the future decay as if
    # they happened at the reference instant (weight exactly 1).
    term = F.col("value").try_cast("decimal(18,2)") * F.pow(
        F.lit(0.5), F.greatest(F.lit(0), F.floor(days / 7))
    ).cast("decimal(8,6)")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(term).cast("double").alias("decayed_value"),
        )
    )


_RESAMPLE_ORACLE = """
WITH span AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
    FROM events GROUP BY user_id),
days AS (
    SELECT user_id,
           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM span),
counts AS (
    SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
    FROM events GROUP BY 1, 2)
SELECT d.user_id, d.day, COALESCE(c.n_events, 0) AS n_events
FROM days d LEFT JOIN counts c ON d.user_id = c.user_id AND d.day = c.day
"""


@register(
    "resample_daily_gapfill",
    _RESAMPLE_ORACLE,
    doc="per-user daily resample with explicit zero rows for silent "
    "days (first..last activity span): sequence()+explode generates "
    "the calendar JVM-side, left join fills counts. Output is linear "
    "in user-days; the span table is one row per user, so at 100 TB "
    "the generate side is tiny and the join shuffles only the daily "
    "count table (already aggregated, << raw events)",
)
def resample_daily_gapfill(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    day = F.to_date("ts").alias("day")
    span = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    counts = ev.groupBy("user_id", day).agg(F.count("*").alias("n"))
    return days.join(counts, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
    )


_TRANSITIONS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS n_transitions,
       count(DISTINCT user_id) AS n_users,
       CAST(count(*) AS DOUBLE)
           / sum(count(*)) OVER (PARTITION BY event_type) AS prob
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@register(
    "path_transitions",
    _TRANSITIONS_ORACLE,
    doc="first-order Markov transition matrix over per-user event "
    "paths: lead() on the (ts, event_id)-ordered timeline, then "
    "count + distinct-user count + row-conditional probability per "
    "(from, to) pair. One window shuffle on user_id + one 25-cell "
    "agg; prob is a single correctly-rounded bigint/bigint divide, "
    "deterministic across engines. The per-user window partitions by "
    "the natural key, so the plan scales with users, not pairs",
)
def path_transitions(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    agg = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions"),
        F.count_distinct("user_id").alias("n_users"),
    )
    total = Window.partitionBy("from_type")
    return agg.withColumn(
        "prob",
        F.col("n_transitions").cast("double") / F.sum("n_transitions").over(total),
    )


@register(
    "agg_heavy_hitters",
    """
WITH tot AS (SELECT count(*) AS n FROM events),
c AS (SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY user_id, event_type)
SELECT user_id, event_type, cnt
FROM c, tot
WHERE cnt * 500 >= tot.n
""",
    doc="exact heavy hitters: (user, event_type) pairs at >= 0.2% of "
    "total traffic. The support test is pure integer arithmetic "
    "(cnt*500 >= n — no float ratio, so both engines select the "
    "identical set), and the global total is a 1-row broadcast. At "
    "100 TB this is one hash agg + a map-side filter; the sketch "
    "alternative (approx counting) is only needed when the KEY "
    "cardinality itself is unmanageable, which user x type is not.",
)
def agg_heavy_hitters(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    tot = ev.agg(F.count("*").alias("n"))
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 500 >= F.col("n"))
        .select("user_id", "event_type", "cnt")
    )


@register(
    "rolling_7d_active_users",
    """
WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
cov AS (
    SELECT user_id, d + CAST(off AS INTEGER) AS day
    FROM du, (SELECT unnest(generate_series(0, 6)) AS off) offs)
SELECT day, count(DISTINCT user_id) AS dau7
FROM cov, mx
WHERE day <= mx.m
GROUP BY day
""",
    doc="trailing-7-day distinct active users per day. Exact rolling "
    "distinct cannot be a window frame (distinct does not decompose), "
    "so each (user, active-day) pair is expanded into the 7 trailing "
    "windows it participates in — a fixed 7x row expansion followed by "
    "one distinct count, instead of 7 self-joins or a quadratic "
    "range join. The expansion factor is the window length, "
    "independent of data volume: the canonical exact-DAU shape at "
    "100 TB.",
)
def rolling_7d_active_users(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    mx = ev.agg(F.max(F.to_date("ts")).alias("m"))
    cov = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("off")).alias("day"))
    return (
        cov.crossJoin(F.broadcast(mx))
        .filter(F.col("day") <= F.col("m"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("dau7"))
    )


@register(
    "streak_longest_daily",
    """
WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
isl AS (
    SELECT user_id, d,
           d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                    AS INTEGER) AS island
    FROM du),
streaks AS (
    SELECT user_id, count(*) AS streak_len, min(d) AS streak_start
    FROM isl GROUP BY user_id, island),
best AS (
    SELECT user_id, streak_len, streak_start,
           row_number() OVER (PARTITION BY user_id
               ORDER BY streak_len DESC, streak_start) AS rk
    FROM streaks)
SELECT user_id, streak_len, streak_start FROM best WHERE rk = 1
""",
    doc="longest consecutive-day activity streak per user via "
    "gaps-and-islands: date minus per-user row_number is constant "
    "within a consecutive run, so streaks fall out of one window pass "
    "+ one aggregation — no self-joins, no iteration. Ties broken by "
    "earliest streak start (deterministic).",
)
def streak_longest_daily(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = du.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_len"), F.min("d").alias("streak_start")
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("streak_len"), "streak_start")
    )
    return (
        streaks.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("user_id", "streak_len", "streak_start")
    )


@register(
    "window_locf_forward_fill",
    """
SELECT event_id, user_id, ts,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_purchase_value
FROM events
""",
    doc="LOCF forward fill (last observation carried forward): every "
    "event annotated with the user's most recent purchase value — "
    "last_value IGNORE NULLS over an ordered running frame, the "
    "standard sparse-to-dense time-series densification. One window "
    "pass partitioned by the natural key; total order via (ts, "
    "event_id) tie-break.",
)
def window_locf_forward_fill(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "anomaly_daily_event_volume",
    """
WITH d AS (
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
    FROM events GROUP BY 1),
m AS (
    SELECT median(n_events) AS med,
           median(abs(n_events - (SELECT median(n_events) FROM d))) AS mad
    FROM d)
SELECT day, n_events,
       n_events - med AS deviation,
       abs(n_events - med) > 3 * mad AS is_anomaly
FROM d, m
""",
    doc="robust daily-volume anomaly flag: |count - median| > 3*MAD "
    "over the daily event counts. Median/MAD (not mean/stddev) on "
    "purpose twice over: robust statistics are the correct detector "
    "when the anomalies themselves would poison the baseline, AND "
    "medians of integer counts are exact (worst case one IEEE "
    "midpoint average), so the oracle hashes bit-for-bit where a "
    "variance would drift by summation order. Shape: one day-grain "
    "agg (bounded: rows = days of history), a 2-row-pass median on "
    "that METADATA table, 1-row broadcast back — the fact table is "
    "scanned once regardless of scale.",
)
def anomaly_daily_event_volume(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    med = d.agg(F.median("n_events").alias("med"))
    mad = (
        d.crossJoin(F.broadcast(med))
        .agg(F.median(F.abs(F.col("n_events") - F.col("med"))).alias("mad"))
    )
    stats = med.crossJoin(F.broadcast(mad))
    return (
        d.crossJoin(F.broadcast(stats))
        .select(
            "day",
            "n_events",
            (F.col("n_events") - F.col("med")).alias("deviation"),
            (F.abs(F.col("n_events") - F.col("med")) > 3 * F.col("mad")).alias(
                "is_anomaly"
            ),
        )
    )


@register(
    "resample_weekly_ohlc",
    """
WITH e AS (
    SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
           ts, event_id, value
    FROM events WHERE event_type = 'purchase'),
rk AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id, wk
                              ORDER BY ts, event_id) AS rn_f,
           row_number() OVER (PARTITION BY user_id, wk
                              ORDER BY ts DESC, event_id DESC) AS rn_l
    FROM e)
SELECT user_id, wk,
       CAST(count(*) AS BIGINT) AS n_events,
       max(CASE WHEN rn_f = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_l = 1 THEN value END) AS close,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS volume
FROM rk GROUP BY user_id, wk
""",
    doc="OHLC downsampling (open/high/low/close + volume per user-week) "
    "— the classic time-series resample a metrics/trading pipeline "
    "runs to compress tick-grain history: open/close are the "
    "first/last values by a TOTAL order (ts, event_id — ties can't "
    "flip the answer between engines or retries), high/low are plain "
    "min/max, volume accumulates in DECIMAL. One window + one hash "
    "agg, both keyed by high-cardinality (user, week); at 100 TB this "
    "is the week-partitioned incremental rollup, each partition "
    "independent.",
)
def resample_weekly_ohlc(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    e = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        "ts",
        "event_id",
        "value",
    )
    wf = Window.partitionBy("user_id", "wk").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id", "wk").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    rk = e.withColumn("rn_f", F.row_number().over(wf)).withColumn(
        "rn_l", F.row_number().over(wl)
    )
    return rk.groupBy("user_id", "wk").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("rn_f") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_l") == 1, F.col("value"))).alias("close"),
        F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double").alias("volume"),
    )


_FUNNEL_WIN_US = 7 * 24 * 3600 * 1_000_000  # 7-day conversion window


@register(
    "funnel_windowed_conversion",
    f"""
WITH s AS (SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS t1
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click'
        AND epoch_us(e.ts) > s.t1
        AND epoch_us(e.ts) <= s.t1 + {_FUNNEL_WIN_US}
      GROUP BY e.user_id),
p AS (SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) > c.t2
        AND epoch_us(e.ts) <= c.t2 + {_FUNNEL_WIN_US}
      GROUP BY e.user_id)
SELECT s.user_id, s.t1 AS signup_us, c.t2 AS click_us, p.t3 AS purchase_us,
       CAST(1 + CASE WHEN c.t2 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN p.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS stage_reached
FROM s LEFT JOIN c ON s.user_id = c.user_id
       LEFT JOIN p ON s.user_id = p.user_id
""",
    doc="windowed funnel — the Amplitude-style conversion funnel with a "
    "DEADLINE between stages (signup -> first click within 7 days -> "
    "first purchase within 7 days of that click), which the plain "
    "ordered funnel can't express: a user who converts after the "
    "window does NOT count. Three per-user argmin aggregations chained "
    "by equi-joins, every shuffle on the high-cardinality user key; "
    "all bounds are BIGINT microseconds so both engines pick identical "
    "stage timestamps. stage_reached (1..3) is the funnel report "
    "column.",
)
def funnel_windowed_conversion(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("tc"))
        .join(s, "user_id")
        .filter((F.col("tc") > F.col("t1")) & (F.col("tc") <= F.col("t1") + _FUNNEL_WIN_US))
        .groupBy("user_id")
        .agg(F.min("tc").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("tp"))
        .join(c, "user_id")
        .filter((F.col("tp") > F.col("t2")) & (F.col("tp") <= F.col("t2") + _FUNNEL_WIN_US))
        .groupBy("user_id")
        .agg(F.min("tp").alias("t3"))
    )
    stage = (
        F.lit(1)
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
    ).cast("long")
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("t1").alias("signup_us"),
            F.col("t2").alias("click_us"),
            F.col("t3").alias("purchase_us"),
            stage.alias("stage_reached"),
        )
    )


@register(
    "window_time_weighted_avg",
    """
WITH r AS (
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t,
           CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT) AS v_micro,
           event_id
    FROM events WHERE event_type = 'purchase'),
seg AS (
    SELECT user_id, v_micro,
           (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)
               // 1000 AS dt_ms
    FROM r)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_readings,
       CAST(sum(dt_ms) AS BIGINT) AS span_ms,
       -- HUGEINT lift (r10 hostile-magnitude): v_micro reaches ~1e18
       -- at the DECIMAL(18,6) envelope, so v*dt overflows int64
       CAST(sum(CAST(v_micro AS HUGEINT) * dt_ms) // sum(dt_ms) AS BIGINT)
           AS twap_micro
FROM seg WHERE dt_ms IS NOT NULL AND dt_ms > 0
GROUP BY user_id
""",
    doc="time-weighted average (TWAP) — the integral mean every "
    "sensor/market pipeline uses when readings are IRREGULARLY spaced "
    "(a plain mean over-weights chatty periods): each reading holds "
    "its value until the next one (LOCF integral), weighted by the "
    "millisecond gap from lead(). ALL-INTEGER pipeline: values in "
    "fixed-point micro-units, weights in ms, one integer division at "
    "the end — no decimal->double cast anywhere (that cast rounds "
    "differently across engines at 1 ulp; this entry exists in the "
    "form that hashes exactly). One window + one agg on the high-"
    "cardinality user key; at 100 TB this partitions by (user, day) "
    "with carried boundary readings.",
)
def window_time_weighted_avg(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    r = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
        # DECIMAL(18,6) round-half-up, not floor-on-double: floor(v*1e6)
        # truncates values the double can't represent exactly
        # (0.29 -> 289999), misstating "fixed-point value"; this is the
        # repo's standard micro-unit recipe (agg_gini_spend).
        (F.col("value").try_cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("v_micro"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seg = r.select(
        "user_id",
        "v_micro",
        F.floor((F.lead("t").over(w) - F.col("t")) / 1000)
        .cast("long")
        .alias("dt_ms"),
    ).filter(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
    return seg.groupBy("user_id").agg(
        F.count("*").alias("n_readings"),
        F.sum("dt_ms").cast("long").alias("span_ms"),
        # true integer division (DIV), not float-divide-then-floor:
        # numerators can exceed 2^53 where double division drifts.
        # DECIMAL(38,0) lift on the product (r10 hostile-magnitude):
        # v_micro reaches ~1e18 at the intake envelope, so the bare
        # int64 product was an ANSI job-killer; the quotient always
        # fits BIGINT again (it is bounded by max v_micro).
        F.expr(
            "CAST(sum(CAST(v_micro AS DECIMAL(38,0)) * dt_ms)"
            " DIV sum(dt_ms) AS BIGINT)"
        ).alias("twap_micro"),
    )


@register(
    "ab_test_chi_squared",
    """
WITH assign AS (
    SELECT DISTINCT user_id,
           ((CAST(position(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                 IN '0123456789abcdef') AS BIGINT) - 1) * 16
            + (CAST(position(substr(md5(CAST(user_id AS VARCHAR)), 2, 1)
                 IN '0123456789abcdef') AS BIGINT) - 1)) % 2 AS grp
    FROM events),
conv AS (
    SELECT user_id, 1 AS converted FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id HAVING count(*) >= 14),
cells AS (
    SELECT a.grp, COALESCE(c.converted, 0) AS converted,
           CAST(count(*) AS BIGINT) AS n
    FROM assign a LEFT JOIN conv c USING (user_id)
    GROUP BY 1, 2),
tab AS (
    SELECT CAST(max(CASE WHEN grp = 0 AND converted = 1 THEN n ELSE 0 END) AS BIGINT) AS a,
           CAST(max(CASE WHEN grp = 0 AND converted = 0 THEN n ELSE 0 END) AS BIGINT) AS b,
           CAST(max(CASE WHEN grp = 1 AND converted = 1 THEN n ELSE 0 END) AS BIGINT) AS c,
           CAST(max(CASE WHEN grp = 1 AND converted = 0 THEN n ELSE 0 END) AS BIGINT) AS d
    FROM cells)
SELECT a, b, c, d,
       CAST((a * d - b * c) * (a * d - b * c) AS DOUBLE)
         * CAST(a + b + c + d AS DOUBLE)
         / CAST(NULLIF(a + b, 0) AS DOUBLE) / CAST(NULLIF(c + d, 0) AS DOUBLE)
         / CAST(NULLIF(a + c, 0) AS DOUBLE) / CAST(NULLIF(b + d, 0) AS DOUBLE)
       AS chi2
FROM tab
""",
    doc="chi-squared A/B conversion test — the experimentation "
    "readout every growth pipeline computes: users md5-split into "
    "two arms (deterministic assignment — a retried task lands every "
    "user in the same arm, the property rand() lacks), conversion = "
    ">= 14 purchases (a threshold that splits this corpus; 'any "
    "purchase' is degenerate here — every synthetic user buys), "
    "chi2 = N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)). The "
    "2x2 table is exact integers; the statistic is a fixed chain of "
    "correctly-rounded int64->double conversions and divisions, so "
    "even the double hashes identically. Two skinny distinct "
    "aggregations + a 4-cell fold — counts move, never events.",
)
def ab_test_chi_squared(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    hexd = "0123456789abcdef"
    m = F.md5(F.col("user_id").cast("string").cast("binary"))

    def v(i):
        return F.position(F.substring(m, i, 1), F.lit(hexd)).cast("long") - 1

    assign = ev.select(
        "user_id", ((v(1) * 16 + v(2)) % 2).alias("grp")
    ).distinct()
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("_np"))
        .filter(F.col("_np") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    cells = (
        assign.join(conv, "user_id", "left")
        .select("grp", F.coalesce(F.col("converted"), F.lit(0)).alias("converted"))
        .groupBy("grp", "converted")
        .agg(F.count("*").alias("n"))
    )
    cell = lambda g, c: F.max(
        F.when((F.col("grp") == g) & (F.col("converted") == c), F.col("n")).otherwise(0)
    ).cast("long")
    tab = cells.agg(
        cell(0, 1).alias("a"), cell(0, 0).alias("b"),
        cell(1, 1).alias("c"), cell(1, 0).alias("d"),
    )
    A, B, C, D = (F.col(x) for x in "abcd")
    det = A * D - B * C

    # NULLIF-guard every margin: on a degenerate table (an empty arm or
    # zero conversions) Spark's non-ANSI double div-by-zero yields NULL
    # while DuckDB's IEEE mode yields Infinity — guarding BOTH engines
    # to NULL keeps the hash gate data-independent (r5 advisor finding).
    def margin(x):
        return F.nullif(x.cast("long"), F.lit(0)).cast("double")

    chi2 = (
        (det * det).cast("double")
        * (A + B + C + D).cast("double")
        / margin(A + B)
        / margin(C + D)
        / margin(A + C)
        / margin(B + D)
    )
    return tab.select("a", "b", "c", "d", chi2.alias("chi2"))


@register(
    "agg_gini_spend",
    """
WITH spend AS (
    SELECT event_type, user_id,
           CAST(sum(CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000 AS BIGINT))
                AS BIGINT) AS cents
    FROM events GROUP BY event_type, user_id),
ranked AS (
    SELECT event_type, cents,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, user_id) AS BIGINT) AS i,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM spend WHERE cents IS NOT NULL)
SELECT event_type, min(n) AS n_users,
       CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS total_micro,
       CAST(2 * sum(CAST(i AS HUGEINT) * cents)
            - (min(n) + 1) * sum(CAST(cents AS HUGEINT)) AS DOUBLE)
           AS gini_num,
       CAST(min(n) * sum(CAST(cents AS HUGEINT)) AS DOUBLE)
           AS gini_den,
       CAST(2 * sum(CAST(i AS HUGEINT) * cents)
            - (min(n) + 1) * sum(CAST(cents AS HUGEINT)) AS DOUBLE)
           / CAST(min(n) * sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS gini
FROM ranked GROUP BY event_type
""",
    doc="Gini coefficient of per-user spend by event type — the "
    "inequality metric behind whale-concentration and data-diversity "
    "dashboards: G = (2*sum(i*x_i) - (n+1)*sum(x))/(n*sum(x)). Scale "
    "design: per-user totals collapse onto the spend-VALUE HISTOGRAM "
    "(second hash agg), and the rank sum over a run of c ties at value "
    "x is x*(c*C_prev + c(c+1)/2) — so the cumulative window runs over "
    "distinct spend values (bounded by micro-unit quantization), never "
    "over the unbounded user population. The ORACLE keeps the textbook "
    "per-user rank formulation: matching hashes prove the histogram "
    "identity cross-engine. Integer numerator/denominator ride along; "
    "the double is one division of exact int64s.",
)
def agg_gini_spend(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    spend = ev.groupBy("event_type", "user_id").agg(
        F.sum((F.col("value").try_cast("decimal(18,6)") * 1_000_000).cast("long"))
        .cast("long")
        .alias("cents")
    )
    # A user whose every value is NULL has cents = sum(NULL) = NULL —
    # no defined spend, so no place on the Lorenz curve (and the two
    # engines rank NULLs on opposite ends: Spark ASC puts them first,
    # DuckDB last — the round-8 NULL-value fixture find).
    spend = spend.filter(F.col("cents").isNotNull())
    hist = spend.groupBy("event_type", "cents").agg(
        F.count("*").cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("c_thru", F.sum("c").over(wcum)).withColumn(
        "c_prev", F.col("c_thru") - F.col("c")
    )
    # sum of ranks across the tie-run: c*C_prev + c(c+1)/2 (c(c+1) even).
    # All rank x cents products in DECIMAL(38,0) (DuckDB HUGEINT twin) —
    # at the DECIMAL(18,6) intake envelope a single user's cents reach
    # ~1e18, and rank x cents blows past int64 at rank ~10 (r10
    # hostile-magnitude find: the old BIGINT contrib was a loud ANSI
    # crash). Outputs carry DECIMAL(38,0) for the same reason.
    rank_sum = F.col("c") * F.col("c_prev") + F.expr(
        "(c * (c + 1)) DIV 2"
    )
    cents38 = F.col("cents").cast("decimal(38,0)")
    contrib = cents38 * rank_sum
    agg = cum.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_users"),
        F.sum(cents38 * F.col("c")).cast("decimal(38,0)").alias("total_micro"),
        F.sum(contrib).cast("decimal(38,0)").alias("ix_sum"),
    )
    num = (
        2 * F.col("ix_sum") - (F.col("n_users") + 1) * F.col("total_micro")
    )
    den = F.col("n_users") * F.col("total_micro")
    # Diagnostic integer ride-alongs leave as DOUBLE (one exact-int ->
    # double conversion each): pandas bridges render wide decimals as
    # incompatible carriers (Spark object(Decimal) vs DuckDB float64),
    # so the driver's dtype-sensitive hash needs the common type; the
    # arithmetic itself stays exact in DECIMAL(38,0)/HUGEINT.
    return agg.select(
        "event_type",
        "n_users",
        F.col("total_micro").cast("double").alias("total_micro"),
        num.cast("double").alias("gini_num"),
        den.cast("double").alias("gini_den"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


@register(
    "stats_ols_user_spend",
    """
WITH per_user AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(CASE WHEN isfinite(value) THEN CAST(TRY_CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) END * 1000000
                                   AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY user_id),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
    FROM per_user),
d AS (
    SELECT n, sx, sy,
           CAST(CAST(n AS HUGEINT) * sxy
                - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cov_n,
           CAST(CAST(n AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS var_x_n,
           CAST(CAST(n AS HUGEINT) * syy
                - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS var_y_n
    FROM m)
SELECT n AS n_users, sx AS sum_clicks, sy AS sum_spend_micro,
       cov_n / sqrt(var_x_n * var_y_n) AS pearson_r,
       cov_n / var_x_n AS slope_micro_per_click,
       (CAST(sy AS DOUBLE) - cov_n / var_x_n * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept_micro
FROM d
""",
    doc="Pearson correlation + OLS fit of per-user spend (micro-units) "
    "on click count — the canonical two-metric relationship readout "
    "(does engagement predict revenue?), done the distributed way: "
    "ONE pass builds the five raw moments (n, Sx, Sy, Sxx, Syy, Sxy) "
    "as EXACT wide integers (DECIMAL(38)/HUGEINT — y^2 reaches 1e23, "
    "past int64), then r = (nSxy-SxSy)/sqrt((nSxx-Sx^2)(nSyy-Sy^2)) "
    "and the slope/intercept are a fixed chain of correctly-rounded "
    "int->double conversions: bit-identical across engines AND "
    "partitionings, where a naive avg-centered two-pass float "
    "covariance is neither. Two hash aggs (user rollup, 1-row "
    "moments); nothing but the moment row leaves the executors.",
)
def stats_ols_user_spend(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                (F.col("value").try_cast("decimal(18,6)") * 1_000_000).cast(
                    "long"
                ),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    m = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
    )
    cov_n = (
        F.col("n").cast(dec) * F.col("sxy")
        - F.col("sx").cast(dec) * F.col("sy")
    ).cast("double")
    var_x_n = (
        F.col("n").cast(dec) * F.col("sxx")
        - F.col("sx").cast(dec) * F.col("sx")
    ).cast("double")
    var_y_n = (
        F.col("n").cast(dec) * F.col("syy")
        - F.col("sy").cast(dec) * F.col("sy")
    ).cast("double")
    d = m.select(
        "n",
        "sx",
        "sy",
        cov_n.alias("cov_n"),
        var_x_n.alias("var_x_n"),
        var_y_n.alias("var_y_n"),
    )
    slope = F.col("cov_n") / F.col("var_x_n")
    return d.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("sum_clicks"),
        F.col("sy").alias("sum_spend_micro"),
        (F.col("cov_n") / F.sqrt(F.col("var_x_n") * F.col("var_y_n"))).alias(
            "pearson_r"
        ),
        slope.alias("slope_micro_per_click"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept_micro"),
    )


_TTC_ORACLE = """
WITH su AS (
    SELECT user_id, min(ts) AS signup_ts FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), pu AS (
    SELECT e.user_id, min(e.ts) AS purchase_ts
    FROM events e JOIN su ON e.user_id = su.user_id
    WHERE e.event_type = 'purchase' AND e.ts > su.signup_ts
    GROUP BY e.user_id
), conv AS (
    SELECT su.user_id,
           CAST(date_trunc('week', su.signup_ts) AS DATE) AS cohort_week,
           epoch_us(pu.purchase_ts) - epoch_us(su.signup_ts) AS diff_us
    FROM su JOIN pu ON su.user_id = pu.user_id
)
SELECT cohort_week,
       CAST(count(*) AS INT) AS n_converted,
       quantile_cont(diff_us, 0.5) AS median_us
FROM conv GROUP BY cohort_week
"""


@register(
    "funnel_time_to_convert",
    _TTC_ORACLE,
    doc="time-to-convert: per signup-week cohort, the median "
    "microseconds from a user's first signup to their first "
    "subsequent purchase — the funnel-velocity complement of "
    "funnel_conversion's reach counts. Exactness: diffs are BIGINT "
    "microseconds; the 0.5 quantile interpolates at position "
    "(n-1)*0.5, which is exact in binary, and an even-count median "
    "is the mean of two BIGINTs — one exact double operation on "
    "both engines (higher quantiles would put (n-1)*q rounding in "
    "play, which is why this entry pins the median only). Scale: "
    "two per-user min-aggregations and an equi-join on user_id; "
    "the median groups by cohort week, whose per-key row count is "
    "one cohort's converters.",
)
def funnel_time_to_convert(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    conv = su.join(pu, "user_id").select(
        F.to_date(F.date_trunc("week", F.col("signup_ts"))).alias(
            "cohort_week"
        ),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")
        ).alias("diff_us"),
    )
    return conv.groupBy("cohort_week").agg(
        F.count("*").cast("int").alias("n_converted"),
        F.expr("percentile(diff_us, 0.5)").alias("median_us"),
    )


_LTV_ORACLE = """
WITH coh AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), size_ AS (
    SELECT cohort_week, count(*) AS cohort_size FROM coh GROUP BY 1
), wk AS (
    SELECT coh.cohort_week,
           date_diff('day', coh.cohort_week,
                     CAST(date_trunc('week', e.ts) AS DATE)) // 7
               AS weeks_since,
           sum(CASE WHEN isfinite(e.value) THEN TRY_CAST(e.value AS DECIMAL(18,6)) END) AS wrev
    FROM events e JOIN coh ON e.user_id = coh.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
), cum AS (
    SELECT cohort_week, weeks_since,
           sum(wrev) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                           ROWS UNBOUNDED PRECEDING) AS crev
    FROM wk
)
SELECT c.cohort_week,
       CAST(c.weeks_since AS INT) AS weeks_since,
       CAST(c.crev AS DOUBLE) AS cum_revenue,
       CAST(c.crev AS DOUBLE) / s.cohort_size AS ltv_per_user
FROM cum c JOIN size_ s ON c.cohort_week = s.cohort_week
"""


@register(
    "cohort_ltv_curve",
    _LTV_ORACLE,
    doc="cohort lifetime-value curve: cumulative purchase revenue per "
    "signup-week cohort by weeks-since-signup, absolute and per "
    "cohort member — the revenue companion of cohort_retention's "
    "activity matrix. Exactness: weekly revenue accumulates in "
    "DECIMAL(18,6), the running sum stays decimal, and the two "
    "DOUBLE outputs are one cast and one division of exactly-agreed "
    "numbers; week arithmetic is integer days//7 on Monday-truncated "
    "dates (both engines Monday-based, behavior.py header). Scale: "
    "one shuffle to (cohort, week) grain, then a window over the "
    "metadata-scale cohort x week matrix.",
)
def cohort_ltv_curve(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    coh = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    size = coh.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    wk = (
        ev.filter(F.col("event_type") == "purchase")
        .join(coh, "user_id")
        .groupBy(
            "cohort_week",
            F.expr(
                "datediff(to_date(date_trunc('week', ts)), cohort_week) "
                "div 7"
            ).alias("weeks_since"),
        )
        .agg(F.sum(F.col("value").try_cast("decimal(18,6)")).alias("wrev"))
    )
    cum = wk.withColumn(
        "crev",
        F.sum("wrev").over(
            W.partitionBy("cohort_week")
            .orderBy("weeks_since")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return cum.join(size, "cohort_week").select(
        "cohort_week",
        F.col("weeks_since").cast("int").alias("weeks_since"),
        F.col("crev").cast("double").alias("cum_revenue"),
        (F.col("crev").cast("double") / F.col("cohort_size")).alias(
            "ltv_per_user"
        ),
    )


_LOCF_TTL_ORACLE = """
SELECT event_id, user_id, ts,
       CASE WHEN epoch_us(ts) - epoch_us(lp.lts) <= 172800000000
            THEN lp.lval END AS fresh_purchase_value,
       lp.lts IS NOT NULL
       AND epoch_us(ts) - epoch_us(lp.lts) > 172800000000 AS went_stale
FROM (
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN ts END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lval
    FROM events
) lp
"""


@register(
    "window_locf_with_ttl",
    _LOCF_TTL_ORACLE,
    doc="LOCF with a staleness TTL: forward-fill the last purchase "
    "value ONLY while it is at most 48 h old at read time, else NULL "
    "with an explicit went_stale flag — the feature-freshness "
    "semantics every serving store enforces (a carried-forward "
    "feature older than its TTL must not silently serve; the "
    "reference's point-lookup fail-open policy is the same concern, "
    "services/user_feature.py). Same one-window shape as "
    "window_locf_forward_fill, carrying (ts, value) of the last "
    "observation so the TTL check is exact BIGINT microsecond "
    "arithmetic at each read row. One window pass on the natural "
    "key, total (ts, event_id) order.",
)
def window_locf_with_ttl(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lts = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts")), True
    ).over(w)
    lval = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), True
    ).over(w)
    ttl_us = 172_800_000_000
    age = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("lts"))
    return ev.select(
        "event_id", "user_id", "ts", lts.alias("lts"), lval.alias("lval")
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.when(age <= ttl_us, F.col("lval")).alias("fresh_purchase_value"),
        (F.col("lts").isNotNull() & (age > ttl_us)).alias("went_stale"),
    )


_INTERARRIVAL_ORACLE = """
WITH g AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events
), m AS (
    SELECT user_id,
           CAST(count(gap) AS HUGEINT) AS n,
           CAST(sum(gap) AS HUGEINT) AS s,
           CAST(sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT))
                AS HUGEINT) AS ss
    FROM g WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       CAST(n AS INT) AS n_gaps,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_us,
       CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE)
           AS var_gap_us2
FROM m
"""


@register(
    "feat_interarrival_stats",
    _INTERARRIVAL_ORACLE,
    doc="inter-arrival statistics per user: mean and population "
    "variance of the microsecond gaps between consecutive events — "
    "the burstiness features (high variance vs steady cadence) a "
    "fraud/engagement model consumes alongside the reference's "
    "count/sum aggregates (services/aggregates.py). Exactness: gaps "
    "are BIGINT µs from one lag() window; moments accumulate in "
    "DECIMAL(38)/HUGEINT (gap² up to ~7e24 overflows int64 — the "
    "stats_ols recipe); mean and variance are each ONE division of "
    "two exactly-agreed values, variance via the n-scaled form "
    "(n·Σx² − (Σx)²)/n² so no float mean is ever subtracted. One "
    "window + one hash agg on the natural key.",
)
def feat_interarrival_stats(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")
    # gap^2 overflows int64 (30-day gaps are ~2.6e12 us) — lift each
    # factor to DECIMAL BEFORE multiplying, then sum in decimal.
    gd = F.col("gap").cast("decimal(19,0)")
    m = g.groupBy("user_id").agg(
        F.count("gap").cast("decimal(38,0)").alias("n"),
        dec(F.sum("gap")).alias("s"),
        F.sum(gd * gd).cast("decimal(38,0)").alias("ss"),
    )
    return m.select(
        "user_id",
        F.col("n").cast("int").alias("n_gaps"),
        (F.col("s").cast("double") / F.col("n").cast("double")).alias(
            "mean_gap_us"
        ),
        (
            (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
                "double"
            )
            / (F.col("n") * F.col("n")).cast("double")
        ).alias("var_gap_us2"),
    )


_ASSOC_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000
                OR lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_s
    FROM events
), sess AS (
    SELECT user_id, event_type,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM ordered
), basket AS (
    SELECT DISTINCT user_id, sid, event_type FROM sess
), nsess AS (SELECT count(DISTINCT (user_id, sid)) AS n FROM basket),
item AS (
    SELECT event_type, count(*) AS c FROM basket GROUP BY event_type
), pair AS (
    SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS c12
    FROM basket a JOIN basket b
      ON a.user_id = b.user_id AND a.sid = b.sid
     AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.lhs, p.rhs,
       CAST(p.c12 AS BIGINT) AS n_cosessions,
       CAST(p.c12 AS DOUBLE) / n.n AS support,
       CAST(p.c12 AS DOUBLE) / i1.c AS confidence_lhs_rhs,
       CAST(p.c12 * n.n AS DOUBLE) / (i1.c * i2.c) AS lift
FROM pair p
JOIN item i1 ON p.lhs = i1.event_type
JOIN item i2 ON p.rhs = i2.event_type
CROSS JOIN nsess n
"""


@register(
    "assoc_rules_session_pairs",
    _ASSOC_ORACLE,
    doc="association rules over session baskets (market-basket "
    "analysis): sessionize with the 30-minute gap rule, reduce each "
    "session to its distinct event-type basket, then score every "
    "type pair with support, confidence and lift — lift > 1 says "
    "the types co-occur beyond chance, the signal behind "
    "'users who X also Y'. Exactness: all three metrics are single "
    "divisions of exact integer counts (lift as c12*n/(c1*c2), one "
    "division — the PMI-without-ln form). Scale: sessionization is "
    "one user-keyed window; baskets collapse sessions to distinct "
    "types BEFORE pairing, so the pair join fans out C(k,2) per "
    "session with k bounded by the type domain, never by session "
    "length; the session-count scalar is a 1-row broadcast.",
)
def assoc_rules_session_pairs(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        gap.isNull() | (gap > 1_800_000_000), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "event_type",
        F.sum(new_s)
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("sid"),
    )
    basket = sess.select("user_id", "sid", "event_type").distinct()
    nsess = basket.select("user_id", "sid").distinct().agg(
        F.count("*").alias("n")
    )
    item = basket.groupBy(F.col("event_type").alias("t")).agg(
        F.count("*").alias("c")
    )
    a = basket.select(
        F.col("user_id").alias("ua"),
        F.col("sid").alias("sa"),
        F.col("event_type").alias("lhs"),
    )
    b = basket.select(
        F.col("user_id").alias("ub"),
        F.col("sid").alias("sb"),
        F.col("event_type").alias("rhs"),
    )
    pair = (
        a.join(
            b,
            (F.col("ua") == F.col("ub"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("lhs") < F.col("rhs")),
        )
        .groupBy("lhs", "rhs")
        .agg(F.count("*").alias("c12"))
    )
    return (
        pair.join(
            F.broadcast(item.select(F.col("t").alias("lhs"), F.col("c").alias("c1"))),
            "lhs",
        )
        .join(
            F.broadcast(item.select(F.col("t").alias("rhs"), F.col("c").alias("c2"))),
            "rhs",
        )
        .join(F.broadcast(nsess))
        .select(
            "lhs",
            "rhs",
            F.col("c12").cast("long").alias("n_cosessions"),
            (F.col("c12").cast("double") / F.col("n")).alias("support"),
            (F.col("c12").cast("double") / F.col("c1")).alias(
                "confidence_lhs_rhs"
            ),
            (
                (F.col("c12") * F.col("n")).cast("double")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
    )


_MOTIF_ORACLE = """
WITH tl AS (
    SELECT user_id,
           list_transform(
               list_sort(list({'t': epoch_us(ts), 'e': event_id,
                               'y': event_type})),
               x -> x.y) AS seq
    FROM events GROUP BY user_id
), tri AS (
    SELECT seq[i] || '>' || seq[i+1] || '>' || seq[i+2] AS motif,
           user_id
    FROM tl, unnest(range(1, len(seq) - 1)) AS t(i)
), counts AS (
    SELECT motif,
           count(*) AS n_occurrences,
           count(DISTINCT user_id) AS n_users
    FROM tri GROUP BY motif
), tot AS (SELECT sum(n_occurrences) AS t FROM counts)
SELECT motif,
       CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_occurrences AS DOUBLE) / t AS share
FROM counts CROSS JOIN tot
ORDER BY n_occurrences DESC, motif
LIMIT 20
"""


@register(
    "seq_frequent_motifs",
    _MOTIF_ORACLE,
    doc="frequent behavioral motifs: the top-20 event-type TRIGRAMS "
    "across all per-user timelines (total (ts, event_id) order), "
    "with occurrence count, distinct-user support and share — the "
    "sequence-mining step up from path_transitions' first-order "
    "Markov bigrams, where 'view>click>purchase' vs "
    "'view>click>error' separates converting journeys from broken "
    "ones. One shuffle builds the timelines (collect+sort per user, "
    "the funnel_conversion shape), trigrams explode JVM-side from "
    "the sorted array (per-user cost = their own event count), one "
    "hash agg counts motifs; the grand total is a 1-row broadcast "
    "scalar and share is ONE exact division. Top-20 via TakeOrdered "
    "with a motif tie-break.",
)
def seq_frequent_motifs(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    timeline = F.expr(
        "transform(array_sort(collect_list(struct(ts, event_id, "
        "event_type))), x -> x.event_type)"
    )
    tl = ev.groupBy("user_id").agg(timeline.alias("seq"))
    # Guard short timelines: sequence(1, greatest(size-2, 0)) yields
    # [1, 0] (step -1) when size(seq) < 3 and element_at then indexes
    # past the array — filter exactly as the oracle's trigram window
    # produces no rows for such users.
    tl = tl.filter(F.expr("size(seq) >= 3"))
    tri = tl.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(seq) - 2, 0)), "
                "i -> concat(element_at(seq, i), '>', "
                "element_at(seq, i + 1), '>', element_at(seq, i + 2)))"
            )
        ).alias("motif"),
    )
    counts = tri.groupBy("motif").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tot = counts.agg(F.sum("n_occurrences").alias("t"))
    return (
        counts.join(F.broadcast(tot))
        .select(
            "motif",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_users").cast("long").alias("n_users"),
            (F.col("n_occurrences").cast("double") / F.col("t")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("motif"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Per-user behavioral entropy (round 9)
# ---------------------------------------------------------------------------

_USER_ENTROPY_ORACLE = """
WITH tc AS (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), s AS (
    SELECT user_id,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           sum(c * ln(CAST(c AS DOUBLE))) AS slog
    FROM tc GROUP BY 1
)
SELECT user_id, n_events, n_types,
       round(ln(CAST(n_events AS DOUBLE)) - slog / n_events, 6)
           AS behavior_entropy
FROM s
"""


@register(
    "user_behavior_entropy",
    _USER_ENTROPY_ORACLE,
    doc="Shannon entropy of each user's event-type distribution "
    "(nats): the behavioral-diversity twin of doc_word_entropy — "
    "near-zero entropy flags single-action accounts (scrapers, "
    "monitoring probes), high entropy marks genuinely engaged "
    "users; a standard bot/engagement screen over the raw event "
    "log. Same algebraic form H = ln(n) - (Sum c*ln c)/n: two hash "
    "aggregations over (user, type) counts, no per-event "
    "probability column, rounded at 6 dp because the float "
    "Sum c*ln c is addition-order-dependent across partitions and "
    "JVM/libm ln differs by 1 ulp. NULL user_id is one group in "
    "both engines (the r8 anonymous-events contract).",
)
def user_behavior_entropy(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    tc = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    s = tc.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("slog"),
    )
    return s.select(
        "user_id",
        "n_events",
        "n_types",
        F.round(
            F.log(F.col("n_events").cast("double"))
            - F.col("slog") / F.col("n_events"),
            6,
        ).alias("behavior_entropy"),
    )


# ---------------------------------------------------------------------------
# D1 / D7 / D30 activation retention (round 9)
# ---------------------------------------------------------------------------

_ACTIVATION_ORACLE = """
WITH signups AS (
    SELECT user_id, min(ts) AS s_ts
    FROM events
    WHERE event_type = 'signup' AND user_id IS NOT NULL
    GROUP BY 1
), flags AS (
    SELECT s.user_id, CAST(s.s_ts AS DATE) AS cohort_day,
           max(CASE WHEN e.ts > s.s_ts
                     AND e.ts <= s.s_ts + INTERVAL 1 DAY
                    THEN 1 ELSE 0 END) AS d1,
           max(CASE WHEN e.ts > s.s_ts
                     AND e.ts <= s.s_ts + INTERVAL 7 DAY
                    THEN 1 ELSE 0 END) AS d7,
           max(CASE WHEN e.ts > s.s_ts
                     AND e.ts <= s.s_ts + INTERVAL 30 DAY
                    THEN 1 ELSE 0 END) AS d30
    FROM signups s
    LEFT JOIN events e ON e.user_id = s.user_id
    GROUP BY 1, 2
)
SELECT cohort_day,
       CAST(count(*) AS BIGINT) AS n_signups,
       CAST(sum(d1) AS BIGINT) AS d1_retained,
       CAST(sum(d7) AS BIGINT) AS d7_retained,
       CAST(sum(d30) AS BIGINT) AS d30_retained,
       CAST(sum(d1) AS DOUBLE) / count(*) AS d1_rate,
       CAST(sum(d7) AS DOUBLE) / count(*) AS d7_rate,
       CAST(sum(d30) AS DOUBLE) / count(*) AS d30_rate
FROM flags GROUP BY 1
"""


@register(
    "cohort_activation_d1_d7_d30",
    _ACTIVATION_ORACLE,
    doc="D1/D7/D30 activation retention by signup-day cohort: for "
    "each user's FIRST signup, whether ANY later event lands within "
    "1/7/30 days — the standard growth-accounting readout "
    "(cohort_retention gives the full month-grain triangle; this is "
    "the day-grain bounded-horizon form product teams pin on "
    "dashboards). Exactness: integer flag sums and one final "
    "double division per rate; window edges are strict-open on the "
    "signup instant and closed at +N days, both engines comparing "
    "the same microsecond timestamps. Scale: one user-grain "
    "min-agg, one hash join on user_id with map-side flag "
    "aggregation (never a per-event window), then a day-grain "
    "metadata agg.",
)
def cohort_activation_d1_d7_d30(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    signups = (
        ev.filter(
            (F.col("event_type") == "signup") & F.col("user_id").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    e = ev.select("user_id", F.col("ts").alias("e_ts"))
    flag = lambda days: F.max(
        F.when(
            (F.col("e_ts") > F.col("s_ts"))
            & (F.col("e_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {days} DAYS")),
            1,
        ).otherwise(0)
    )
    flags = (
        signups.join(e, "user_id", "left")
        .groupBy("user_id", F.to_date("s_ts").alias("cohort_day"))
        .agg(flag(1).alias("d1"), flag(7).alias("d7"), flag(30).alias("d30"))
    )
    return flags.groupBy("cohort_day").agg(
        F.count("*").alias("n_signups"),
        F.sum("d1").alias("d1_retained"),
        F.sum("d7").alias("d7_retained"),
        F.sum("d30").alias("d30_retained"),
        (F.sum("d1").cast("double") / F.count("*")).alias("d1_rate"),
        (F.sum("d7").cast("double") / F.count("*")).alias("d7_rate"),
        (F.sum("d30").cast("double") / F.count("*")).alias("d30_rate"),
    )
