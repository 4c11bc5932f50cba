"""Feature-store query family: the reference's dataflow over the driver's
events table, each paired with a DuckDB oracle.

Reference parity is via plans/feature_pipeline.py (aggregates A5-A7,
rules A9-A11, grants A12/A14) and plans/circuit_breaker.py (A16/A17);
see those modules for file:line citations into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_2_spark.config import DEFAULT_CONFIG
from feature_store_2_spark.plans.circuit_breaker import windowed_denial_rate
from feature_store_2_spark.plans.feature_pipeline import (
    feature_grants_long,
    feature_grants_wide,
    user_aggregates,
)
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table

# Shared oracle CTEs: uuid-dedup then per-user conditional aggregation —
# the SQL rendering of user_aggregates(DEFAULT_CONFIG). DECIMAL
# accumulation keeps SUM order-independent so hashes match Spark's.
_AGG_CTE = """
WITH dedup AS (
    SELECT user_id, event_id,
           min(event_type) AS event_type,
           -- strict-integer props field (the r9 props-envelope
           -- contract): non-integer k values are MISSING, not errors;
           -- the regex gate mirrors Spark try_cast's strict integer
           -- parse (DuckDB's bare TRY_CAST would round '1.5' to 2)
           min(CASE WHEN regexp_matches(
                        regexp_replace(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g'),
                        '^[+-]?[0-9]+$')
                    THEN TRY_CAST(regexp_replace(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g')
                                  AS BIGINT) END) AS k,
           min(value) AS value
    FROM events
    GROUP BY user_id, event_id
),
agg AS (
    SELECT
        user_id,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS total_error_flags,
        count(DISTINCT CASE WHEN event_type = 'signup' THEN k END) AS signup_distinct_ks,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS total_signups,
        CAST(sum(CASE WHEN event_type = 'click' THEN CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,2)) END END) AS DOUBLE) AS total_click_amount,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,2)) END END) AS DOUBLE) AS total_purchase_amount
    FROM dedup
    GROUP BY user_id
),
rules AS (
    SELECT
        user_id, total_error_flags, signup_distinct_ks, total_signups,
        total_click_amount, total_purchase_amount,
        coalesce(total_error_flags, 0) < 3 AS cannot_error_message,
        CASE WHEN coalesce(total_signups, 0) < 2 THEN TRUE
             ELSE (CASE WHEN total_signups = 0 THEN 0.0
                        ELSE signup_distinct_ks / total_signups END) < 0.95
        END AS too_many_distinct_ks,
        (CASE WHEN coalesce(total_purchase_amount, 0.0) = 0 THEN 0.0
              ELSE coalesce(total_click_amount, 0.0) / total_purchase_amount
         END) < 1.0 AS click_to_purchase_ratio
    FROM agg
)
"""


@register(
    "fs_user_aggregates",
    _AGG_CTE + "SELECT user_id, total_error_flags, signup_distinct_ks, total_signups,"
    " total_click_amount, total_purchase_amount FROM agg",
    doc="per-user incremental aggregates (SURVEY §2 A5-A7) in one pass",
)
def fs_user_aggregates(spark, sf_dir):
    return user_aggregates(load_table(spark, "events", sf_dir), DEFAULT_CONFIG)


@register(
    "fs_feature_grants",
    _AGG_CTE
    + """
, wide AS (
    SELECT user_id,
           too_many_distinct_ks AND click_to_purchase_ratio AS purchase_grant,
           cannot_error_message AS message_grant
    FROM rules
)
SELECT user_id, 'purchase' AS feature, purchase_grant AS has_grant FROM wide
UNION ALL
SELECT user_id, 'message' AS feature, message_grant AS has_grant FROM wide
""",
    doc="grants table: rules -> feature conjunctions (A9-A14)",
)
def fs_feature_grants(spark, sf_dir):
    return feature_grants_long(load_table(spark, "events", sf_dir), DEFAULT_CONFIG)


@register(
    "fs_purchase_allowlist",
    _AGG_CTE
    + """
SELECT user_id,
       CASE WHEN coalesce(total_purchase_amount, 0.0) = 0 THEN 0.0
            ELSE coalesce(total_click_amount, 0.0) / total_purchase_amount
       END AS click_purchase_ratio
FROM rules
WHERE too_many_distinct_ks AND click_to_purchase_ratio
""",
    doc="flagship: users allowed the purchase feature, with their ratio",
)
def fs_purchase_allowlist(spark, sf_dir):
    wide = feature_grants_wide(load_table(spark, "events", sf_dir), DEFAULT_CONFIG)
    num = F.coalesce(F.col("total_click_amount"), F.lit(0.0))
    den = F.coalesce(F.col("total_purchase_amount"), F.lit(0.0))
    return wide.filter(F.col("purchase_grant")).select(
        "user_id",
        F.when(den == 0, F.lit(0.0)).otherwise(num / den).alias("click_purchase_ratio"),
    )


@register(
    "fs_windowed_denial_rate",
    """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start_epoch,
       event_type,
       count(DISTINCT user_id) AS total_users,
       count(DISTINCT CASE WHEN value < 2.0 THEN user_id END) AS denied_users,
       count(DISTINCT CASE WHEN value < 2.0 THEN user_id END)
           / nullif(count(DISTINCT user_id), 0) AS denial_rate,
       count(DISTINCT CASE WHEN value < 2.0 THEN user_id END)
           / nullif(count(DISTINCT user_id), 0) > 0.05 AS circuit_open
FROM events
GROUP BY 1, 2
""",
    doc="10-min tumbling distinct-user denial rate + circuit state (A16/A17)",
)
def fs_windowed_denial_rate(spark, sf_dir):
    out = windowed_denial_rate(
        load_table(spark, "events", sf_dir), denied=F.col("value") < 2.0
    )
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_epoch"),
        "event_type",
        "total_users",
        "denied_users",
        "denial_rate",
        "circuit_open",
    )


_PIT_ORACLE = """
WITH labels AS (
    SELECT event_id AS label_id, user_id, ts AS label_ts, value AS label
    FROM events WHERE event_type = 'purchase'
), sig AS (
    SELECT user_id, ts, value, event_id FROM events
    WHERE event_type = 'signup'
), f1 AS (
    SELECT label_id, last_signup_value FROM (
        SELECT l.label_id, s.value AS last_signup_value,
               row_number() OVER (
                   PARTITION BY l.label_id
                   ORDER BY s.ts DESC, s.event_id DESC) AS rk
        FROM labels l JOIN sig s
          ON s.user_id = l.user_id AND s.ts < l.label_ts)
    WHERE rk = 1
), f2 AS (
    SELECT l.label_id, count(*) AS clicks_7d
    FROM labels l JOIN events c
      ON c.user_id = l.user_id AND c.event_type = 'click'
     AND c.ts < l.label_ts AND c.ts >= l.label_ts - INTERVAL 7 DAY
    GROUP BY l.label_id
)
SELECT l.label_id, l.user_id,
       CAST(epoch_us(l.label_ts) AS BIGINT) AS label_ts_us,
       l.label,
       f1.last_signup_value,
       CAST(COALESCE(f2.clicks_7d, 0) AS BIGINT) AS clicks_7d
FROM labels l
LEFT JOIN f1 ON l.label_id = f1.label_id
LEFT JOIN f2 ON l.label_id = f2.label_id
"""


@register(
    "fs_point_in_time_training_set",
    _PIT_ORACLE,
    doc="point-in-time-correct training-set assembly — THE feature-store "
    "read (reference: the per-user aggregates of "
    "services/aggregates.py become features; this is how they join "
    "onto labels WITHOUT leakage): each purchase (label) is enriched "
    "with (a) the user's last signup value STRICTLY BEFORE the label "
    "timestamp (as-of semantics — a later signup must never leak "
    "backward) and (b) the trailing-7-day click count ending strictly "
    "before the label. Spark side runs both features leakage-free in "
    "ONE pass each: the as-of via a union-merge (ts, kind) window "
    "(no range join), the trailing count via the same user-keyed "
    "hash join + residual time filter as attribution_time_decay. "
    "Exactness: BIGINT microseconds, integer counts, doubles only "
    "copied (never computed); as-of ties broken toward the latest "
    "(ts, event_id). The oracle states the same semantics as "
    "correlated range joins — two independent formulations agreeing "
    "is the leakage proof.",
)
def fs_point_in_time_training_set(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    # Feature (a): last signup value strictly before each purchase, via
    # one union-merge timeline per user — signups carry their value,
    # purchases read the running last signup seen so far. Strictly
    # before: order purchases ahead of same-ts signups via kind flag
    # (signup kind=0 sorts after purchase kind=-1 at equal ts? No:
    # "strictly before" means a same-ts signup must NOT be visible, so
    # purchases sort FIRST at equal ts -> kind purchase=0 < signup=1).
    sig = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.col("event_id").alias("sig_id"),
        F.col("value").alias("sig_value"),
        F.lit(None).cast("long").alias("label_id"),
        F.lit(None).cast("double").alias("label"),
    )
    lab = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("sig_id"),
        F.lit(None).cast("double").alias("sig_value"),
        F.col("event_id").alias("label_id"),
        F.col("value").alias("label"),
    )
    merged = sig.unionByName(lab)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "sig_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    asof = (
        merged.withColumn("last_signup_value", F.last("sig_value", True).over(w))
        .filter(F.col("label_id").isNotNull())
        .select(
            "label_id",
            "user_id",
            F.unix_micros("ts").alias("label_ts_us"),
            F.col("ts").alias("label_ts"),
            "label",
            "last_signup_value",
        )
    )
    # Feature (b): trailing 7-day click count, strictly before.
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    f2 = (
        asof.join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") < F.col("label_ts"))
            & (
                F.col("c_ts")
                >= F.col("label_ts") - F.expr("INTERVAL 7 DAYS")
            ),
        )
        .groupBy("label_id")
        .agg(F.count("*").alias("clicks_7d"))
    )
    return asof.join(f2, "label_id", "left").select(
        "label_id",
        "user_id",
        "label_ts_us",
        "label",
        "last_signup_value",
        F.coalesce(F.col("clicks_7d"), F.lit(0))
        .cast("long")
        .alias("clicks_7d"),
    )


# ---------------------------------------------------------------------------
# Grant flip audit between two corpus snapshots (round 9)
# ---------------------------------------------------------------------------


def _grants_cte(suffix: str, where: str) -> str:
    """One parameterized instance of the dedup→agg→rules→grants chain
    (CTE names suffixed so two snapshots coexist in one query). Mirrors
    _AGG_CTE exactly — same strict-integer k gate, decimal sums, rule
    conjunctions — plus the long grants projection."""
    return f"""
dedup_{suffix} AS (
    SELECT user_id, event_id,
           min(event_type) AS event_type,
           min(CASE WHEN regexp_matches(
                        regexp_replace(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g'),
                        '^[+-]?[0-9]+$')
                    THEN TRY_CAST(regexp_replace(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7F]+|[\\x00-\\x20\\x7F]+$', '', 'g')
                                  AS BIGINT) END) AS k,
           min(value) AS value
    FROM events {where}
    GROUP BY user_id, event_id
),
agg_{suffix} AS (
    SELECT
        user_id,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS total_error_flags,
        count(DISTINCT CASE WHEN event_type = 'signup' THEN k END) AS signup_distinct_ks,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS total_signups,
        CAST(sum(CASE WHEN event_type = 'click' THEN CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,2)) END END) AS DOUBLE) AS total_click_amount,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,2)) END END) AS DOUBLE) AS total_purchase_amount
    FROM dedup_{suffix}
    GROUP BY user_id
),
rules_{suffix} AS (
    SELECT user_id,
        coalesce(total_error_flags, 0) < 3 AS cannot_error_message,
        CASE WHEN coalesce(total_signups, 0) < 2 THEN TRUE
             ELSE (CASE WHEN total_signups = 0 THEN 0.0
                        ELSE signup_distinct_ks / total_signups END) < 0.95
        END AS too_many_distinct_ks,
        (CASE WHEN coalesce(total_purchase_amount, 0.0) = 0 THEN 0.0
              ELSE coalesce(total_click_amount, 0.0) / total_purchase_amount
         END) < 1.0 AS click_to_purchase_ratio
    FROM agg_{suffix}
),
grants_{suffix} AS (
    SELECT user_id, 'purchase' AS feature,
           too_many_distinct_ks AND click_to_purchase_ratio AS has_grant
    FROM rules_{suffix}
    UNION ALL
    SELECT user_id, 'message', cannot_error_message FROM rules_{suffix}
)"""


_FLIP_ORACLE = (
    """
WITH cut AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS c FROM events
),"""
    + _grants_cte("pre", "WHERE epoch_us(ts) <= (SELECT c FROM cut)")
    + ","
    + _grants_cte("now", "")
    + """
SELECT coalesce(n.user_id, p.user_id) AS user_id,
       coalesce(n.feature, p.feature) AS feature,
       coalesce(p.has_grant, FALSE) AS had_grant,
       coalesce(n.has_grant, FALSE) AS has_grant,
       CASE WHEN coalesce(n.has_grant, FALSE) THEN 'gained'
            ELSE 'lost' END AS flip
FROM grants_pre p
FULL JOIN grants_now n
  ON p.user_id = n.user_id AND p.feature = n.feature
WHERE coalesce(p.has_grant, FALSE) <> coalesce(n.has_grant, FALSE)
"""
)


@register(
    "fs_grant_flip_audit",
    _FLIP_ORACLE,
    doc="grant flip audit between two corpus snapshots: the feature "
    "pipeline evaluated on events up to the corpus midpoint vs the "
    "full corpus, emitting every (user, feature) whose grant FLIPPED "
    "— the batch analog of A18's change-notification stream (what "
    "changed, for whom, in which direction) and the audit a feature "
    "store runs before shipping a rules change. Absent-in-snapshot "
    "means no grant (FALSE) — the grants-table reading, distinct "
    "from A15's fail-open serving default, documented here. "
    "Exactness: both snapshots are the exact _AGG_CTE machinery "
    "(strict-integer k, decimal sums); the midpoint cut is integer "
    "micros floor-div, the CUPED pattern — no wall clock. Scale: "
    "the pre-snapshot is a filtered re-aggregation (partial aggs, "
    "same shuffle key), the diff one user-grain full outer join; "
    "flips out are change-volume-sized, not corpus-sized.",
)
def fs_grant_flip_audit(spark, sf_dir):
    from feature_store_2_spark.plans.feature_pipeline import (
        feature_grants_long,
    )

    ev = load_table(spark, "events", sf_dir)
    bounds = ev.agg(
        F.call_function(
            "div",
            F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")),
            F.lit(2),
        ).alias("c")
    )
    pre_events = (
        ev.crossJoin(F.broadcast(bounds))
        .filter(F.unix_micros("ts") <= F.col("c"))
        .drop("c")
    )
    pre = feature_grants_long(pre_events).select(
        "user_id", "feature", F.col("has_grant").alias("had_grant")
    )
    now = feature_grants_long(ev)
    joined = now.join(pre, ["user_id", "feature"], "full")
    had = F.coalesce("had_grant", F.lit(False))
    has = F.coalesce("has_grant", F.lit(False))
    return (
        joined.filter(had != has)
        .select(
            "user_id",
            "feature",
            had.alias("had_grant"),
            has.alias("has_grant"),
            F.when(has, "gained").otherwise("lost").alias("flip"),
        )
    )
