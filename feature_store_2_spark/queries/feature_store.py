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
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k,
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
        CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS total_click_amount,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS total_purchase_amount
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
           / count(DISTINCT user_id) AS denial_rate,
       count(DISTINCT CASE WHEN value < 2.0 THEN user_id END)
           / count(DISTINCT user_id) > 0.05 AS circuit_open
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
