"""Streaming sliding-window denial rate — the circuit breaker (A16/A17).

Reference parity: per-feature deque of (ts, user_id, success) with
trailing 10-minute eviction and distinct total/denied user sets
(/root/reference/services/user_feature.py:26-30,57-73), re-evaluated
every 15 seconds; denial_rate > 5% opens the circuit (fail-open)
(services/user_feature.py:98-126). The reference evicts a user when
their *oldest* entry expires even if newer in-window entries remain
(SURVEY.md §2 A16 bug); event-time windows are correct by construction.

Streaming shape: watermark drives state eviction (the deque trim);
``window(ts, "10 minutes", "15 seconds")`` assigns each access to its
sliding windows; ``approx_count_distinct`` (HLL++) replaces the exact
sets — exact ``countDistinct`` is unsupported in streaming aggregations
and at 100 TB the exact distinct shuffle would dominate anyway; ±2%
error on a 5% threshold is the right trade. The batch analog with exact
distincts (plans/circuit_breaker.py) is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_2_spark.plans.circuit_breaker import DENIAL_RATE_THRESHOLD


def streaming_denial_rate(
    access_log: DataFrame,
    denied: Column,
    window_size: str = "10 minutes",
    slide: str = "15 seconds",
    key: str = "event_type",
    watermark_delay: str = "10 minutes",
    threshold: float = DENIAL_RATE_THRESHOLD,
) -> DataFrame:
    """Streaming per-(window, key) denial rate + circuit state.

    Attach to a sink with ``outputMode("update")`` and
    ``trigger(processingTime="15 seconds")`` for the reference's cadence
    (services/user_feature.py:104), or ``availableNow`` for backfill.
    """
    return (
        access_log.withWatermark("ts", watermark_delay)
        .withColumn("__denied", denied)
        .groupBy(F.window("ts", window_size, slide).alias("w"), F.col(key))
        .agg(
            F.approx_count_distinct("user_id").alias("total_users"),
            F.approx_count_distinct(
                F.when(F.col("__denied"), F.col("user_id"))
            ).alias("denied_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "total_users",
            "denied_users",
            # nullif: approx_count_distinct ignores NULL user_ids, so a
            # window of purely-anonymous traffic has total_users = 0 —
            # the bare ANSI division would kill the STREAM (round-8
            # anonymous-events fixture find, the batch twin's guard
            # mirrored).
            (
                F.col("denied_users")
                / F.nullif(F.col("total_users"), F.lit(0))
            ).alias("denial_rate"),
            (
                F.col("denied_users")
                / F.nullif(F.col("total_users"), F.lit(0))
                > F.lit(threshold)
            ).alias("circuit_open"),
        )
    )
