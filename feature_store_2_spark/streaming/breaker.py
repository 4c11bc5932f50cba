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
sliding windows. Two variants:

- ``streaming_denial_rate`` — ``approx_count_distinct`` (HLL++) in a
  single update-mode aggregation: ±2% error on a 5% threshold, minimal
  state, emits provisional open windows every trigger — the serving
  cadence the reference's 15-second loop implies.
- ``streaming_denial_rate_exact`` (r10) — EXACT distincts via chained
  stateful aggregations (Spark 3.4+ multiple-stateful-operator
  support): level 1 collapses to (window, key, user) with a bool_or of
  denied, level 2 counts the collapsed rows. Append mode — only
  watermark-closed windows emit, which is what makes the result
  deterministic and exactly oracle-checkable. State cost: level 1
  holds one row per (window, key, distinct user in window) — bounded
  by window span x active users, NOT by event volume; level 2 is the
  tiny per-window count. At 100 TB the level-1 state is the same
  cardinality the exact batch distinct would shuffle, spread over the
  window's lifetime — affordable when windows are short; the HLL
  variant remains the long-window/unbounded-cardinality trade.

Crossover threshold (measured, r11 — SCALING.md "Exact-vs-HLL breaker
crossover", tools/breaker_crossover.py): level-1 state ~= (active
users per window) x (window/slide overlapping windows). At the
reference's 10 min/5 min shape that was 0.18x input; at 24 h/2 h over
a 50k-user population it reached 2.3x input (every (user, window)
pair resident) while the HLL variant held 28 constant-size rows. Run
the exact form while (window/slide) x users-per-window stays well
under event volume; switch to HLL or lengthen the slide past that.
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


def streaming_denial_rate_exact(
    access_log: DataFrame,
    denied: Column,
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    key: str = "event_type",
    watermark_delay: str = "10 minutes",
    threshold: float = DENIAL_RATE_THRESHOLD,
) -> DataFrame:
    """EXACT per-(window, key) distinct-user denial rate.

    count(DISTINCT) is unsupported in a streaming aggregation, so the
    distinct is computed as two chained stateful aggregations: collapse
    to one row per (window, key, user) carrying bool_or(denied), then
    count the collapsed rows. Attach with ``outputMode("append")`` —
    chained stateful operators require it, and it is the semantics that
    makes the output exact: a window row emits once, when the watermark
    passes its end (window_end <= max(ts) - delay), never provisionally.

    NULL user_ids (anonymous traffic) collapse to one level-1 row that
    level 2's count(user_id) skips — matching the batch twin's
    count(DISTINCT user_id), which also ignores NULLs; an all-anonymous
    window therefore has total_users = 0 and a NULL rate (nullif guard).
    """
    lvl1 = (
        access_log.withWatermark("ts", watermark_delay)
        .withColumn("__denied", denied)
        .groupBy(
            F.window("ts", window_size, slide).alias("w"),
            F.col(key),
            F.col("user_id"),
        )
        .agg(F.max("__denied").alias("user_denied"))
    )
    rate = F.col("denied_users") / F.nullif(F.col("total_users"), F.lit(0))
    return (
        lvl1.groupBy("w", key)
        .agg(
            F.count("user_id").alias("total_users"),
            F.count(
                F.when(
                    F.col("user_denied") & F.col("user_id").isNotNull(), 1
                )
            ).alias("denied_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "total_users",
            "denied_users",
            rate.alias("denial_rate"),
            (rate > F.lit(threshold)).alias("circuit_open"),
        )
    )
