"""Sliding-window access metrics + denial-rate circuit breaker (batch analog).

Reference parity: UserFeatureService keeps a per-feature deque of
(timestamp, user_id, success) with trailing 10-minute eviction and
distinct total/denied user sets (services/user_feature.py:26-30,57-73);
every 15 s the breaker opens when denial_rate > 5%
(services/user_feature.py:98-126). The reference's eviction drops a user
when their *oldest* entry leaves the window even if newer entries remain
(the A16 bug); event-time windows below are correct by construction.

Batch shape: the access log is the events stream itself; a "denial" is
modeled per-row by a configurable predicate. `F.window(ts, size, slide)`
assigns each row to its sliding windows (an explode-style projection, no
shuffle), then ONE groupBy((window, key)) computes distinct totals —
exact `countDistinct` here where the oracle must match; swap in
`approx_count_distinct` (HLL++) at 100 TB where a 2% error is fine and
the distinct-shuffle would dominate.

Streaming gets the same semantics from withWatermark + the identical
window aggregate (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENIAL_RATE_THRESHOLD = 0.05  # services/user_feature.py:118-121


def windowed_denial_rate(
    access_log: DataFrame,
    denied: Column,
    window_size: str = "10 minutes",
    slide: str | None = None,
    key: str = "event_type",
    threshold: float = DENIAL_RATE_THRESHOLD,
) -> DataFrame:
    """Per-(window, key) distinct-user denial rate and circuit state.

    Returns window_start, <key>, total_users, denied_users, denial_rate,
    circuit_open. denial_rate = |distinct denied users| / |distinct
    users| exactly as services/user_feature.py:106-121 computes it.
    """
    win = F.window("ts", window_size, slide) if slide else F.window("ts", window_size)
    # r12 (guide §2.3 — aggregate before you shuffle): the two
    # countDistincts planned as an Expand that DOUBLES every access row
    # before the distinct shuffle. Two-level form instead: pre-aggregate
    # per (window, key, user) — one boolean per user per window, exactly
    # the partial-aggregatable shape — then count users / denied users
    # over the per-user rows. Value-exact equivalences (profiled 12%
    # faster at sf0.1, proven row-set-EQUAL there): count("user_id")
    # skips the NULL-user group exactly as countDistinct skipped NULL
    # user_ids; max(__denied) over a user's rows is NULL only when every
    # row's predicate is NULL, in which case the old
    # when(__denied, user_id) also never produced that user. At 100 TB
    # the win is structural: the heavy shuffle carries one row per
    # (window, user) instead of 2x the raw access rows, and a hot user
    # no longer concentrates on one (window, key) reducer.
    per_user = (
        access_log.withColumn("__denied", denied)
        .groupBy(win.alias("w"), F.col(key), F.col("user_id"))
        .agg(F.max("__denied").alias("__any_denied"))
    )
    return (
        per_user.groupBy("w", key)
        .agg(
            F.count("user_id").alias("total_users"),
            F.count(
                F.when(
                    F.col("__any_denied") & F.col("user_id").isNotNull(),
                    F.lit(1),
                )
            ).alias("denied_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "total_users",
            "denied_users",
            # nullif: countDistinct ignores NULL user_ids, so a window
            # of purely-anonymous traffic has total_users = 0 — under
            # ANSI mode the bare division CRASHES the breaker (round-8
            # anonymous-events fixture find); NULL rate / NULL verdict
            # matches the oracle's division-by-zero semantics.
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
