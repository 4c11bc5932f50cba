"""Property-based invariants (hypothesis) for the round-6 time-series
family, checked against randomly generated event logs. Each example is
a full Spark plan execution, so max_examples stays low (the
test_properties.py convention); the point is adversarial shapes —
single-event users, same-timestamp bursts, gap-heavy calendars — not
volume.

Invariants:
  * throttle partitions events exactly: kept + suppressed = user total,
    and every kept id is a real event id of that user;
  * interval coalescing: longest <= total span <= n_events * 5 min, and
    n_intervals <= n_events;
  * EWMA lies within [min, max] of the daily counts in its own window;
  * RFM scores are in 1..5 and recency is non-negative;
  * activity bitmap: popcount(mask) == n_active_days and span
    accounting closes (active + gaps == span).
"""

import datetime as dt
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feature_store_2_spark.queries.timeseries import (
    agg_activity_bitmap,
    rate_limit_throttle,
    rfm_segmentation,
    ts_ewma_daily_volume,
    window_interval_coalesce,
)

_BASE = dt.datetime(2024, 1, 1)

# (user_id 1-3, minute offset 0..4320 [3 days], event_type)
_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=4320),
        st.sampled_from(["view", "click", "purchase", "signup"]),
    ),
    min_size=1,
    max_size=25,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _stage(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i, _BASE + dt.timedelta(minutes=m), uid, et, float(i % 7) + 0.5, "{}")
            for i, (uid, m, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), f"sf{abs(hash(tuple(rows))) % 10**8}")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    return sf


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_throttle_partitions_events_exactly(spark, tmp_path, rows):
    sf = _stage(spark, tmp_path, rows)
    per_user = {}
    for i, (uid, _m, _et) in enumerate(rows):
        per_user.setdefault(uid, set()).add(i)
    for r in rate_limit_throttle(spark, sf).collect():
        ids = per_user[r["user_id"]]
        assert r["n_kept"] + r["n_suppressed"] == len(ids)
        assert 1 <= r["n_kept"] <= len(ids)


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_interval_coalesce_bounds(spark, tmp_path, rows):
    sf = _stage(spark, tmp_path, rows)
    n_by_user = {}
    for uid, _m, _et in rows:
        n_by_user[uid] = n_by_user.get(uid, 0) + 1
    five_min = 5 * 60 * 1_000_000
    for r in window_interval_coalesce(spark, sf).collect():
        n = n_by_user[r["user_id"]]
        assert 1 <= r["n_intervals"] <= n
        assert r["longest_us"] <= r["total_span_us"] <= n * five_min
        assert r["longest_us"] >= five_min


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_ewma_within_window_envelope(spark, tmp_path, rows):
    sf = _stage(spark, tmp_path, rows)
    daily = {}
    for uid, m, et in rows:
        d = (_BASE + dt.timedelta(minutes=m)).date()
        daily[(et, d)] = daily.get((et, d), 0) + 1
    for r in ts_ewma_daily_volume(spark, sf).collect():
        window = [
            c
            for (et, d), c in daily.items()
            if et == r["event_type"] and 0 <= (r["d"] - d).days <= 9
        ]
        assert min(window) <= r["ewma"] <= max(window)
        assert r["n_days"] == len(window)


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_rfm_scores_in_range(spark, tmp_path, rows):
    sf = _stage(spark, tmp_path, rows)
    for r in rfm_segmentation(spark, sf).collect():
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["recency_days"] >= 0
        assert r["frequency"] >= 1


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_activity_bitmap_popcount_and_span(spark, tmp_path, rows):
    sf = _stage(spark, tmp_path, rows)
    for r in agg_activity_bitmap(spark, sf).collect():
        assert bin(r["mask"]).count("1") == r["n_active_days"]
        span = r["last_day"] - r["first_day"] + 1
        assert r["n_active_days"] + r["n_gap_days"] == span
        assert r["mask"] >> r["first_day"] & 1
        assert r["mask"] >> r["last_day"] & 1
