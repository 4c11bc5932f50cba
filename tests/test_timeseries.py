"""Edge-case pins for queries/timeseries.py on hand-built data where the
expected values are known by inspection. The DuckDB oracle proves
corpus-level equivalence; these pin the semantics the corpus may never
exercise: gap-day EWMA weights, step-change CUSUM argmax, same-window
throttle tie-breaks, immediate-adjacency pattern counts, the 7-day
attribution cutoff, and the Pareto 80% boundary."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries.timeseries import (
    attribution_time_decay,
    pareto_revenue_concentration,
    rate_limit_throttle,
    rfm_segmentation,
    seq_pattern_match,
    ts_cusum_changepoint,
    ts_ewma_daily_volume,
)

_BASE = dt.datetime(2024, 1, 1)


def _events(spark, tmp_path, rows):
    """rows: [(event_id, day_offset_float, user_id, event_type, value)]"""
    df = spark.createDataFrame(
        [
            (eid, _BASE + dt.timedelta(days=day), uid, et, val, "{}")
            for eid, day, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_ewma_gap_day_weights(spark, tmp_path):
    # Days 0 and 2 have clicks (3 and 1); day 1 is absent. EWMA at day 2
    # weights day 2 by 2^9 and day 0 by 2^7 — the gap day contributes
    # nothing to numerator OR denominator.
    rows = [(i, 0.1 * i, 1, "click", 1.0) for i in range(3)]  # day 0: 3
    rows += [(10, 2.5, 1, "click", 1.0)]  # day 2: 1
    sf = _events(spark, tmp_path, rows)
    out = {
        r["d"].isoformat(): (r["ewma"], r["n_days"])
        for r in ts_ewma_daily_volume(spark, sf).collect()
    }
    assert out["2024-01-01"] == (3.0, 1)
    num = 1 * 512 + 3 * 128
    den = 512 + 128
    assert out["2024-01-03"] == (num / den, 2)


def test_cusum_flags_step_change(spark, tmp_path):
    # 6 days of volume: 1,1,1,5,5,5 — CUSUM |S_t| peaks at day 3 (the
    # last day of the low regime): S_3 = 6*3 - 3*18 = -36.
    rows = []
    eid = 0
    for day in range(6):
        n = 1 if day < 3 else 5
        for _ in range(n):
            rows.append((eid, day + 0.5, 1, "view", 1.0))
            eid += 1
    sf = _events(spark, tmp_path, rows)
    row = ts_cusum_changepoint(spark, sf).collect()[0]
    assert row["change_day"].isoformat() == "2024-01-03"
    assert row["cusum_scaled"] == -36
    assert row["n_days"] == 6


def test_throttle_keeps_earliest_and_breaks_ties_by_id(spark, tmp_path):
    sec = 1.0 / 86400
    rows = [
        (5, 0.0, 1, "view", 1.0),       # window 0, kept (earliest)
        (3, 60 * sec, 1, "view", 1.0),  # window 0, suppressed
        (9, 0.0, 2, "view", 1.0),       # tie on ts with id 7 -> 7 kept
        (7, 0.0, 2, "view", 1.0),
        (4, 700 * sec, 1, "view", 1.0),  # window 1, kept
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["user_id"]: (r["n_kept"], r["n_suppressed"], r["kept_id_checksum"])
        for r in rate_limit_throttle(spark, sf).collect()
    }
    assert out[1] == (2, 1, 5 + 4)
    assert out[2] == (1, 1, 7)


def test_seq_pattern_requires_adjacency(spark, tmp_path):
    # user 1: click,view,purchase -> 'cvp', no adjacent 'cp'.
    # user 2: click,purchase,click,purchase,error -> 'cpcpe': 2 matches,
    # and purchase-then-error holds.
    rows = [
        (1, 0.0, 1, "click", 1.0),
        (2, 0.1, 1, "view", 1.0),
        (3, 0.2, 1, "purchase", 1.0),
        (4, 0.0, 2, "click", 1.0),
        (5, 0.1, 2, "purchase", 1.0),
        (6, 0.2, 2, "click", 1.0),
        (7, 0.3, 2, "purchase", 1.0),
        (8, 0.4, 2, "error", 1.0),
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["user_id"]: (
            r["seq_len"],
            r["n_click_then_purchase"],
            r["purchase_then_error"],
        )
        for r in seq_pattern_match(spark, sf).collect()
    }
    assert out[1] == (3, 0, False)
    assert out[2] == (5, 2, True)


def test_attribution_decay_and_cutoff(spark, tmp_path):
    # Purchase at day 10.5 (noon). Touches: view same calendar day
    # (weight 1), click 1 day before (0.5), view 7 calendar days before
    # (0.0078125, and within the 7-day ts window at 6.9 days), click 9
    # days before (excluded by ts window), view AFTER (excluded).
    rows = [
        (1, 10.5, 1, "purchase", 9.9),
        (2, 10.2, 1, "view", 1.0),            # same date -> weight 1
        (3, 9.0, 1, "click", 1.0),            # 1 day -> 0.5
        (4, 3.6, 1, "view", 1.0),             # 7 days -> 2^-7
        (5, 1.5, 1, "click", 1.0),            # 9 days -> excluded
        (6, 11.0, 1, "view", 1.0),            # after -> excluded
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["event_type"]: (r["credit"], r["n_touches"])
        for r in attribution_time_decay(spark, sf).collect()
    }
    assert out["view"] == (1.0 + 0.0078125, 2)
    assert out["click"] == (0.5, 1)


def test_rfm_scores_within_cohort(spark, tmp_path):
    # Two users in the same signup week; user 1 purchased more recently
    # and spent more -> r_score 1 (best recency quintile among 2 users)
    # and m_score 1; user 2 gets the later ntile bucket.
    rows = [
        (1, 0.0, 1, "signup", 0.0),
        (2, 0.5, 2, "signup", 0.0),
        (3, 5.0, 1, "purchase", 100.0),
        (4, 2.0, 2, "purchase", 10.0),
        (5, 5.5, 1, "view", 0.0),  # anchors the global max date
    ]
    sf = _events(spark, tmp_path, rows)
    out = {r["user_id"]: r.asDict() for r in rfm_segmentation(spark, sf).collect()}
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 3
    assert out[1]["r_score"] < out[2]["r_score"]
    assert out[1]["m_score"] < out[2]["m_score"]
    assert out[1]["cohort_week"] == out[2]["cohort_week"]


def test_pareto_boundary(spark, tmp_path):
    # One region, three customers with revenue 80/10/10: the top
    # customer alone reaches exactly 80% -> n_customers_80pct = 1.
    region = spark.createDataFrame(
        [(0, "AMERICA", "")], "r_regionkey long, r_name string, r_comment string"
    )
    nation = spark.createDataFrame(
        [(0, "BRAZIL", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    )
    customer = spark.createDataFrame(
        [(1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "BUILDING"),
         (3, "c", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(1, 1, "O", 80.0, _BASE, "1-URGENT"),
         (2, 2, "O", 10.0, _BASE, "1-URGENT"),
         (3, 3, "O", 10.0, _BASE, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    for name, df in [("region", region), ("nation", nation),
                     ("customer", customer), ("orders", orders)]:
        df.write.mode("overwrite").parquet(os.path.join(sf, f"{name}.parquet"))
    row = pareto_revenue_concentration(spark, sf).collect()[0]
    assert row["region"] == "AMERICA"
    assert row["n_customers_80pct"] == 1
    assert row["n_customers"] == 3
    assert row["region_revenue"] == 100.0
