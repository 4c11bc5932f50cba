"""Funnel-fold semantics (queries/behavior.py) on hand-built timelines
where the strict-ordering edge cases are known by inspection. The
DuckDB oracle already proves corpus-level equivalence; these pin the
tricky per-user transitions: same-timestamp stages must NOT chain,
out-of-order stages must not count, and stage 1 needs no predecessor."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries.behavior import funnel_conversion


def _stage(spark, tmp_path, rows):
    """rows: [(user_id, seconds_offset, event_type)] -> {user: stage}."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=sec), uid, et, 1.0, "{}")
            for i, (uid, sec, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = funnel_conversion(spark, sf)
    return {r["user_id"]: r["funnel_stage"] for r in out.collect()}


def test_full_funnel_in_order(spark, tmp_path):
    rows = [(1, 0, "signup"), (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase")]
    assert _stage(spark, tmp_path, rows) == {1: 4}


def test_out_of_order_stages_do_not_count(spark, tmp_path):
    # purchase/click BEFORE the view: funnel stops at view.
    rows = [(1, 0, "signup"), (1, 1, "purchase"), (1, 2, "click"), (1, 3, "view")]
    assert _stage(spark, tmp_path, rows) == {1: 2}


def test_same_timestamp_does_not_chain(spark, tmp_path):
    # view at exactly the signup ts: strict '>' rejects it.
    rows = [(1, 0, "signup"), (1, 0, "view")]
    assert _stage(spark, tmp_path, rows) == {1: 1}


def test_no_signup_means_stage_zero(spark, tmp_path):
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"), (2, 0, "signup")]
    assert _stage(spark, tmp_path, rows) == {1: 0, 2: 1}


def test_later_events_can_resume_funnel(spark, tmp_path):
    # First view precedes signup (ignored); a later view resumes the chain.
    rows = [(1, 0, "view"), (1, 5, "signup"), (1, 9, "view"), (1, 11, "click")]
    assert _stage(spark, tmp_path, rows) == {1: 3}
