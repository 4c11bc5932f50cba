"""Hand-computed pins for batch-4 round-6 operators: exact OLS trend,
median time-to-convert interpolation, cohort LTV accumulation, and PMI
collocation values."""

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries.behavior import (
    cohort_ltv_curve,
    funnel_time_to_convert,
)
from feature_store_2_spark.queries.llm_text import doc_term_pmi_collocations
from feature_store_2_spark.queries.timeseries import ts_daily_trend_slope

_BASE = dt.datetime(2024, 1, 1)  # a Monday


def _events(spark, tmp_path, rows):
    """rows: [(event_id, day_offset, user_id, event_type, value)]"""
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


def test_trend_slope_exact_line(spark, tmp_path):
    # Daily view counts 1, 2, 3 on consecutive days: slope 1, intercept 1.
    rows, eid = [], 0
    for day, n in enumerate([1, 2, 3]):
        for _ in range(n):
            rows.append((eid, day + 0.5, 1, "view", 1.0))
            eid += 1
    sf = _events(spark, tmp_path, rows)
    row = ts_daily_trend_slope(spark, sf).collect()[0]
    assert row["n_days"] == 3
    assert row["slope"] == 1.0
    assert row["intercept"] == 1.0


def test_time_to_convert_even_median_interpolates(spark, tmp_path):
    # Two converters in one cohort: diffs of 1 day and 3 days -> median
    # is the mean, 2 days in microseconds.
    rows = [
        (1, 0.0, 1, "signup", 0.0),
        (2, 1.0, 1, "purchase", 5.0),
        (3, 0.0, 2, "signup", 0.0),
        (4, 3.0, 2, "purchase", 5.0),
    ]
    sf = _events(spark, tmp_path, rows)
    row = funnel_time_to_convert(spark, sf).collect()[0]
    assert row["n_converted"] == 2
    assert row["median_us"] == 2 * 86400 * 1_000_000.0


def test_ltv_curve_accumulates_per_cohort_member(spark, tmp_path):
    # Two users join in week 0; purchases: 10 in week 0, 30 in week 1.
    rows = [
        (1, 0.0, 1, "signup", 0.0),
        (2, 1.0, 2, "signup", 0.0),
        (3, 2.0, 1, "purchase", 10.0),
        (4, 8.0, 2, "purchase", 30.0),
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["weeks_since"]: (r["cum_revenue"], r["ltv_per_user"])
        for r in cohort_ltv_curve(spark, sf).collect()
    }
    assert out[0] == (10.0, 5.0)
    assert out[1] == (40.0, 20.0)


def test_pmi_hand_computed(spark, tmp_path):
    # Docs: "a b", "a b", "a c", "b c". df(a)=df(b)=3, df(c)=2, n=4.
    # PMI(a,b) = ln(2*4/9); PMI(a,c) = PMI(b,c) = ln(1*4/6).
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in
         enumerate(["a b", "a b", "a c", "b c"])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        (r["t1"], r["t2"]): (r["n_codocs"], r["pmi"])
        for r in doc_term_pmi_collocations(spark, sf).collect()
    }
    assert out[("a", "b")] == (2, round(math.log(8 / 9), 6))
    assert out[("a", "c")] == (1, round(math.log(4 / 6), 6))
    assert out[("b", "c")] == (1, round(math.log(4 / 6), 6))


def test_label_propagation_clique_converges_and_isolated_keeps_own(
    spark, tmp_path
):
    from feature_store_2_spark.queries.llm_text import graph_label_propagation

    clique = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in
         enumerate([clique, clique, clique, "u v w x y z"])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r["doc_id"]: r["community"]
        for r in graph_label_propagation(spark, sf).collect()
    }
    # K3 clique: after 2 synchronous min-tie-break rounds all land on 0.
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[3] == 3  # isolated keeps its own label


def test_dow_seasonality_ratio(spark, tmp_path):
    from feature_store_2_spark.queries.timeseries import (
        ts_seasonality_dow_profile,
    )

    # Two Mondays (days 0, 7 from _BASE=Mon): volumes 1 and 3 ->
    # dow mean 2 -> ratios 0.5 and 1.5; iso_dow must be 1.
    rows = [(1, 0.5, 1, "view", 1.0)]
    rows += [(2 + i, 7.5, 1, "view", 1.0) for i in range(3)]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["d"].isoformat(): (r["iso_dow"], r["n_events"], r["seasonal_ratio"])
        for r in ts_seasonality_dow_profile(spark, sf).collect()
    }
    assert out["2024-01-01"] == (1, 1, 0.5)
    assert out["2024-01-08"] == (1, 3, 1.5)


def test_rolling_median_even_and_odd_frames(spark, tmp_path):
    from feature_store_2_spark.queries.timeseries import (
        ts_rolling_median_volume,
    )

    # Daily view counts 1, 9, 2: medians 1 (one day), 5.0 (even frame
    # interpolates), 2 (odd frame exact element).
    rows, eid = [], 0
    for day, n in enumerate([1, 9, 2]):
        for _ in range(n):
            rows.append((eid, day + 0.5, 1, "view", 1.0))
            eid += 1
    sf = _events(spark, tmp_path, rows)
    out = {
        r["d"].isoformat(): (r["rolling_median"], r["n_in_frame"])
        for r in ts_rolling_median_volume(spark, sf).collect()
    }
    assert out["2024-01-01"] == (1.0, 1)
    assert out["2024-01-02"] == (5.0, 2)
    assert out["2024-01-03"] == (2.0, 3)


def test_activity_bitmap_mask_and_gaps(spark, tmp_path):
    from feature_store_2_spark.queries.timeseries import agg_activity_bitmap

    # User 1 active on days 0, 2, 3 (relative to corpus min): mask
    # 0b1101 = 13, 3 active days, 1 gap day inside the [0,3] span.
    rows = [
        (1, 0.1, 1, "view", 1.0),
        (2, 2.1, 1, "view", 1.0),
        (3, 2.9, 1, "click", 1.0),
        (4, 3.5, 1, "view", 1.0),
    ]
    sf = _events(spark, tmp_path, rows)
    row = agg_activity_bitmap(spark, sf).collect()[0]
    assert row["mask"] == 0b1101
    assert row["n_active_days"] == 3
    assert (row["first_day"], row["last_day"]) == (0, 3)
    assert row["n_gap_days"] == 1


def test_autocorr_perfect_weekly_cycle(spark, tmp_path):
    from feature_store_2_spark.queries.timeseries import ts_autocorr_weekly

    # 14 days with volumes 1,2,1,2,... (period 2, so lag-7 pairs see a
    # perfectly ANTI-correlated series: odd lag flips phase): r^2 = 1,
    # sign negative.
    rows, eid = [], 0
    for day in range(14):
        n = 1 if day % 2 == 0 else 2
        for _ in range(n):
            rows.append((eid, day + 0.5, 1, "view", 1.0))
            eid += 1
    sf = _events(spark, tmp_path, rows)
    row = ts_autocorr_weekly(spark, sf).collect()[0]
    assert row["n_pairs"] == 7
    assert row["r_sign"] == -1
    assert row["r_squared"] == 1.0


def test_vocab_growth_first_occurrence_buckets(spark, tmp_path):
    from feature_store_2_spark.queries.llm_text import doc_vocab_growth_curve

    # 10 docs: doc 0 introduces {a, b}; doc 5 introduces {c}; doc 9
    # introduces {d}. Deciles: 0 -> 2 new, 5 -> 1, 9 -> 1; cum 2, 3, 4.
    texts = ["a b"] * 5 + ["a c"] * 4 + ["b d"]
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r["decile"]: (r["n_new_terms"], r["cum_vocab"])
        for r in doc_vocab_growth_curve(spark, sf).collect()
    }
    assert out == {0: (2, 2), 5: (1, 3), 9: (1, 4)}


def test_locf_ttl_serves_fresh_nulls_stale(spark, tmp_path):
    from feature_store_2_spark.queries.behavior import window_locf_with_ttl

    # Purchase at day 0; reads at day 1 (fresh), day 3 (stale -> NULL +
    # flag), and a read BEFORE any purchase (NULL, not stale).
    rows = [
        (1, 0.0, 1, "purchase", 42.0),
        (2, 1.0, 1, "view", 0.0),
        (3, 3.0, 1, "view", 0.0),
        (4, 0.0, 2, "view", 0.0),
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["event_id"]: (r["fresh_purchase_value"], r["went_stale"])
        for r in window_locf_with_ttl(spark, sf).collect()
    }
    assert out[1] == (42.0, False)  # the purchase row itself, age 0
    assert out[2] == (42.0, False)
    assert out[3] == (None, True)
    assert out[4] == (None, False)


def test_interarrival_mean_and_variance(spark, tmp_path):
    from feature_store_2_spark.queries.behavior import feat_interarrival_stats

    # Gaps of 1 day and 3 days: mean 2 days, population variance 1 day^2.
    rows = [
        (1, 0.0, 1, "view", 0.0),
        (2, 1.0, 1, "view", 0.0),
        (3, 4.0, 1, "view", 0.0),
    ]
    sf = _events(spark, tmp_path, rows)
    row = feat_interarrival_stats(spark, sf).collect()[0]
    day = 86400 * 1_000_000
    assert row["n_gaps"] == 2
    assert row["mean_gap_us"] == 2.0 * day
    assert row["var_gap_us2"] == 1.0 * day * day


def test_roc_points_cells_and_rates(spark, tmp_path):
    from feature_store_2_spark.queries.quality import eval_roc_points

    # Two docs: an 'en' doc scoring high and a 'de' doc scoring low.
    # "a b c" (n_chars=5): score = 50*3 + 30*3 - 2*5 = 230.
    # At threshold 0: both predicted positive -> TP=1, FP=1, TPR=FPR=1.
    # At threshold 1000: both negative -> FN=1, TN=1, TPR=FPR=0.
    df = spark.createDataFrame(
        [(0, "a b c", "en", "web", 5), (1, "a b c", "de", "web", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"], r["tpr"], r["fpr"])
        for r in eval_roc_points(spark, sf).collect()
    }
    assert out[0] == (1, 1, 0, 0, 1.0, 1.0)
    assert out[1000] == (0, 0, 1, 1, 0.0, 0.0)
    assert len(out) == 5


def test_wap_publishes_and_round_trips(spark, tmp_path):
    from feature_store_2_spark.queries.storage import (
        _STAGING_CACHE,
        storage_write_audit_publish,
    )

    rows = [
        (1, 0.5, 1, "view", 1.0),
        (2, 0.6, 2, "view", 1.0),
        (3, 1.5, 1, "click", 1.0),
    ]
    sf = _events(spark, tmp_path, rows)
    out1 = {
        (r["event_type"], r["d"].isoformat()): (r["n_events"], r["n_users"])
        for r in storage_write_audit_publish(spark, sf).collect()
    }
    assert out1[("view", "2024-01-01")] == (2, 2)
    assert out1[("click", "2024-01-02")] == (1, 1)
    # Second call serves the published table from the process cache —
    # same rows, no re-publish (the staging dir was renamed away).
    root = _STAGING_CACHE[("wap_daily", os.path.abspath(sf))]
    assert os.path.isdir(os.path.join(root, "published", "daily"))
    assert not os.path.exists(os.path.join(root, "staging", "daily"))
    out2 = {
        (r["event_type"], r["d"].isoformat()): (r["n_events"], r["n_users"])
        for r in storage_write_audit_publish(spark, sf).collect()
    }
    assert out2 == out1


def test_pit_training_set_no_leakage(spark, tmp_path):
    from feature_store_2_spark.queries.feature_store import (
        fs_point_in_time_training_set,
    )

    # User 1: signup v=1 at day 0, purchase at day 1 (sees v=1), signup
    # v=2 at day 2, purchase at day 3 (sees v=2). A same-timestamp
    # signup must NOT be visible: user 2's signup and purchase share
    # ts -> last_signup_value NULL. Clicks: one inside 7d, one outside.
    rows = [
        (1, 0.0, 1, "signup", 1.0),
        (2, 1.0, 1, "purchase", 10.0),
        (3, 2.0, 1, "signup", 2.0),
        (4, 3.0, 1, "purchase", 20.0),
        (5, 3.0, 2, "signup", 9.0),
        (6, 3.0, 2, "purchase", 30.0),
        (7, 2.5, 1, "click", 0.0),    # within 7d of both purchases? of day-3 yes
        (8, 0.5, 1, "click", 0.0),    # before day-1 purchase (0.5d), within 7d
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        r["label_id"]: (r["last_signup_value"], r["clicks_7d"])
        for r in fs_point_in_time_training_set(spark, sf).collect()
    }
    assert out[2] == (1.0, 1)   # day-1 purchase: signup v=1; click at 0.5
    assert out[4] == (2.0, 2)   # day-3 purchase: signup v=2; clicks 0.5, 2.5
    assert out[6] == (None, 0)  # same-ts signup invisible (strictly before)


def test_business_days_weekend_rolls(spark, tmp_path):
    from feature_store_2_spark.queries.scalar_funcs import func_business_days

    # Fri 2024-01-05 -> next biz Mon 01-08, SLA Fri 01-12.
    # Sat 2024-01-06 -> next biz Mon 01-08, SLA Mon 01-15.
    # Sun 2024-01-07 -> next biz Mon 01-08, SLA Mon 01-15.
    orders = spark.createDataFrame(
        [(1, 1, "O", 1.0, dt.datetime(2024, 1, 5), "1"),
         (2, 1, "O", 1.0, dt.datetime(2024, 1, 6), "1"),
         (3, 1, "O", 1.0, dt.datetime(2024, 1, 7), "1")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    orders.write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    out = {
        r["o_orderkey"]: (
            r["next_business_day"].isoformat(),
            r["sla_5bd"].isoformat(),
            r["placed_on_weekend"],
        )
        for r in func_business_days(spark, sf).collect()
    }
    assert out[1] == ("2024-01-08", "2024-01-12", False)
    assert out[2] == ("2024-01-08", "2024-01-15", True)
    assert out[3] == ("2024-01-08", "2024-01-15", True)


def test_k_anonymity_flags_small_and_undiverse_groups(spark, tmp_path):
    from feature_store_2_spark.queries.quality import dq_k_anonymity

    # Group (0, A): 5 members, balances both signs -> anonymous+diverse.
    # Group (1, B): 2 members -> NOT k-anonymous.
    # Group (2, C): 5 members, all positive -> anonymous but NOT diverse.
    rows = []
    for i in range(5):
        rows.append((i, f"c{i}", 0, 10.0 if i % 2 else -5.0, "A"))
    for i in range(5, 7):
        rows.append((i, f"c{i}", 1, 1.0, "B"))
    for i in range(7, 12):
        rows.append((i, f"c{i}", 2, 3.0, "C"))
    customer = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    customer.write.mode("overwrite").parquet(
        os.path.join(sf, "customer.parquet")
    )
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): (
            r["k_anonymous"], r["l_diverse"]
        )
        for r in dq_k_anonymity(spark, sf).collect()
    }
    assert out[(0, "A")] == (True, True)
    assert out[(1, "B")] == (False, False)
    assert out[(2, "C")] == (True, False)


def test_ivm_merge_equals_recompute_with_new_key_in_delta(spark, tmp_path):
    from feature_store_2_spark.queries.storage import (
        mv_incremental_maintenance,
    )

    # 'error' appears ONLY on the last (delta) day: the full-outer merge
    # must surface it; 'view' spans both sides and must add up.
    rows = [
        (1, 0.5, 1, "view", 1.5),
        (2, 1.5, 1, "view", 2.5),
        (3, 1.6, 2, "error", 4.0),
    ]
    sf = _events(spark, tmp_path, rows)
    out = {
        (r["event_type"], r["d"].isoformat()): (r["n_events"], r["total_value"])
        for r in mv_incremental_maintenance(spark, sf).collect()
    }
    assert out[("view", "2024-01-01")] == (1, 1.5)
    assert out[("view", "2024-01-02")] == (1, 2.5)
    assert out[("error", "2024-01-02")] == (1, 4.0)


def test_ledger_reconciliation_ranks_worst_diffs(spark, tmp_path):
    from feature_store_2_spark.queries.quality import dq_ledger_reconciliation

    orders = spark.createDataFrame(
        [(1, 1, "O", 100.0, _BASE, "1"), (2, 1, "O", 50.0, _BASE, "1")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 60.0, 0.0, 0.0, "N", "O", _BASE),
         (1, 2, 1, 2, 1.0, 40.0, 0.0, 0.0, "N", "O", _BASE),
         (2, 3, 1, 1, 1.0, 80.0, 0.0, 0.0, "N", "O", _BASE)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    sf = os.path.join(str(tmp_path), "sf")
    orders.write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    lineitem.write.mode("overwrite").parquet(
        os.path.join(sf, "lineitem.parquet")
    )
    rows = dq_ledger_reconciliation(spark, sf).collect()
    # Order 2 reconciles worst (|50-80|=30), order 1 exactly (|100-100|=0).
    assert [r["o_orderkey"] for r in rows] == [2, 1]
    assert rows[0]["abs_diff"] == 30.0
    assert rows[1]["abs_diff"] == 0.0
    assert rows[1]["n_lines"] == 2


def test_assoc_rules_support_confidence_lift(spark, tmp_path):
    from feature_store_2_spark.queries.behavior import (
        assoc_rules_session_pairs,
    )

    # 4 sessions (one per user, tight timestamps):
    #   u1: {view, click}; u2: {view, click}; u3: {view}; u4: {click}.
    # c(view)=3, c(click)=3, c12=2, n=4 ->
    # support 0.5, confidence 2/3, lift 2*4/9.
    rows = [
        (1, 0.000, 1, "view", 1.0), (2, 0.001, 1, "click", 1.0),
        (3, 0.000, 2, "view", 1.0), (4, 0.001, 2, "click", 1.0),
        (5, 0.000, 3, "view", 1.0),
        (6, 0.000, 4, "click", 1.0),
    ]
    sf = _events(spark, tmp_path, rows)
    rowsout = assoc_rules_session_pairs(spark, sf).collect()
    assert len(rowsout) == 1
    r = rowsout[0]
    assert (r["lhs"], r["rhs"]) == ("click", "view")
    assert r["n_cosessions"] == 2
    assert r["support"] == 0.5
    assert r["confidence_lhs_rhs"] == 2 / 3
    assert r["lift"] == 8 / 9


def test_link_prediction_wedge_minus_edges(spark, tmp_path):
    from feature_store_2_spark.queries.llm_text import graph_link_prediction

    # Path graph A-B-C (via >= 8 shared purchase days): A and C are
    # non-adjacent with one common neighbor B of degree 2 ->
    # AA = 1/ln(2). A-B and B-C adjacent -> excluded.
    rows, eid = [], 0
    # A(1)-B(2) share days 0-7; B(2)-C(3) share days 10-17; A and C
    # share only 0 days.
    for day in range(8):
        for uid in (1, 2):
            rows.append((eid, day + 0.5, uid, "purchase", 1.0)); eid += 1
    for day in range(10, 18):
        for uid in (2, 3):
            rows.append((eid, day + 0.5, uid, "purchase", 1.0)); eid += 1
    sf = _events(spark, tmp_path, rows)
    out = graph_link_prediction(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    import math
    assert (r["user_a"], r["user_b"]) == (1, 3)
    assert r["common_neighbors"] == 1
    assert r["adamic_adar"] == round(1 / math.log(2), 6)


def test_value_bands_exact_rank_picks(spark, tmp_path):
    from feature_store_2_spark.queries.timeseries import ts_value_band_profile

    # 10 purchases on one day with values 1..10: ceil ranks 1, 5, 9 ->
    # p10 = 1.0, p50 = 5.0, p90 = 9.0 (micro-units).
    rows = [(i, 0.5, 1, "purchase", float(i + 1)) for i in range(10)]
    sf = _events(spark, tmp_path, rows)
    row = ts_value_band_profile(spark, sf).collect()[0]
    assert row["n_purchases"] == 10
    assert row["p10_micro"] == 1_000_000
    assert row["p50_micro"] == 5_000_000
    assert row["p90_micro"] == 9_000_000


def test_frequent_motifs_counts_and_share(spark, tmp_path):
    from feature_store_2_spark.queries.behavior import seq_frequent_motifs

    # u1: v c p v c p -> trigrams vcp, cpv, pvc, vcp; u2: v c p -> vcp.
    # vcp: 3 occurrences across 2 users; total trigrams = 5.
    rows = []
    eid = 0
    for off, et in enumerate(["view", "click", "purchase"] * 2):
        rows.append((eid, 0.01 * off, 1, et, 1.0)); eid += 1
    for off, et in enumerate(["view", "click", "purchase"]):
        rows.append((eid, 0.01 * off, 2, et, 1.0)); eid += 1
    sf = _events(spark, tmp_path, rows)
    out = {
        r["motif"]: (r["n_occurrences"], r["n_users"], r["share"])
        for r in seq_frequent_motifs(spark, sf).collect()
    }
    assert out["view>click>purchase"] == (3, 2, 3 / 5)
    assert out["click>purchase>view"] == (1, 1, 1 / 5)
    assert len(out) == 3


def test_timezone_dst_spring_forward(spark, tmp_path):
    from feature_store_2_spark.queries.scalar_funcs import (
        func_timezone_convert,
    )

    # 2024-03-10: US DST jump at 07:00 UTC. 06:30 UTC is still EST
    # (-300 min, 01:30 local); 07:30 UTC is EDT (-240 min, 03:30
    # local — 02:30 never exists). Kolkata stays +330 all year.
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 3, 10, 6, 30), 1, "purchase", 1.0, "{}"),
            (2, dt.datetime(2024, 3, 10, 7, 30), 1, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = {
        (r["event_id"], r["zone"]): (r["local_hour"], r["utc_offset_min"])
        for r in func_timezone_convert(spark, sf).collect()
    }
    assert out[(1, "America/New_York")] == (1, -300)
    assert out[(2, "America/New_York")] == (3, -240)
    assert out[(1, "Asia/Kolkata")] == (12, 330)


def test_pythagorean_means_inequality_and_values(spark, tmp_path):
    from feature_store_2_spark.queries.windows_setops import (
        agg_pythagorean_means,
    )

    # Values 1, 4: AM = 2.5, GM = 2, HM = 1.6; AM >= GM >= HM.
    rows = [(1, 0.5, 1, "view", 1.0), (2, 0.6, 1, "view", 4.0)]
    sf = _events(spark, tmp_path, rows)
    r = agg_pythagorean_means(spark, sf).collect()[0]
    assert r["n"] == 2
    assert r["arithmetic_mean"] == 2.5
    assert r["geometric_mean"] == 2.0
    assert r["harmonic_mean"] == 1.6
    assert r["arithmetic_mean"] >= r["geometric_mean"] >= r["harmonic_mean"]
