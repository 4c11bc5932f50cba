"""Semantic checks for the round-7 feature-engineering family —
independent pandas recomputation of each entry's math on sf0.001 (the
DuckDB oracle equivalence is separately enforced by check_oracle /
driver CORRECTNESS rows; these pin the SEMANTICS, not just engine
agreement)."""

import math

import pandas as pd
import pytest

from feature_store_2_spark.queries import CATALOG, _load_all
from feature_store_2_spark.sources.tables import load_table

_load_all()
_BY = {d.name: d for d in CATALOG}


@pytest.fixture(scope="module")
def events_pd(spark, sf_dir):
    return load_table(spark, "events", sf_dir).toPandas()


def _micro(v: float) -> int:
    # decimal(18,6) round-half-up micro-units
    from decimal import Decimal, ROUND_HALF_UP

    return int(
        Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        * 1_000_000
    )


def test_mean_impute_fills_with_user_mean(spark, sf_dir, events_pd):
    out = _BY["feat_mean_impute"].fn(spark, sf_dir).toPandas()
    assert len(out) == len(events_pd)
    assert out["value_filled"].notna().all()
    ev = events_pd.assign(
        vm=[
            None if t == "error" else _micro(v)
            for t, v in zip(events_pd["event_type"], events_pd["value"])
        ]
    )
    means = ev.groupby("user_id")["vm"].agg(["sum", "count"])
    merged = out.merge(ev[["event_id", "vm"]], on="event_id")
    miss = merged[merged["was_missing"]]
    assert len(miss) == (events_pd["event_type"] == "error").sum()
    for _, r in miss.head(25).iterrows():
        m = means.loc[r["user_id"]]
        expect = (m["sum"] / m["count"]) / 1e6
        assert math.isclose(r["value_filled"], expect, rel_tol=1e-12)
    obs = merged[~merged["was_missing"]].head(25)
    for _, r in obs.iterrows():
        assert math.isclose(r["value_filled"], r["vm"] / 1e6, rel_tol=1e-12)


def test_target_encoding_loo_math(spark, sf_dir, events_pd):
    out = _BY["feat_target_encoding_loo"].fn(spark, sf_dir).toPandas()
    assert len(out) == len(events_pd)
    ev = events_pd.assign(y=[_micro(v) for v in events_pd["value"]])
    cat = ev.groupby("event_type")["y"].agg(["sum", "count"])
    merged = out.merge(ev[["event_id", "y"]], on="event_id")
    for _, r in merged.head(50).iterrows():
        c = cat.loc[r["event_type"]]
        assert r["n_category"] == c["count"]
        expect = (c["sum"] - r["y"]) / (c["count"] - 1) / 1e6
        assert math.isclose(r["te_loo"], expect, rel_tol=1e-12)


def test_calibration_bins_partition_the_corpus(spark, sf_dir, events_pd):
    out = (
        _BY["eval_calibration_bins"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("bin")
    )
    assert out["n"].sum() == len(events_pd)
    assert set(out["bin"]) <= set(range(10))
    for _, r in out.iterrows():
        # mean score of a bin must sit inside the bin's score range
        assert r["bin"] / 10 <= r["mean_score"] < (r["bin"] + 1) / 10
        assert 0 <= r["frac_positive"] <= 1
        assert r["n_pos"] <= r["n"]


def test_hashing_trick_buckets_and_mass(spark, sf_dir, events_pd):
    out = _BY["feat_hashing_trick"].fn(spark, sf_dir).toPandas()
    assert out["bucket"].between(0, 15).all()
    n_et = len(events_pd)
    n_k = events_pd["props"].apply(
        lambda p: isinstance(p, str) and '"k"' in p
    ).sum()
    assert out["n"].sum() == n_et + n_k
    # one row per (user, bucket)
    assert not out.duplicated(["user_id", "bucket"]).any()


def test_ks_statistic_matches_pandas_ecdf(spark, sf_dir, events_pd):
    out = _BY["stats_ks_test"].fn(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    a = sorted(
        _micro(v)
        for t, v in zip(events_pd["event_type"], events_pd["value"])
        if t == "click"
    )
    b = sorted(
        _micro(v)
        for t, v in zip(events_pd["event_type"], events_pd["value"])
        if t == "purchase"
    )
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    pts = sorted(set(a) | set(b))
    sa = pd.Series(a)
    sb = pd.Series(b)
    d = max(
        abs(
            (sa <= p).sum() / len(a) - (sb <= p).sum() / len(b)
        )
        for p in pts
    )
    assert math.isclose(r["ks_d"], d, rel_tol=1e-12)
    assert 0 <= r["ks_d"] <= 1


def test_quantile_normalize_ranks(spark, sf_dir, events_pd):
    out = _BY["feat_quantile_normalize"].fn(spark, sf_dir).toPandas()
    assert len(out) == len(events_pd)
    ev = events_pd.assign(v=[_micro(v) for v in events_pd["value"]])
    merged = out.merge(ev[["event_id", "v", "event_type"]], on="event_id")
    for et, grp in list(merged.groupby("event_type_x"))[:2]:
        n = len(grp)
        # min-rank ties: rank == 1 + count of strictly smaller values
        vs = sorted(grp["v"])
        import bisect

        for _, r in grp.head(20).iterrows():
            expect = bisect.bisect_left(vs, r["v"]) + 1
            assert r["value_rank"] == expect
            assert math.isclose(
                r["quantile"], expect / (n + 1), rel_tol=1e-12
            )
    # quantiles bounded away from 0 and 1
    assert (out["quantile"] > 0).all() and (out["quantile"] < 1).all()
