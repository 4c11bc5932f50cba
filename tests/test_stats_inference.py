"""Semantic checks for the statistical-inference family — independent
pandas/pure-python recomputation of each entry's math on sf0.001 (the
DuckDB oracle equivalence is separately enforced by check_oracle /
driver CORRECTNESS rows; these pin the SEMANTICS, not just engine
agreement)."""

from fractions import Fraction

import pytest

from feature_store_2_spark.queries import CATALOG, _load_all
from feature_store_2_spark.sources.tables import load_table

_load_all()
_BY = {d.name: d for d in CATALOG}


@pytest.fixture(scope="module")
def events_pd(spark, sf_dir):
    return load_table(spark, "events", sf_dir).toPandas()


def test_auc_exact_matches_pairwise_definition(spark, sf_dir):
    """AUC from the rank-sum identity must equal the O(n^2) pairwise
    definition P(score_pos > score_neg) + 0.5*P(tie) on the small SF."""
    import hashlib

    ev = load_table(spark, "events", sf_dir).toPandas()
    scores, ys = [], []
    for _, r in ev.iterrows():
        h = hashlib.md5(str(int(r["event_id"])).encode()).hexdigest()
        scores.append(int(h[:4], 16))
        ys.append(r["event_type"] == "purchase")
    pos = [s for s, y in zip(scores, ys) if y]
    neg = [s for s, y in zip(scores, ys) if not y]
    num = sum(
        2 if p > q else (1 if p == q else 0) for p in pos for q in neg
    )
    expected = Fraction(num, 2 * len(pos) * len(neg))

    out = _BY["eval_auc_exact"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - float(expected)) < 1e-12


def test_chi2_cells_reconstruct_marginals(spark, sf_dir):
    out = _BY["stats_chi2_independence"].fn(spark, sf_dir).toPandas()
    n = int(out["n_obs"].sum())
    # expected counts must re-sum to N per margin (within the 1e-6
    # per-cell floor-DIV truncation)
    assert abs(out["expected_micro"].sum() / 1e6 - n) < len(out) * 1e-6
    # contributions are non-negative and finite
    assert (out["contrib_micro"] >= 0).all()
    # exact recomputation of one cell from the observed table
    row = out.iloc[0]
    row_tot = int(out[out.segment == row.segment]["n_obs"].sum())
    col_tot = int(out[out.priority == row.priority]["n_obs"].sum())
    exp = row_tot * col_tot * 1_000_000 // n
    assert int(row["expected_micro"]) == exp
    num = (n * int(row["n_obs"]) - row_tot * col_tot) ** 2 * 1_000_000
    assert int(row["contrib_micro"]) == num // (n * row_tot * col_tot)


def test_survival_km_exact_product_chain(spark, sf_dir):
    """survival_micro must equal the stepwise integer DIV chain over
    (n_risk, d) ordered by day — and be non-increasing."""
    out = (
        _BY["stats_survival_km"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("t_day")
        .reset_index(drop=True)
    )
    assert len(out) >= 1
    s = None
    for _, r in out.iterrows():
        n_r, d = int(r["n_risk"]), int(r["n_events"])
        assert 0 < d <= n_r
        if s is None:
            s = (n_r - d) * 1_000_000 // n_r
        else:
            s = s * (n_r - d) // n_r
        assert int(r["survival_micro"]) == s
    assert (out["survival_micro"].diff().dropna() <= 0).all()
    # risk sets shrink over time
    assert (out["n_risk"].diff().dropna() < 0).all()


def test_equidepth_buckets_cover_and_bound(spark, sf_dir, events_pd):
    out = (
        _BY["stats_equidepth_histogram"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    n = len(events_pd)
    assert list(out["bucket"]) == list(range(1, 11))
    assert (out["n_le"].diff().dropna() >= 0).all()
    # bucket k's edge is the least value whose cumulative reaches
    # ceil(k*n/10): cumulative at the edge must reach the rank target
    for _, r in out.iterrows():
        k = int(r["bucket"])
        target = -(-k * n // 10)  # ceil
        assert int(r["n_le"]) >= target
    # the last edge is the max value, covering everything
    assert int(out.iloc[-1]["n_le"]) == n


def test_weighted_sampling_ranks_and_determinism(spark, sf_dir):
    out = _BY["sample_weighted_importance"].fn(spark, sf_dir).toPandas()
    for _, g in out.groupby("source"):
        assert list(g.sort_values("sample_rank")["sample_rank"]) == list(
            range(1, len(g) + 1)
        )
        assert len(g) <= 20
    assert (out["weight"] > 0).all()
    # determinism: a second run selects the identical sample
    again = _BY["sample_weighted_importance"].fn(spark, sf_dir).toPandas()
    a = out.sort_values(["source", "sample_rank"]).reset_index(drop=True)
    b = again.sort_values(["source", "sample_rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_poisson_bootstrap_exact_replicate_recompute(spark, sf_dir, events_pd):
    """Replicate 0's (n_eff, boot_mean) must equal an independent pure-
    python recomputation of the md5-thresholded Poisson draws."""
    import hashlib
    from decimal import Decimal, ROUND_HALF_UP

    from feature_store_2_spark.queries.stats_inference import _POIS_T

    out = _BY["stats_poisson_bootstrap"].fn(spark, sf_dir).toPandas()
    assert len(out) == 100
    # every replicate's effective n concentrates near n (Poisson(1) sum)
    n = len(events_pd)
    assert ((out["n_eff"] - n).abs() < 6 * n**0.5 + 10).all()

    s = c_tot = 0
    for _, r in events_pd.iterrows():
        h = hashlib.md5(f"{int(r['event_id'])}:0".encode()).hexdigest()
        u = int(h[:8], 16)
        c = sum(1 for t in _POIS_T if u >= t)
        vm = int(
            Decimal(repr(r["value"])).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
            * 1_000_000
        )
        s += c * vm
        c_tot += c
    row = out[out["replicate"] == 0].iloc[0]
    assert int(row["n_eff"]) == c_tot
    assert abs(row["boot_mean"] - (s / c_tot / 1e6)) < 1e-12


def test_permutation_test_pvalue_and_observed_diff(spark, sf_dir, events_pd):
    out = _BY["stats_permutation_test"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    ab = events_pd[events_pd["event_type"].isin(["click", "purchase"])]
    a = ab[ab["event_type"] == "click"]["value"]
    b = ab[ab["event_type"] == "purchase"]["value"]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    # micro-quantization keeps the observed diff within 1e-6 of pandas
    assert abs(row["diff_obs"] - (a.mean() - b.mean())) < 2e-6
    # add-one p-value bounds: (1..101)/101
    assert 1 / 101 <= row["p_value"] <= 1.0
    # the two groups are draws from the same synthetic value process,
    # so the null should comfortably NOT be rejected at 1/101
    assert row["p_value"] > 1 / 101


def test_mann_kendall_matches_pure_python(spark, sf_dir, events_pd):
    out = _BY["stats_mann_kendall"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    daily = (
        events_pd.assign(d=events_pd["ts"].dt.date)
        .groupby("d")
        .size()
        .sort_index()
    )
    vs = [int(v) for v in daily.values]
    ts = [(d - daily.index[0]).days for d in daily.index]
    s = sum(
        (vs[j] > vs[i]) - (vs[j] < vs[i])
        for i in range(len(vs))
        for j in range(i + 1, len(vs))
    )
    assert row["s"] == s
    n = len(vs)
    assert row["n_days"] == n
    assert row["n_pairs"] == n * (n - 1) // 2
    from collections import Counter

    tie = sum(
        c * (c - 1) * (2 * c + 5) for c in Counter(vs).values() if c > 1
    )
    assert row["var_num18"] == n * (n - 1) * (2 * n + 5) - tie
    slopes = sorted(
        (vs[j] - vs[i]) / (ts[j] - ts[i])
        for i in range(len(vs))
        for j in range(i + 1, len(vs))
    )
    np_ = len(slopes)
    med = (slopes[(np_ + 1) // 2 - 1] + slopes[(np_ + 2) // 2 - 1]) / 2
    assert abs(row["sen_slope"] - med) < 1e-12


def test_mann_kendall_even_pair_count_median(spark, tmp_path):
    """Regression: with an EVEN number of pairwise slopes the Sen
    median must average the two middle ranks. The rank filter
    originally compared row_number against Spark's `/` (double
    division), so (np+1)/2 landed on x.5 and matched nothing — the
    even case silently averaged ONE element. A 4-day series has
    C(4,2)=6 slopes: [-7, -1.5, 2.5, 3, 4, 12] -> median 2.75 (the
    one-element bug answered 3.0)."""
    import datetime

    import pandas as pd

    rows = []
    for di, cnt in enumerate([5, 9, 2, 14]):
        for k in range(cnt):
            rows.append(
                (
                    len(rows),
                    datetime.datetime(2024, 1, 1 + di, 12, 0, k % 60),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    row = _BY["stats_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]
    assert row["n_pairs"] == 6
    assert row["sen_slope"] == 2.75


def test_survival_km_beyond_default_recursion_limit(spark, tmp_path):
    """Regression (r7 advisor): recursion depth equals distinct death
    days, and Spark's default spark.sql.cteRecursionLevelLimit is 100 —
    a corpus spanning ~100+ event days threw
    RECURSION_LEVEL_LIMIT_EXCEEDED while the DuckDB oracle recursed
    unbounded. 130 users erroring on 130 distinct days must produce one
    KM step per day with a monotone survival chain."""
    import datetime

    import pandas as pd

    rows = []
    for u in range(1, 131):
        base = datetime.datetime(2024, 1, 1, 8, 0, 0)
        rows.append((len(rows), base, u, "signup", 1.0, "{}"))
        rows.append(
            (
                len(rows),
                base + datetime.timedelta(days=u),
                u,
                "error",
                1.0,
                "{}",
            )
        )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = (
        _BY["stats_survival_km"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .sort_values("t_day")
        .reset_index(drop=True)
    )
    assert len(out) == 130
    assert (out["survival_micro"].diff().dropna() <= 0).all()
    # risk set shrinks by exactly one per death day
    assert list(out["n_risk"]) == list(range(130, 0, -1))


def test_month_spine_beyond_default_recursion_limit(spark, tmp_path):
    """Regression (same class as the KM advisor find): the month-spine
    recursion depth equals months of history, and Spark's default
    spark.sql.cteRecursionLevelLimit (100) threw past ~8 years of
    orders while the DuckDB oracle recursed unbounded. 130 months —
    one order on the first day of every 3rd month — must yield one
    spine row per month with gap months as explicit zeros."""
    import datetime

    import pandas as pd

    rows = []
    for m in range(0, 130, 3):
        y, mo = divmod(m, 12)
        rows.append(
            (
                len(rows) + 1,
                1,
                "O",
                100.0 + m,
                datetime.datetime(2000 + y, mo + 1, 1),
                "1-URGENT",
            )
        )
    pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    ).astype({"o_orderdate": "datetime64[us]"}).to_parquet(
        tmp_path / "orders.parquet"
    )
    out = (
        _BY["sql_recursive_month_spine"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .sort_values("month_start")
        .reset_index(drop=True)
    )
    # min month 2000-01, max 2010-10 (m=129 -> +129 months): 130 rows
    assert len(out) == 130
    # every 3rd month has the order, the two between are explicit zeros
    assert list(out["n_orders"]) == [1 if i % 3 == 0 else 0 for i in range(130)]
