"""Invariant pins for the round-7 late additions: Gopher quality flags,
multi-source BFS hop distance, and the skyline/Pareto frontier.

Oracle equality for all three is separately pinned by
tests/test_adversarial_fixtures.py (auto-enrolled) and the check_oracle
sweeps; these tests pin the semantic invariants a hash compare can't
express (dominance-freeness, BFS frontier soundness, flag algebra).
"""

import itertools

import pyspark.sql.functions as F

from feature_store_2_spark.operators.curation import gopher_quality_flags
from feature_store_2_spark.queries import CATALOG

Q = {q.name: q.fn for q in CATALOG}
SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Gopher quality flags
# ---------------------------------------------------------------------------


def test_gopher_crafted_doc_counts(spark):
    text = "the cat and the dog sat"  # 6 words, 'the' x2
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = gopher_quality_flags(df).collect()[0]
    assert row.n_words == 6
    assert row.tot_chars == len(text.replace(" ", ""))
    assert row.max_tf == 2
    assert row.n_stop == 3  # the, the, and
    assert row.n_alpha == 6
    assert not row.wc_ok  # 6 < 50
    assert row.stop_ok and row.alpha_ok
    assert not row.keep


def test_gopher_empty_doc_all_zero_not_kept(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id int, text string")
    rows = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert set(rows) == {1, 2}  # zero-word docs survive the left join
    for r in rows.values():
        assert r.n_words == 0 and r.tot_chars == 0 and r.max_tf == 0
        assert not r.keep


def test_gopher_keep_is_and_of_flags(spark):
    out = Q["doc_gopher_quality_flags"](spark, SF)
    bad = out.filter(
        F.col("keep")
        != (
            F.col("wc_ok")
            & F.col("mean_len_ok")
            & F.col("rep_ok")
            & F.col("stop_ok")
            & F.col("alpha_ok")
        )
    ).count()
    assert bad == 0
    assert out.count() == out.select("doc_id").distinct().count()


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance
# ---------------------------------------------------------------------------


def test_bfs_crafted_chain(spark):
    # path graph 0-1-2-3-4-5, seed {0}: dists 0,1,2,3 then -1 beyond depth 3
    from feature_store_2_spark.operators import dedup as _  # noqa: F401

    # reuse the catalog entry's frontier logic inline on a crafted edge set
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(i + 1, i) for i in range(5)],
        "a int, b int",
    )
    nodes = spark.range(6).select(F.col("id").cast("int").alias("vec_id"))
    seeds = nodes.filter(F.col("vec_id") == 0).withColumn("dist", F.lit(0))
    visited, frontier = seeds, seeds.select("vec_id")
    for hop in (1, 2, 3):
        nxt = (
            edges.join(frontier.withColumnRenamed("vec_id", "a"), "a")
            .select(F.col("b").alias("vec_id"))
            .distinct()
            .join(visited.select("vec_id"), "vec_id", "left_anti")
        )
        visited = visited.unionAll(nxt.withColumn("dist", F.lit(hop)))
        frontier = nxt
    got = {
        r.vec_id: r.hop_dist
        for r in nodes.join(visited, "vec_id", "left")
        .select(
            "vec_id", F.coalesce(F.col("dist"), F.lit(-1)).alias("hop_dist")
        )
        .collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: -1, 5: -1}


def test_bfs_entry_invariants(spark):
    out = Q["graph_bfs_distance"](spark, SF).toPandas()
    assert set(out.hop_dist.unique()) <= {-1, 0, 1, 2, 3}
    seeds = out[out.vec_id % 50 == 0]
    assert (seeds.hop_dist == 0).all()
    non_seeds = out[out.vec_id % 50 != 0]
    assert (non_seeds.hop_dist != 0).all()
    # one row per embedding
    assert out.vec_id.is_unique


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier
# ---------------------------------------------------------------------------


def _dominates(a, b):
    # a dominates b: price <= and size >= with at least one strict
    return (
        a.p_retailprice <= b.p_retailprice
        and a.p_size >= b.p_size
        and (a.p_retailprice < b.p_retailprice or a.p_size > b.p_size)
    )


def test_skyline_no_internal_dominance(spark):
    rows = Q["skyline_pareto_frontier"](spark, SF).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    for brand_rows in by_brand.values():
        for a, b in itertools.permutations(brand_rows, 2):
            assert not _dominates(a, b), (a, b)


def test_skyline_excluded_rows_are_dominated(spark):
    out = Q["skyline_pareto_frontier"](spark, SF)
    part = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .dropna()
    )
    frontier = {r.p_partkey for r in out.collect()}
    by_brand = {}
    for r in out.collect():
        by_brand.setdefault(r.p_brand, []).append(r)
    for r in part.collect():
        if r.p_partkey in frontier:
            continue
        assert any(_dominates(f, r) for f in by_brand.get(r.p_brand, [])), r


def test_skyline_ties_kept_crafted(spark):
    # two parts with identical (price, size) on the frontier: both kept
    import pyspark.sql.types as T

    from decimal import Decimal

    schema = T.StructType(
        [
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_retailprice", T.DecimalType(12, 2)),
            T.StructField("p_size", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [
            ("B1", 1, Decimal("10.00"), 5),
            ("B1", 2, Decimal("10.00"), 5),  # tie with 1 — both survive
            ("B1", 3, Decimal("12.00"), 5),  # dominated by 1/2
            ("B1", 4, Decimal("9.00"), 3),  # frontier (cheaper)
            ("B1", 5, Decimal("11.00"), 9),  # frontier (bigger)
        ],
        schema,
    )
    import feature_store_2_spark.queries.relational2 as r2

    per_price = df.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("gmax")
    )
    from pyspark.sql import Window

    w_ord = Window.partitionBy("p_brand").orderBy("p_retailprice")
    cum = per_price.withColumn(
        "cum_le",
        F.max("gmax").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("cum_lt", F.lag("cum_le").over(w_ord))
    dominated = (
        F.col("cum_lt").isNotNull() & (F.col("cum_lt") >= F.col("p_size"))
    ) | (F.col("cum_le") > F.col("p_size"))
    kept = {
        r.p_partkey
        for r in df.join(
            cum.select("p_brand", "p_retailprice", "cum_le", "cum_lt"),
            ["p_brand", "p_retailprice"],
        )
        .filter(~dominated)
        .collect()
    }
    assert kept == {1, 2, 4, 5}
    assert r2  # module import sanity (keeps the entry's home importable)


# ---------------------------------------------------------------------------
# Covariance matrix (PCA feed)
# ---------------------------------------------------------------------------


def test_covariance_crafted_known_values(spark):
    # two perfectly anticorrelated dims + one constant dim
    import numpy as np

    rows = [(i, [float(i), float(-i), 2.0] + [0.0] * 61) for i in range(8)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    from feature_store_2_spark.operators.similarity import (
        embedding_covariance_partials,
    )
    import pyspark.sql.functions as FF

    parts = embedding_covariance_partials(df)
    agg = (
        parts.groupBy("i", "j")
        .agg(
            FF.sum("s2").alias("S2"),
            FF.sum("s1i").alias("S1i"),
            FF.sum("s1j").alias("S1j"),
            FF.sum("n").alias("N"),
        )
        .collect()
    )
    got = {(r.i, r.j): (r.N * r.S2 - r.S1i * r.S1j) / (r.N * r.N) for r in agg}
    QS2 = float(1 << 24) ** 2
    x = np.arange(8)
    var_x = ((x - x.mean()) ** 2).mean()
    assert got[(0, 0)] / QS2 == var_x  # exact: integers scale cleanly
    assert got[(0, 1)] / QS2 == -var_x  # perfect anticorrelation
    assert got[(2, 2)] == 0  # constant dim
    assert got[(0, 2)] == 0
    assert len(got) == 64 * 65 // 2


def test_covariance_entry_symmetric_psd_diag(spark):
    out = Q["emb_covariance_matrix"](spark, SF).toPandas()
    assert len(out) == 64 * 65 // 2
    assert (out[out.i == out.j]["cov"] >= 0).all()  # variances non-negative
    assert (out.i <= out.j).all()


def test_covariance_overflow_guard_large_components(spark):
    # components of magnitude 24 (the adversarial-fixture hazard): the
    # dynamic chunk bound must keep int64 einsum accumulation exact
    rows = [(i, [24.0 if j % 2 == 0 else -24.0 for j in range(64)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from feature_store_2_spark.operators.similarity import (
        embedding_covariance_partials,
    )
    import pyspark.sql.functions as FF

    parts = embedding_covariance_partials(df)
    tot = parts.groupBy("i", "j").agg(FF.sum("s2").alias("S2")).collect()
    q = 24 * (1 << 24)
    for r in tot:
        expect = q * q * 50 * (1 if (r.i % 2) == (r.j % 2) else -1)
        assert r.S2 == expect, (r.i, r.j)


# ---------------------------------------------------------------------------
# Winsorization
# ---------------------------------------------------------------------------


def test_winsorize_entry_invariants(spark):
    out = Q["feat_winsorize_clip"](spark, SF).toPandas()
    assert (out.p05 <= out.p95).all()
    assert ((out.winsorized >= out.p05) & (out.winsorized <= out.p95)).all()
    inside = (out.o_totalprice >= out.p05) & (out.o_totalprice <= out.p95)
    assert (out.winsorized[inside] == out.o_totalprice[inside]).all()
    # clip fraction per tail is at most ~5% + one tied value's mass
    n = len(out)
    assert (out.o_totalprice < out.p05).sum() <= 0.06 * n + 1
    assert (out.o_totalprice > out.p95).sum() <= 0.06 * n + 1


# ---------------------------------------------------------------------------
# Distinct-users time rollup
# ---------------------------------------------------------------------------


def test_rollup_distinct_users_hierarchy_bounds(spark):
    out = Q["rollup_distinct_users_time"](spark, SF).toPandas()
    day = out[out.grain == "day"]
    month = out[out.grain == "month"].set_index(["y", "m"])
    year = out[out.grain == "year"].set_index("y")
    # monthly actives bounded by the sum of daily actives in the month,
    # and at least the busiest single day
    per_month = day.groupby(["y", "m"]).n_users
    for key, mrow in month.iterrows():
        assert per_month.max()[key] <= mrow.n_users <= per_month.sum()[key]
    per_year = month.reset_index().groupby("y").n_users
    for y, yrow in year.iterrows():
        assert per_year.max()[y] <= yrow.n_users <= per_year.sum()[y]


def test_winsorize_thresholds_match_sorted_rank_property(spark):
    # property: p05/p95 equal the ceil(q*n)-th smallest value (1-indexed)
    # for any multiset, ties and duplicates included
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=50).map(
                lambda c: Decimal(c) / 4  # coarse grid -> many exact ties
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(vals):
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_orderpriority", T.StringType()),
                T.StructField("o_totalprice", T.DecimalType(12, 2)),
            ]
        )
        df = spark.createDataFrame(
            [(i, "G", v) for i, v in enumerate(vals)], schema
        )
        df.createOrReplaceTempView("_w_orders")
        # same rank arithmetic as feat_winsorize_clip, single group
        n = len(vals)
        srt = sorted(Decimal(v).quantize(Decimal("0.01")) for v in vals)
        k05 = (5 * n + 99) // 100
        k95 = (95 * n + 99) // 100
        want_lo, want_hi = srt[k05 - 1], srt[k95 - 1]
        out = spark.sql(
            """
            WITH h AS (SELECT o_totalprice AS v, count(*) AS c
                       FROM _w_orders GROUP BY 1),
            r AS (SELECT v,
                         sum(c) OVER (ORDER BY v) AS cum,
                         sum(c) OVER () AS n FROM h)
            SELECT min(CASE WHEN cum >= (5*n+99) div 100 THEN v END) AS lo,
                   min(CASE WHEN cum >= (95*n+99) div 100 THEN v END) AS hi
            FROM r
            """
        ).collect()[0]
        assert out.lo == want_lo and out.hi == want_hi, (vals, out)

    check()


# ---------------------------------------------------------------------------
# Retrieval-quality evals
# ---------------------------------------------------------------------------


def test_ann_recall_bounds_and_sample(spark):
    out = Q["eval_ann_recall_at_k"](spark, SF).toPandas()
    assert (out.query_id % 10 == 0).all()
    assert (out.n_exact == 5).all()
    assert ((out.n_hits >= 0) & (out.n_hits <= 5)).all()
    assert ((out.recall_at_5 * 5).round() == out.n_hits).all()
    # the SRP index's pytest-pinned recall floor: mean recall well above 0
    assert out.n_hits.sum() > 0.5 * 5 * len(out)


def test_mrr_exact_rational_identity(spark):
    out = Q["eval_mrr_retrieval"](spark, SF).toPandas()
    assert len(out) == out.label.nunique()
    # mrr is EXACTLY rr60_sum / (60 * n): one IEEE division, no float sum
    import numpy as np

    expect = out.rr60_sum.astype(float) / (60.0 * out.n_queries.astype(float))
    assert (out.mrr_at_5.values == expect.values).all()
    assert ((out.mrr_at_5 >= 0) & (out.mrr_at_5 <= 1)).all()


# ---------------------------------------------------------------------------
# Source overlap matrix / seasonal-naive backtest
# ---------------------------------------------------------------------------


def test_source_overlap_matrix_invariants(spark):
    out = Q["dedup_source_overlap_matrix"](spark, SF).toPandas()
    assert (out.source_a <= out.source_b).all()  # unordered normalization
    assert not out.duplicated(["source_a", "source_b"]).any()
    assert (out.n_docs_a <= out.n_dup_pairs).all()
    assert (out.n_docs_b <= out.n_dup_pairs).all()
    assert (out.n_dup_pairs > 0).all()


def test_seasonal_naive_backtest_identities(spark):
    out = Q["eval_seasonal_naive_backtest"](spark, SF).toPandas()
    assert len(out) > 0
    assert (out.mae * out.n_days).round(6).equals(
        out.sum_abs_err.astype(float).round(6)
    )
    # |bias| <= MAE always (triangle inequality on the error sum)
    assert (out.mean_err.abs() <= out.mae + 1e-12).all()


# ---------------------------------------------------------------------------
# Entry/exit matrix + new-vs-returning split
# ---------------------------------------------------------------------------


def test_entry_exit_crafted_sessions(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: one 3-event session click -> view -> purchase
        (1, t0, 1, "click"),
        (2, t0 + dt.timedelta(minutes=5), 1, "view"),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase"),
        # user 1: later bounce session (single view), > 30 min gap
        (4, t0 + dt.timedelta(hours=2), 1, "view"),
        # user 2: bounce click
        (5, t0, 2, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    from feature_store_2_spark.queries import CATALOG as _C

    # reuse the entry body on a crafted frame via module function import
    import feature_store_2_spark.queries.relational2 as r2
    import pyspark.sql.functions as FF
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    us = FF.unix_micros(FF.col("ts"))
    flagged = df.withColumn(
        "new_session",
        FF.when(us - FF.lag(us).over(w) <= 30 * 60 * 1_000_000, FF.lit(0))
        .otherwise(FF.lit(1)),
    )
    sessions = flagged.withColumn("session_id", FF.sum("new_session").over(wcum))
    key = FF.struct("ts", "event_id")
    per = sessions.groupBy("user_id", "session_id").agg(
        FF.min_by("event_type", key).alias("entry_type"),
        FF.max_by("event_type", key).alias("exit_type"),
        FF.count("*").alias("n_ev"),
    )
    out = {
        (r.entry_type, r.exit_type): (r.n_sessions, r.n_bounce)
        for r in per.groupBy("entry_type", "exit_type")
        .agg(
            FF.count("*").alias("n_sessions"),
            FF.sum(FF.when(FF.col("n_ev") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounce"),
        )
        .collect()
    }
    assert out == {
        ("click", "purchase"): (1, 0),
        ("view", "view"): (1, 1),
        ("click", "click"): (1, 1),
    }
    assert r2


def test_new_vs_returning_identities(spark):
    out = Q["ts_new_vs_returning_daily"](spark, SF).toPandas()
    assert (out.n_new + out.n_returning == out.n_active).all()
    # every user is new exactly once: total n_new == distinct users
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert out.n_new.sum() == n_users
    # earliest day has zero returning
    first = out.sort_values("d").iloc[0]
    assert first.n_returning == 0


# ---------------------------------------------------------------------------
# Stickiness + activity histogram
# ---------------------------------------------------------------------------


def test_stickiness_identities(spark):
    out = Q["ts_stickiness_dau_mau"](spark, SF).toPandas()
    assert len(out) > 0
    # avg day audience can't exceed the monthly audience
    assert ((out.stickiness > 0) & (out.stickiness <= 1)).all()
    assert (out.avg_dau <= out.mau).all()
    assert (out.dau_sum >= out.mau).all()  # each MAU contributes >= 1 day


def test_activity_histogram_mass_conservation(spark):
    hist = Q["ts_activity_histogram"](spark, SF).toPandas()
    stick = Q["ts_stickiness_dau_mau"](spark, SF).toPandas()
    # per month: sum of histogram users == MAU; sum of k*n_users == dau_sum
    for _, srow in stick.iterrows():
        h = hist[(hist.y == srow.y) & (hist.m == srow.m)]
        assert h.n_users.sum() == srow.mau
        assert (h.active_days * h.n_users).sum() == srow.dau_sum


# ---------------------------------------------------------------------------
# Clamped running balance
# ---------------------------------------------------------------------------


def test_clamped_balance_crafted_recurrence(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    # deltas in order: +60, +60 (cap at 100), -150 (floor at 0), +30
    rows = [
        (1, t0, 7, "purchase", 60.0),
        (2, t0 + dt.timedelta(minutes=1), 7, "purchase", 60.0),
        (3, t0 + dt.timedelta(minutes=2), 7, "click", 150.0),
        (4, t0 + dt.timedelta(minutes=3), 7, "purchase", 30.0),
        (5, t0, 8, "error", 999.0),  # non-monetary type: delta 0
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    import pyspark.sql.functions as FF
    import pandas as pd

    ev = df.select(
        "user_id", "event_id", "ts",
        FF.when(FF.col("event_type") == "purchase",
                (FF.col("value").cast("decimal(18,6)") * 1_000_000).cast("long"))
        .when(FF.col("event_type") == "click",
              -(FF.col("value").cast("decimal(18,6)") * 1_000_000).cast("long"))
        .otherwise(FF.lit(0)).alias("delta"),
    )

    def scan(pdf):
        pdf = pdf.sort_values(["ts", "event_id"])
        bal, out = 0, []
        for d in pdf["delta"].tolist():
            bal = max(min(bal + int(d), 100_000_000), 0)
            out.append(bal)
        return pd.DataFrame({"user_id": pdf["user_id"], "event_id": pdf["event_id"],
                             "balance_micro": pd.Series(out, index=pdf.index, dtype="int64")})

    got = {
        r.event_id: r.balance_micro
        for r in ev.groupBy("user_id")
        .applyInPandas(scan, "user_id long, event_id long, balance_micro long")
        .collect()
    }
    assert got == {1: 60_000_000, 2: 100_000_000, 3: 0, 4: 30_000_000, 5: 0}


def test_clamped_balance_entry_bounds(spark):
    out = Q["window_clamped_running_balance"](spark, SF).toPandas()
    assert ((out.balance_micro >= 0) & (out.balance_micro <= 100_000_000)).all()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert len(out) == ev.count()  # one balance per event
    assert out.event_id.is_unique


# ---------------------------------------------------------------------------
# Hour x dow heatmap + price/volume decomposition
# ---------------------------------------------------------------------------


def test_hour_dow_heatmap_invariants(spark):
    out = Q["ts_seasonality_hour_dow"](spark, SF).toPandas()
    assert out.iso_dow.between(1, 7).all()
    assert out.hod.between(0, 23).all()
    # per type: ppm shares floor-sum to <= 1_000_000 and > 999_000
    for _, g in out.groupby("event_type"):
        assert g.share_ppm.sum() <= 1_000_000
        assert g.share_ppm.sum() > 1_000_000 - len(g)


def test_pv_decomposition_identity(spark):
    out = Q["stats_revenue_price_volume_decomp"](spark, SF).toPandas()
    assert len(out) > 0
    # volume_effect + price_effect == d_rev by algebraic identity
    # (identical IEEE chains -> tolerance only for association order)
    resid = (out.volume_effect + out.price_effect - out.d_rev).abs()
    scale = out.rev.abs() + 1.0
    assert (resid / scale < 1e-12).all()


# ---------------------------------------------------------------------------
# Pattern profile + order aging
# ---------------------------------------------------------------------------


def test_pattern_profile_crafted_signatures(spark):
    from feature_store_2_spark.queries import CATALOG as _
    import pyspark.sql.functions as FF

    df = spark.createDataFrame(
        [("Abc-123",), ("Xyz-987",), ("no digits",)], "s string"
    )
    x = FF.regexp_replace(FF.col("s"), "[A-Z]", "A")
    x = FF.regexp_replace(x, "[a-z]", "a")
    x = FF.regexp_replace(x, "[0-9]", "9")
    got = sorted(r[0] for r in df.select(x).collect())
    assert got == ["Aaa-999", "Aaa-999", "aa aaaaaa"]


def test_pattern_profile_entry_mass(spark):
    out = Q["dq_value_pattern_profile"](spark, SF).toPandas()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    per_col = out.groupby("column_name").n_values.sum()
    assert per_col["c_name"] == n_cust
    assert per_col["c_mktsegment"] == n_cust
    # synthetic names are uniform: ONE dominant pattern for c_name
    assert (out[out.column_name == "c_name"].n_values.max()) == n_cust


def test_order_aging_invariants(spark):
    out = Q["dq_open_order_aging"](spark, SF).toPandas()
    assert set(out.o_orderstatus) <= {"O", "P"}
    assert set(out.age_bucket) <= {"0-30", "31-60", "61-90", "90+"}
    assert (out.min_age_days <= out.max_age_days).all()
    assert (out.min_age_days >= 0).all()
    n_open = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter("o_orderstatus IN ('O','P')")
        .count()
    )
    assert out.n_orders.sum() == n_open


def test_weekly_overlap_invariants(spark):
    out = Q["ts_weekly_audience_overlap"](spark, SF).toPandas()
    assert len(out) > 0
    assert (out.n_retained <= out.wau).all()
    assert (out.n_retained <= out.wau_next).all()
    assert ((out.wow_retention >= 0) & (out.wow_retention <= 1)).all()
    # consecutive monday starts only
    assert out.week_start.map(lambda d: d.weekday()).eq(0).all()


def test_share_of_parent_mass(spark):
    out = Q["agg_share_of_parent"](spark, SF).toPandas()
    # floor-ppm shares per region sum to <= 1e6 and within |nations| ulps
    for _, g in out.groupby("region"):
        assert g.share_of_region_ppm.sum() <= 1_000_000
        assert g.share_of_region_ppm.sum() > 1_000_000 - len(g)
    # region shares of total likewise (one value per region)
    regs = out.drop_duplicates("region")
    assert regs.region_share_of_total_ppm.sum() <= 1_000_000
    assert regs.region_share_of_total_ppm.sum() > 1_000_000 - len(regs)


def test_topk_with_ties_keeps_boundary_ties(spark):
    import pyspark.sql.functions as FF

    out = Q["window_topk_with_ties"](spark, SF)
    pdf = out.toPandas()
    assert (pdf.rnk <= 3).all()
    # WITH TIES semantics: every group has AT LEAST 3 rows (where the
    # customer has >= 3 orders), possibly more on boundary ties
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    sizes = orders.groupBy("o_custkey").count().toPandas().set_index("o_custkey")
    got = pdf.groupby("o_custkey").size()
    for ck, n in got.items():
        assert n >= min(3, int(sizes.loc[ck]["count"]))
