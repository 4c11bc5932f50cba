"""Accuracy bounds for the approximate paths against their exact twins:
HLL distinct, approx percentiles, IVF and SRP-LSH ANN recall."""

from pyspark.sql import functions as F

from feature_store_2_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from feature_store_2_spark.sources.tables import load_table


def test_hll_within_rsd(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(3, 0.1 * n)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    rows = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_med"
        ),
    ).collect()
    for r in rows:
        assert abs(r["approx_med"] - r["exact_med"]) / r["exact_med"] < 0.02


def test_approx_percentile_gk_rank_error_contract(spark, sf_dir):
    """Pin the Greenwald-Khanna CONTRACT, not a loose value-distance:
    approx_percentile(col, q, B) must return an ELEMENT of the group
    whose rank is within eps*n of q*n, eps = 1/B. Value-distance can
    pass on skewed data where the rank is wildly off; rank error is the
    sketch's actual guarantee, so any semantic drift in the entry's
    aggregation fails here (r4 verdict item 7)."""
    B = 10_000
    eps = 1.0 / B
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_extendedprice"
    )
    for q in (0.5, 0.9):
        approx = li.groupBy("l_returnflag").agg(
            F.approx_percentile("l_extendedprice", F.lit(q), F.lit(B)).alias("v")
        )
        # rank bounds of the returned value within its own group
        j = li.join(approx, "l_returnflag")
        stats = (
            j.groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("l_extendedprice") < F.col("v")).cast("long")).alias(
                    "r_lt"
                ),
                F.sum((F.col("l_extendedprice") <= F.col("v")).cast("long")).alias(
                    "r_le"
                ),
            )
            .collect()
        )
        for r in stats:
            n, r_lt, r_le = r["n"], r["r_lt"], r["r_le"]
            # membership: the value is an element of the group
            assert r_le > r_lt, (q, r)
            target = q * n
            slack = eps * n + 1  # +1 for rank discreteness
            # the value's rank interval [r_lt+1, r_le] must intersect
            # [target - eps*n, target + eps*n]
            assert r_lt + 1 <= target + slack, (q, r)
            assert r_le >= target - slack, (q, r)


def test_stream_denial_rate_equals_batch_same_spec(spark, sf_dir):
    """stream_denial_rate is EXACT since r10 (chained stateful
    aggregations, append mode): each watermark-closed (window, key)
    row emits exactly once and must EQUAL the batch exact-distinct
    computation of the same spec restricted to closed windows — the
    stream==batch equality pin on top of the DuckDB oracle, proving
    the chained-state path (not just the SQL rendering) correct."""
    from feature_store_2_spark.queries import CATALOG

    q = next(q for q in CATALOG if q.name == "stream_denial_rate")
    streamed = q.fn(spark, sf_dir).select(
        "window_start_us", "event_type", "total_users", "denied_users"
    )
    # append mode: no (window, key) may emit twice
    n = streamed.count()
    assert streamed.dropDuplicates(["window_start_us", "event_type"]).count() == n
    ev = load_table(spark, "events", sf_dir)
    wm_end = ev.agg(
        (F.unix_micros(F.max("ts")) - F.lit(600_000_000)).alias("wm")
    ).collect()[0]["wm"]
    batch = (
        ev.withColumn("__denied", F.col("value") < 2.0)
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count_distinct("user_id").alias("b_total"),
            F.count_distinct(
                F.when(F.col("__denied"), F.col("user_id"))
            ).alias("b_denied"),
        )
        .filter(F.unix_micros("w.end") <= F.lit(wm_end))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "b_total",
            "b_denied",
        )
    )
    cmp = streamed.join(
        batch, ["window_start_us", "event_type"], "full_outer"
    ).collect()
    assert cmp
    bad = [
        r
        for r in cmp
        if r["total_users"] != r["b_total"] or r["denied_users"] != r["b_denied"]
    ]
    assert not bad, bad[:5]


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=5).collect()
    }
    # The synthetic labels correlate only weakly with cosine
    # neighborhoods, so assert the qualitative IVF contract: recall is
    # monotone in nprobe, nonzero at a partial probe, and exhaustive
    # probing (nprobe = all 10 cells) recovers brute force exactly.
    def recall(nprobe):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(e, q, k=5, nprobe=nprobe).collect()
        }
        return len(exact & approx) / len(exact)

    r2, r6, r10 = recall(2), recall(6), recall(10)
    assert r2 > 0.2
    assert r2 <= r6 <= r10
    assert r10 == 1.0


def test_countmin_never_underestimates(spark, sf_dir):
    """CMS guarantee: estimate >= true count for every key (collisions
    only ever ADD); and with 150 users in 4x64 cells, at least some
    estimate should be exact."""
    from feature_store_2_spark.queries import CATALOG

    q = next(q for q in CATALOG if q.name == "sketch_countmin_users")
    rows = q.fn(spark, sf_dir).collect()
    assert rows
    assert all(r["cms_est"] >= r["true_cnt"] for r in rows)
    assert any(r["cms_est"] == r["true_cnt"] for r in rows)


def test_matryoshka_recall_monotone_and_exhaustive(spark, sf_dir):
    """MRL two-stage contract: recall@5 vs brute force is monotone in
    the stage-1 candidate budget m, nonzero at a small budget, and
    equals 1.0 when m covers the whole corpus (prefix pruning becomes a
    no-op and stage 2 IS brute force)."""
    from feature_store_2_spark.operators.similarity import (
        brute_force_topk,
        matryoshka_topk,
    )

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=5).collect()
    }
    n = e.count()

    def recall(m):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in matryoshka_topk(e, q, k=5, m=m, prefix_dims=16).collect()
        }
        return len(exact & got) / len(exact)

    r_small, r_mid, r_full = recall(20), recall(100), recall(n)
    assert r_small > 0.2
    assert r_small <= r_mid <= r_full
    assert r_full == 1.0


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom guarantee: every actual member must read maybe_present
    (bits only ever turn ON); false positives are allowed and exact-
    oracle-matched, false negatives never."""
    from feature_store_2_spark.queries import CATALOG

    q = next(q for q in CATALOG if q.name == "sketch_bloom_membership")
    rows = q.fn(spark, sf_dir).collect()
    assert rows
    assert all(r["maybe_present"] for r in rows if r["actually_present"])
    # sanity: the flag derivation is internally consistent
    for r in rows:
        assert r["is_false_positive"] == (
            r["maybe_present"] and not r["actually_present"]
        )
