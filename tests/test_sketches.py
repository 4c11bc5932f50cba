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
