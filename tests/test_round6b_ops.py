"""Edge pins for the round-6 batch-2 operators: bigram-LM scoring
(hand-computed smoothed log-probs), k-core peeling (clique survives,
pendant pair peels off), interval coalescing (overlap vs gap), and the
Benford digit extraction (exact at powers of ten, where float log10
would flip)."""

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries.llm_text import (
    graph_kcore_membership,
    lm_bigram_logprob,
)
from feature_store_2_spark.queries.quality import stats_benford_distribution
from feature_store_2_spark.queries.timeseries import window_interval_coalesce

_BASE = dt.datetime(2024, 1, 1)


def _docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_bigram_lm_hand_computed(spark, tmp_path):
    # Corpus: "a b a b" and "a c". Bigrams: (a b)x2, (b a)x1, (a c)x1.
    # Contexts: C(a)=3, C(b)=1. V = 3 distinct terms {a, b, c}.
    sf = _docs(spark, tmp_path, ["a b a b", "a c"])
    out = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in lm_bigram_logprob(spark, sf).collect()
    }
    lp_ab = math.log((2 + 1.0) / (3 + 3))
    lp_ba = math.log((1 + 1.0) / (1 + 3))
    lp_ac = math.log((1 + 1.0) / (3 + 3))
    assert out[0][0] == 3
    assert out[0][1] == round((lp_ab + lp_ba + lp_ab) / 3, 6)
    assert out[1] == (1, round(lp_ac, 6))


def test_kcore_clique_survives_pendant_peels(spark, tmp_path):
    # Docs 0-3: identical text -> K4 clique, every degree 3 -> in 2-core.
    # Docs 4-5: identical to each other only -> degree-1 pair, peeled.
    # Doc 6: unique -> isolated.
    clique = "alpha beta gamma delta epsilon zeta"
    pair = "one two three four five six"
    sf = _docs(
        spark, tmp_path, [clique, clique, clique, clique, pair, pair, "x y z w v u"]
    )
    out = {
        r["doc_id"]: (r["in_2core"], r["core_degree"])
        for r in graph_kcore_membership(spark, sf).collect()
    }
    for d in range(4):
        assert out[d] == (True, 3)
    for d in (4, 5, 6):
        assert out[d] == (False, 0)


def test_interval_coalesce_overlap_and_gap(spark, tmp_path):
    # User 1: events at t=0 and t=4min (overlap -> one 9-min island),
    # then t=20min (separate 5-min island).
    rows = [
        (1, _BASE, 1),
        (2, _BASE + dt.timedelta(minutes=4), 1),
        (3, _BASE + dt.timedelta(minutes=20), 1),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "view", 1.0, "{}") for eid, ts, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    row = window_interval_coalesce(spark, sf).collect()[0]
    nine_min = 9 * 60 * 1_000_000
    five_min = 5 * 60 * 1_000_000
    assert row["n_intervals"] == 2
    assert row["total_span_us"] == nine_min + five_min
    assert row["longest_us"] == nine_min


def test_benford_digit_exact_at_powers_of_ten(spark, tmp_path):
    # 1000.00 must read digit 1 (float log10(1000)=2.9999... would say
    # otherwise); 999.99 reads 9; 123.45 reads 1.
    orders = spark.createDataFrame(
        [(1, 1, "O", 123.45, _BASE, "1"), (2, 1, "O", 999.99, _BASE, "1"),
         (3, 1, "O", 1000.00, _BASE, "1")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = os.path.join(str(tmp_path), "sf")
    orders.write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    out = {r["digit"]: r for r in stats_benford_distribution(spark, sf).collect()}
    assert set(out) == {1, 9}
    assert out[1]["n"] == 2 and out[9]["n"] == 1
    assert out[1]["share"] == 2.0 / 3.0
    assert out[1]["benford_expected"] == round(math.log10(2), 6)
