"""Unit tests for the corpus-curation operators (contamination check,
repetition stats, TF-salience, chunk-level dedup) on tiny in-memory
corpora with hand-computable answers."""

import pytest

from feature_store_2_spark.operators.curation import (
    chunk_dedup_stats,
    contamination_vs_benchmark,
    repetition_stats,
    tf_salient_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 0 is the "benchmark" (0 % 13 == 0); doc 14 is a verbatim copy
    # of it (fully contaminated); doc 1 shares no 3-gram with it.
    bench = "alpha beta gamma delta epsilon zeta eta theta"
    clean = "one two three four five six seven eight nine ten"
    return spark.createDataFrame(
        [(0, bench), (14, bench), (1, clean)],
        "doc_id long, text string",
    )


def test_contamination_flags_verbatim_copy(corpus):
    rows = {r["doc_id"]: r for r in contamination_vs_benchmark(corpus).collect()}
    assert 0 not in rows  # benchmark docs are excluded from the output
    assert rows[14]["contamination"] == 1.0 and rows[14]["is_contaminated"]
    assert rows[1]["contamination"] == 0.0 and not rows[1]["is_contaminated"]
    # 8 words -> 6 distinct 3-gram shingles
    assert rows[14]["n_shingles"] == 6 and rows[14]["n_contaminated"] == 6


def test_repetition_stats_flags_looping_text(spark):
    looping = "spam ham " * 8  # "spam ham" repeated: top 2-gram dominates
    # 12 distinct words -> every 2-gram unique, top fraction 1/11 < 0.1
    varied = "a b c d e f g h i j k l"
    df = spark.createDataFrame(
        [(1, looping.strip()), (2, varied)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["is_repetitive"] and not rows[2]["is_repetitive"]
    assert rows[1]["top_2gram"] == "ham spam" or rows[1]["top_2gram"] == "spam ham"
    # 16 words, 2 distinct -> dup fraction 14/16
    assert rows[1]["dup_word_frac"] == 14 / 16
    assert rows[2]["dup_word_frac"] == 0.0 and rows[2]["top_2gram_n"] == 1


def test_tf_salience_prefers_rare_terms(spark):
    # "rare" appears twice in doc 1 only; "common" appears in all docs.
    df = spark.createDataFrame(
        [
            (1, "rare rare common filler1"),
            (2, "common filler2 filler2b x"),
            (3, "common filler3 filler3b y"),
        ],
        "doc_id long, text string",
    )
    top = {
        r["doc_id"]: r["term"]
        for r in tf_salient_terms(df, k=1).collect()
    }
    # rare: tf=2, df=1 -> score 6.0; common: tf=1, df=3 -> score 1.0
    assert top[1] == "rare"


def test_chunk_dedup_counts_shared_chunks(spark):
    # Two docs share their first 8-word chunk exactly; doc 2's second
    # chunk is unique. Canonical = lowest (doc_id, chunk_idx).
    shared = "c1 c2 c3 c4 c5 c6 c7 c8"
    df = spark.createDataFrame(
        [(1, shared + " u1 u2"), (2, shared + " v1 v2")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in chunk_dedup_stats(df).collect()}
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 2
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 1
    assert rows[2]["kept_frac"] == 0.5
