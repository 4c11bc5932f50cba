"""Invariant tests for the training-data assembly family
(queries/training_data.py). The DuckDB oracle pins cross-engine value
equality; these pin the SEMANTIC contracts the oracle can't see:
sample-size bounds, batch-capacity feasibility, mixture-rate
statistics, and posting-list well-formedness.
"""

import pyspark.sql.functions as F

from feature_store_2_spark.queries import CATALOG

Q = {q.name: q.fn for q in CATALOG}


def test_reservoir_sample_size_and_determinism(spark, sf_dir):
    out = Q["sample_group_reservoir"](spark, sf_dir)
    per_group = out.groupBy("user_id").count()
    assert per_group.filter(F.col("count") > 3).count() == 0
    # users with >= 3 events must contribute exactly 3 (min(k, n) rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_by_user = ev.groupBy("user_id").count().withColumnRenamed("count", "n")
    short = (
        per_group.join(n_by_user, "user_id")
        .filter((F.col("n") >= 3) & (F.col("count") != 3))
        .count()
    )
    assert short == 0
    # deterministic: a second run returns the identical id set
    a = {r.event_id for r in out.select("event_id").collect()}
    b = {r.event_id for r in Q["sample_group_reservoir"](spark, sf_dir).select("event_id").collect()}
    assert a == b


def test_length_bucket_batches_feasible(spark, sf_dir):
    out = Q["doc_length_bucket_batches"](spark, sf_dir)
    bad = out.filter(
        (F.col("max_tokens") > F.col("bucket") * 32)
        | (F.col("max_tokens") <= (F.col("bucket") - 1) * 32)
        | (F.col("pad_waste") < 0)
        | (F.col("n_docs") > 8)
        | (F.col("n_docs") < 1)
    ).count()
    assert bad == 0
    # batch ids are dense per (bucket, shard): max_id + 1 == n_batches
    dense = (
        out.groupBy("bucket", "shard")
        .agg(F.max("batch_id").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") + 1 != F.col("n"))
        .count()
    )
    assert dense == 0
    # every document lands in exactly one batch
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.agg(F.sum("n_docs")).collect()[0][0] == total_docs


def test_mixture_temperature_rates(spark, sf_dir):
    out = Q["doc_mixture_temperature_sample"](spark, sf_dir)
    rows = out.groupBy("lang", "n_lang", "keep_rate").count().collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_min = docs.groupBy("lang").count().agg(F.min("count")).collect()[0][0]
    for r in rows:
        expect = (float(n_min) / r.n_lang) ** 0.5
        assert abs(r.keep_rate - expect) < 1e-12
        # kept count is Binomial(n_lang, rate); allow 4 sigma
        sigma = (r.n_lang * expect * (1 - expect)) ** 0.5
        assert abs(r["count"] - r.n_lang * expect) <= 4 * sigma + 1
    # the smallest language is kept whole (rate exactly 1.0)
    assert any(r.keep_rate == 1.0 and r["count"] == r.n_lang for r in rows)


def test_inverted_index_postings_wellformed(spark, sf_dir):
    out = Q["search_inverted_index"](spark, sf_dir)
    rows = out.collect()
    seg_width = 100
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == r.seg_df
        assert ids == sorted(ids) and len(set(ids)) == len(ids)
        assert all(i // seg_width == r.segment for i in ids)
        assert r.seg_df <= seg_width  # bounded by construction


def test_bpe_merge_step_counts(spark, sf_dir):
    rows = Q["vocab_bpe_merge_step"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    ns = [r.pair_n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(n > 0 for n in ns)
    assert all(len(r.pair) == 3 and r.pair[1] == "|" for r in rows)


def test_domain_profile_shares_sum_to_one(spark, sf_dir):
    rows = Q["doc_domain_quality_profile"](spark, sf_dir).collect()
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 <= r.dup_frac < 1
        assert r.n_unique_texts <= r.n_docs
