"""Salted skew-join: result equivalence with the plain join, and salt
distribution sanity."""

from pyspark.sql import functions as F

from feature_store_2_spark.operators.skew import salted_equi_join
from feature_store_2_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    # event_type is the skewed key: ~5 hot values across every row.
    dim = events.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    plain = events.join(dim, "event_type").select("event_id", "event_type", "type_avg")
    salted = salted_equi_join(
        events, dim, on="event_type", salt_src="event_id", n_salts=8
    ).select("event_id", "event_type", "type_avg")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    salted = events.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(8)).cast("int")
    )
    per_salt = (
        salted.filter(F.col("event_type") == "click")
        .groupBy("__salt")
        .count()
        .collect()
    )
    counts = [r["count"] for r in per_salt]
    assert len(counts) == 8  # hot key sharded across all salts
    assert max(counts) < 2 * min(counts)  # roughly even


def test_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "zzz")], "id int, k string")
    right = spark.createDataFrame([("a", 10), ("b", 20)], "k string, v int")
    out = salted_equi_join(left, right, on="k", salt_src="id", how="left", n_salts=4)
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 10, 2: 20, 3: None}
