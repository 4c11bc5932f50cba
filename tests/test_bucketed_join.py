"""Bucketed storage: the join AND same-key agg must plan with zero
Exchange (the write-time shuffle is the only shuffle, ever)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from feature_store_2_spark.sources.bucketed import bucketed_pair, physical_plan


@pytest.fixture(scope="module")
def pair(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("seg")
    )
    right = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("fk"), (F.col("id") * 2).cast("double").alias("amt")
    )
    root = tempfile.mkdtemp(prefix="fs2_bkt_test_")
    dim, fact = bucketed_pair(
        spark, left, right, "t_bkt_left", "t_bkt_right", root, "k", "fk", n_buckets=4
    )
    return dim, fact, root


def test_bucketed_join_has_no_exchange(pair):
    dim, fact, _ = pair
    # merge hint: at test scale Spark would broadcast instead (its own
    # exchange); the bucketed sort-merge path is the one that must be
    # shuffle-free, and it's the plan a 100 TB fact-fact join takes.
    joined = dim.hint("merge").join(fact, dim.k == fact.fk)
    plan = physical_plan(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == 5000


def test_bucketed_join_then_same_key_agg_has_no_exchange(pair):
    dim, fact, _ = pair
    out = (
        dim.hint("merge").join(fact, dim.k == fact.fk)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("amt").alias("s"))
    )
    plan = physical_plan(out)
    assert "Exchange" not in plan, plan
    assert out.count() == 1000


def test_bucketed_scan_reads_bucket_files(pair):
    # Layout check: 4 buckets on disk; bucket id is the _NNNNN suffix of
    # each part file (part-<task>-<uuid>_<bucket>.c000...).
    _, _, root = pair
    files = os.listdir(os.path.join(root, "t_bkt_left"))
    buckets = {
        f.split("_")[-1].split(".")[0] for f in files if f.startswith("part-")
    }
    assert buckets == {"00000", "00001", "00002", "00003"}


def test_date_partition_pruning_reads_only_matching_days(spark, sf_dir, tmp_path):
    """A day-range predicate on a partitionBy(day) layout must prune at
    the DIRECTORY level: the filtered scan lists only the 3 matching
    day partitions, and the physical plan carries PartitionFilters."""
    from pyspark.sql import functions as F

    from feature_store_2_spark.sources.tables import load_table

    target = str(tmp_path / "events_by_day")
    ev = load_table(spark, "events", sf_dir).withColumn("day", F.col("ts").cast("date"))
    ev.write.partitionBy("day").parquet(target)

    part = spark.read.parquet(target)
    pruned = part.filter(
        (F.col("day") >= F.lit("2024-01-10").cast("date"))
        & (F.col("day") <= F.lit("2024-01-12").cast("date"))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # The day bounds sit in PartitionFilters (directory pruning), NOT in
    # the data filter the scan evaluates per row group.
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "day" in pf[0] and "2024-01-10" in pf[0] and "2024-01-12" in pf[0]
    # Execution proof: only the 3 matching days contribute rows, and the
    # full month exists in the layout.
    assert pruned.select("day").distinct().count() == 3
    assert part.select("day").distinct().count() > 25


def test_dpp_partitioned_join_prunes_at_runtime(spark, sf_dir):
    """The date-partitioned fact scan must carry a dynamicpruning
    expression (runtime partition elimination from the dim side), not
    scan all ~30 day directories."""
    from feature_store_2_spark.queries import CATALOG

    q = next(q for q in CATALOG if q.name == "join_dpp_partitioned")
    df = q.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_staging_cache_commits_only_after_success(spark, sf_dir, monkeypatch):
    """r4 advisor finding: _staged_root must NOT cache a root before the
    caller's staging writes succeed — a failed first staging must leave
    no cache entry, so the next call re-stages instead of silently
    reading a partial tree."""
    from feature_store_2_spark.queries import storage

    key = storage._staging_key("failtest", sf_dir)
    storage._STAGING_CACHE.pop(key, None)

    root1, ready1 = storage._staged_root("failtest", sf_dir)
    assert not ready1
    # Simulate the caller's staging write throwing: no commit happens.
    assert key not in storage._STAGING_CACHE
    root2, ready2 = storage._staged_root("failtest", sf_dir)
    assert not ready2 and root2 != root1
    storage._commit_staging("failtest", sf_dir, root2)
    root3, ready3 = storage._staged_root("failtest", sf_dir)
    assert ready3 and root3 == root2
    storage._STAGING_CACHE.pop(key, None)


def test_bucketed_entry_stages_once_per_process(spark, sf_dir):
    """join_bucketed_colocated must reuse one bucketed layout per
    (sf_dir, process) instead of writing a fresh mkdtemp copy per
    invocation (r4 verdict hygiene item)."""
    import glob as _glob
    import tempfile as _tempfile

    from feature_store_2_spark.queries import CATALOG, storage

    q = next(q for q in CATALOG if q.name == "join_bucketed_colocated")
    q.fn(spark, sf_dir).count()
    key = storage._staging_key("bucketed", sf_dir)
    assert key in storage._STAGING_CACHE
    before = set(_glob.glob(os.path.join(_tempfile.gettempdir(), "fs2_bucketed_*")))
    q.fn(spark, sf_dir).count()
    after = set(_glob.glob(os.path.join(_tempfile.gettempdir(), "fs2_bucketed_*")))
    assert before == after, "second invocation staged a new bucketed copy"


def test_bucketed_fact_fact_join_no_exchange(spark, sf_dir):
    """The lineitem-orders bucketed entry must plan join + same-key agg
    with zero Exchange — the write-time shuffle is the only one, which
    is the whole claim at 100 TB where neither fact side broadcasts."""
    from feature_store_2_spark.queries import CATALOG
    from feature_store_2_spark.sources.bucketed import physical_plan

    q = next(q for q in CATALOG if q.name == "join_bucketed_fact_fact")
    df = q.fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
