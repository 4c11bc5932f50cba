"""Regression tests for the plan-audit checker itself (round-4 item:
the r3 weak spots — a global-ordered window in doc_pack_token_budget and
a global row_number in kmeans_fit — were invisible to the audit because
it had no non-partitioned-window check. Prove the checker catches them.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.explain_audit import GLOBAL_WINDOW_OK, global_windows


def test_checker_flags_global_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert global_windows(df) >= 1


def test_checker_passes_partitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy((F.col("id") % 10)).orderBy("id")
        ),
    )
    assert global_windows(df) == 0


def test_catalog_has_no_unlisted_global_window(spark, sf_dir):
    """Full-catalog sweep: no batch entry may compile to a physical plan
    with a non-partitioned Window unless it is on the documented
    allowlist. This is the check that would have caught the r3
    doc_pack_token_budget / kmeans_fit weak spots at commit time."""
    from feature_store_2_spark.queries import CATALOG

    offenders = []
    for q in CATALOG:
        if q.name.startswith("stream") or q.name in GLOBAL_WINDOW_OK:
            continue
        if global_windows(q.fn(spark, sf_dir)):
            offenders.append(q.name)
    assert not offenders, offenders
