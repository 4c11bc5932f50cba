"""df.observe() — accumulator-style metrics riding an existing action
(Spark's CollectMetrics operator). The zero-extra-pass way to account
rows/violations while a 100 TB job already runs: the dq_constraint_audit
entry is the standalone audit; observe() attaches the same conditional
aggregates to a production write so quality accounting costs nothing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from feature_store_2_spark.sources.tables import load_table


def test_observe_rides_a_write_without_extra_pass(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "bad_status"
        ),
    )
    # One action drives BOTH the job and the metrics — no second scan.
    observed.write.mode("overwrite").format("noop").save()
    got = obs.get
    assert got["n_rows"] == orders.count()
    assert got["nonpositive_price"] == 0
    assert got["bad_status"] == 0
