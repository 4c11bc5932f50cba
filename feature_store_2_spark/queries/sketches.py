"""Sketch-based approximate aggregates (the 100 TB substitutes for exact
distinct/quantile shuffles). Approximation algorithms differ across
engines, so these carry no value-exact oracle — the driver records the
rows-only check — but each has an exact twin in the catalog
(agg_distinct_exact, agg_median_quantiles) and a pytest bound check
(tests/test_sketches.py) against the exact answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


@register(
    "sketch_hll_users_per_type",
    None,
    doc="HyperLogLog++ distinct users per event type (vs exact twin "
    "agg_distinct_exact); the sketch is mergeable across partitions",
)
def sketch_hll_users_per_type(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "sketch_approx_percentiles",
    None,
    doc="approx_percentile (Greenwald-Khanna) per return flag (vs exact "
    "twin agg_median_quantiles)",
)
def sketch_approx_percentiles(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median_price"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000)).alias(
            "approx_p90_price"
        ),
    )


@register(
    "udaf_mad_quantity",
    """
SELECT l_returnflag,
       mad(l_quantity) AS mad_qty,
       median(l_quantity) AS median_qty
FROM lineitem
GROUP BY l_returnflag
""",
    doc="pandas GROUPED_AGG UDAF surface (SURVEY §2 UDF/UDAF row): "
    "median absolute deviation per return flag, computed by an "
    "Arrow-batched numpy aggregation — the robust-dispersion statistic "
    "that needs a grouped median of deviations from the grouped "
    "median, which built-in aggregates only reach with a two-pass "
    "join. Quantities are integral doubles so medians are exact "
    "binary halves and the oracle (DuckDB's native mad()) matches "
    "bit-for-bit. Plan shows AggregateInPandas, never BatchEvalPython "
    "— the UDAF is the vectorized slow path used ONLY where Catalyst "
    "has no one-pass equivalent.",
)
def udaf_mad_quantity(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        a = v.to_numpy()
        return float(np.median(np.abs(a - np.median(a))))

    @pandas_udf("double")
    def med(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        mad("l_quantity").alias("mad_qty"),
        med("l_quantity").alias("median_qty"),
    )
