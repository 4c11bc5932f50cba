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



# --- Count-Min sketch with an EXACT cross-engine oracle -----------------
# Unlike HLL/GK (engine-internal layouts, rows-only checks), CMS is pure
# integer arithmetic: md5-derived row hashes, counter sums, min-over-rows
# estimate — so the sketch itself is bit-identical on both engines.
_CMS_D, _CMS_W = 4, 64


def _cms_idx_spark(j: int) -> F.Column:
    key = F.concat(F.lit(f"{j}:"), F.col("user_id").cast("string"))
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast("long")
        % _CMS_W
    )


def _cms_oracle() -> str:
    from feature_store_2_spark.queries.llm_text import _hex_fold

    idx = {
        j: f"(({_hex_fold(repr(str(j) + ':') + ' || CAST(user_id AS VARCHAR)')}) % {_CMS_W})"
        for j in range(_CMS_D)
    }
    cells = " UNION ALL ".join(
        f"SELECT user_id, true_cnt, {j} AS j, {idx[j]} AS idx FROM counts"
        for j in range(_CMS_D)
    )
    return f"""
WITH counts AS (
    SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id),
cells AS ({cells}),
counters AS (
    SELECT j, idx, CAST(sum(true_cnt) AS BIGINT) AS c
    FROM cells GROUP BY j, idx)
SELECT cells.user_id, CAST(min(true_cnt) AS BIGINT) AS true_cnt,
       min(c) AS cms_est
FROM cells JOIN counters USING (j, idx)
GROUP BY cells.user_id
"""


@register(
    "sketch_countmin_users",
    _cms_oracle(),
    doc="Count-Min sketch (d=4 rows x w=64 counters) of per-user event "
    "frequencies, with an EXACT oracle: the hash rows are md5-derived "
    "integer arithmetic reproduced in SQL, counters are plain sums, "
    "and the estimate is the min over rows — every cell and every "
    "estimate hash-matches across engines (the guarantee the HLL/GK "
    "entries structurally cannot give, which is why they are "
    "rows-only). Output carries the true count next to the estimate; "
    "CMS guarantees est >= true, pinned by pytest. Scale shape: the "
    "sketch is a 256-cell table built in one map-side-combinable "
    "aggregation — mergeable across partitions/streams by cell-wise "
    "addition.",
)
def sketch_countmin_users(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    cells = counts.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_idx_spark(j).alias("idx")
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("user_id", "true_cnt", "cell.j", "cell.idx")
    counters = cells.groupBy("j", "idx").agg(F.sum("true_cnt").alias("c"))
    return (
        cells.join(F.broadcast(counters), ["j", "idx"])
        .groupBy("user_id")
        .agg(
            F.min("true_cnt").alias("true_cnt"),
            F.min("c").alias("cms_est"),
        )
    )


@register(
    "udf_grouped_minmax_scale",
    """
WITH w AS (
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           min(l_quantity) OVER (PARTITION BY l_returnflag) AS mn,
           max(l_quantity) OVER (PARTITION BY l_returnflag) AS mx
    FROM lineitem)
SELECT l_returnflag, l_orderkey, l_linenumber,
       CASE WHEN mx = mn THEN 0.0
            ELSE (l_quantity - mn) / (mx - mn) END AS scaled
FROM w
""",
    doc="pandas GROUPED-MAP surface (applyInPandas — the batch twin of "
    "the streaming applyInPandasWithState path, and the UDF-family row "
    "GROUPED_AGG/mapInPandas entries don't cover): per-return-flag "
    "min-max feature scaling, each group handed to an Arrow-batched "
    "pandas function that returns the transformed rows. Min-max (not "
    "z-score) on purpose: min/max/subtract/divide are single IEEE ops, "
    "so the result is bit-identical to the SQL window oracle — a "
    "variance-based scaler would drift by summation order. Plan shows "
    "FlatMapGroupsInPandas (one shuffle on the group key), never "
    "BatchEvalPython. At 100 TB each group must fit one executor's "
    "Arrow batch — fine for per-category scalers; per-user grains use "
    "the windowed form instead.",
)
def udf_grouped_minmax_scale(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["l_quantity"]
        mn, mx = v.min(), v.max()
        scaled = (v - mn) / (mx - mn) if mx != mn else v * 0.0
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "scaled": scaled,
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        scale,
        "l_returnflag string, l_orderkey long, l_linenumber long, scaled double",
    )
