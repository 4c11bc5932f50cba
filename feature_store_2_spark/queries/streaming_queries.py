"""Streaming-path query entries for the driver contract.

``stream_feature_grants`` runs the REAL Structured Streaming pipeline
(file source -> applyInPandasWithState -> foreachBatch grants store) over
the sf_dir events and returns the resulting grants snapshot. Its oracle
is the SAME SQL as the batch ``fs_feature_grants`` — so the correctness
gate proves batch/stream equivalence end-to-end, not just "rows came
out": the stateful path must reproduce the declarative pipeline exactly
(uuid dedup, distinct sets, cent-exact sums).

``stream_denial_rate`` exercises the watermarked sliding-window breaker
(A16/A17). It uses ``approx_count_distinct`` (exact distinct is
unsupported in streaming aggs and unaffordable at 100 TB), so there is no
exact SQL oracle — the driver records the rows-only check.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from feature_store_2_spark.queries import register
from feature_store_2_spark.queries.feature_store import _AGG_CTE
from feature_store_2_spark.sources.tables import load_table
from feature_store_2_spark.streaming import (
    read_grants,
    run_grants_pipeline,
    streaming_denial_rate,
)

_GRANTS_ORACLE = (
    _AGG_CTE
    + """
, wide AS (
    SELECT user_id,
           too_many_distinct_ks AND click_to_purchase_ratio AS purchase_grant,
           cannot_error_message AS message_grant
    FROM rules
)
SELECT user_id, 'purchase' AS feature, purchase_grant AS has_grant FROM wide
UNION ALL
SELECT user_id, 'message' AS feature, message_grant AS has_grant FROM wide
"""
)


def _stage_events(spark, sf_dir: str) -> str:
    """Write the (ts-normalized) events table into a fresh streaming
    source dir — the batch parquet stands in for the Kafka topic."""
    root = tempfile.mkdtemp(prefix="fs2_stream_")
    events_dir = os.path.join(root, "events")
    load_table(spark, "events", sf_dir).write.parquet(events_dir)
    return root


@register(
    "stream_feature_grants",
    _GRANTS_ORACLE,
    doc="END-TO-END STREAMING: stateful per-user aggregation + grants "
    "foreachBatch, oracle-checked against the batch grants SQL",
)
def stream_feature_grants(spark, sf_dir):
    root = _stage_events(spark, sf_dir)
    run_grants_pipeline(
        spark,
        events_path=os.path.join(root, "events"),
        grants_path=os.path.join(root, "grants"),
        notifications_path=os.path.join(root, "notifications"),
        checkpoint_path=os.path.join(root, "checkpoint"),
    )
    return read_grants(spark, os.path.join(root, "grants"))


@register(
    "stream_dedup_events",
    """
SELECT user_id, event_id, min(event_type) AS event_type
FROM events
GROUP BY user_id, event_id
""",
    doc="streaming uuid-dedup via dropDuplicatesWithinWatermark (state "
    "bounded by the watermark — the scale path for A5/A7's exact sets)",
)
def stream_dedup_events(spark, sf_dir):
    root = _stage_events(spark, sf_dir)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(os.path.join(root, "events"))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_id"]
    )
    name = "fs2_stream_dedup"
    q = (
        deduped.select("user_id", "event_id", "event_type")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "stream_denial_rate",
    None,  # approx_count_distinct => no exact oracle; rows-only check
    doc="watermarked 10-min/5-min sliding-window denial rate over the "
    "event stream (A16/A17), HLL++ distincts",
)
def stream_denial_rate(spark, sf_dir):
    root = _stage_events(spark, sf_dir)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(os.path.join(root, "events"))
    rates = streaming_denial_rate(
        stream, denied=F.col("value") < 2.0, slide="5 minutes"
    )
    name = "fs2_stream_denial_rate"
    q = (
        rates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
