"""Multimodal query family: binary payload columns + Arrow-batched
decode plumbing (stubbed codec, real Spark machinery). The fake decode
derives metadata from payload length, so the DuckDB oracle reproduces
it and the gate checks the full mapInPandas path end-to-end."""

from __future__ import annotations

from feature_store_2_spark.operators.multimodal import decode_features, with_payload
from feature_store_2_spark.queries import register
from feature_store_2_spark.sources.tables import load_table


@register(
    "mm_payload_stats",
    """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
       strlen(text) = length(text) AS is_ascii
FROM documents
""",
    doc="binary payload columns: byte-length vs char-length metadata",
)
def mm_payload_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    d = with_payload(load_table(spark, "documents", sf_dir))
    return d.select(
        "doc_id",
        "byte_len",
        (F.col("byte_len") == F.length("text").cast("long")).alias("is_ascii"),
    )


@register(
    "mm_decode_features",
    """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       CAST(strlen(text) % 640 AS BIGINT) AS width,
       CAST((strlen(text) * 7) % 480 AS BIGINT) AS height,
       CAST(strlen(text) % 24 + 1 AS BIGINT) AS n_frames
FROM documents
""",
    doc="Arrow-batched decode via mapInPandas (deterministic stub codec)",
)
def mm_decode_features(spark, sf_dir):
    return decode_features(with_payload(load_table(spark, "documents", sf_dir)))
