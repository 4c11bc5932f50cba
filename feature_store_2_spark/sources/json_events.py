"""JSON-lines event source — the reference's wire format as a file/stream
source.

Reference parity: events arrive as JSON bodies on ``POST /event``
(/root/reference/app.py:17-44) with ISO-8601 timestamps
(models/event.py:31, event_sender/send_events.py:31). Here the transport
is JSON-lines files (or a Kafka value column — same parse), read against
the explicit envelope schema: no schema inference (a 100 TB scan must
never pay an inference pass, and inference would widen types on dirty
data). Rows that fail envelope parsing land in a quarantine frame via
the corrupt-record column — the batch analog of the 400 response —
and property-schema validation then runs through the same
``schemas.parse_events`` used by the parquet path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_2_spark.schemas import EVENT_ENVELOPE

# Envelope + corrupt-record capture for PERMISSIVE mode.
_JSON_SCHEMA = T.StructType(
    [*EVENT_ENVELOPE.fields, T.StructField("_corrupt", T.StringType(), True)]
)
_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]",
}


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch JSON-lines read with explicit envelope schema."""
    return spark.read.options(**_OPTS).schema(_JSON_SCHEMA).json(path)


def read_event_stream_json(spark: SparkSession, path: str) -> DataFrame:
    """Streaming file-source variant (new files per micro-batch)."""
    return spark.readStream.options(**_OPTS).schema(_JSON_SCHEMA).json(path)


def split_envelope_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): a row is quarantined when the JSON line
    failed envelope parsing or lacks required envelope fields."""
    bad = (
        F.col("_corrupt").isNotNull()
        | F.col("event_id").isNull()
        | F.col("ts").isNull()
        | F.col("user_id").isNull()
        | F.col("event_type").isNull()
    )
    return (
        raw.filter(~bad).drop("_corrupt"),
        raw.filter(bad),
    )
