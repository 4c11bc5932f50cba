"""Multimodal column plumbing (north-star extension): treat image/audio/
video payloads as opaque binary columns with typed metadata, and run
decode / feature-extraction as Arrow-batched Pandas UDFs via mapInPandas.

The decode step itself is STUBBED — image/audio codecs are not in this
container — behind ``decode_image_real`` (NotImplementedError) and a
deterministic fake (``_fake_decode_features``) so the Spark-side
plumbing (schema, batch shape, partitioning, Arrow exchange) is real
and testable end-to-end. Swap ``_fake_decode_features`` for a PIL/
ffmpeg call and nothing else changes.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
materialize on the driver; partition count governs decode parallelism,
so repartition by a content-hash prefix for even work distribution when
payload sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decode hook — requires an image codec not present here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; swap _fake_decode_features for "
        "a real codec call when the library is available"
    )


def _fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: metadata derived from payload length so
    the oracle can reproduce it in SQL."""
    n = len(payload)
    return n % 640, (n * 7) % 480, n % 24 + 1


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text
    stand in for image bytes) plus byte-length metadata."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "byte_len", F.octet_length(text_col).cast("long")
    )


def decode_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over (doc_id, payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len),
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "n_frames": feats.map(lambda t: t[2]),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, DECODED_SCHEMA
    )
