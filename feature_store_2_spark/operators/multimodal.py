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
        # byte_len/width/height/n_frames nullable: a NULL payload (the
        # missing-asset row every real corpus has) decodes to NULL
        # metadata, matching strlen(NULL) on the oracle side.
        T.StructField("byte_len", T.LongType(), True),
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
            # None-safe: a missing asset (NULL payload) yields NULL
            # metadata instead of crashing len()/decode (round-8
            # NULL-text fixture find).
            feats = pdf["payload"].map(
                lambda p: _fake_decode_features(p)
                if p is not None
                else (None, None, None)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"]
                    .map(lambda p: len(p) if p is not None else None)
                    .astype("Int64"),
                    "width": feats.map(lambda t: t[0]).astype("Int64"),
                    "height": feats.map(lambda t: t[1]).astype("Int64"),
                    "n_frames": feats.map(lambda t: t[2]).astype("Int64"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("out_width", T.LongType(), True),
        T.StructField("out_height", T.LongType(), True),
        T.StructField("scale_num", T.LongType(), True),
    ]
)


def resize_features(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """'Resize' planning over decoded metadata: target dims that fit
    ``max_side`` preserving aspect ratio (integer arithmetic so the
    oracle reproduces it). The pixel resample itself belongs in the same
    stubbed codec hook as decode; the Spark-side contract — schema,
    Arrow batching, pure per-row math — is the real plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # nullable Int64: NULL dims (missing asset) propagate NA
            # through the integer plan instead of poisoning floats.
            w = pdf["width"].astype("Int64").clip(lower=1)
            h = pdf["height"].astype("Int64").clip(lower=1)
            side = pd.concat([w, h], axis=1).max(axis=1)
            # fixed-point scale: max_side/side in 1/1024ths, floor
            num = (max_side * 1024) // side
            num = num.clip(upper=1024)  # never upscale
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": (w * num) // 1024,
                    "out_height": (h * num) // 1024,
                    "scale_num": num,
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def frame_sample(decoded: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling plan: one row per sampled frame index (0, every,
    2*every, ...) per clip — built-in sequence+explode, no Python. At
    scale the exploded (doc_id, frame_idx) set drives the per-frame
    decode fan-out, partitioned by doc so a clip's frames co-locate."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("win_idx", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("peak", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
    ]
)


def audio_window_energy(docs_with_payload: DataFrame, window: int = 64) -> DataFrame:
    """Windowed sample statistics over an opaque 'audio' payload — the
    shape of a VAD / loudness-gate stage in an audio curation pipeline:
    bytes -> sample array -> fixed-length windows -> per-window peak and
    energy. Payload bytes stand in for PCM samples (a real pipeline
    swaps the ``frombuffer`` line for a codec call; everything else —
    Arrow batching, numpy windowed reduction, output schema — is the
    production plumbing). All-integer math so the oracle reproduces it
    exactly.

    Scale: mapInPandas streams Arrow batches; one output row per window
    (payload_len/window fan-out), no sample-level shuffle ever.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "win_idx": [], "n_samples": [], "peak": [], "energy": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # missing asset -> no windows (the oracle's
                    # generate_series over strlen(NULL) is empty too)
                    continue
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                for w in range(0, len(samples), window):
                    chunk = samples[w : w + window]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(w // window)
                    out["n_samples"].append(len(chunk))
                    out["peak"].append(int(chunk.max()))
                    out["energy"].append(int((chunk * chunk).sum()))
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, AUDIO_WINDOW_SCHEMA
    )
