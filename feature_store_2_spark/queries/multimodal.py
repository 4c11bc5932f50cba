"""Multimodal query family: binary payload columns + Arrow-batched
decode plumbing (stubbed codec, real Spark machinery). The fake decode
derives metadata from payload length, so the DuckDB oracle reproduces
it and the gate checks the full mapInPandas path end-to-end."""

from __future__ import annotations

from feature_store_2_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    resize_features,
    with_payload,
)
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


@register(
    "mm_resize_plan",
    """
WITH decoded AS (
    -- strlen(NULL) + 0: DuckDB's greatest() SKIPS NULL arguments
    -- (greatest(NULL, 1) = 1), which would invent dims for a missing
    -- asset; adding the NULL-propagating term keeps a NULL payload's
    -- plan NULL like the Spark side's nullable Int64 math.
    SELECT doc_id,
           CAST(greatest(strlen(text) % 640, 1) + strlen(text) * 0
                AS BIGINT) AS w,
           CAST(greatest((strlen(text) * 7) % 480, 1) + strlen(text) * 0
                AS BIGINT) AS h,
           CAST(strlen(text) % 640 AS BIGINT) AS width,
           CAST((strlen(text) * 7) % 480 AS BIGINT) AS height
    FROM documents
),
scaled AS (
    SELECT doc_id, width, height, w, h,
           -- + w * 0: least() also SKIPS NULLs (least(NULL, 1024) =
           -- 1024) — keep a NULL plan NULL.
           least(256 * 1024 // greatest(w, h), 1024) + w * 0 AS scale_num
    FROM decoded
)
SELECT doc_id, width, height,
       w * scale_num // 1024 AS out_width,
       h * scale_num // 1024 AS out_height,
       scale_num
FROM scaled
""",
    doc="aspect-preserving resize plan (fit 256, integer fixed-point scale)",
)
def mm_resize_plan(spark, sf_dir):
    decoded = decode_features(with_payload(load_table(spark, "documents", sf_dir)))
    return resize_features(decoded, max_side=256)


@register(
    "mm_frame_sample",
    """
SELECT doc_id, n_frames, CAST(f.f AS BIGINT) AS frame_idx
FROM (SELECT doc_id, CAST(strlen(text) % 24 + 1 AS BIGINT) AS n_frames
      FROM documents)
CROSS JOIN generate_series(0, 24, 4) f(f)
WHERE f.f < n_frames
""",
    doc="frame sampling fan-out: every-4th frame index per clip",
)
def mm_frame_sample(spark, sf_dir):
    decoded = decode_features(with_payload(load_table(spark, "documents", sf_dir)))
    return frame_sample(decoded, every=4)


@register(
    "mm_audio_window_energy",
    """
WITH hx AS (
    -- BYTE semantics, not characters: the Spark path reads the UTF-8
    -- payload as uint8 samples, so the oracle parses hex(bytes) pairs;
    -- ascii(substring(text, i, 1)) would yield CODEPOINTS and diverge
    -- on any non-ASCII text (codepoint 26481 squared vs two bytes).
    SELECT doc_id, hex(encode(text)) AS h, strlen(text) AS nb
    FROM documents),
samples AS (
    SELECT doc_id,
           (i - 1) // 64 AS win_idx,
           (position(substring(h, CAST(2 * i - 1 AS INTEGER), 1)
                     IN '0123456789ABCDEF') - 1) * 16
           + (position(substring(h, CAST(2 * i AS INTEGER), 1)
                       IN '0123456789ABCDEF') - 1) AS v
    FROM hx, LATERAL (SELECT unnest(generate_series(1, nb)) AS i) t)
SELECT doc_id, win_idx,
       count(*) AS n_samples,
       CAST(max(v) AS BIGINT) AS peak,
       CAST(sum(v * v) AS BIGINT) AS energy
FROM samples
GROUP BY doc_id, win_idx
""",
    doc="audio-pipeline plumbing: payload bytes as PCM samples, windowed "
    "peak + energy (the VAD/loudness-gate stage) via numpy inside "
    "mapInPandas — all-integer so the SQL oracle reproduces the Arrow "
    "path exactly; one output row per 64-sample window, no "
    "sample-level shuffle",
)
def mm_audio_window_energy(spark, sf_dir):
    from feature_store_2_spark.operators.multimodal import audio_window_energy

    return audio_window_energy(with_payload(load_table(spark, "documents", sf_dir)))


@register(
    "mm_payload_dedup",
    """
SELECT sha256(text) AS content_hash,
       CAST(count(*) AS BIGINT) AS n_copies,
       min(doc_id) AS canonical_id,
       CAST(max(strlen(text)) AS BIGINT) AS byte_len
FROM documents
GROUP BY sha256(text)
""",
    doc="binary-content dedup: opaque payload bytes (the image/audio "
    "stand-in, operators/multimodal.with_payload) grouped by their "
    "sha256 — the content-addressable-storage primitive behind "
    "asset dedup in multimodal corpora (identical bytes stored once, "
    "metadata rows keep pointers). Hash computed JVM-side over the "
    "BINARY column (never the string), canonical = min doc_id. One "
    "hash aggregate; at 100 TB the 32-byte digests shuffle, never "
    "the payloads.",
)
def mm_payload_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    d = with_payload(load_table(spark, "documents", sf_dir))
    return d.groupBy(F.sha2(F.col("payload"), 256).alias("content_hash")).agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("doc_id").alias("canonical_id"),
        F.max("byte_len").cast("long").alias("byte_len"),
    )
