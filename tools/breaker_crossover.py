"""Exact-vs-HLL breaker state crossover (r10 verdict ask #6).

The r10 receipt showed `streaming_denial_rate_exact`'s level-1 state is
window-span x active users, NOT event volume — "affordable when windows
are short". This tool puts a NUMBER on where that stops being true: the
same access log replayed time-ordered through the exact breaker at a
short window (10 min / 5 min slide — the reference's shape) and at a
long window (24 h / 2 h slide) against a high-cardinality user
population, plus the HLL variant at the long window as the alternative.

Level-1 state rows ~= (distinct users active per window) x (open
windows) x keys. Short windows keep few windows open and few users per
window; a 24 h window over a high-cardinality population holds ~every
active user x (span/slide) open windows — the state approaches
(users x windows) pairs, i.e. the exact batch distinct held resident,
and the HLL sketch (constant bytes per (window, key)) is the honest
trade past that point.

Usage: python tools/breaker_crossover.py [n_events] [n_users]
Defaults 200_000 events / 50_000 users over a 48 h span, 12 slices.
Prints one JSON line per (variant, window); results belong in
SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from feature_store_2_spark.session import get_spark  # noqa: E402
from feature_store_2_spark.streaming.breaker import (  # noqa: E402
    streaming_denial_rate,
    streaming_denial_rate_exact,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _stage(spark, n_events: int, n_users: int, n_slices: int = 12) -> str:
    out = f"/tmp/fs2_breaker_xover_{n_events}_{n_users}"
    marker = os.path.join(out, "_STAGED")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    span_s = 48 * 3600
    per = n_events // n_slices
    ev = (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * span_s / n_events).cast("long")
            ).alias("ts"),
            # xxhash spreads users uniformly; cardinality ~= n_users
            F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
            F.when(F.pmod(F.col("id"), 11) == 0, F.lit("denied"))
            .otherwise(F.lit("granted"))
            .alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    # ids are already time-ordered -> range slices are chronological
    for i in range(n_slices):
        ev.filter(
            (F.col("event_id") >= i * per)
            & (F.col("event_id") < (i + 1) * per if i < n_slices - 1 else True)
        ).coalesce(1).write.parquet(os.path.join(out, f"slice={i:03d}"))
        time.sleep(0.05)  # strictly increasing mtimes
    open(marker, "w").close()
    return out


def _run(spark, df, tag: str, mode: str):
    ckpt = tempfile.mkdtemp(prefix=f"fs2_bx_{tag}_")
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    peaks = []  # per-operator peak across batches
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        for k, op in enumerate(ops):
            while len(peaks) <= k:
                peaks.append(0)
            peaks[k] = max(peaks[k], int(op.get("numRowsTotal", 0)))
    inputs = sum(int(p["numInputRows"]) for p in q.recentProgress)
    return {
        "batches": len(q.recentProgress),
        "input_rows": inputs,
        "state_rows_peak_per_op": peaks,
        "state_rows_peak": max(peaks or [0]),
    }


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("breaker-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    src = _stage(spark, n_events, n_users)
    glob = os.path.join(src, "slice=*")
    denied = F.col("event_type") == "denied"

    def stream():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(glob)
        )

    cases = [
        ("exact", "10 minutes", "5 minutes", "10 minutes"),
        ("exact", "24 hours", "2 hours", "10 minutes"),
        ("hll", "24 hours", "2 hours", "10 minutes"),
    ]
    for variant, win, slide, delay in cases:
        t0 = time.time()
        if variant == "exact":
            df = streaming_denial_rate_exact(
                stream(), denied, window_size=win, slide=slide,
                watermark_delay=delay,
            )
            r = _run(spark, df, f"ex_{win.replace(' ', '')}", "append")
        else:
            df = streaming_denial_rate(
                stream(), denied, window_size=win, slide=slide,
                watermark_delay=delay,
            )
            r = _run(spark, df, f"hll_{win.replace(' ', '')}", "update")
        r.update(
            variant=variant, window=win, slide=slide,
            n_events=n_events, n_users=n_users,
            sec=round(time.time() - t0, 1),
        )
        print("@@" + json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
