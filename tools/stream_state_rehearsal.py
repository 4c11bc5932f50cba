"""Stream-state scale rehearsal: the stream-stream join family (r8
verdict ask #4 — the one scored family with no 30x/100x point).

The 100 TB risk for stateful streaming is STATE SIZE vs watermark, not
shuffle volume: an interval join retains every row inside
watermark + interval per side, and a misconfigured watermark keeps the
whole corpus. Two measurements per factor:

1. **Catch-up form (the scored entries' shape)**: availableNow over the
   staged corpus with a full-span watermark. State is corpus-sized BY
   DESIGN (nothing can evict inside one batch run) — recorded as the
   honest baseline, linear in the corpus.

2. **Steady-state form (the production shape)**: the same interval join
   replayed in TIME ORDER (events sliced into n_slices chronological
   files, maxFilesPerTrigger=1 so the watermark advances between
   micro-batches) with a SHORT watermark (1 day). State must plateau at
   ~rows-per-(watermark+interval) regardless of corpus length — the
   receipt that eviction, not corpus size, bounds memory. The peak/final
   state rows come from each batch's stateOperators numRowsTotal.

Usage: python tools/stream_state_rehearsal.py [factor ...]  (default 1 3 10 30)
Prints one JSON line per (form, factor); results belong in SCALING.md /
BENCH_NOTES.md. Uses the staged /tmp/fs2_scale_<m>x dirs written by
scale_rehearsal.py (run it first).
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

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from feature_store_2_spark.session import get_spark  # noqa: E402

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, factor: int):
    path = f"/tmp/fs2_scale_{factor}x/events.parquet"
    if not os.path.exists(path):
        raise SystemExit(f"{path} missing — run tools/scale_rehearsal.py first")
    df = spark.read.parquet(path)
    # replicas carry raw int64 ns; normalize to timestamp like load_table
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def _stage_sliced(spark, factor: int, n_slices: int = 24) -> str:
    """Write the factor's events as n_slices CHRONOLOGICAL parquet dirs
    (slice i = i-th time range), written in time order so the file
    stream replays them like a log and the watermark advances."""
    out = f"/tmp/fs2_stream_state_{factor}x"
    marker = os.path.join(out, "_STAGED")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    ev = _events(spark, factor)
    sliced = ev.withColumn(
        "_slice", F.ntile(n_slices).over(W.orderBy("ts", "event_id"))
    )
    # ntile over a global window is the single-task shape — fine for a
    # rehearsal staging step (one sort of the replica, done once).
    sliced.persist()
    for i in range(1, n_slices + 1):
        sliced.filter(F.col("_slice") == i).drop("_slice").coalesce(
            1
        ).write.parquet(os.path.join(out, f"slice={i:03d}"))
        time.sleep(0.05)  # strictly increasing mtimes for source order
    sliced.unpersist()
    open(marker, "w").close()
    return out


def _join_streams(spark, src_glob: str, watermark: str, how: str = "inner"):
    purchases = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
        .where(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        [
            purchases.user_id == clicks.user_id,
            F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"),
            F.col("c_ts") <= F.col("p_ts"),
        ],
        how,
    ).select(
        purchases.user_id.alias("user_id"), "purchase_id", "click_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


def _run(spark, joined, tag: str):
    ckpt = tempfile.mkdtemp(prefix=f"fs2_ss_{tag}_")
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = [
        int(op.get("numRowsTotal", 0))
        for p in q.recentProgress
        for op in (p.get("stateOperators") or [])
    ]
    inputs = sum(int(p["numInputRows"]) for p in q.recentProgress)
    return {
        "batches": len(q.recentProgress),
        "input_rows": inputs,
        "state_rows_peak": max(state_rows or [0]),
        "state_rows_final": state_rows[-1] if state_rows else 0,
    }


def main() -> int:
    factors = [int(a) for a in sys.argv[1:]] or [1, 3, 10, 30]
    spark = get_spark("stream-state-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    for fac in factors:
        src = _stage_sliced(spark, fac)
        glob = os.path.join(src, "slice=*")
        n = _events(spark, fac).count()

        t0 = time.time()
        r = _run(spark, _join_streams(spark, glob, "35 days"), f"full{fac}")
        r.update(form="catchup_full_watermark", factor=fac, corpus_rows=n,
                 sec=round(time.time() - t0, 1))
        print("@@" + json.dumps(r), flush=True)

        t0 = time.time()
        r = _run(spark, _join_streams(spark, glob, "1 day"), f"short{fac}")
        r.update(form="steady_1d_watermark", factor=fac, corpus_rows=n,
                 sec=round(time.time() - t0, 1))
        print("@@" + json.dumps(r), flush=True)

        # outer variants: same state machine + a null-emission timer —
        # the horizon bound must hold identically (measured, not argued
        # by analogy).
        for how in ("left_outer", "full_outer"):
            t0 = time.time()
            r = _run(
                spark,
                _join_streams(spark, glob, "1 day", how=how),
                f"{how}{fac}",
            )
            r.update(form=f"steady_1d_{how}", factor=fac, corpus_rows=n,
                     sec=round(time.time() - t0, 1))
            print("@@" + json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
