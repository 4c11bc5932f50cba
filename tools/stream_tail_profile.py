"""Per-micro-batch attribution for streaming entries (guide §1).

Attaches a StreamingQueryListener, runs the named catalog stream
entries once each, and prints every micro-batch's durationMs breakdown
(triggerExecution / queryPlanning / getBatch / addBatch / walCommit /
commitOffsets) plus stateOperators commit times and row counts — the
evidence for how much of a run is the availableNow no-data
watermark-advance tail vs real batch work, and what of the tail is
plan construction vs state-store commits.

Usage: [SPARK_GRAFT_STREAM_PARTS=N] python tools/stream_tail_profile.py entry [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from feature_store_2_spark.queries import CATALOG
from feature_store_2_spark.session import get_spark


class _Capture(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    by = {q.name: q for q in CATALOG}
    spark = get_spark("fs2-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    parts = os.environ.get("SPARK_GRAFT_STREAM_PARTS")
    cap = _Capture()
    spark.streams.addListener(cap)
    for name in names:
        cap.progress.clear()
        t0 = time.perf_counter()
        if parts:
            # Entries set their own stream shuffle partitions; an env
            # override here lets the state-commit cost be A/B'd without
            # editing them.
            os.environ["SPARK_GRAFT_STREAM_PARTS_OVERRIDE"] = parts
        df = by[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        print(f"=== {name}: wall {wall:.2f}s, {len(cap.progress)} progress events")
        for p in cap.progress:
            d = p.get("durationMs", {})
            rows = p.get("numInputRows")
            ops = [
                {
                    "rows": so.get("numRowsTotal"),
                    "upd": so.get("numRowsUpdated"),
                    "commitMs": so.get("commitTimeMs"),
                    "shards": so.get("numShufflePartitions"),
                }
                for so in p.get("stateOperators", [])
            ]
            print(
                f"  batch {p.get('batchId')}: rows={rows} durationMs={d} "
                f"state={ops}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
