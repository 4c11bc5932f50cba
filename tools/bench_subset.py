"""Subset bench for optimization iteration (guide §1.6 re-measure).

Mirrors bench.py's methodology exactly (same session factory, noop sink,
clearCache per attempt, min-of-3 / min-of-2 for stream entries) but runs
only the queries named on the command line, with optional session conf
overrides from $SPARK_GRAFT_EXTRA_CONF ("k=v;k=v") so config candidates
can be A/B-tested without editing session.py. NOT the driver contract —
bench.py stays the only artifact writer.

Usage: SPARK_GRAFT_EXTRA_CONF="spark.x=y" python tools/bench_subset.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries import CATALOG  # noqa: E402
from feature_store_2_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fs2-bench-subset")
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, extra.split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
    spark.sparkContext.setLogLevel("ERROR")
    by_name = {q.name: q for q in CATALOG}
    # Warm-up mirrors bench.py
    try:
        force(by_name["q1_pricing_summary"].fn(spark, sf_dir))
    except Exception:  # noqa: BLE001
        pass
    tiny_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if any(n.startswith("stream") for n in names) and os.path.isdir(tiny_sf):
        try:
            force(by_name["stream_feature_grants"].fn(spark, tiny_sf))
        except Exception:  # noqa: BLE001
            pass
    times = {}
    spreads = {}
    for name in names:
        q = by_name[name]
        attempts = 2 if name.startswith("stream") else 3
        tries = []
        for _ in range(attempts):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(q.fn(spark, sf_dir))
            tries.append(round(time.perf_counter() - t0, 3))
        times[name] = min(tries)
        spreads[name] = tries
    out = {
        "total": round(sum(times.values()), 3),
        "queries": times,
        "spreads": spreads,
        "extra_conf": extra,
    }
    sys.stdout.flush()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
