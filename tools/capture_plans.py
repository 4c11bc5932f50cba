"""Capture .explain("formatted") for catalog queries into plans/<tag>/.

Deliverable evidence for optimization rounds: the committed plan files
are what a reviewer without a Spark runtime checks claims against
("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin", pushed
filters). Captures the pre-execution plan (AQE initial); operators that
eagerly materialize during query *construction* (localCheckpoint/count
gates) run as usual, so capturing is not free for those.

Usage: python tools/capture_plans.py <tag> [--suffix before|after] [query ...]
       (no query list = the bench HEADLINE set)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries import CATALOG
from feature_store_2_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print("usage: capture_plans.py <tag> [--suffix s] [query ...]")
        sys.exit(2)
    tag = args[0]
    args = args[1:]
    suffix = "before"
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    names = args
    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark("fs2-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    by_name = {q.name: q for q in CATALOG}
    for name in names:
        q = by_name[name]
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        print(f"{name}: {len(text)} bytes, Exchange x{n_exch} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
