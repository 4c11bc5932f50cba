"""Driver-environment rehearsal: run EVERY catalog entry under a plain
SparkSession (no engine tuning — default shuffle partitions, default
configs), exactly as the correctness driver would, and report
per-entry wall time and row counts.

This catches environment-coupling bugs the tuned `get_spark` session
hides: conf-dependent plans, state-store partition blowups (streaming
entries right-size their own shuffle partitions for exactly this
reason), lateral-alias/ANSI differences, and anything leaning on the
session the entry didn't build itself.

Usage: python tools/vanilla_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .appName("fs2-vanilla-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    failures = 0
    for name, fn in entrymod.queries().items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            sys.stdout.write(f"VOK   {name} ({n} rows) [{time.time() - t0:.1f}s]\n")
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            failures += 1
            sys.stdout.write(
                f"VFAIL {name}: {type(e).__name__}: {str(e)[:300]}\n"
            )
        sys.stdout.flush()
    sys.stdout.write(f"\n{failures} failures\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
