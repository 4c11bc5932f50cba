"""Per-query stage/job profiler (guide §1: measure first).

Runs catalog queries with the noop sink exactly like bench.py, but with
the Spark UI's REST API enabled, then reports where the wall-clock went:
per-job duration (labelled via setJobDescription) and per-stage task
count / task-time / shuffle bytes / input bytes. This is the empirical
loop of the optimization guide — find the slow stage before touching
anything.

Usage: python tools/profile_query.py [--attempts N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from feature_store_2_spark.queries import CATALOG


def get_spark_with_ui(cpus: str) -> SparkSession:
    # Mirrors session.get_spark but with the UI on so the REST API
    # exists. Timing numbers here are for *attribution*, not the
    # official bench (bench.py stays UI-off).
    return (
        SparkSession.builder.appName("fs2-profile")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .getOrCreate()
    )


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    attempts = 2
    if args and args[0] == "--attempts":
        attempts = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark_with_ui(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    by_name = {q.name: q for q in CATALOG}
    base = spark.sparkContext.uiWebUrl + "/api/v1/applications/" + spark.sparkContext.applicationId

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # Warm-up mirrors bench.py
    try:
        spark.sparkContext.setJobDescription("warmup")
        force(by_name["q1_pricing_summary"].fn(spark, sf_dir))
    except Exception:
        pass

    report = {}
    for name in args:
        q = by_name[name]
        walls = []
        for i in range(attempts):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}#att{i}")
            t0 = time.perf_counter()
            force(q.fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        report[name] = {"walls": walls}

    jobs = rest(base, "/jobs?status=succeeded")
    stages = {s["stageId"]: s for s in rest(base, "/stages?status=COMPLETE&details=false")}
    for name, rec in report.items():
        best = min(range(len(rec["walls"])), key=lambda i: rec["walls"][i])
        tag = f"{name}#att{best}"
        jrows = [j for j in jobs if j.get("description") == tag]
        jrows.sort(key=lambda j: j["jobId"])
        out = []
        for j in jrows:
            sids = sorted(j.get("stageIds", []))
            srows = []
            for sid in sids:
                s = stages.get(sid)
                if not s:
                    continue
                srows.append(
                    {
                        "stage": sid,
                        "name": s["name"].split("\n")[0][:70],
                        "tasks": s.get("numCompleteTasks", 0),
                        "ms": s.get("executorRunTime", 0),
                        "cpu_ms": int(s.get("executorCpuTime", 0) / 1e6),
                        "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                        "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                        "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    }
                )
            t_sub = j.get("submissionTime", "")
            t_done = j.get("completionTime", "")
            out.append(
                {
                    "job": j["jobId"],
                    "submitted": t_sub,
                    "completed": t_done,
                    "n_tasks": j.get("numCompletedTasks"),
                    "stages": srows,
                }
            )
        rec["jobs_best_attempt"] = out
        rec["n_jobs"] = len(jrows)

    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
