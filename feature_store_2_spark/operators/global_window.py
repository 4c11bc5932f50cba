"""Distributed global ordered scans — the two-phase prefix pattern.

A window spec with an empty (or low-cardinality) PARTITION BY forces
Spark to sort and scan each partition's rows in ONE task — the classic
100 TB cliff behind ``ntile() OVER (ORDER BY ...)``, global running
sums, and sweep lines. Several catalog docstrings name the standard
fix ("range-partitioned partials + broadcast prefix offsets"); this
module IS that fix, as a reusable operator:

  1. **Bucket** rows by a range key: collect ~``n_buckets`` approximate
     quantile boundaries of the key to the driver (a bounded action —
     one sketch aggregation), then assign each row a bucket id with a
     pure column expression over those literals. Because the bucket id
     is a FUNCTION of the key, every row with the same key lands in the
     same bucket and the assignment is immune to the classic
     exchange-reuse / resampling hazard of ``spark_partition_id()``
     after ``repartitionByRange`` (two executions of the sampler can
     disagree; literals cannot).
  2. **Local scan**: an ordinary window partitioned by
     ``(partition_cols..., bucket)`` — each bucket sorts and scans in
     its own task, in parallel.
  3. **Offsets**: per-bucket totals from one map-side-combined hash
     agg, a running sum over the ≤``n_buckets``-row metadata table
     (a genuinely bounded window), broadcast-joined back.

The result is VALUE-IDENTICAL to the single-task window for any
boundary set — boundaries only steer load balance, never values — so
the DuckDB oracles of consuming entries are unchanged and the property
test in tests/test_global_window.py pins equality against the plain
window on adversarial key distributions (ties straddling boundaries,
nulls, constant keys, empty frames).

Null range keys sort FIRST (Spark's ASC NULLS FIRST default): the
bucket expression sends them to bucket 0 explicitly.

Scale shape: two shuffles of the fact table (hash by bucket for the
local window; the partial-agg shuffle is metadata-sized after map-side
combine) + one bounded driver action for boundaries, instead of one
shuffle into ONE sort task. At 1000 executors, ``n_buckets`` tracks
the cluster's task budget, not the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "range_bucket",
    "bucketed_running_sum",
    "bucketed_running_sums",
    "bucketed_row_number",
    "release_gw_caches",
]

_B = "_gw_bucket"

# range_bucket's persisted inputs ride the shared bounded operator
# cache registry (operators/cache.py — the r8 ADVICE leak fix,
# generalized repo-wide in r9). release_gw_caches is kept as an alias.
from feature_store_2_spark.operators.cache import (  # noqa: E402
    release_tracked_caches as release_gw_caches,
    track_persist as _track_persist,
)
from feature_store_2_spark.operators.sizing import plan_size_bytes  # noqa: E402

# Compact-input fast path (r12): below this Catalyst estimate of the
# input, the plain window IS the operator — value-identical by this
# module's defining property (any boundary set assembles the same
# values as the single-task window; the bucketed machinery exists only
# to avoid the one-task sort at scale) — and it skips the boundary
# sketch job, the bucket projection, the offsets agg and the
# broadcast join: measured ~2 s of fixed machinery per consumer at
# sf0.1 where the plain window costs 0.6 s. The estimate tracks scan
# bytes (sf0.1 consumers ~1 MB, 10x ~11 MB — both comfortably under),
# so rehearsal scales ride the fast path while anything estimated past
# 32 MiB (and any UNKNOWN estimate) takes the range-partitioned plan;
# at the crossover a one-task sort of a ~32 MB-scan histogram is
# low-single-digit seconds, inside the gate's error budget. Same
# derive-from-size discipline as compact_for_lazy_iteration and
# adaptive_partitions. tests/test_global_window.py pins both paths:
# the equality suite forces the bucketed path (gate monkeypatched to
# 0) against the plain reference, and the gate test asserts
# gate-on == gate-off on the adversarial keysets.
GW_PLAIN_WINDOW_MAX_BYTES = 32 << 20


def range_bucket(
    df: DataFrame,
    range_key: str,
    n_buckets: int = 32,
    nulls: str = "first",
) -> tuple[DataFrame, int]:
    """Attach a range-bucket id column (``_gw_bucket``) derived from
    driver-collected approximate quantiles of ``range_key``.

    Returns ``(df_with_bucket, n_distinct_buckets)``. The boundary
    collection is one bounded action (a quantile sketch — never the
    rows); duplicate boundaries collapse, so heavily-tied keys simply
    use fewer buckets (correctness is unaffected; a single giant tie
    degrades to the single-task case, which is unavoidable for exact
    ordered semantics and irrelevant for real numeric keys).

    The input is persist()-ed first: the quantile action (which runs
    at PLAN-CONSTRUCTION time — callers of a bucketed_* consumer
    trigger one bounded Spark job just building the DataFrame)
    materializes it, and the local-window and offsets branches then
    read the SAME cache instead of recomputing the upstream plan three
    times (measured 2.5x overhead on window_max_concurrency at 30x
    before this). persist — not localCheckpoint — so lineage survives
    executor loss at cluster scale; blocks are evictable (worst case a
    branch recomputes). Caches are tracked in a bounded module FIFO
    (oldest unpersisted past _MAX_CACHED) and releasable en masse via
    release_gw_caches() — see the registry note above.
    """
    df = _track_persist(df)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # One percentile_approx AGGREGATE instead of df.stat.approxQuantile:
    # same QuantileSummaries sketch, but as a plain map-side-combined
    # SQL agg it skips the stat-function wrapper's extra plan pass —
    # measured ~2x cheaper per call on a cached histogram (this action
    # runs at plan-construction time for every bucketed_* consumer, so
    # it is pure fixed cost on every bench attempt). accuracy=100 is
    # the same 1% relative error the old call requested. Boundaries
    # steer load balance only — any boundary set is value-identical
    # (tests/test_global_window.py pins this), so the swap cannot
    # change a consumer's output.
    qrow = df.select(
        F.percentile_approx(
            F.col(range_key).cast("double"), F.lit(probs), F.lit(100)
        ).alias("qs")
    ).first()
    qs = [q for q in (qrow["qs"] or []) if q is not None]
    # Dedup + sort: approxQuantile can repeat a boundary on tied keys.
    bounds = sorted(set(qs))
    # Bucket id = |{boundaries strictly below the key}| as ONE
    # higher-order expression over a boundary-array literal, not a
    # 31-deep chain of when(cast > lit, 1).otherwise(0) adds. The
    # chain form cost ~0.4 s of codegen compilation per consuming
    # plan (each bucketed_* consumer compiles it into 2-3 plans) and
    # ~2x the per-row time of the HOF form (r12 measured: warm-cache
    # pass 0.18 s chain vs 0.10 s HOF on a 49k-row hist; first-pass
    # 0.61 vs 0.35). Value-identical, including NULL keys: the
    # filter predicate (NULL > b) is NULL, so every element drops
    # and size() = 0 — bucket 0, exactly the otherwise-0 of the old
    # chain (ASC NULLS FIRST), and tests/test_global_window.py pins
    # equality against the plain window either way.
    bucket: Column
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(
            F.filter(barr, lambda x: F.col(range_key).cast("double") > x)
        )
    else:
        bucket = F.lit(0)
    if nulls == "last":
        # ASC NULLS LAST (the DESC-via-negation case: DESC defaults to
        # NULLS LAST in both engines): nulls get their own final
        # bucket, past every boundary bucket.
        bucket = F.when(
            F.col(range_key).isNull(), F.lit(len(bounds) + 1)
        ).otherwise(bucket)
    return df.withColumn(_B, bucket), len(bounds) + 2


def bucketed_running_sums(
    df: DataFrame,
    range_key: str,
    order_cols: Sequence[str],
    items: Sequence[tuple[Column, str]],
    partition_cols: Sequence[str] = (),
    n_buckets: int = 32,
    nulls: str = "first",
) -> DataFrame:
    """``sum(value_i) OVER (PARTITION BY partition_cols ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)`` for every ``(value_i,
    out_col_i)`` in ``items`` — one bucketing pass, one local window,
    one offset table, however many cumulative columns.

    ``range_key`` must be the leading element of ``order_cols`` (the
    bucketing key); ``order_cols`` must be a total order within each
    partition group so frames are deterministic (the catalog's standard
    tie-break discipline). Sum typing follows Spark's usual window-sum
    rules per value expression.
    """
    assert order_cols and order_cols[0] == range_key, (
        "range_key must lead order_cols so buckets are order-contiguous"
    )
    assert items, "at least one (value, out_col) pair"
    assert nulls in ("first", "last")
    pc = list(partition_cols)
    est = plan_size_bytes(df)
    if est is not None and 0 < est <= GW_PLAIN_WINDOW_MAX_BYTES:
        # Compact input: the plain window (this operator's pinned
        # reference semantics) — see GW_PLAIN_WINDOW_MAX_BYTES. The
        # persist keeps the operator's multi-branch caching side-effect
        # for consumers that read df again (no boundary job, so it
        # materializes lazily with the first action).
        out = _track_persist(df)
        lead = (
            F.col(order_cols[0]).asc_nulls_last()
            if nulls == "last"
            else F.col(order_cols[0]).asc()
        )
        w = (
            W.partitionBy(*pc)
            .orderBy(lead, *order_cols[1:])
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        for value, out_col in items:
            out = out.withColumn(out_col, F.sum(value).over(w))
        return out
    tagged, _ = range_bucket(df, range_key, n_buckets, nulls=nulls)
    vcols = [f"_gw_v{i}" for i in range(len(items))]
    for vc, (value, _o) in zip(vcols, items):
        tagged = tagged.withColumn(vc, value)

    lead = (
        F.col(order_cols[0]).asc_nulls_last()
        if nulls == "last"
        else F.col(order_cols[0]).asc()
    )
    local_w = (
        W.partitionBy(*pc, _B)
        .orderBy(lead, *order_cols[1:])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = tagged
    lcols = [f"_gw_l{i}" for i in range(len(items))]
    for lc, vc in zip(lcols, vcols):
        local = local.withColumn(lc, F.sum(vc).over(local_w))

    # Per-(partition, bucket) totals -> running offset over the bounded
    # bucket table. The offset window's partition count is |partition
    # values actually present| and its per-partition row count is
    # <= n_buckets: metadata by construction.
    totals = tagged.groupBy(*pc, _B).agg(
        *[F.sum(vc).alias(f"_gw_t{i}") for i, vc in enumerate(vcols)]
    )
    off_w = (
        W.partitionBy(*pc)
        .orderBy(_B)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = totals.select(
        *pc,
        F.col(_B),
        *[
            (F.sum(f"_gw_t{i}").over(off_w) - F.col(f"_gw_t{i}")).alias(
                f"_gw_o{i}"
            )
            for i in range(len(items))
        ],
    )

    # Null-safe equi-join on the partition columns: Window.partitionBy
    # treats NULL as an ordinary group, so the offsets attach must too
    # (a plain equi-join would silently DROP every null-group row).
    off = F.broadcast(offsets.select(
        *[F.col(c).alias(f"_gw_p_{c}") for c in pc], _B, *[
            F.col(f"_gw_o{i}") for i in range(len(items))
        ]
    ).withColumnRenamed(_B, "_gw_pb"))
    cond = F.col(_B) == F.col("_gw_pb")
    for c in pc:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_gw_p_{c}"))
    joined = local.join(off, cond).drop(
        "_gw_pb", *[f"_gw_p_{c}" for c in pc]
    )
    for i, (_v, out_col) in enumerate(items):
        joined = joined.withColumn(
            out_col, F.col(lcols[i]) + F.col(f"_gw_o{i}")
        )
    drop = [_B] + vcols + lcols + [f"_gw_o{i}" for i in range(len(items))]
    return joined.drop(*drop)


def bucketed_running_sum(
    df: DataFrame,
    range_key: str,
    order_cols: Sequence[str],
    value: Column,
    out_col: str,
    partition_cols: Sequence[str] = (),
    n_buckets: int = 32,
) -> DataFrame:
    """Single-column convenience wrapper over ``bucketed_running_sums``."""
    return bucketed_running_sums(
        df,
        range_key,
        order_cols,
        [(value, out_col)],
        partition_cols=partition_cols,
        n_buckets=n_buckets,
    )


def bucketed_row_number(
    df: DataFrame,
    range_key: str,
    order_cols: Sequence[str],
    out_col: str = "rn",
    partition_cols: Sequence[str] = (),
    n_buckets: int = 32,
    nulls: str = "first",
) -> DataFrame:
    """``row_number() OVER (PARTITION BY partition_cols ORDER BY
    order_cols)`` via the two-phase prefix (a running count of 1s).

    With the catalog's unique-tie-break discipline, row_number == rank
    == dense_rank, so this is also the scale path for percent_rank
    ((rn-1)/(n-1)) and exact ntile(k) — see ``ntile_from_row_number``.
    """
    return bucketed_running_sums(
        df,
        range_key,
        order_cols,
        [(F.lit(1).cast("long"), out_col)],
        partition_cols=partition_cols,
        n_buckets=n_buckets,
        nulls=nulls,
    )


def ntile_from_row_number(rn: Column, n: Column, k: int) -> Column:
    """Exact SQL ntile(k) from a 1-based row_number and the partition
    row count, as a closed-form column expression.

    SQL semantics: the first ``n mod k`` tiles get ``n div k + 1``
    rows, the rest ``n div k``. For ``n < k`` every row gets its own
    tile (q = 0 branch degenerates correctly: cutoff = n covers all
    rows with tile = rn).
    """
    # Integral `div` (IntegralDivide), NOT double division + cast:
    # correctly-rounded doubles can floor wrong once operands approach
    # 2^53, and the repo's discipline is all-integer exactness at any n
    # (ADVICE r8).
    def _div(a: Column, b: Column | int) -> Column:
        return F.call_function("div", a, F.lit(b) if isinstance(b, int) else b)

    q = _div(n, k)
    r = n - q * k
    big = q + 1
    cutoff = r * big
    return (
        F.when(rn <= cutoff, _div(rn - 1, big) + 1)
        .otherwise(r + _div(rn - cutoff - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("long")
    )
