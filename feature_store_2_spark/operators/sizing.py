"""Size-derived partition counts for operator-level repartitions.

Several operators repartition their (compact, few-file) input BEFORE a
CPU-expanding step — shingle explode, SRP signature projection, token
explode — because a small parquet scans as ~1 partition and AQE's
post-shuffle coalescing (which only sees shuffle BYTES, not the CPU
about to be spent per byte) would collapse a bare ``repartition(col)``
right back to one core.

Those sites used a constant ``defaultParallelism``. That constant is
right once the input is large (the 10x/100x rehearsals) but at small
input it manufactures dozens of near-empty tasks per stage — and
because the repartitioned frame is usually *persisted*, every
downstream stage inherits the inflated partition count with no AQE
exchange left to coalesce it (measured: the exact-Jaccard prefix join
at sf0.1 runs 3-4x slower at 32 map partitions than at 8; see
OPTIMIZATION_r11.md). The scale-correct form of the same idea
(optimization guide §2: derive partitioning from input size, never a
constant tuned for one deployment) is

    partitions = clamp(estimated_input_bytes / bytes_per_task,
                       floor, defaultParallelism)

- ``estimated_input_bytes`` is Catalyst's optimized-plan size estimate:
  driver-side metadata, no job. Unknown/huge estimates saturate at the
  cap, i.e. exactly the old behavior.
- ``bytes_per_task`` encodes the operator's CPU expansion (how much
  work one input byte fans into). 128 KiB of document text ~ tens of
  ms of shingle/signature CPU — small enough that a task is never idle
  scheduling overhead, large enough that a 10x corpus already saturates
  every core.
- ``floor`` keeps genuinely CPU-heavy-but-byte-light inputs parallel
  (the reason these repartitions exist at all).

At rehearsal scale (10x+) every call site below returns the cap — the
identical partitioning the constant produced — so the 10x/100x receipts
in SCALING.md / BENCH_NOTES.md remain valid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# One input byte of compact text/vector data fans into roughly 10-100x
# of explode/hash CPU in the consumers below; 128 KiB per task keeps
# tasks in the tens-of-ms range (measured at sf0.1) while a 6 MB (10x)
# corpus already wants more tasks than a 32-core box has.
CPU_EXPANDING_BYTES_PER_TASK = 128 * 1024

# Task floor: cheap insurance that a tiny-but-dense input still spreads
# (8 near-empty tasks cost ~100 ms; one overloaded task can cost
# seconds). Never exceeds the cap.
_DEFAULT_FLOOR = 8

# SRP embedding engines (band signature matmul + bucket self-join +
# exact re-rank) are denser per input byte than the text shinglers:
# after the r12 one-pass symmetrization removed the duplicated kNN
# subtree, the single candidate stage carried ~15 CPU-s over 8 tasks
# at sf0.1 (only a quarter of the box busy). Same per-site move as
# minhash's 32 KiB (dedup.py, r11): halve the per-task byte budget so
# the spread saturates at defaultParallelism twice as early. Measured
# {8, 16, 32}-partition A/B at sf0.1: graph_bfs_distance 4.79 / 4.10 /
# 4.16, dedup_embedding_ann_pairs 1.82 / 1.60 / 2.08 — 16 wins both.
SRP_BYTES_PER_TASK = 64 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (optimized logical plan
    stats) — driver-side metadata, no Spark job. None when the estimate
    is unavailable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:  # noqa: BLE001 — sizing is best-effort
        return None


def adaptive_partitions(
    df: DataFrame,
    bytes_per_task: int = CPU_EXPANDING_BYTES_PER_TASK,
    floor: int = _DEFAULT_FLOOR,
    cap: int | None = None,
) -> int:
    """Partition count for a pre-explode repartition of ``df``: input
    size over ``bytes_per_task``, clamped to [min(floor, cap), cap].
    Unknown or saturating sizes return the cap (the old constant)."""
    if cap is None:
        cap = df.sparkSession.sparkContext.defaultParallelism
    floor = min(floor, cap)
    size = plan_size_bytes(df)
    if size is None or size <= 0 or size >= bytes_per_task * cap:
        return cap
    return max(floor, min(cap, -(-size // bytes_per_task)))


# Input-size ceiling under which a driver-driven iteration (BFS rounds,
# label propagation) cuts lineage LAZILY (persist) instead of EAGERLY
# (localCheckpoint): below it the whole loop's data is KB-scale and the
# per-round checkpoint is a pure barrier-job tax (~0.1-0.2 s each at
# sf0.1); above it eager truncation is the right trade (bounded plan
# depth, no deep recompute on executor loss). 64 MiB of source bytes ~
# the 10x-100x rehearsal band where the eager path was measured and
# kept.
ITER_LAZY_MAX_INPUT_BYTES = 64 << 20


def compact_for_lazy_iteration(df: DataFrame) -> bool:
    """True when ``df``'s Catalyst size estimate says an iterative
    operator over it can cut per-round lineage with ``persist()``
    instead of ``localCheckpoint()`` (see ITER_LAZY_MAX_INPUT_BYTES).
    Unknown sizes are treated as big — eager checkpointing stays the
    at-scale default."""
    size = plan_size_bytes(df)
    return size is not None and 0 < size <= ITER_LAZY_MAX_INPUT_BYTES


def _max_partition_bytes(df: DataFrame) -> int:
    """``spark.sql.files.maxPartitionBytes`` in bytes (the scan split
    size); default 128 MiB when unreadable."""
    try:
        raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes")
        jvm = df.sparkSession.sparkContext._jvm
        return int(jvm.org.apache.spark.util.Utils.byteStringAsBytes(raw))
    except Exception:  # noqa: BLE001 — sizing is best-effort
        return 128 * 1024 * 1024


def spread_scan(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Conditionally round-robin-spread a few-partition scan whose
    consumer is a CPU-heavy map-side aggregation.

    Single-row-group parquet files scan as ONE task no matter what
    maxPartitionBytes asks for, which serializes the partial
    aggregation onto one core (the stats_inference._spread_for_fanout
    finding, generalized). Conditional on the scan's ESTIMATED split
    count — Catalyst's size estimate over the split size, the same
    driver-side metadata ``adaptive_partitions`` reads — so a real
    100 TB scan (thousands of splits) never pays a base-wide shuffle
    just to aggregate. The r11 form probed
    ``df.rdd.getNumPartitions()``, which compiles a SECOND physical
    plan for the scan subtree per call (and on arbitrary frames under
    AQE could trigger partial stage execution — ADVICE r11); the
    estimate answers the same "fewer splits than cores?" question from
    plan stats alone, with no extra plan compilation. ONLY for
    consumers whose results are row-order-independent (exact
    decimal/integer aggregation — NOT bare double sums)."""
    sc = df.sparkSession.sparkContext
    cap = cap or sc.defaultParallelism
    size = plan_size_bytes(df)
    if size is None or size <= 0:
        # No estimate (non-file relation): assume it is big — never
        # inject a base-wide shuffle on a guess.
        return df
    est_splits = -(-size // _max_partition_bytes(df))
    if est_splits < cap:
        return df.repartition(cap)
    return df
