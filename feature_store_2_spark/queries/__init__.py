"""Query catalog: every operator the engine exposes, as (name, spark_fn,
oracle_sql) triples consumed by the driver contract (__spark_entry__.py).

Each QueryDef's ``fn(spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``oracle`` is the equivalent ANSI SQL DuckDB runs on the
same parquet for the correctness gate (row-count + schema +
order-insensitive value hash). ``oracle=None`` marks genuinely
non-SQL-expressible operators (driver falls back to a rows-only check).

Determinism contract for oracle-matched queries:
  * every computed column is aliased identically on both sides;
  * SUM/AVG over doubles accumulate in DECIMAL (exact, order-independent)
    and cast to DOUBLE once, so hashes match bit-for-bit;
  * ORDER-sensitive outputs always carry a total tie-break key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


CATALOG: list[QueryDef] = []


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        if any(q.name == name for q in CATALOG):
            raise ValueError(f"duplicate catalog entry: {name}")
        CATALOG.append(QueryDef(name, fn, oracle, doc))
        return fn

    return deco


# The driver scores catalog entries in order and has a per-round budget
# (~the first 50). Round-4 head, in three bands (per the r3 verdict's
# rotation plan):
#   1. MUST-SCORE — the 31 entries added in round 3 that have never been
#      driver-scored (they were parked in _NEXT_ROUND_HEAD while the r3
#      head was frozen); each needs a green CORRECTNESS_r04 row.
#   2. R2-ONLY GREENS — driver-green in round 2 but never re-scored under
#      the current runtime; value-level drift (the func_math_lineitem
#      class) only surfaces under the oracle, so re-score them.
#   3. REGRESSION STAPLES — the core r3-green queries kept in the head
#      every round as a runtime-drift canary.
# Everything else keeps registration order after the priority block.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- band 1: new in round 3, never driver-scored --
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "doc_word_entropy",
    "stream_topk_trending",
    "agg_heavy_hitters",
    "rolling_7d_active_users",
    "sql_lateral_topn_per_segment",
    "mm_audio_window_energy",
    "func_zorder_key",
    "func_regexp_extract_all",
    "stream_grants_multibatch",
    "streak_longest_daily",
    "window_locf_forward_fill",
    "fs_grants_version_diff",
    "udaf_mad_quantity",
    "emb_kmeans_fit",
    "fs_grants_forget_users",
    "hist_equidepth_price",
    "window_nth_value_third_order",
    "agg_string_concat_ordered",
    "agg_mode_event_type",
    "agg_bitwise_flags",
    "stream_locf_last_purchase",
    "sketch_countmin_users",
    "doc_chunk_overlap",
    "doc_pack_token_budget",
    "join_dpp_partitioned",
    "func_array_higher_order",
    "window_cume_dist_acctbal",
    "func_try_arithmetic",
    # -- band 2: r2-only greens, re-scored under the current runtime --
    "func_json_events",
    "func_null_handling",
    "stream_grant_notifications",
    "stream_static_join_enrich",
    "join_salted_skew",
    "pivot_event_type_counts",
    "topk_orders_global",
    "mm_decode_features",
    "doc_corpus_curation",
    "emb_lsh_ann_topk",
    # -- band 3: regression staples (r3-green, kept as drift canary) --
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "fs_purchase_allowlist",
    "fs_user_aggregates",
    "stream_feature_grants",
    "dedup_minhash_lsh",
    "dedup_embedding_ann_pairs",
    "sessionize_events",
)

# Entries created after this round's 50-entry head is frozen rotate into
# the head next round (the judge verifies them locally via
# tools/check_oracle.py in the meantime).
_NEXT_ROUND_HEAD: tuple[str, ...] = (
    "emb_knn_join_ann",
    "dedup_fuzzy_levenshtein",
    "dq_constraint_audit",
    "rollup_time_hierarchy_events",
    "stats_column_profile",
    "join_null_safe_eq",
    "func_map_higher_order",
    "explode_outer_doc_tail",
)


def _load_all() -> None:
    # Import side-effect populates CATALOG. Imports are UNCONDITIONAL: a
    # module that fails to import must fail the whole catalog loudly —
    # silently dropping a family would let the correctness gate "pass"
    # on shrunken coverage (the round-1 failure mode).
    for mod in (
        "feature_store",
        "relational",
        "relational2",
        "tpch_deep",
        "setops_misc",
        "sketches",
        "windows_setops",
        "scalar_funcs",
        "behavior",
        "llm_text",
        "llm_curation",
        "quality",
        "llm_similarity",
        "multimodal",
        "storage",
        "streaming_queries",
    ):
        __import__(f"feature_store_2_spark.queries.{mod}")

    by_name = {q.name: q for q in CATALOG}
    missing = [n for n in _DRIVER_PRIORITY if n not in by_name]
    if missing:
        raise RuntimeError(f"_DRIVER_PRIORITY names not registered: {missing}")
    rest = [q for q in CATALOG if q.name not in set(_DRIVER_PRIORITY)]
    CATALOG[:] = [by_name[n] for n in _DRIVER_PRIORITY] + rest


_load_all()
