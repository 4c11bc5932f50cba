"""Catalog integrity: loud loading, no duplicates, driver-priority order.

Round-1 lesson: the driver scores entries in registration order with a
per-round budget (~50), and `except ImportError: pass` could silently
shrink the catalog. These tests pin both fixes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.queries import CATALOG, _DRIVER_PRIORITY


def test_catalog_size():
    # Every query family loaded — nothing silently dropped.
    assert len(CATALOG) >= 84, [q.name for q in CATALOG]


def test_no_duplicate_names():
    names = [q.name for q in CATALOG]
    assert len(names) == len(set(names))


def test_priority_block_leads():
    names = [q.name for q in CATALOG]
    assert tuple(names[: len(_DRIVER_PRIORITY)]) == _DRIVER_PRIORITY


def test_must_score_entries_lead_head():
    """Round-4 head contract: the driver scores ~50 entries in order.
    The 31 round-3 additions that have never been driver-scored must
    lead the head, followed by the 10 r2-only greens being re-scored
    under the current runtime, then regression staples."""
    never_scored = {
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
    }
    assert never_scored <= set(_DRIVER_PRIORITY[:31])
    assert len(_DRIVER_PRIORITY) <= 50, "head must fit the driver's scoring budget"


def test_every_entry_has_fn_and_doc():
    for q in CATALOG:
        assert callable(q.fn), q.name
        assert q.doc, q.name


# Environment-drift canary (round-2 lesson): pyspark 4.1.2 changed how
# the events parquet's timestamps resolve (TIMESTAMP_NTZ), and three
# entries that had rotated OUT of the driver-scored head crashed at
# analysis time with nobody watching. Analyzing every entry's plan at
# sf0.001 catches any such runtime drift across the whole catalog in CI,
# not just the scored head. Batch entries only touch .schema (analysis,
# no job); streaming entries execute their pipeline when called, which
# is the only way to analyze them — still cheap at sf0.001.
_BATCH_ENTRIES = [q.name for q in CATALOG if not q.name.startswith("stream")]


@pytest.mark.parametrize("name", _BATCH_ENTRIES)
def test_entry_analyzes(spark, sf_dir, name):
    q = next(q for q in CATALOG if q.name == name)
    schema = q.fn(spark, sf_dir).schema
    assert len(schema.fields) > 0, name


def test_next_round_head_names_registered():
    """A typo in _NEXT_ROUND_HEAD would silently break next round's
    head rotation — every queued name must be a real catalog entry."""
    from feature_store_2_spark.queries import _NEXT_ROUND_HEAD

    names = {q.name for q in CATALOG}
    missing = [n for n in _NEXT_ROUND_HEAD if n not in names]
    assert not missing, missing


def test_bench_headline_names_registered():
    """bench.py crashes (rc=1, empty artifact) on an unknown name —
    pin every HEADLINE entry to the catalog."""
    import bench

    names = {q.name for q in CATALOG}
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, missing
