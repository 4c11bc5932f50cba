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
    """Round-3 head contract: the driver scores ~50 entries in order.
    Entries with no driver row yet (late-r2 additions) and the four
    entries fixed this round must sit in the scored head, ahead of
    regression staples."""
    must_score = {
        "funnel_conversion",
        "cohort_retention",
        "feat_time_decay",
        "resample_daily_gapfill",
        "path_transitions",
        "dedup_cluster_components",
        "doc_stratified_sample",
        "emb_quantize_int8",
        "stream_stream_join",
        "sessionize_events",
        "argmax_latest_event_per_user",
        "window_trailing_10min_count",
        "func_math_lineitem",
    }
    assert must_score <= set(_DRIVER_PRIORITY[:13])
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
