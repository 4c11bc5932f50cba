"""Catalog integrity: loud loading, no duplicates, driver-priority order.

Round-1 lesson: the driver scores entries in registration order with a
per-round budget (~50), and `except ImportError: pass` could silently
shrink the catalog. These tests pin both fixes.
"""

import os
import sys

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


def test_unscored_families_in_priority_head():
    """Every entry without a round-1 driver-green row sits in the head
    the driver scores first (func_hash_family was already green in r01)
    — or in the explicit next-round rotation list for entries created
    after this round's 50-entry head was frozen."""
    from feature_store_2_spark.queries import _NEXT_ROUND_HEAD

    head = set(_DRIVER_PRIORITY) | set(_NEXT_ROUND_HEAD)
    for q in CATALOG:
        prefixed = q.name.split("_")[0] in {"doc", "dedup", "emb", "mm", "func", "stream"}
        if prefixed and q.name != "func_hash_family":
            assert q.name in head, q.name


def test_every_entry_has_fn_and_doc():
    for q in CATALOG:
        assert callable(q.fn), q.name
        assert q.doc, q.name
