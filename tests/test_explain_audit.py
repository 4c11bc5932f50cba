"""Regression tests for the plan-audit checker itself (round-4 item:
the r3 weak spots — a global-ordered window in doc_pack_token_budget and
a global row_number in kmeans_fit — were invisible to the audit because
it had no non-partitioned-window check. Prove the checker catches them.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.explain_audit import GLOBAL_WINDOW_OK, global_windows


def test_checker_flags_global_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert global_windows(df) >= 1


def test_checker_passes_partitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy((F.col("id") % 10)).orderBy("id")
        ),
    )
    assert global_windows(df) == 0


def test_broadcast_lint_clean():
    """Every F.broadcast in the package must target a provably bounded
    input registered in BROADCAST_ALLOWLIST (r4 verdict weak-spot #1:
    a forced broadcast of the vocabulary-sized df table overrode AQE's
    size check and would OOM at web-corpus scale)."""
    from tools.explain_audit import broadcast_lint

    assert broadcast_lint() == []


def test_broadcast_allowlist_no_stale_entries():
    """Allowlist entries must correspond to live F.broadcast call sites
    — stale rows would quietly re-authorize a removed pattern."""
    import re
    from pathlib import Path

    from tools.explain_audit import BROADCAST_ALLOWLIST

    pkg = Path(__file__).resolve().parents[1] / "feature_store_2_spark"
    rx = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")
    live = set()
    for f in pkg.rglob("*.py"):
        rel = f.relative_to(pkg).as_posix()
        for m in rx.finditer(f.read_text()):
            live.add((rel, m.group(1)))
    stale = [k for k in BROADCAST_ALLOWLIST if k not in live]
    assert not stale, stale


def test_corpus_curation_topk_is_two_phase(spark, sf_dir):
    """doc_corpus_curation's per-lang budget must stay two-phase (r4
    verdict weak-spot #2): a salted (lang, salt) partial top-k window
    must precede the final per-lang window, so the low-cardinality lang
    partition never sees unbounded rows. Pin: at least one physical
    Window with a 2-expression partition spec."""
    from feature_store_2_spark.queries import CATALOG
    from tools.explain_audit import _WINDOW_EXECS, _walk

    q = next(q for q in CATALOG if q.name == "doc_corpus_curation")
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
    spec_sizes = [
        node.partitionSpec().size()
        for node in _walk(plan)
        if node.getClass().getSimpleName() in _WINDOW_EXECS
    ]
    assert 2 in spec_sizes, spec_sizes


def test_catalog_has_no_unlisted_global_window(spark, sf_dir, monkeypatch):
    """Full-catalog sweep: no batch entry may compile to a physical plan
    with a non-partitioned Window unless it is on the documented
    allowlist. This is the check that would have caught the r3
    doc_pack_token_budget / kmeans_fit weak spots at commit time.

    The r12 compact-input gate DELIBERATELY emits a single-task window
    below GW_PLAIN_WINDOW_MAX_BYTES (test corpora qualify) — that is a
    bounded, size-gated choice, not the accidental cliff this lint
    hunts. Force the gate off so the sweep keeps auditing the plan
    that runs AT SCALE, where an unlisted global window is still a
    bug."""
    from feature_store_2_spark.operators import global_window as gw
    from feature_store_2_spark.queries import CATALOG

    monkeypatch.setattr(gw, "GW_PLAIN_WINDOW_MAX_BYTES", 0)
    offenders = []
    for q in CATALOG:
        if q.name.startswith("stream") or q.name in GLOBAL_WINDOW_OK:
            continue
        if global_windows(q.fn(spark, sf_dir)):
            offenders.append(q.name)
    assert not offenders, offenders
