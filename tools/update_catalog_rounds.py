"""Maintain feature_store_2_spark/queries/catalog_rounds.json.

Maps every catalog entry name -> the round it was first registered, so
_derive_head can queue never-scored entries FIFO across rounds (a new
round's additions must not displace last round's still-unscored entries
from the driver's ~50-entry scoring budget merely by module position).

Idempotent: existing names keep their recorded round; names not yet in
the file are stamped with the CURRENT round = max(CORRECTNESS_r*.json
round) + 1 (the round whose driver run hasn't happened yet). Run after
registering new entries; tests/test_catalog.py pins full coverage.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OUT = ROOT / "feature_store_2_spark" / "queries" / "catalog_rounds.json"


def current_round() -> int:
    rounds = [
        int(m.group(1))
        for f in ROOT.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    from feature_store_2_spark.queries import CATALOG

    known: dict[str, int] = {}
    if OUT.exists():
        known = {k: int(v) for k, v in json.loads(OUT.read_text()).items()}
    rnd = current_round()
    added = []
    for q in CATALOG:
        if q.name not in known:
            known[q.name] = rnd
            added.append(q.name)
    stale = sorted(set(known) - {q.name for q in CATALOG})
    for name in stale:  # renamed/retired entries must not linger
        del known[name]
    OUT.write_text(json.dumps(dict(sorted(known.items())), indent=0) + "\n")
    print(f"round={rnd} added={len(added)} removed={len(stale)} total={len(known)}")
    for n in added:
        print(f"  + {n}")


if __name__ == "__main__":
    main()
