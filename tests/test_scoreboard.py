"""SCOREBOARD.md stays current (r6 verdict ask #6).

The scoreboard is derived deterministically from CORRECTNESS_r*.json +
catalog_rounds.json; regenerating must reproduce the committed file
byte-for-byte, so a round that adds entries or lands new driver rows
fails here until `python tools/make_scoreboard.py` is rerun.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_scoreboard_is_current():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "make_scoreboard.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_scoreboard_totals_line():
    """The summary line's arithmetic is internally consistent with the
    table rows — a renderer regression that drops rows would show here."""
    text = (ROOT / "SCOREBOARD.md").read_text()
    rows = [
        l for l in text.splitlines()
        if l.startswith("| ") and not l.startswith("| entry")
        and not l.startswith("|--")
    ]
    n_green = sum(1 for l in rows if l.endswith("| green |"))
    n_never = sum(1 for l in rows if l.endswith("| never |"))
    summary = [l for l in text.splitlines() if l.startswith("**")][0]
    assert f"{len(rows)} entries" in summary
    assert f"{n_green} driver-green" in summary
    assert f"{n_never} never driver-scored" in summary
