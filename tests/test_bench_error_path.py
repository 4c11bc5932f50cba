"""Pin the bench artifact's crash semantics (round-3 ADVICE medium): a
crashing headline query must surface as value=null + an errors key +
nonzero rc — never as a smaller (better-looking) sum over the surviving
queries, and never as ERROR strings polluting the float-valued queries
map."""

import json
import os
import subprocess
import sys


def test_bench_emits_null_value_and_nonzero_rc_on_errors(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/nonexistent/sfX",
        SPARK_GRAFT_CPUS="4",
        # keep the committed sf0.1 BENCH_DETAIL.json artifact intact
        SPARK_GRAFT_DETAIL_PATH=str(tmp_path / "BENCH_DETAIL.json"),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 2, (proc.returncode, proc.stderr[-500:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] is None
    assert out["errors"]  # every headline query failed on the bogus dir
    assert all(isinstance(v, float) for v in out["queries"].values())
