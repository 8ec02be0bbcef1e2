"""Task-retry determinism: a representative slice of the catalog must
return identical results when Spark task retries fire mid-query
(tools/retry_audit.py; the full-catalog artifact is RETRY_r08.json).

Runs in a SUBPROCESS because retries only exist under a
``local[N, maxFailures]`` master and the suite's shared session is
plain local[*] (an injected failure there would fail the job, not
retry). The slice covers the distinct execution surfaces: pure
relational agg, broadcast join, window/rank, HOF signature fold
(minhash), BLAS mapInPandas assignment (semantic dedup), stateful
latest-wins, and a driver-built-literal ANN probe.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SLICE = [
    "q03_agg_tpch_q1",
    "q06_join_broadcast",
    "q13_window_rank",
    "q12_cdc_latest_wins",
    "ns_dedup_minhash",
    "ns_semantic_dedup",
    "ns_simsearch_ivf",
]


def test_retry_slice_deterministic(tmp_path):
    out = tmp_path / "retry_slice.json"
    env = dict(
        os.environ,
        RETRY_QUERIES=",".join(SLICE),
        RETRY_SF_DIR="/root/testdata/sf0.01",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "retry_audit.py"), str(out)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    doc = json.loads(out.read_text())
    assert doc["summary"]["mismatches"] == 0
    assert doc["summary"]["queries"] == len(SLICE)
    # the audit only proves something if failures were actually
    # injected and absorbed
    assert doc["summary"]["total_injected_failures"] >= len(SLICE)
    for q in SLICE:
        assert doc["queries"][q]["match"], q
    # exactly-once through the partition-scope JDBC sink under task
    # retry: pre-commit failure (rollback + retry) and post-commit
    # crash (idempotent re-application) both converge to ground truth
    for k, v in doc["sink_scenarios"].items():
        assert v["match"], (k, v)
