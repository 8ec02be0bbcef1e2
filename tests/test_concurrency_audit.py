"""Concurrent-execution determinism: a representative catalog slice
must return identical results when 8 driver threads share one
FAIR-scheduled session (tools/concurrency_audit.py; the full-catalog
artifact is CONCURRENCY_r08.json).

Subprocess because the audit needs its own FAIR-mode session
(scheduler mode is fixed at context start). The slice deliberately
includes the one fixed-name temp view (ns_udtf_bigrams), the conf-
setting events loader (q12), a driver-collecting model query
(ns_semantic_dedup), and plain relational/window legs — the surfaces
where session-global state could race.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SLICE = [
    "q03_agg_tpch_q1",
    "q12_cdc_latest_wins",
    "q13_window_rank",
    "ns_udtf_bigrams",
    "ns_semantic_dedup",
    "ns_dedup_minhash",
    "s7_interval_join",
    "q27_cosine_topk",
]


def test_concurrent_slice_matches_serial(tmp_path):
    out = tmp_path / "conc_slice.json"
    env = dict(
        os.environ,
        CONC_QUERIES=",".join(SLICE),
        CONC_SF_DIR="/root/testdata/sf0.01",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "concurrency_audit.py"),
            str(out),
        ],
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
    for q in SLICE:
        assert doc["queries"][q]["match"], q
