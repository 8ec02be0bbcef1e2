"""Memory/spill audit slice: a representative set of shuffle-heavy
queries must complete with ZERO spill (memory or disk) at sf0.01, and
the audit's REST-derived byte metrics must be populated — a query
that claims to shuffle nothing while aggregating 60k rows means the
metric plumbing broke, not that the plan got free. The sf1 heavy-tier
artifact is SPILL_r08.json (tools/spill_audit.py).

Subprocess because the audit needs its own UI-enabled session (the
suite session runs with the UI off) and reads /api/v1 on the actual
bound port.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SLICE = [
    "q03_agg_tpch_q1",    # groupBy aggregation: must show shuffle bytes
    "q07_join_multiway",  # fact-dim joins
    "ns_dedup_minhash",   # signature fold + band self-join
    "ns_tfidf_topterms",  # explode + double aggregation
]


def test_spill_audit_slice_zero_spill(tmp_path):
    out = tmp_path / "spill_slice.json"
    env = dict(
        os.environ,
        SPILL_SF_DIR="/root/testdata/sf0.01",
        SPILL_CPUS="8",
        SPILL_QUERIES=",".join(SLICE),
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "spill_audit.py"),
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
    s = doc["_summary"]
    assert s["queries_with_spill"] == []
    assert s["errors"] == []
    assert s["total_disk_bytes_spilled"] == 0
    assert s["total_memory_bytes_spilled"] == 0
    for q in SLICE:
        rec = doc[q]
        # metric plumbing sanity: the scan read rows and the
        # aggregation crossed an exchange
        assert rec["inputRecords"] > 0, (q, rec)
        assert rec["shuffleWriteBytes"] > 0, (q, rec)
        assert rec["num_stages"] >= 2, (q, rec)
