"""Plan-stability determinism: oracle parity must hold when Spark's
runtime planning is forced into a hostile regime — AQE disabled, an
adversarial shuffle-partition count (7: odd, tiny, not the 32 every
other harness uses), and broadcast joins banned (every join degrades
to its shuffle form). The retry/skew/concurrency audits cover fault,
data-distribution, and scheduling nondeterminism; this closes the
remaining class: answers must not depend on WHICH physical plan Spark
happens to pick. The full-catalog artifact is SWEEP_r08_planstab.json
(tools/full_sweep.py with SWEEP_SPARK_CONF).

Subprocess because the sweep needs its own session with the hostile
confs fixed at build time. The slice picks surfaces where the
physical strategy actually varies: multiway broadcast-vs-SMJ joins
(q07), AQE-coalesced aggregation (q03), window ranking (q13), a
NOT IN null-trap anti-join (q72), the interval join whose skew
handling is plan-dependent (s7), a driver-collecting model query
(ns_semantic_dedup), a signature fold (ns_dedup_exact), and top-k
(q16) whose TakeOrderedAndProject must survive AQE-off.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SLICE = [
    "q03_agg_tpch_q1",
    "q07_join_multiway",
    "q13_window_rank",
    "q16_topk",
    "q72_not_in_null_trap",
    "s7_interval_join",
    "ns_semantic_dedup",
    "ns_dedup_exact",
]

HOSTILE_CONF = (
    "spark.sql.adaptive.enabled=false,"
    "spark.sql.shuffle.partitions=7,"
    "spark.sql.autoBroadcastJoinThreshold=-1"
)


def test_hostile_planning_slice_matches_oracle(tmp_path):
    out = tmp_path / "planstab_slice.json"
    env = dict(
        os.environ,
        SWEEP_QUERIES=",".join(SLICE),
        SWEEP_SF_DIR="/root/testdata/sf0.01",
        SWEEP_SPARK_CONF=HOSTILE_CONF,
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "full_sweep.py"),
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
    assert doc["_summary"]["mismatches"] == 0
    assert doc["_summary"]["checked"] == len(SLICE)
    assert doc["_summary"]["spark_conf_overrides"] == {
        k: v for k, _, v in (p.partition("=") for p in HOSTILE_CONF.split(","))
    }
    for q in SLICE:
        assert doc[q]["hash_match"], (q, doc[q])
