#!/usr/bin/env python
"""Skew robustness artifact (round 8): join the skewed-corpus oracle
sweep with a uniform-corpus sweep at the same scale and report, per
query, correctness under skew plus the skew/uniform runtime ratio.

Inputs are two tools/full_sweep.py outputs over the SAME row counts:
- the skewed corpus from tools/skew_testdata.py (50% single-user
  events, 30% duplicate documents/embeddings, 15% single-order
  lineitem), and
- the untouched generator corpus.

DuckDB reads the same skewed files, so a hash mismatch is a genuine
skew-activated wrongness (guard flipping an answer, overflow on a
giant group), and a runtime ratio far above the corpus-change factor
flags a quadratic pair-expansion or a one-hot-partition stall — the
two ways skew kills a 100 TB job.

Usage: python tools/skew_audit.py skew_sweep.json uniform_sweep.json out.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    skew_path, base_path, out_path = sys.argv[1:4]
    skew = json.load(open(skew_path))
    base = json.load(open(base_path))
    sq, bq = (
        {k: v for k, v in d.items() if not k.startswith("_")}
        for d in (skew, base)
    )
    rows = {}
    for name, s in sq.items():
        b = bq.get(name, {})
        ratio = None
        if s.get("sec") and b.get("sec"):
            # floor the base at 50 ms: sub-50 ms queries are
            # scheduling-noise-bound and their ratios are meaningless
            ratio = round(s["sec"] / max(b["sec"], 0.05), 2)
        rows[name] = {
            "hash_match_under_skew": s.get("hash_match"),
            "sec_skew": s.get("sec"),
            "sec_uniform": b.get("sec"),
            "skew_time_ratio": ratio,
        }
    mismatch = [n for n, r in rows.items() if not r["hash_match_under_skew"]]
    ratios = [r["skew_time_ratio"] for r in rows.values() if r["skew_time_ratio"]]
    worst = sorted(
        ((r["skew_time_ratio"], n) for n, r in rows.items()
         if r["skew_time_ratio"]),
        reverse=True,
    )[:10]
    doc = {
        "summary": {
            "queries": len(rows),
            "hash_mismatches_under_skew": len(mismatch),
            "mismatch_names": mismatch,
            "median_time_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
            "worst_time_ratios": [
                {"query": n, "ratio": r} for r, n in worst
            ],
            "skew_profile": (
                "events: 50% one user; documents/embeddings: 30% one "
                "text/vector; lineitem: 15% one orderkey "
                "(tools/skew_testdata.py, deterministic)"
            ),
            "skew_sweep": skew.get("_summary"),
            "uniform_sweep": base.get("_summary"),
        },
        "queries": rows,
    }
    json.dump(doc, open(out_path, "w"), indent=1, sort_keys=True)
    print(
        f"{len(rows)} queries under skew: {len(mismatch)} hash mismatches; "
        f"median time ratio {doc['summary']['median_time_ratio']}; "
        f"worst {worst[:3]} -> {out_path}"
    )
    sys.exit(1 if mismatch else 0)


if __name__ == "__main__":
    main()
