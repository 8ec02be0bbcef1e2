#!/usr/bin/env python
"""Regenerate PLANS.md: executed physical plans of representative
queries with the scale property each one is meant to exhibit. Run from
the repo root after plan-affecting changes:

    python tools/dump_plans.py

The same properties are ASSERTED in tests/test_plans.py — this file is
the human-readable evidence trail, not the enforcement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hybrid_cdc_demo_spark.plans import QUERIES  # noqa: E402
from hybrid_cdc_demo_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

#: (query, executed_first, what to look for)
SHOWCASE = [
    ("q03_agg_tpch_q1", True,
     "partial_ aggregates below one Exchange (map-side combine); "
     "whole-stage codegen `*(n)` spans the scan→agg path"),
    ("q07_join_multiway", True,
     "AQE picks broadcast for the customer dim; decimal-exact "
     "aggregation; only the group-by shuffles"),
    ("q16_topk", False,
     "TakeOrderedAndProject — per-partition heaps + driver merge, "
     "no global sort Exchange"),
    ("q52_grouping_sets", False,
     "one Expand node feeds a single partial-aggregated hash shuffle "
     "for all four grouping sets"),
    ("q53_unpivot", False,
     "UNPIVOT = map-side Expand; the l_orderkey filter stays in "
     "PushedFilters on the parquet scan below it"),
    ("ns_dedup_minhash", False,
     "shuffle-free signature stage: no Exchange between the documents "
     "scan and the minhash projection (banded join shuffles later, "
     "on the tiny signature relation)"),
    ("ns_simsearch_ivf_fullprobe", False,
     "persisted IVF probe: the `_cell` partition filter prunes the "
     "index scan to probed cells' directories (PartitionFilters)"),
    ("ns_value_histogram", False,
     "bucket computed in the scan projection; the shuffle carries "
     "<= 20 aggregate rows"),
    ("ns_rolling_7day", False,
     "one hash shuffle on user_id serves the RANGE-frame window; "
     "running frame state, no self-join"),
    ("ns_reconcile_drift", False,
     "both reconciliation sides project (key, sha2 fingerprint) "
     "BELOW the full-outer join — payload never shuffles"),
    ("ns_dq_violations", False,
     "all four rules in ONE partial aggregate over one scan; output "
     "is O(rules)"),
    ("ns_band_join", False,
     "|a-b| <= eps planned as a hash EQUI-join on eps-buckets "
     "(3-way candidate explode) — no BroadcastNestedLoopJoin, no "
     "cartesian"),
    ("q49_tpch_q2_shape", False,
     "the selective part predicate prunes lineitem BEFORE the "
     "(partkey, suppkey) MIN cost aggregate — a broadcast LeftSemi "
     "below the HashAggregate, with p_size/p_type in PushedFilters; "
     "the query's one big shuffle carries only selected parts"),
    ("ns_dedup_simhash", False,
     "shuffle-free fingerprint fold; bucket-size guard counted via a "
     "partial-aggregating groupBy (bounded 4x2^16 domain) and the "
     "kept-bucket list BROADCAST back — no collect_list of a hot "
     "bucket can materialize; candidate distinct shuffles bare id "
     "pairs, fingerprints rejoin after"),
    ("ns_doc_chunking", False,
     "chunking is pure per-row higher-order expressions (split -> "
     "sequence -> slice -> posexplode) — a single stage over the "
     "scan, no Exchange anywhere"),
    ("ns_heavy_hitters", False,
     "Misra-Gries candidates from mapInPandas partition summaries; "
     "exact recount joins the token stream against the BROADCAST "
     "candidate set (left_semi) — the full-vocabulary shuffle never "
     "happens. NOTE: since round 5 the operator materializes its "
     "<= capacity result rows EAGERLY so the token-stream cache "
     "releases before returning (ADVICE r4 #4) — the returned frame "
     "is therefore a local relation and the distributed stages run "
     "inside the call; the shape above is asserted by "
     "tests/test_sketches.py against the inner pipeline"),
    ("ns_dataset_card", False,
     "dataset card: ONE narrow projection (split hash, token count, "
     "text hash, 60-bit fingerprint int — all computed where the row "
     "lives) into ONE partially-aggregated groupBy; BIT_XOR makes the "
     "content fingerprint independent of row order and partitioning. "
     "No joins, no windows, no driver data"),
    ("ns_kmeans_assign", False,
     "the scale path (full-corpus assignment) is scan + nested-literal "
     "argmin projection — the ONLY Exchange is the presentation sort; "
     "the trained model rides in as a literal, no join, no shuffle"),
    ("ns_simsearch_batch", False,
     "WindowGroupLimit below the qid Exchange: each map task "
     "pre-reduces to its local top-k per query BEFORE the shuffle; "
     "the query set enters via BroadcastExchange"),
    ("ns_fuzzy_join", True,
     "deletion-neighborhood blocking compiles to an equi-join "
     "(SortMergeJoin/ShuffledHashJoin on the variant string) — no "
     "CartesianProduct/BroadcastNestedLoopJoin anywhere"),
    ("ns_zorder_curve", False,
     "the Morton key is one whole-stage-codegen projection (static "
     "shift/mask/OR tree); bounds ride in as literals from table "
     "stats — no per-row join against a bounds frame"),
    ("ns_temperature_sampling", False,
     "ONE hashpartitioning Exchange (the groupBy) with partial_count "
     "map-side combine; total + sorted-fold normalizer run in a "
     "single unbounded window over the tiny per-group frame"),
    ("ns_pq_adc_topk", False,
     "the ADC scan is a map-only projection over the encoded frame — "
     "codes + lookup tables ride in as literals, no join against the "
     "codebook — followed by TakeOrderedAndProject; 64 floats never "
     "re-enter the plan after encoding"),
    ("ns_bm25_topk", False,
     "corpus stats and per-term document frequency enter the scoring "
     "projection via BroadcastExchange; the only wide exchange is the "
     "(doc, term) partial-aggregated groupBy; top-k is "
     "TakeOrderedAndProject, never a global window sort"),
    ("ns_prefix_dedup", False,
     "the global sorted-neighbor pass is ONE rangepartitioning "
     "exchange + in-partition sort + MapInPandas — no Window operator "
     "anywhere (a window with no PARTITION BY would run in one task)"),
    ("ns_pca_project", False,
     "map-only nested-literal projection: scan + one codegen "
     "projection; the model (4x64 doubles) rides in as literals — no "
     "join, the presentation sort is the only Exchange"),
    ("ns_dedup_substring", False,
     "exact-substring span dedup: ONE wide exchange keyed on the "
     "64-bit xxhash64 gram fingerprint (8-byte shuffle keys, never "
     "the multi-word gram string); the corpus-wide occurrence count "
     "is a WINDOW over that exchange — the groupBy+semi-join "
     "formulation recomputed the tokenize+explode subtree per "
     "consumer (column pruning defeats ReuseExchange), and the "
     "window rewrite halved the sf0.1 runtime — then the interval "
     "union is a per-doc running-max window; no per-token explode"),
    ("ns_hybrid_rrf", False,
     "both retrieval legs pre-reduce BEFORE fusion: "
     "LimitPushDownThroughWindow turns each leg's rank window into "
     "TakeOrderedAndProject (limit=50) with the row_number "
     "recomputed over the bounded result; the full-outer fusion "
     "join therefore touches <= 100 rows at any corpus size"),
    ("ns_funnel_conversion", False,
     "every funnel stage is a partial-aggregated MIN(ts) per user "
     "gated strictly-after the previous stage — all exchanges key on "
     "user_id, nothing wider than |users| moves, and the only "
     "window is the 3-row rate window at the top"),
    ("ns_prequential_anomaly", False,
     "expanding-window moments per event type: ONE hash exchange on "
     "the type key serves the window; count/sum/sumsq accumulate in "
     "exact DECIMAL inside the frame (order-free bits) and the z "
     "projection is pure codegen above it"),
    ("ns_winsorize", False,
     "exact tail order statistics WITHOUT a global sort: each "
     "boundary is a TakeOrderedAndProject heap (r rows to one "
     "reducer, r << n) + 1-row aggregate, broadcast into a map-side "
     "clip CASE — the oracle's full row_number ranking never runs"),
    ("ns_pareto_revenue", False,
     "rank + exact prefix sum in ONE global_rank_cumsum pass: a "
     "rangepartitioning exchange + in-partition sort + Arrow sweep "
     "with <= P-row driver control data — the scale-safe form of an "
     "unpartitioned SUM OVER window (one task in Spark)"),
    ("ns_text_entropy", False,
     "the corpus-wide char explode collapses map-side: partial "
     "(doc,ch) aggregation before the first exchange, then the "
     "per-doc log2 fold runs over a collected SORTED bounded array — "
     "exactly two hash exchanges for the whole query"),
    ("ns_hard_negatives", False,
     "probe batch broadcasts (map-side expansion, no corpus "
     "shuffle); label exclusion filters before the rank window; "
     "WindowGroupLimit pre-reduces each task to its local top-k so "
     "only probes x partitions x k rows move"),
    ("ns_dedup_canonical", False,
     "the per-cluster quality argmax is a partial-aggregated "
     "max(struct(quality, -id, id)) — one candidate per key per task "
     "crosses the wire; the oracle's per-cluster window never runs"),
    ("ns_lm_coherence", False,
     "Q20 fixed-point bigram LM: exactly TWO corpus explodes (the "
     "unigram model rolls up from the bigram+successor counts, the "
     "vocabulary-sized table localCheckpointed once), scoring is a "
     "broadcast join + plain integer SUM — no collect_list, no "
     "HOF fold, whole-stage codegen end to end"),
    ("ns_simsearch_binary", False,
     "1-bit binary quantization: sign-bit packing + XOR + popcount "
     "is a map-only integer projection over dim/8 bytes per vector, "
     "and the top-k is TakeOrderedAndProject (per-partition heaps) — "
     "no join, no hash exchange, the cheapest ANN tier"),
    ("ns_rfm_segments", False,
     "three quartile ranks from ONE global_rank pass over a slim "
     "3-rows-per-user metric union (rank = pos - metric*n): a single "
     "rangepartitioning exchange feeds all three quartiles, then a "
     "user-keyed pivot joins them back"),
]


def main() -> None:
    spark = get_spark(app_name="plan-dossier", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS.md — executed-plan dossier (auto-generated)",
        "",
        "Regenerate with `python tools/dump_plans.py` (sf0.01, "
        "shuffle_partitions=8). Each section states the scale property",
        "the plan is meant to exhibit; tests/test_plans.py asserts the",
        "same properties so regressions fail loudly.",
        "",
    ]
    for name, execute_first, note in SHOWCASE:
        df = QUERIES[name](spark, SF)
        if execute_first:  # AQE finalizes join strategies on execution
            df.write.mode("overwrite").format("noop").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Property:** {note}.")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
