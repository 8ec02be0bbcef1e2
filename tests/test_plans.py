"""Physical-plan regression tests: the scale properties the engine
claims (predicate pushdown, column pruning, broadcast joins, top-k
without total sort, shuffle-free signatures) must be visible in the
actual Catalyst plans, not just intended. A plan regression here is a
100 TB performance bug even when sf0.01 results stay correct."""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import dedup as D
from hybrid_cdc_demo_spark.plans import QUERIES
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    df = load_table(spark, SF, "lineitem").filter(
        F.col("l_discount") > 0.05
    ).select("l_orderkey")
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "l_discount" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not scan all 16 lineitem columns."""
    df = QUERIES["q01_scan_project"](spark, SF)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_small_dim_join_broadcasts(spark):
    """customer⋈nation must broadcast the 25-row nation side, never
    shuffle both sides."""
    plan = plan_of(QUERIES["q06_join_broadcast"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_topk_avoids_total_sort(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition heaps), not a global Exchange+Sort."""
    plan = plan_of(QUERIES["q16_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_minhash_signatures_are_shuffle_free(spark, monkeypatch):
    """The signature stage is a pure map: no Exchange may appear
    between the parquet scan and the signature projection. (spread()
    — a no-op at scale — is disabled to inspect the intrinsic plan.)"""
    monkeypatch.setattr(D, "spread", lambda df, n=None: df)
    docs = load_table(spark, SF, "documents")
    sigs = D.minhash_signatures(docs, "text", "doc_id", 16, 3)
    assert "Exchange" not in plan_of(sigs)


def test_simhash_is_shuffle_free(spark, monkeypatch):
    monkeypatch.setattr(D, "spread", lambda df, n=None: df)
    docs = load_table(spark, SF, "documents")
    fps = D.simhash(docs, "text", "doc_id")
    assert "Exchange" not in plan_of(fps)


def test_semi_anti_joins_compile_to_join_not_subquery(spark):
    for name, kind in [("q09_join_semi", "LeftSemi"), ("q10_join_anti", "LeftAnti")]:
        plan = plan_of(QUERIES[name](spark, SF))
        assert kind in plan, name


def test_partial_aggregation_before_shuffle(spark):
    """groupBy aggregates must map-side combine (partial_ functions
    below the Exchange) so the shuffle carries one row per group per
    partition, not raw rows."""
    plan = plan_of(QUERIES["q03_agg_tpch_q1"](spark, SF))
    before_exchange = plan.split("Exchange")[-1]  # deepest = pre-shuffle
    assert "partial_" in before_exchange


def test_whole_stage_codegen_covers_relational_path(spark):
    """Codegen'd operators print with a `*(n)` stage prefix; the agg
    path must be inside a codegen stage. (AQE only finalizes the plan
    on execution, so materialize first.)"""
    df = QUERIES["q03_agg_tpch_q1"](spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "*(" in plan and "HashAggregate" in plan


def test_ngram_jaccard_slice_pushes_down(spark):
    """The bounded-slice predicate (doc_id < 100) must reach the
    parquet scan — at 100 TB this is the difference between reading
    one row group and reading the corpus."""
    plan = plan_of(QUERIES["ns_dedup_ngram_jaccard"](spark, SF))
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert pushed and any("doc_id" in ln for ln in pushed), plan


def test_text_analysis_has_no_python_udf(spark):
    """The text family's claim is 'all builtin column expressions,
    zero UDFs' — no Python/Arrow eval node may appear in the plan
    (a Python worker roundtrip per batch would be the 100 TB
    bottleneck)."""
    for name in ("ns_text_stats", "ns_text_quality", "ns_text_fingerprint",
                 "ns_text_langid", "ns_tokens_bpeish", "q26_text_token_stats"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_pii_masking_stays_jvm_side(spark):
    """SHA-256 PII masking is builtin sha2 — the q22 plan must contain
    no Python eval (HMAC/PHI is the ONLY sanctioned pandas_udf and
    only enters when a PHI column exists)."""
    plan = plan_of(QUERIES["q22_masking_sha256"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_brute_force_topk_broadcasts_query_side(spark):
    """Cosine top-k must broadcast the 1-row query frame (map-side
    scoring on every executor) and rank via TakeOrderedAndProject —
    no shuffle of the corpus, no global sort."""
    plan = plan_of(QUERIES["q27_cosine_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q6_is_pure_scan_filter_agg(spark):
    """Q6 must plan as scan → filter → partial agg → final agg with
    every predicate in the scan's DataFilters and only the 4 needed
    columns read — no join, no wide shuffle. The canonical pushdown
    litmus test."""
    plan = plan_of(QUERIES["q35_tpch_q6"](spark, SF))
    assert "Join" not in plan
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln][0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in scan, col
    assert "l_orderkey" not in scan  # column pruning
    assert "l_shipdate" in scan and "l_discount" in scan


def test_tpch_topk_avoids_global_sort(spark):
    """Q3 and Q18 rank with LIMIT — the plan must use
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    full Exchange rangepartitioning + Sort of the aggregate output."""
    for name in ("q34_tpch_q3", "q38_tpch_q18"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert "TakeOrderedAndProject" in plan, name
        assert "rangepartitioning" not in plan, name


def test_tpch_q9_shape_broadcasts_all_dimensions(spark):
    """Q9-shape joins lineitem against part/supplier/nation/orders:
    every dimension must broadcast (no shuffle for the join inputs)
    and the p_name LIKE filter must reach the part scan, so the only
    hash exchange in the plan is the final group-by."""
    plan = plan_of(QUERIES["q40_tpch_q9_shape"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    part_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "p_name" in ln
    ]
    assert part_scans and any("red" in ln for ln in part_scans)


def test_streaming_uses_stateful_dedup_operator(spark):
    """S5 must plan a streaming dedup-within-watermark state operator
    when applied to a real stream (batch emulation aside)."""
    from hybrid_cdc_demo_spark.streaming import windows as W

    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    stream = stream.withColumn("event_id", F.col("value").cast("string"))
    dd = W.stateful_dedup(stream, id_col="event_id", ts_col="timestamp")
    explained = dd._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in explained or "Deduplicate" in explained


def test_tpch_q7_q8_broadcast_dimensions(spark):
    """Q7/Q8 join lineitem+orders against nation/supplier/customer/
    part/region dims: every dimension side must broadcast so the only
    sort-merge/shuffle join (if any) is fact⋈fact, and the date filter
    must push to the fact scan."""
    for name, min_bhj in (("q42_tpch_q7", 3), ("q43_tpch_q8", 4)):
        plan = plan_of(QUERIES[name](spark, SF))
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
        fact = [ln for ln in scans if "l_extendedprice" in ln]
        assert fact, name


def test_tpch_q13_two_level_aggregate(spark):
    """Q13's count-of-counts must keep the priority filter in the
    outer-join condition (customers with zero surviving orders still
    appear) and plan exactly one wide shuffle on custkey — the regroup
    on c_count operates on a tiny frame."""
    from hybrid_cdc_demo_spark.sources.tables import load_table

    df = QUERIES["q44_tpch_q13"](spark, SF)
    plan = plan_of(df)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # outer-join semantics: every customer appears in exactly one bucket
    assert sum(rows.values()) == load_table(spark, SF, "customer").count()
    assert "HashAggregate" in plan


def test_repetition_signals_are_shuffle_free(spark):
    """ns_repetition's signal computation is a pure per-row map — the
    only Exchange allowed is the final deterministic orderBy's range
    partitioning, never a hash shuffle."""
    df = QUERIES["ns_repetition"](spark, SF)
    plan = plan_of(df)
    assert "Exchange hashpartitioning" not in plan


def test_quantize_is_shuffle_free(spark):
    df = QUERIES["ns_embedding_quantize"](spark, SF)
    assert "Exchange hashpartitioning" not in plan_of(df)


def test_novelty_plans_two_hash_shuffles(spark):
    """ns_ngram_novelty = inverted-index window-min (one hash shuffle
    on gram) + per-doc regroup (one hash shuffle on doc_id). More
    shuffles = a plan regression; fewer = the semantics broke."""
    df = QUERIES["ns_ngram_novelty"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 2


def test_pivot_plans_two_phase_aggregate(spark):
    """With an explicit value list the pivot needs no distinct-values
    pre-job; the plan is the two-phase aggregate Catalyst emits —
    partial (user, type) counts below a hash Exchange, then the
    pivotfirst regroup on user (second Exchange carries <= one row
    per (user, type))."""
    df = QUERIES["q45_pivot"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "pivotfirst" in plan
    assert "partial_count" in plan  # map-side combine before shuffle 1


def test_cube_expands_mapside(spark):
    """CUBE pre-aggregates to the finest grouping BEFORE the Expand
    (r10, guide §2.3): the corpus-side partial aggregation sits below
    the first hash Exchange, and the Expand multiplies only the
    ≤|groups| pre-aggregated rows between the two (tiny) exchanges —
    never every lineitem row ×4."""
    df = QUERIES["q46_cube"](spark, SF)
    plan = plan_of(df)
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    below_expand = plan.split("Expand")[-1]
    # the corpus pass: ONE exchange, partial-aggregated below it
    assert below_expand.count("Exchange hashpartitioning") == 1
    assert "partial_" in below_expand.split("Exchange hashpartitioning")[1]
    # the rollup re-aggregation above the Expand is partial too
    above_expand = plan.split("Expand")[0]
    assert "partial_sum" in above_expand


def test_winnowing_is_shuffle_free(spark):
    df = QUERIES["ns_winnowing"](spark, SF)
    assert "Exchange hashpartitioning" not in plan_of(df)


def test_tpch_q12_shape_partial_aggregates_after_fact_join(spark):
    """The orders⋈lineitem fact join must not broadcast either side
    at scale intent (both are facts); the CASE counts partial-
    aggregate before the group-by exchange."""
    plan = plan_of(QUERIES["q47_tpch_q12_shape"](spark, SF))
    below_group_exchange = plan.split("Exchange hashpartitioning")[1]
    assert "partial_sum" in below_group_exchange


def test_tpch_q21_shape_decorrelates_to_semi_and_anti(spark):
    """The EXISTS / NOT EXISTS pair must compile to LeftSemi + LeftAnti
    joins (no subquery re-execution per row), with the nation-scoped
    supplier dim broadcast."""
    plan = plan_of(QUERIES["q48_tpch_q21_shape"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q2_shape_broadcasts_dims_and_reuses_cost(spark):
    """supplier/nation/region/part all broadcast; the (partkey,
    suppkey) cost build is the only wide shuffle."""
    plan = plan_of(QUERIES["q49_tpch_q2_shape"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3


def test_tpch_q2_shape_part_filter_below_cost_aggregate(spark):
    """The selective part predicate must prune lineitem BEFORE the
    (partkey, suppkey) MIN aggregate — as a broadcast LeftSemi against
    the filtered part scan sitting BELOW the aggregate — so the
    query's dominant shuffle carries only selected parts, not every
    lineitem pair (the 100× scale finding from round 3)."""
    plan = plan_of(QUERIES["q49_tpch_q2_shape"](spark, SF))
    # the part scan still pushes its predicates down to parquet
    part_scans = [
        ln for ln in plan.splitlines()
        if "Scan parquet" in ln and "part.parquet" in ln
    ]
    assert part_scans, "expected a part scan in the plan"
    assert "EqualTo(p_size,3)" in plan and "EqualTo(p_type,LARGE)" in plan
    # structural pin: a LeftSemi broadcast join appears below the first
    # partial HashAggregate over (l_partkey, l_suppkey) — plan text is
    # printed top-down, so the semi-join line must come AFTER the
    # aggregate line yet belong to its subtree; assert order + presence
    lines = plan.splitlines()
    agg_idx = next(
        i for i, ln in enumerate(lines)
        if "HashAggregate" in ln and "l_partkey" in ln and "min" in ln
    )
    semi_idx = next(
        i for i, ln in enumerate(lines) if "LeftSemi" in ln
    )
    assert semi_idx > agg_idx, "part semi-join must sit below the cost aggregate"


def test_tpch_q11_shape_reuses_value_exchange(spark):
    """The per-part value aggregate feeds both the output rows and the
    scalar total; exchange reuse must kick in so lineitem is scanned
    and shuffled once, not twice."""
    df = QUERIES["q50_tpch_q11_shape"](spark, SF)
    df.collect()  # AQE finalizes reuse on execution
    plan = plan_of(df)
    assert "ReusedExchange" in plan or plan.count("Scan parquet") == 1


def test_tpch_q20_shape_nested_in_is_semi_join(spark):
    plan = plan_of(QUERIES["q51_tpch_q20_shape"](spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_unpivot_is_mapside_expand_with_pushdown(spark):
    """UNPIVOT must compile to a single Expand node (each row emits one
    row per value column, map-side — no shuffle, no union of N scans)
    with the row filter still pushed to the parquet scan below it."""
    plan = plan_of(QUERIES["q53_unpivot"](spark, SF))
    assert "Expand" in plan
    assert plan.count("FileScan") == 1
    assert "LessThan(l_orderkey,1000)" in plan


def test_grouping_sets_expand_mapside_single_shuffle(spark):
    """GROUPING SETS pre-aggregates to the finest grouping BEFORE the
    Expand (r10, guide §2.3 — same shape as q46): the corpus partial
    aggregation sits below the first hash Exchange; the Expand and the
    grouping-id re-aggregation run on ≤|groups| rows (the ORDER BY
    adds a range exchange on ≤ |sets|·|groups| rows)."""
    plan = plan_of(QUERIES["q52_grouping_sets"](spark, SF))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    below_expand = plan.split("Expand")[-1]
    assert below_expand.count("Exchange hashpartitioning") == 1
    assert "partial_" in below_expand.split("Exchange hashpartitioning")[1]


def test_histogram_aggregates_mapside(spark):
    """The fixed-width histogram computes buckets in the scan stage and
    partial-aggregates before its single hash shuffle — the shuffle
    carries <= n_buckets rows per partition."""
    plan = plan_of(QUERIES["ns_value_histogram"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan.split("Exchange hashpartitioning")[1]


def test_regression_moments_single_shuffle(spark):
    """All five regression moments accumulate in ONE partial-aggregated
    groupBy (single hash shuffle); the closed-form math is a driver-free
    projection over one row per group."""
    plan = plan_of(QUERIES["ns_regression_stats"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.split("Exchange hashpartitioning")[1].count("partial_sum") >= 5


def test_session_assignment_single_shuffle_two_windows(spark):
    """lag + running-sum share the same (user_id) partitioning: one
    hash shuffle serves both window operators."""
    plan = plan_of(QUERIES["ns_session_assignment"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_df_join_small_side_broadcast(spark):
    """The document-frequency side (vocab-sized) must broadcast into
    the tf relation at this SF; per-doc top-k must be a window filter,
    not a global sort of the scored pairs."""
    df = QUERIES["ns_tfidf_topterms"](spark, SF)
    df.collect()  # AQE decides the join strategy on execution
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """The scale claim 'AQE handles skew' must be visible in an executed
    plan: a join with one hot key (with thresholds scaled to test data)
    re-plans into a skew-optimized SortMergeJoin — the runtime
    mitigation that replaces manual salting for one-sided skew."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        # coalescing would merge the small partitions first and mask
        # the skew decision at toy sizes — disable it for the contract
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 200k rows on ONE key vs 100 spread keys -> partition skew
        hot = spark.range(200000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        spread_side = spark.range(1, 101).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("payload")
        )
        left = hot.unionAll(spread_side)
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit(1).alias("tag")
        )
        joined = left.join(right, "k").groupBy("tag").count()
        joined.collect()  # AQE finalizes on execution
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_profile_multi_distinct_is_single_scan(spark):
    """The profiling report computes several COUNT(DISTINCT)s; Spark
    must rewrite them into one Expand-based aggregation over ONE scan
    of the input — never one pass per profiled column."""
    plan = plan_of(QUERIES["ns_table_profile"](spark, SF))
    assert plan.count("FileScan") == 1
    assert "Expand" in plan


def test_band_join_is_hash_join_not_nested_loop(spark):
    """The banded range join must plan a hash/sort-merge EQUI-join on
    the bucket id — never the BroadcastNestedLoopJoin / cartesian a
    plain |a-b| <= eps condition degenerates to."""
    plan = plan_of(QUERIES["ns_band_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_unigram_likelihood_tf_collapse_shape(spark):
    """The unigram-likelihood score must join the COLLAPSED tf table,
    never the raw occurrence stream (tf·df products weight the sums),
    with the df side broadcast at this SF, map-side partial
    aggregation on every shuffle, and no cartesian product from the
    n_docs scalar (it broadcasts)."""
    df = QUERIES["ns_unigram_likelihood"](spark, SF)
    df.collect()  # AQE decides join strategies on execution
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_lm_coherence_two_explodes_no_object_agg(spark):
    """The r7 Q20 rewrite's shape: the corpus token stream is exploded
    exactly TWICE (one model pass — unigram counts roll up from the
    bigram+successor counts — and one scoring pass), and the per-doc
    reduction is a plain integer SUM — no collect_list/
    ObjectHashAggregate (the r6 sorted-fold needed an unbounded
    per-doc array) and no per-row higher-order-function fold. The
    scoring join carries NO F.broadcast hint (the weight table is
    distinct-bigram-sized, i.e. corpus-scaling — r7 ADVICE); at this
    SF the measured size is tiny so AQE must still pick a broadcast
    join AT RUNTIME, which this pin checks (strategy chosen by size,
    not forced). (r10 note: a single-explode rewrite sharing one
    per-(doc, x, y) exchange via ReuseExchange measured consistently
    SLOWER — the pre-aggregation adds a corpus-sized exchange that
    costs more than the saved explode, locally and at scale per guide
    §2.2 — so the two-explode shape is the deliberate choice, recorded
    in OPTIMIZATION_r10.md.)"""
    df = QUERIES["ns_lm_coherence"](spark, SF)
    df.collect()  # AQE decides join strategies on execution
    plan = plan_of(df)
    assert plan.count("Generate") == 2
    assert "ObjectHashAggregate" not in plan
    assert "collect_list" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the hint must not come back: the LOGICAL plan (pre-AQE) must not
    # contain a broadcast hint on the scoring join
    from hybrid_cdc_demo_spark.plans.catalog import QUERIES as _Q

    logical = _Q["ns_lm_coherence"](spark, SF)._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_batch_topk_uses_window_group_limit(spark):
    """The batch-ANN per-query limit must compile with
    WindowGroupLimit (map-side partial top-k per qid BEFORE the
    shuffle) — without it every scored row shuffles, which is the
    difference between queries*partitions*k and corpus-sized network
    traffic at 100 TB."""
    plan = plan_of(QUERIES["ns_simsearch_batch"](spark, SF))
    assert "WindowGroupLimit" in plan
    # the query set rides in as a broadcast, not a shuffled join side
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_full_assignment_no_exchange(spark):
    """ns_kmeans_assign's scale-path (full-corpus assignment) is a
    map-only literal argmin; the only Exchange allowed is the final
    presentation sort's range partitioning."""
    plan = plan_of(QUERIES["ns_kmeans_assign"](spark, SF))
    assert plan.count("Exchange") == 1  # the ORDER BY vec_id only
    assert "rangepartitioning" in plan


def test_temperature_sampling_single_group_shuffle(spark):
    """One hashpartitioning Exchange (the groupBy source) — the
    normalizer and total ride back as broadcast one-row frames."""
    plan = plan_of(QUERIES["ns_temperature_sampling"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine on the groupBy


def test_bm25_broadcast_side_inputs_distributed_topk(spark):
    """BM25: df + corpus stats must ride in as broadcasts (never a
    shuffled join against the tiny side), and top-k must be
    TakeOrderedAndProject — a global rank window here would serialize
    the corpus through one task."""
    plan = plan_of(QUERIES["ns_bm25_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastExchange") >= 2  # dfreq + stats
    assert "CartesianProduct" not in plan


def test_prefix_dedup_no_global_window(spark):
    """The sorted-neighbor pass must be range-exchange + in-partition
    sort + MapInPandas; a Window operator here means the one-task
    global-window formulation leaked back in."""
    plan = plan_of(QUERIES["ns_prefix_dedup"](spark, SF))
    assert "Window" not in plan
    assert "MapInPandas" in plan


def test_pca_projection_map_only(spark):
    """The trained components ride in as literals: no join anywhere,
    and the presentation sort is the only exchange."""
    plan = plan_of(QUERIES["ns_pca_project"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # rangepartitioning + AQE read


def test_bpe_pair_stats_partial_aggregated(spark):
    """BPE merge statistics: the vocab-sized pair count must partial-
    aggregate map-side below ONE exchange, and the argmax/top-k must
    be TakeOrderedAndProject."""
    plan = plan_of(QUERIES["ns_bpe_merges"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan or "partial_sum" in plan or (
        "HashAggregate" in plan and "Exchange hashpartitioning" in plan
    )


def test_span_dedup_shuffles_hashed_keys_only(spark):
    """ns_dedup_substring's wide exchange must carry the 64-bit
    xxhash64 fingerprint, never the multi-word gram string; the
    corpus-wide occurrence count is a WINDOW over that one exchange
    (so the tokenize+window+explode subtree runs once — the old
    groupBy + semi-join formulation recomputed it per consumer); the
    coverage union is a second, per-doc running-max window. No
    per-token explode stage exists."""
    df = QUERIES["ns_dedup_substring"](spark, SF)
    opt = optimized_of(df)
    assert "xxhash64" in opt
    plan = plan_of(df)
    assert "hashpartitioning(_key" in plan  # the one gram exchange
    assert plan.count("Window") >= 2  # occurrence count + interval union
    assert "HashAggregate(keys=[_key" not in plan  # no second pass


def test_event_paths_prunes_per_user_topn_mapside(spark):
    """The first-3-events window must compile with WindowGroupLimit so
    each map task pre-reduces to 3 rows per user before the shuffle."""
    plan = plan_of(QUERIES["ns_event_paths"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_hybrid_rrf_legs_prereduce(spark):
    """Both RRF legs must pre-reduce to their candidate lists BEFORE
    fusion — Catalyst's LimitPushDownThroughWindow turns each leg's
    rank window into TakeOrderedAndProject (per-partition heaps) with
    the row_number recomputed over the bounded result: three
    TakeOrderedAndProject nodes (sparse 50, dense 50, fused 20), and
    every Window sits ABOVE one of them, never over the raw corpus."""
    plan = plan_of(QUERIES["ns_hybrid_rrf"](spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 3
    assert "limit=50" in plan and "limit=20" in plan


def test_funnel_partial_aggregates_per_stage(spark):
    """Every funnel stage is a partial-aggregated MIN per user —
    HashAggregate pairs around each exchange, no window over raw
    events. Asserted on the raw (reuse=False) stage lineage: the
    default path checkpoints each stage frame (r11 — one
    materialization per stage instead of one per consumer), which
    hides the aggregation inside the checkpoint lineage."""
    from hybrid_cdc_demo_spark.operators.analytics import (
        funnel_stage_users,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    events = load_table(spark, SF, "events")
    raw = funnel_stage_users(
        events, ["view", "click", "purchase"], reuse=False
    )
    for fr in raw:
        p = plan_of(fr)
        assert "partial_min" in p
        assert "Window" not in p
    # the default (reuse=True) query reads each stage frame from its
    # checkpoint: three ExistingRDD count branches, window only at the
    # 3-row rate step
    plan = plan_of(QUERIES["ns_funnel_conversion"](spark, SF))
    assert plan.count("Scan ExistingRDD") == 3
    assert plan.count("WindowGroupLimit") == 0


def test_anomaly_stats_broadcast_back(spark):
    """Per-type stats (5 rows) must broadcast into the z projection,
    not shuffle the counts table again."""
    plan = plan_of(QUERIES["ns_daily_anomaly"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_entropy_char_explode_collapses_mapside(spark):
    """The char-level explode is corpus x 1 wide; the (doc, char)
    aggregation must partial-aggregate BEFORE its exchange so only
    |docs| x |alphabet| rows shuffle, and the per-doc fold must run
    over the collected bounded array (no third shuffle)."""
    plan = plan_of(QUERIES["ns_text_entropy"](spark, SF))
    # map-side combine on (doc,ch) AND on the per-doc fold inputs
    assert "partial_count" in plan and "partial_collect_list" in plan
    assert "Generate explode" in plan
    # two hash shuffles: (doc,ch) then (doc); the sort is the output ORDER BY
    assert plan.count("Exchange hashpartitioning") == 2


def test_zipf_head_avoids_global_sort(spark):
    """The vocabulary head must be TakeOrderedAndProject (per-partition
    heaps); the rank window and the least-squares fold then run over
    100 rows, so the single-partition window exchange is bounded."""
    plan = plan_of(QUERIES["ns_zipf_slope"](spark, SF))
    assert "TakeOrderedAndProject" in plan and "limit=100" in plan


def test_hard_negatives_prereduce_and_broadcast(spark):
    """The probe batch must broadcast (map-side expansion, no corpus
    shuffle) and the per-query top-k must compile with WindowGroupLimit
    so each task pre-reduces before the rank exchange."""
    plan = plan_of(QUERIES["ns_hard_negatives"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan


def test_canonical_dedup_argmax_is_partial_aggregated(spark):
    """The quality argmax must be a max(struct(...)) partial aggregate
    (one candidate per key per task crosses the wire) — never a
    per-cluster window over all copies."""
    plan = plan_of(QUERIES["ns_dedup_canonical"](spark, SF))
    assert "partial_max" in plan  # one best candidate per key per task
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_rfm_single_rank_pass(spark):
    """RFM's three quartile ranks must come from ONE global_rank pass
    over the 3-metric union: exactly one range exchange in the whole
    plan (the enumeration's total order), never three."""
    plan = plan_of(QUERIES["ns_rfm_segments"](spark, SF))
    assert plan.count("Exchange rangepartitioning") <= 2  # rank pass + output sort


def test_transcript_assembly_prunes_mapside(spark):
    """The 8-turn cap must compile with WindowGroupLimit so each map
    task pre-reduces to its local first-8-per-user before the user
    shuffle; exactly one hash exchange end to end."""
    plan = plan_of(QUERIES["ns_transcript_assembly"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_forecast_backtest_joins_cells_not_row_lag(spark):
    """The seasonal-naive forecast must be a self-equi-join of the
    (type, day) COUNT cells — never a row-offset lag window (which
    diverges on zero-event days). Cells partial-aggregate map-side
    before their exchange, and the tiny cell table broadcasts."""
    plan = plan_of(QUERIES["ns_forecast_backtest"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


def test_ttl_expiry_is_pushed_down_scan_filter(spark):
    """TTL expiry is a narrow per-row predicate: zero hash exchanges
    at any scale, and the expiry condition must reach the parquet
    scan's data filters (the only exchange is the output ORDER BY)."""
    df = QUERIES["ns_ttl_expiry"](spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Window" not in plan and "Join" not in plan
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "DataFilters: [" in scan_line
    assert "DataFilters: []" not in scan_line  # predicate reached the scan


def test_dataset_card_single_grouped_pass_no_joins(spark):
    """The card is one narrow projection into partially-aggregated
    groupBys: no joins, no windows; the COUNT(DISTINCT text_hash)
    expands to exactly the two-level distinct aggregate (2 hash
    exchanges), never a self-join."""
    plan = plan_of(QUERIES["ns_dataset_card"](spark, SF))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_bit_xor" in plan or "partial_" in plan


def test_pareto_revenue_single_rank_exchange_no_window(spark):
    """Rank + running revenue share come from ONE global_rank_cumsum
    pass, and the grand total is a driver literal from that pass's
    own control frame (r10) — so the FINAL plan shows no Window (the
    oracle's unpartitioned SUM OVER would be one task), no Join, and
    ZERO hash exchanges: the only user aggregation lives inside the
    rank pass's checkpointed lineage (Scan ExistingRDD), and before
    r10 the one visible hash exchange was literally the wasteful
    SECOND aggregation recomputing the total."""
    plan = plan_of(QUERIES["ns_pareto_revenue"](spark, SF))
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed rank pass


def test_weighted_sample_is_heap_topk_no_global_sort(spark):
    """The weighted sample must select via TakeOrderedAndProject
    (per-partition k-heaps); the rank window then runs over the
    already-selected 200 rows, never the corpus."""
    plan = plan_of(QUERIES["ns_weighted_sample"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_interval_join_bucketized_shape(spark):
    """s7/s9's r8 rewrite: the interval self-join must plan as a hash
    EQUI-join whose key includes the time bucket (__ib) — one Generate
    (the 2-candidate explode), no nested-loop/cartesian fallback, and
    the join key carrying the bucket so a hot user's rows spread over
    its time range instead of one quadratic task (SKEW_r08's worst
    amplifier before the rewrite)."""
    for name in ("s7_interval_join",):
        df = QUERIES[name](spark, SF)
        df.collect()  # AQE finalizes join strategies
        # AQE's toString appends the pre-execution "Initial Plan" —
        # pin only the final section
        plan = plan_of(df).split("== Initial Plan ==")[0]
        assert plan.count("Generate") == 1, name
        assert "__ib" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # s9 checkpoints the matched pair set (r11 — the anti-join's
    # distinct re-ran the whole interval join), which hides the
    # bucketized join inside the checkpoint lineage: assert the shape
    # on the raw inner join, and pin the default plan's checkpoint
    # reads (two consumers, one materialization).
    from hybrid_cdc_demo_spark.operators.rangejoin import (
        keyed_interval_join,
        ntz_micros,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    a = ev.select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("u"),
        ntz_micros("ts").alias("a_us"),
    )
    b = ev.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("u2"),
        ntz_micros("ts").alias("b_us"),
    )
    raw = keyed_interval_join(
        a, b, on=[("u", "u2")], left_us="a_us", right_us="b_us",
        upper_us=300_000_000,
    )
    raw.collect()
    plan = plan_of(raw).split("== Initial Plan ==")[0]
    assert plan.count("Generate") == 1
    assert "__ib" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    outer_plan = plan_of(QUERIES["s9_interval_join_outer"](spark, SF))
    assert outer_plan.count("Scan ExistingRDD") == 2
