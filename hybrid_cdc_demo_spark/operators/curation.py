"""Training-corpus curation operators: deterministic splits, sequence
packing, and cross-split contamination checks.

The reference pipeline feeds analytics warehouses (SURVEY.md §0); these
operators are part of the LLM-training-data extension surface the
project north star adds on top (BASELINE.json). All three are pure
DataFrame expressions — no UDFs, no driver-side loops — so Catalyst
keeps them whole-stage-codegen'd and they scale by partitioning alone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from hybrid_cdc_demo_spark.operators.dedup import word_shingles
from hybrid_cdc_demo_spark.operators.partitioning import spread

__all__ = [
    "hash_split",
    "pack_sequences",
    "ngram_contamination",
    "stratified_sample",
    "weighted_mixture",
    "chunk_documents",
    "dataset_card",
    "temperature_weights",
]


def hash_split(
    df: DataFrame,
    id_col: str,
    split_col: str = "split",
    train_hex_max: str = "c",
    val_hex_max: str = "e",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash — the standard way a training pipeline splits a corpus so the
    assignment is reproducible across runs, machines, and engines.

    The first hex digit of sha256(id) buckets rows 16 ways; digits
    ``0..train_hex_max`` → train, ``..val_hex_max`` → val, rest → test
    (defaults: 13/16 ≈ 81%, 2/16 = 12.5%, 1/16 ≈ 6%). A single hex-char
    string comparison is portable ANSI SQL, so the DuckDB oracle
    reproduces the exact assignment.

    100 TB posture: one narrow projection, no shuffle — the split column
    is computed where the row already lives.
    """
    h = F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 1)
    split = (
        F.when(h <= train_hex_max, F.lit("train"))
        .when(h <= val_hex_max, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, split)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic stratified sample: the k rows per stratum with the
    smallest sha256(id) — a uniform-at-random draw (the hash is
    uniform over ids) that is reproducible across runs and engines,
    unlike ``df.sample`` whose output depends on partitioning. The
    standard way a pipeline takes an inspectable fixed dev subset per
    language/source bucket.

    100 TB posture: one shuffle on the stratum key; row_number within
    each stratum never materializes a global sort. For heavily skewed
    strata, pre-filter by a hash-prefix range to cap the per-stratum
    sort input before ranking.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.sha2(F.col(id_col).cast("string"), 256), id_col
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    partition_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Next-fit sequence packing: walk documents in ``order_col`` order
    and assign each to the bin of its *preceding* cumulative token
    count, so bins fill to ``budget`` tokens before the next one opens
    (a document larger than the budget gets a bin of its own). This is
    the deterministic, shuffle-minimal form of the packing step that
    prepares fixed-length training sequences.

    ``bin = floor((cumsum - tokens) / budget)`` over a running-sum
    window — exactly expressible in ANSI SQL, so the assignment is
    oracle-checkable bit-for-bit.

    100 TB posture: the running sum is windowed *within*
    ``partition_col`` (source / shard / date), never globally — pass a
    partition column at scale so no single ordered partition holds the
    corpus. One shuffle on the partition key; a downstream groupBy
    (partition, bin) reuses that partitioning.
    """
    part = [partition_col] if partition_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    bin_id = F.floor(
        (cum - F.col(token_col)) / F.lit(float(budget))
    ).cast("long")
    return df.withColumn(bin_col, bin_id)


def ngram_contamination(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str = "split",
    n: int = 5,
    probe_split: str = "test",
    against_split: str = "train",
    hashed: bool = False,
) -> DataFrame:
    """Cross-split contamination: for each ``probe_split`` document,
    count its distinct word n-grams that also appear anywhere in
    ``against_split`` — the decontamination check run before an eval
    set is trusted (a train/test 5-gram collision usually means a
    near-duplicate leaked across the split).

    Returns ``(id_col, n_hits)`` for contaminated probe docs only.

    ``hashed=True`` joins on ``xxhash64(ngram)`` instead of the ngram
    string — the 100 TB form (8-byte shuffle keys instead of ~40-byte
    strings; collision odds are negligible at 2^-64 per pair). The
    string form is kept as default because it is exactly reproducible
    in the DuckDB oracle; tests assert both forms agree.
    """
    # the shingle explode is the CPU-heavy stage — spread first so a
    # single-row-group local input doesn't serialize it on one core
    # (no-op on a well-partitioned production input)
    grams = spread(df).select(
        F.col(id_col),
        F.col(split_col),
        F.explode(word_shingles(text_col, n)).alias("_g"),
    )
    key = F.xxhash64("_g").alias("_k") if hashed else F.col("_g").alias("_k")
    against = (
        grams.filter(F.col(split_col) == against_split).select(key).distinct()
    )
    probe = grams.filter(F.col(split_col) == probe_split).select(
        id_col, key
    )
    return (
        probe.join(against, "_k")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


_HEX = "0123456789abcdef"


def weighted_mixture(
    df: DataFrame,
    rate_col,
    id_col: str,
    keep_col: str = "kept",
) -> DataFrame:
    """Deterministic weighted dataset mixture: keep each row with the
    per-row probability ``rate_col`` (a Column of SIXTEENTHS, 0..16 —
    e.g. 4 ≙ 25%), decided by the same content-independent id hash as
    :func:`hash_split` so the selection is reproducible across runs,
    engines, and resampling of the same corpus. This is the mixture-
    weights stage of a training-data pipeline (upsample curated
    sources, downsample crawl) — at 100 TB it must be a narrow
    projection, never a random() shuffle-and-sort, and hash gating is
    exactly that: zero shuffle, trivially pushdown-friendly.

    Sixteenths keep the gate a single hex-digit comparison, portable
    to ANSI SQL — the DuckDB oracle reproduces the exact row set
    (rates finer than 1/16 → extend to two hex digits, same idea).
    """
    h = F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 1)
    # h < _HEX[rate] ⟺ bucket index < rate (uniform 16-way buckets).
    # The rate domain is ENFORCED, not assumed (ADVICE r4 #5): an
    # out-of-range rate would make element_at return null, so kept=null
    # rows silently vanish in a filter(kept) — a bad mixture weight
    # must fail loudly, never sample a source to zero.
    rate = rate_col.cast("int")
    checked = F.when((rate >= 0) & (rate <= 16), rate).otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_mixture rate out of 0..16 domain: "),
                F.coalesce(rate_col.cast("string"), F.lit("null")),
            )
        )
    )
    thresholds = F.array(*[F.lit(c) for c in _HEX + "g"])  # 16 ⇒ keep all
    return df.withColumn(
        keep_col, h < F.element_at(thresholds, checked + 1)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window preparation stage (chunk 64 / stride 48 ⇒ 16-token
    overlap between consecutive chunks). Emits one row per chunk:
    (id, chunk_id, n_tok, chunk_text).

    Chunk starts are ``k·stride`` for ``k = 0 .. n_chunks−1`` with
    ``n_chunks = least(1 + ceil(max(n−chunk,0)/stride),
    ceil(n/stride))`` — with ``stride ≤ chunk`` (overlap/abutting,
    the default) every token is covered and the final chunk may be
    short; with ``stride > chunk`` (gap sampling) the clamp keeps
    every emitted chunk non-empty (hypothesis falsified the unclamped
    form: n=2, chunk=1, stride=100 emitted an empty tail chunk at
    start 100 — tests/test_property_invariants.py). A short doc
    yields exactly one chunk. Pure higher-order expressions over the
    token array (split → sequence → transform → posexplode): per-row
    work, no shuffle, codegen'd — the 100 TB shape. Token rule:
    whitespace split of lower/trim/space-normalized text, shared with
    the dedup/contamination operators so chunk boundaries agree with
    their shingle space."""
    assert stride >= 1 and chunk_tokens >= 1
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    n = F.size(toks)  # >= 1: split of "" yields [""]
    n_chunks = F.least(
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)),
        F.ceil(n / F.lit(stride)),
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.concat_ws(
            " ", F.slice(toks, k * stride + 1, chunk_tokens)
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).withColumn(
        "n_tok", F.size(F.split(F.col("chunk_text"), " ")).cast("long")
    )


def dataset_card(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Dataset card: the per-group documentation table a training run
    ships with its corpus — one row per ``group_cols`` combination
    (typically source × split) carrying exact volume, dedup, and
    token statistics plus an order-independent content fingerprint:

    * ``n_docs`` / ``n_unique_texts`` — exact text-hash dedup basis;
    * ``total_tokens`` / ``total_chars`` — whitespace-token and char
      volume (token rule shared with the dedup/chunking operators);
    * ``dup_rate`` / ``avg_tokens`` — single IEEE divisions of exact
      longs (hash-exact cross-engine);
    * ``content_fp`` — BIT_XOR over a 60-bit integer drawn from
      sha256(id:text) per row. XOR is commutative/associative, so the
      fingerprint is independent of row order and partitioning, and
      two corpora with ANY differing row disagree with overwhelming
      probability — the cheap "is this exactly the dataset the model
      was trained on?" check, reproducible from any engine.

    Scale shape: one narrow projection (hashes/token counts computed
    where the row lives) into one partially-aggregated groupBy — no
    joins, no windows, no driver data."""
    from hybrid_cdc_demo_spark.functions import text as T

    fp_src = F.concat(
        F.col(id_col).cast("string"),
        F.lit(":"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    base = df.select(
        *group_cols,
        F.size(F.split(T.normalized_text(text_col), " ")).alias("_n_tok"),
        F.length(text_col).alias("_n_chars"),
        F.sha2(F.col(text_col), 256).alias("_text_hash"),
        F.conv(F.substring(F.sha2(fp_src, 256), 1, 15), 16, 10)
        .cast("long")
        .alias("_fp"),
    )
    n = F.count(F.lit(1))
    uniq = F.count_distinct(F.col("_text_hash"))
    return (
        base.groupBy(*group_cols)
        .agg(
            n.cast("long").alias("n_docs"),
            uniq.cast("long").alias("n_unique_texts"),
            F.sum("_n_tok").cast("long").alias("total_tokens"),
            F.sum("_n_chars").cast("long").alias("total_chars"),
            ((n - uniq).cast("double") / n.cast("double")).alias("dup_rate"),
            (F.sum("_n_tok").cast("double") / n.cast("double")).alias(
                "avg_tokens"
            ),
            F.expr("bit_xor(_fp)").alias("content_fp"),
        )
        .orderBy(*group_cols)
    )


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based sampling weights per group — the mC4/CC-100
    scheme for rebalancing a multilingual/multi-source corpus:
    q_i = p_i^alpha / sum_j p_j^alpha, where p_i is the group's doc
    share. alpha < 1 upsamples the tail, alpha = 1 is proportional.

    Determinism: p_i is an exact integer ratio; alpha = 0.5 (the
    default, and the common published setting) uses sqrt, which IEEE
    correctly rounds in every engine — unlike pow()/exp(), which are
    libm-divergent (PLANS.md rule), so other alphas are rejected when
    an oracle-exact result is required. The normalizer folds the
    per-group terms in SORTED group order (collect into one bounded
    array — group cardinality is tiny by definition), so the
    double sum is reproducible bit for bit.

    One aggregation shuffle on the group key + a broadcast of the
    one-row normalizer: the 100 TB plan is the same shape.
    """
    if alpha == 0.5:
        temper = F.sqrt
    elif alpha == 1.0:
        def temper(c):
            return c
    else:
        raise ValueError(
            f"alpha={alpha}: only 0.5 (sqrt) and 1.0 (identity) are "
            "bitwise-reproducible across engines; pow() is libm-divergent"
        )
    counts = spread(df).groupBy(group_col).agg(F.count("*").alias("n_docs"))
    # everything after the groupBy runs over the tiny per-group frame:
    # one unbounded window (single-partition exchange of #groups rows)
    # computes total, shares, and the sorted-fold normalizer in ONE
    # pass — a join formulation would re-run the corpus scan+aggregate
    # once per branch (Spark does not dedupe common DataFrame lineage)
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast(
        "double"
    )
    base = counts.withColumn("share", share).withColumn(
        "_s", temper(F.col("share"))
    )
    denom = F.aggregate(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(group_col).alias("g"), F.col("_s").alias("s"))
            ).over(w)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x.getField("s"),
    )
    return (
        base.withColumn("_denom", denom)
        .select(
            group_col,
            "n_docs",
            "share",
            (F.col("_s") / F.col("_denom")).alias("weight"),
        )
        .orderBy(group_col)
    )


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    priority-sampling family — Duffield/Lund/Thorup priority sampling,
    Efraimidis-Spirakis A-ES): each row gets a reproducible
    pseudo-uniform from sha256(id) (the hash_split/dataset_card
    60-bit-hex trick) and priority = hash / weight; the k SMALLEST
    priorities win, so selection probability rises with weight — the
    "sample documents proportional to quality/length" curation stage,
    but REPRODUCIBLE across engines and runs, unlike rand()-based
    sampling. The priority is one IEEE division of values both engines
    compute bit-identically (division is correctly rounded), so the
    selected SET is exactly SQL-mirrorable; rows with NULL or
    non-positive weight are excluded (a zero weight must never be
    sampled, and a negative one would invert the ordering).

    Scale shape: map-only priority projection +
    TakeOrderedAndProject (per-partition k-heaps, no global sort) —
    the same top-k plan every bounded selection here compiles to.
    """
    h = F.conv(
        F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 15), 16, 10
    ).cast("long")
    w = F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            F.col(weight_col),
            (h.cast("double") / w).alias("_priority"),
        )
        .orderBy("_priority", id_col)
        .limit(k)
    )
