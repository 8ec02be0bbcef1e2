"""Distributed BPE tokenizer induction (Sennrich et al. 2016, public
algorithm): train merge rules over the corpus the tokenizer will
tokenize — the vocabulary-induction step of a training-data pipeline.

Scale shape (100 TB posture): the classic reduction — BPE statistics
are a function of the WORD-FREQUENCY TABLE, not the token stream, so
one corpus-wide ``groupBy(word).count()`` collapses 100 TB of text to
a vocabulary-sized frame (the only corpus-scale job), and every merge
iteration runs distributed over that frame: adjacent-pair counts are
an explode + partial-aggregated sum, the argmax pair is a
TakeOrderedAndProject of ONE row, and the merge itself is a map-only
higher-order fold over each word's symbol array (no UDF, no driver
data beyond the single winning pair per step). Each iteration
localCheckpoints the symbol table so k merges cost k passes, not
O(k²) lineage recomputation.

Determinism: counts are exact integers; argmax ties break
lexicographically on the pair; the fold merges leftmost-first
non-overlapping — the textbook greedy semantics, reproducible across
engines (the first iteration's pair table is oracle-checked in
ns_bpe_merges; the loop is contract-pinned on the classic
low/lower/newest/widest corpus).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.functions.text import words_lower
from hybrid_cdc_demo_spark.operators.partitioning import spread


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased whitespace vocabulary — the
    one corpus-scale aggregation; everything downstream is vocab-sized."""
    return (
        spread(docs)
        .select(F.explode(words_lower(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def doc_word_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, word, cnt) — the corpus token stream collapsed to
    per-document word counts (the tfidf tf shape), lazily
    localCheckpoint'ed so a train+encode composition runs the corpus
    scan + explode ONCE: training's word-freq table is its
    ``groupBy(word).sum(cnt)`` (exact integers, order-free) and the
    encode join/aggregation runs on the collapsed counts instead of
    the raw token stream (guide §2.3/§2.4)."""
    return (
        spread(docs)
        .select(F.col(id_col), F.explode(words_lower(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )


def symbolize(wf: DataFrame, word_col: str = "word") -> DataFrame:
    """Split each word into its character symbols (the BPE start
    state) — a map-only projection."""
    c = F.col(word_col)
    chars = F.transform(
        F.sequence(F.lit(1), F.length(c)), lambda i: c.substr(i, F.lit(1))
    )
    return wf.withColumn("sym", chars)


def pair_counts(sym_df: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency: explode
    + partial-aggregated sum (map-side combine), vocab-sized input."""
    pairs = F.when(
        F.size("sym") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("sym") - 1),
            lambda i: F.struct(
                F.element_at("sym", i).alias("a"),
                F.element_at("sym", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        sym_df.select(F.explode(pairs).alias("p"), "freq")
        .select("p.a", "p.b", "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_pair_expr(sym: F.Column, a: str, b: str) -> F.Column:
    """Replace adjacent (a, b) with the merged symbol, leftmost-first
    non-overlapping — a strict left fold building the new symbol
    array; pure higher-order expression, whole-stage evaluated."""
    merged = F.lit(a + b)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    partitions: int | None = None,
    mode: str = "auto",
    max_driver_vocab: int = 200_000,
    word_freq: DataFrame | None = None,
) -> list[dict]:
    """Run ``num_merges`` BPE iterations; returns the merge table
    [{step, left, right, merged, cnt}, ...].

    ``partitions`` sizes the vocab-table stages: the iteration loop is
    scheduling-bound when the vocabulary is small relative to the
    cluster (each of the k steps launches its own jobs), so benchmarks
    on small vocabs pass a small value; at corpus scale leave None and
    the table keeps the session's parallelism.

    ``mode`` (r10): BPE statistics are EXACT integers and the argmax
    tie-break is lexicographic, so the merge loop is reproducible in
    plain Python to the byte — no floating point anywhere. After the
    one corpus-scale aggregation (word_freq_table), ``"auto"`` counts
    the vocabulary (one cheap job): at or under ``max_driver_vocab``
    it collects the (freq, symbols) table ONCE and runs all
    ``num_merges`` iterations locally (the HF-tokenizers trainer
    shape — 2 jobs total instead of ~2 per merge step); above the
    bound it stays on the distributed loop. ``"driver"`` forces the
    collect (raises over the bound); ``"dist"`` forces the loop.
    Identical merge tables by construction (pinned in test_bpe.py:
    integer counts are order-free, UTF-8 byte order == code-point
    order, and the fold below is replayed verbatim)."""
    if mode not in ("auto", "driver", "dist"):
        raise ValueError(f"train_bpe: unknown mode {mode!r}")
    # ``word_freq`` (r11): a caller composing train+encode passes the
    # (word, freq) table derived from a shared doc_word_counts
    # checkpoint so the corpus explode runs once across the whole
    # composition; counts are exact integers, so a sum of per-doc
    # partials is the same table.
    wf = word_freq if word_freq is not None else word_freq_table(docs, text_col)
    sym = symbolize(wf).select("freq", "sym")
    if partitions:
        sym = sym.coalesce(partitions)
    # pin the start state: iterations re-scan the vocab table, not the
    # corpus. eager=False (r10): the checkpoint materializes inside the
    # next job (vocab count or argmax) instead of spending a dedicated
    # job per step — same truncated lineage and cached blocks (guide
    # §1.2 "per-task work" after the algorithm is right).
    sym = sym.localCheckpoint(eager=False)
    if mode != "dist":
        n_vocab = sym.count()  # materializes the checkpoint too
        if n_vocab <= max_driver_vocab:
            rows = sym.collect()
            return _train_bpe_local(
                [(r["freq"], list(r["sym"])) for r in rows], num_merges
            )
        if mode == "driver":
            raise ValueError(
                f"train_bpe(mode='driver'): vocabulary has {n_vocab} "
                f"words, over the {max_driver_vocab} driver-side bound "
                "— use mode='auto'/'dist' (or raise max_driver_vocab "
                "deliberately)"
            )
    merges: list[dict] = []
    for step in range(1, num_merges + 1):
        top = (
            pair_counts(sym)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append(
            {"step": step, "left": a, "right": b, "merged": a + b, "cnt": cnt}
        )
        sym = sym.select(
            "freq", merge_pair_expr(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=False)  # k passes total, not O(k^2)
        # lineage; lazy — the next step's argmax job materializes it
    return merges


def _train_bpe_local(vocab: list[tuple[int, list[str]]], num_merges: int) -> list[dict]:
    """The merge loop on the collected vocabulary — each step mirrors
    the distributed formulation operation-for-operation: adjacent-pair
    counts weighted by word frequency (exact integers, any summation
    order), argmax by (cnt DESC, a, b) (Python code-point comparison
    == Spark's UTF8 byte comparison), and merge_pair_expr's strict
    left fold (last-accumulated == a and current == b -> replace with
    a+b, leftmost-first non-overlapping)."""
    merges: list[dict] = []
    for step in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for freq, sym in vocab:
            for i in range(len(sym) - 1):
                key = (sym[i], sym[i + 1])
                counts[key] = counts.get(key, 0) + freq
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            {"step": step, "left": a, "right": b, "merged": a + b, "cnt": cnt}
        )
        merged = a + b
        new_vocab: list[tuple[int, list[str]]] = []
        for freq, sym in vocab:
            acc: list[str] = []
            for x in sym:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = merged
                else:
                    acc.append(x)
            new_vocab.append((freq, acc))
        vocab = new_vocab
    return merges


def merges_df(spark, merges: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["merged"], m["cnt"]) for m in merges],
        "step int, left string, right string, merged string, cnt long",
    )


def encode_expr(word: F.Column | str, merges: list[dict]) -> F.Column:
    """Tokenize a word column with a trained merge list: start from
    characters, apply each merge rule in training order — map-only,
    the trained rules ride in as literals."""
    c = F.col(word) if isinstance(word, str) else word
    sym = F.transform(
        F.sequence(F.lit(1), F.length(c)), lambda i: c.substr(i, F.lit(1))
    )
    for m in merges:
        sym = merge_pair_expr(sym, m["left"], m["right"])
    return sym


def encode_token_counts(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    word_counts: DataFrame | None = None,
) -> DataFrame:
    """Tokenize the corpus with a trained merge list and report
    per-document whitespace-token and BPE-token counts (the
    tokens-per-doc accounting a training pipeline runs before packing).

    Dictionary-encoded, the scale-right shape: each DISTINCT word is
    encoded ONCE on the vocab-sized frame (the 6-fold merge chain runs
    |vocab| times, not |corpus tokens| times), then the per-word token
    count joins back on the word key and re-aggregates per document.

    The join and both consumers run on the COLLAPSED (doc_id, word,
    cnt) counts (doc_word_counts — checkpointed, so the corpus explode
    runs once even with two consumers; before r11 the vocab-distinct
    branch and the join side each re-ran the corpus scan + explode).
    ``word_counts`` lets a caller that already built the frame (e.g.
    to derive training's word-freq table) share it. Integer-count
    algebra keeps results identical: n_words = SUM(cnt) = the old
    per-occurrence COUNT(*), n_bpe_tokens = SUM(cnt * n_bpe).
    """
    wdc = (
        word_counts
        if word_counts is not None
        else doc_word_counts(docs, text_col, id_col)
    )
    vocab = wdc.select("word").distinct().select(
        "word", F.size(encode_expr("word", merges)).alias("_n_bpe")
    )
    return (
        wdc.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("_n_bpe")).alias("n_bpe_tokens"),
        )
    )
