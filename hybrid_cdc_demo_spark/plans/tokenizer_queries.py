"""Tokenizer-induction north-star queries: distributed BPE training
over the documents corpus (operators/bpe.py).

ns_bpe_merges hash-verifies the statistics engine of the trainer (the
weighted adjacent-pair table every iteration argmaxes over) against
DuckDB; ns_bpe_vocab runs the full iterative loop, which no single SQL
statement can express (each step's input depends on the previous
argmax), so it is contract-pinned instead — on the classic
low/lower/newest/widest corpus from the BPE paper, plus determinism
and the non-increasing-max-count invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from hybrid_cdc_demo_spark.operators.bpe import (
    merges_df,
    pair_counts,
    symbolize,
    train_bpe,
    word_freq_table,
)
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table


@query(
    "ns_bpe_merges",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ), wf AS (
      SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word
    ), pairs AS (
      SELECT word[i] AS a, word[i + 1] AS b, freq
      FROM wf, unnest(generate_series(1, length(word) - 1)) AS t(i)
    ), pc AS (
      SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM pairs GROUP BY a, b
    )
    SELECT CAST(row_number() OVER w AS INT) AS rank, a, b, cnt
    FROM pc
    WINDOW w AS (ORDER BY cnt DESC, a, b)
    QUALIFY row_number() OVER w <= 20
    ORDER BY rank
    """,
)
def ns_bpe_merges(spark, sf_dir):
    """First-iteration BPE merge candidates (top-20 weighted
    adjacent-character pairs), HASH-VERIFIED: certifies the statistics
    reduction the iterative trainer loops over — corpus collapses to
    the word-frequency table in ONE aggregation, pair counts are a
    vocab-sized explode + partial-aggregated sum, top-k is
    TakeOrderedAndProject. Integer counts, lexicographic tiebreaks —
    zero FP surface."""
    docs = load_table(spark, sf_dir, "documents")
    pc = pair_counts(symbolize(word_freq_table(docs)))
    top = pc.orderBy(F.desc("cnt"), "a", "b").limit(20)
    w = Window.orderBy(F.desc("cnt"), "a", "b")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "a", "b", "cnt"
    )


@query("ns_bpe_vocab")  # contract-pinned in tests/test_bpe.py
def ns_bpe_vocab(spark, sf_dir):
    """Six full BPE training iterations on the corpus: per step, the
    vocab-sized pair aggregation + a ONE-row argmax to the driver +
    a map-only higher-order fold applying the merge (localCheckpoint
    keeps k merges at k passes). Inherently iterative — each step's
    input is the previous step's output — so there is no single-SQL
    oracle; the contract test pins the textbook corpus, determinism,
    and the non-increasing max-count invariant, and ns_bpe_merges
    hash-verifies the statistics engine itself."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(
        docs, num_merges=6,
        partitions=4,  # tiny synthetic vocab: scheduling-bound, not compute-bound
    )
    return merges_df(spark, merges).orderBy("step")


@query("ns_bpe_encode")  # contract-pinned in tests/test_bpe.py
def ns_bpe_encode(spark, sf_dir):
    """Train-then-encode: tokenize the whole corpus with the 6 trained
    merges and report per-document whitespace vs BPE token counts —
    the tokens-per-doc accounting that feeds sequence packing.
    Dictionary-encoded (each distinct word encoded once on the
    vocab-sized frame, joined back on the word key), so the fold chain
    cost scales with |vocab|, not corpus tokens. No SQL oracle (the
    merge rules come from the iterative trainer); the contract test
    pins per-word bounds (1 <= bpe tokens <= chars), whitespace-token
    parity with the oracle-backed ns_text_stats surface, spot-checked
    Python-reference encodes, and determinism."""
    from hybrid_cdc_demo_spark.operators.bpe import encode_token_counts

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=6, partitions=4)
    return (
        encode_token_counts(docs, merges)
        .select(
            "doc_id",
            "n_words",
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )
