"""Tokenizer-induction north-star queries: distributed BPE training
over the documents corpus (operators/bpe.py).

ns_bpe_merges hash-verifies the statistics engine of the trainer (the
weighted adjacent-pair table every iteration argmaxes over) against
DuckDB; ns_bpe_vocab and ns_bpe_encode replay the FULL iterative loop
in GENERATED SQL (round 9): the k training steps unroll as a
MATERIALIZED CTE chain — pair counts, a LIMIT 1 argmax, and the
leftmost-first merge fold expressed as list_reduce over a
list-of-singleton-lists (DuckDB's fold fixes the accumulator type to
the element type, so the VARCHAR[] accumulator rides inside
VARCHAR[][] elements). Zero FP surface end to end — integer counts,
lexicographic tiebreaks, string folds — so the hash match certifies
the whole train(+encode) pipeline bit-for-bit. The textbook-corpus
contract tests in tests/test_bpe.py remain as structural safety nets.
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


def _bpe_chain_sql(num_merges: int) -> str:
    """Shared CTE prelude for the generated BPE oracles: word-freq
    table → char symbolization → ``num_merges`` unrolled training
    steps. Each step is (pair counts, LIMIT-1 argmax m{i}, merge fold
    sym{i}); the fold mirrors operators/bpe.py:merge_pair_expr's
    leftmost-first non-overlapping semantics exactly. MATERIALIZED is
    load-bearing (each sym{i} is referenced twice; inlining would
    re-evaluate the chain exponentially)."""
    head = """
    WITH words AS MATERIALIZED (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ), wf AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word
    ), sym0 AS MATERIALIZED (
      SELECT word, freq,
             list_transform(generate_series(1, length(word)), i -> word[i]) AS sym
      FROM wf
    )"""
    parts = [head]
    for i in range(1, num_merges + 1):
        parts.append(
            f""",
    pc{i} AS MATERIALIZED (
      SELECT s.sym[j] AS a, s.sym[j + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM sym{i - 1} s, unnest(generate_series(1, len(s.sym) - 1)) AS t(j)
      GROUP BY 1, 2
    ), m{i} AS MATERIALIZED (
      SELECT a, b, a || b AS merged, cnt
      FROM pc{i} ORDER BY cnt DESC, a, b LIMIT 1
    ), sym{i} AS MATERIALIZED (
      SELECT s.word, s.freq,
             list_reduce(
               list_prepend(CAST([] AS VARCHAR[]),
                            list_transform(s.sym, t -> [t])),
               (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a
                                     AND x[1] = m.b
                           THEN list_append(acc[1:len(acc) - 1], m.merged)
                           ELSE list_append(acc, x[1]) END
             ) AS sym
      FROM sym{i - 1} s CROSS JOIN m{i} m
    )"""
        )
    return "".join(parts)


def _bpe_vocab_oracle_sql(num_merges: int = 6) -> str:
    hist = " UNION ALL ".join(
        f'SELECT CAST({i} AS INT) AS step, a AS "left", b AS "right", '
        f"merged, cnt FROM m{i}"
        for i in range(1, num_merges + 1)
    )
    return (
        _bpe_chain_sql(num_merges)
        + f"\n    SELECT * FROM ({hist}) ORDER BY step"
    )


def _bpe_encode_oracle_sql(num_merges: int = 6) -> str:
    k = num_merges
    return (
        _bpe_chain_sql(k)
        + f""",
    docwords AS MATERIALIZED (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    )
    SELECT d.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(len(s.sym)) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, word FROM docwords WHERE word <> '') d
    JOIN sym{k} s USING (word)
    GROUP BY d.doc_id
    ORDER BY d.doc_id"""
    )


@query("ns_bpe_vocab", oracle=_bpe_vocab_oracle_sql(num_merges=6))
def ns_bpe_vocab(spark, sf_dir):
    """Six full BPE training iterations on the corpus: per step, the
    vocab-sized pair aggregation + a ONE-row argmax to the driver +
    a map-only higher-order fold applying the merge (localCheckpoint
    keeps k merges at k passes). HASH-VERIFIED against a GENERATED
    DuckDB oracle replaying the identical six steps as unrolled CTEs
    (_bpe_vocab_oracle_sql) — integer counts and lexicographic
    tiebreaks mean zero FP surface; the textbook-corpus contract test
    in tests/test_bpe.py remains as the structural safety net."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(
        docs, num_merges=6,
        partitions=4,  # tiny synthetic vocab: scheduling-bound, not compute-bound
    )
    return merges_df(spark, merges).orderBy("step")


@query("ns_bpe_encode", oracle=_bpe_encode_oracle_sql(num_merges=6))
def ns_bpe_encode(spark, sf_dir):
    """Train-then-encode: tokenize the whole corpus with the 6 trained
    merges and report per-document whitespace vs BPE token counts —
    the tokens-per-doc accounting that feeds sequence packing.
    Dictionary-encoded (each distinct word encoded once on the
    vocab-sized frame, joined back on the word key), so the fold chain
    cost scales with |vocab|, not corpus tokens. HASH-VERIFIED against
    a GENERATED DuckDB oracle that replays the training chain AND the
    dictionary-encoded tokenization (_bpe_encode_oracle_sql) — all
    integers, so the match is bit-for-bit; the contract test keeps the
    per-word bounds, whitespace parity, and Python-reference encodes
    as structural safety nets."""
    from hybrid_cdc_demo_spark.operators.bpe import (
        doc_word_counts,
        encode_token_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus scan + explode for the whole train+encode composition
    # (r11): the checkpointed (doc_id, word, cnt) frame feeds
    # training's word-freq table (sum of exact integer partials), the
    # vocab-distinct encode branch, and the per-doc re-aggregation —
    # before, each of the three re-ran the corpus explode.
    wdc = doc_word_counts(docs)
    wf = wdc.groupBy("word").agg(F.sum("cnt").alias("freq"))
    merges = train_bpe(docs, num_merges=6, partitions=4, word_freq=wf)
    return (
        encode_token_counts(docs, merges, word_counts=wdc)
        .select(
            "doc_id",
            "n_words",
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )
