"""Corpus-curation query registrations: deterministic split, sequence
packing, cross-split contamination — the remaining training-data
pipeline stages (operators/curation.py), each with an exact DuckDB
oracle so the driver hash-checks the full assignment, not just counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.functions import text as T
from hybrid_cdc_demo_spark.operators import curation as C
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table

# Shared oracle fragment: the hash-split CASE (first hex char of
# sha256(doc_id): 0..c train, d..e val, f test — 13/2/1 of 16).
_SPLIT_CASE = """
    CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
         WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
         ELSE 'test' END
"""


@query(
    "ns_split_train_val",
    oracle=f"""
    SELECT doc_id, {_SPLIT_CASE} AS split
    FROM documents ORDER BY doc_id
    """,
)
def ns_split_train_val(spark, sf_dir):
    """Deterministic per-document train/val/test assignment
    (operators.curation.hash_split): reproducible across engines by
    construction — the oracle hash-checks every row's assignment.
    No shuffle; the split is a narrow projection."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        C.hash_split(docs, "doc_id")
        .orderBy("doc_id")
        .select("doc_id", "split")
    )


@query(
    "ns_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT source, CAST(FLOOR((cum - n_tok) / 256.0) AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM c GROUP BY source, bin_id ORDER BY source, bin_id
    """,
)
def ns_pack_sequences(spark, sf_dir):
    """Next-fit sequence packing into 256-token bins per source
    (operators.curation.pack_sequences) + per-bin stats. The window
    cumsum and the groupBy share the `source` partitioning, so the
    whole plan is one shuffle; at 100 TB the same shape packs each
    shard independently (never a global ordered window)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        T.bpe_ish_token_count("text").cast("long").alias("n_tok"),
    )
    packed = C.pack_sequences(
        toks, "n_tok", "doc_id", budget=256, partition_col="source"
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@query(
    "ns_contamination",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, {_SPLIT_CASE} AS split,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, split,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 4, 1)),
               i -> array_to_string(toks[i:i+4], ' '))) AS shingles
      FROM sp
    ), tr AS (
      SELECT DISTINCT unnest(shingles) AS g FROM sh WHERE split = 'train'
    ), te AS (
      SELECT doc_id, unnest(shingles) AS g FROM sh WHERE split = 'test'
    )
    SELECT te.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM te JOIN tr ON te.g = tr.g
    GROUP BY te.doc_id ORDER BY te.doc_id
    """,
)
def ns_contamination(spark, sf_dir):
    """Train→test contamination (operators.curation.ngram_contamination):
    distinct word 5-grams of each test doc found anywhere in train —
    the decontamination gate before an eval split is trusted. The
    string-keyed join is the oracle-exact form; the xxhash64-keyed
    variant (8-byte shuffle keys) is the 100 TB form, asserted equal
    in tests/test_curation.py."""
    docs = load_table(spark, sf_dir, "documents")
    split = C.hash_split(docs, "doc_id")
    return C.ngram_contamination(
        split, "text", "doc_id", n=5
    ).orderBy("doc_id")
