"""Corpus-curation query registrations: deterministic split, sequence
packing, cross-split contamination — the remaining training-data
pipeline stages (operators/curation.py), each with an exact DuckDB
oracle so the driver hash-checks the full assignment, not just counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.functions import text as T
from hybrid_cdc_demo_spark.functions.masking import scrub_text_pii
from hybrid_cdc_demo_spark.operators import curation as C
from hybrid_cdc_demo_spark.operators.partitioning import spread
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table

# Shared oracle fragment: the hash-split CASE (first hex char of
# sha256(doc_id): 0..c train, d..e val, f test — 13/2/1 of 16).
_SPLIT_CASE = """
    CASE WHEN substr(sha256(CAST(doc_id AS STRING)), 1, 1) <= 'c' THEN 'train'
         WHEN substr(sha256(CAST(doc_id AS STRING)), 1, 1) <= 'e' THEN 'val'
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


@query(
    "ns_weighted_sample",
    oracle="""
    WITH pri AS (
      SELECT doc_id, n_chars,
             CAST(CAST(CONCAT('0x',
               substr(sha256(CAST(doc_id AS STRING)), 1, 15)) AS BIGINT)
               AS DOUBLE) / CAST(n_chars AS DOUBLE) AS p
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ), top AS (
      SELECT doc_id, n_chars, p FROM pri ORDER BY p, doc_id LIMIT 200
    )
    SELECT CAST(row_number() OVER (ORDER BY p, doc_id) AS INT) AS rank,
           doc_id, n_chars
    FROM top ORDER BY rank
    """,
)
def ns_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators.curation.weighted_priority_sample — the priority-
    sampling family): 200 documents selected with probability rising
    in n_chars, priorities derived from sha256(doc_id) so the sample
    is reproducible AND exactly SQL-mirrorable (the priority is one
    IEEE division of bit-identical inputs; division is correctly
    rounded, so both engines order identically). HASH-VERIFIED — and
    the output is all integers, zero float surface. Plan: map-only
    priority + TakeOrderedAndProject per-partition heaps; the rank
    window runs over the already-selected 200 rows."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    top = C.weighted_priority_sample(docs, "n_chars", "doc_id", k=200)
    w = Window.orderBy("_priority", "doc_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        "n_chars",
    ).orderBy("rank")


@query(
    "ns_sample_stratified",
    oracle="""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY sha256(CAST(doc_id AS STRING)), doc_id) AS INTEGER) AS rk
      FROM documents)
    WHERE rk <= 5 ORDER BY lang, rk
    """,
)
def ns_sample_stratified(spark, sf_dir):
    """Deterministic per-language sample (operators.curation.
    stratified_sample): 5 docs per lang by smallest sha256(doc_id) —
    a reproducible uniform draw, hash-checked row-for-row against the
    oracle (df.sample could never be: its output depends on
    partitioning). One shuffle on lang."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        C.stratified_sample(docs, "lang", "doc_id", k=5)
        .select("lang", "doc_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("lang", "rk")
    )


@query(
    "ns_pii_scrub",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS STRING)
                  || '@example.com or +1 (415) 555-01'
                  || lpad(CAST(doc_id % 100 AS STRING), 2, '0')
                  || ' (SSN 123-45-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
                  || ').' AS raw
      FROM documents
    )
    , scrubbed AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<ID>', 'g'),
               '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') AS s
      FROM planted
    )
    SELECT doc_id, sha256(s) AS scrubbed_fp,
           CAST(len(s) - len(regexp_replace(s, '<', '', 'g')) AS INTEGER)
             AS n_redactions
    FROM scrubbed ORDER BY doc_id
    """,
)
def ns_pii_scrub(spark, sf_dir):
    """Free-text PII scrub (functions.masking.scrub_text_pii) over a
    deterministically PII-planted corpus — the synthetic documents
    carry no emails/phones/SSNs, so the query plants one of each per
    doc (derived from doc_id) and the oracle replays the identical
    construction + redaction; the scrubbed-text fingerprint hash-checks
    every replacement byte-for-byte. Chained builtin regexp_replace:
    JVM-side, no UDF, column-pruned scan."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (415) 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" (SSN 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(")."),
    )
    planted = docs.select("doc_id", raw.alias("raw"))
    scrubbed = planted.select(
        "doc_id", scrub_text_pii("raw").alias("s")
    )
    return (
        scrubbed.select(
            "doc_id",
            F.sha2("s", 256).alias("scrubbed_fp"),
            (
                F.length("s") - F.length(F.regexp_replace("s", "<", ""))
            ).cast("int").alias("n_redactions"),
        )
        .orderBy("doc_id")
    )


@query(
    "ns_length_quantiles",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.5)  AS p50,
           quantile_cont(n_chars, 0.9)  AS p90
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def ns_length_quantiles(spark, sf_dir):
    """Per-language document-length quantiles — the distribution stat a
    curation pass reads before setting min/max-length filters. Spark's
    exact `percentile` and DuckDB's `quantile_cont` both interpolate
    lower + frac*(upper-lower) over the sorted values, so the doubles
    hash-match bitwise (verified at sf0.001/sf0.01). At 100 TB swap in
    approx_percentile — same plan shape, sketch-mergeable, no global
    sort; the exact form here is the oracle-checkable ground truth."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.expr("percentile(n_chars, array(0.25, 0.5, 0.9))").alias("_q"))
        .select(
            "lang",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p90"),
        )
        .orderBy("lang")
    )


@query(
    "ns_corpus_pipeline",
    oracle=f"""
    WITH canon AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) rn
        FROM documents) WHERE rn = 1
    ), kept AS (
      SELECT doc_id, {_SPLIT_CASE} AS split,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok
      FROM canon
      WHERE LENGTH(text) >= 100
        AND (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')))
            * 1.0 / LENGTH(text) <= 0.1
    ), packed AS (
      SELECT split, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM kept
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT FLOOR((cum - n_tok) / 256.0)) AS BIGINT) AS n_bins
    FROM packed GROUP BY split ORDER BY split
    """,
)
def ns_corpus_pipeline(spark, sf_dir):
    """The COMPLETE training-data pipeline as one Catalyst plan: exact
    dedup (canonical = min doc_id per text) → quality gates (length +
    punctuation density) → deterministic train/val/test hash split →
    next-fit packing into 256-token bins per split → per-split corpus
    stats. Every stage is the operator already hash-verified in
    isolation; composed, the optimizer pipelines them into three
    shuffles total (dedup window on text, pack window on split, final
    agg reuses the split partitioning). The same plan shape holds at
    100 TB — no stage materializes driver-side state."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    canon = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    kept = (
        canon.filter(
            (T.char_count("text") >= 100) & (T.punct_ratio("text") <= 0.1)
        )
        .select(
            "doc_id", T.bpe_ish_token_count("text").cast("long").alias("n_tok")
        )
    )
    split = C.hash_split(kept, "doc_id")
    packed = C.pack_sequences(
        split, "n_tok", "doc_id", budget=256, partition_col="split"
    )
    return (
        packed.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.countDistinct("bin_id").cast("long").alias("n_bins"),
        )
        .orderBy("split")
    )


@query(
    "ns_dataset_mixture",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source,
             CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 2 = 0
                  THEN 16 ELSE 4 END AS rate
      FROM documents
    )
    SELECT doc_id, source FROM rated
    WHERE substr(sha256(CAST(doc_id AS STRING)), 1, 1)
          < substr('0123456789abcdefg', rate + 1, 1)
    ORDER BY doc_id
    """,
)
def ns_dataset_mixture(spark, sf_dir):
    """Weighted dataset mixture (operators.curation.weighted_mixture):
    even-numbered sources keep every row (rate 16/16), odd-numbered
    sources are downsampled to 4/16 = 25% — the mixture-weights stage
    that upsamples curated sources and downsamples crawl. Selection is
    a deterministic hash gate (narrow projection, zero shuffle, no
    random()), so the oracle hash-checks the exact surviving row set."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(
            F.regexp_extract("source", r"([0-9]+)", 1).cast("int") % 2 == 0,
            F.lit(16),
        )
        .otherwise(F.lit(4))
    )
    return (
        C.weighted_mixture(docs.withColumn("rate", rate), F.col("rate"), "doc_id")
        .filter(F.col("kept"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "ns_doc_chunking",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM documents WHERE doc_id < 200
    ), c AS (
      SELECT doc_id, toks,
             CAST(least(1 + ceil(greatest(len(toks) - 64, 0) / 48.0),
                        ceil(len(toks) / 48.0)) AS INT) AS n_chunks
      FROM t
    )
    SELECT doc_id, CAST(k AS INT) AS chunk_id,
           array_to_string(toks[k*48+1 : k*48+64], ' ') AS chunk_text,
           CAST(len(toks[k*48+1 : k*48+64]) AS BIGINT) AS n_tok
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(0, n_chunks - 1)) AS k
          FROM c)
    ORDER BY doc_id, chunk_id
    """,
)
def ns_doc_chunking(spark, sf_dir):
    """Context-window preparation (operators.curation.chunk_documents):
    64-token chunks at stride 48 (16-token overlap) over normalized
    whitespace tokens; one row per chunk with its text and length.
    Pure per-row higher-order expressions (split → sequence → slice →
    posexplode) — no shuffle, the 100 TB shape; the oracle hash-checks
    every chunk boundary and payload."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        C.chunk_documents(docs, "text", "doc_id", chunk_tokens=64, stride=48)
        .select("doc_id", "chunk_id", "chunk_text", "n_tok")
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "ns_vocabulary",
    oracle="""
    WITH occ AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS n_occ,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM occ GROUP BY tok
    )
    SELECT tok, n_occ, doc_freq FROM freq
    WHERE doc_freq >= 5
    ORDER BY n_occ DESC, tok LIMIT 1000
    """,
)
def ns_vocabulary(spark, sf_dir):
    """Vocabulary building with heavy-hitter ranking: every token's
    total occurrence count and document frequency, floor df ≥ 5 (drop
    hapax noise), ranked by corpus frequency — the stage that builds a
    training vocabulary / frequency table. Plan shape: token explode →
    ONE groupBy computing count + count-distinct together (Expand +
    two-phase aggregate, map-side partials) → TakeOrderedAndProject
    for the head. At 100 TB this is the canonical two-phase aggregate:
    no collect, no global sort, shuffle keyed on the token."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            )
        ).alias("tok"),
    )
    return (
        occ.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= 5)
        .orderBy(F.desc("n_occ"), "tok")
        .limit(1000)
    )


@query(
    "ns_heavy_hitters",
    oracle="""
    WITH occ AS (
      SELECT unnest(string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ FROM occ GROUP BY tok
    )
    SELECT tok, n_occ FROM freq
    WHERE n_occ * 65 > (SELECT COUNT(*) FROM occ)
    ORDER BY n_occ DESC, tok
    """,
)
def ns_heavy_hitters(spark, sf_dir):
    """Frequent tokens above φ = 1/65 of the corpus, via the
    Misra-Gries sketch + exact-verify composition
    (operators/frequency.py): per-partition O(64) summaries generate
    the candidate set, a broadcast semi-join recounts ONLY candidates,
    and the φ threshold is applied to exact counts — so the output is
    EXACT (hash-checked against DuckDB's brute-force frequency table)
    while the shuffle carries candidates instead of the full
    vocabulary. The 100 TB shape for 'what dominates this corpus'."""
    from hybrid_cdc_demo_spark.operators.frequency import heavy_hitters

    # spread BEFORE the explode (r11): the operator no longer
    # repartitions its input (that shuffled every token occurrence);
    # spreading the document rows parallelizes the single-row-group
    # local scan at document granularity and is a no-op on a
    # well-partitioned production input.
    docs = spread(load_table(spark, sf_dir, "documents"))
    occ = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            )
        ).alias("tok")
    )
    return (
        heavy_hitters(occ, "tok", capacity=64, out_item="tok")
        .orderBy(F.desc("n_occ"), "tok")
    )


@query(
    "ns_dataset_card",
    oracle=f"""
    WITH base AS (
      SELECT source,
             {_SPLIT_CASE} AS split,
             len(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
               AS n_tok,
             length(text) AS n_chars,
             sha256(text) AS text_hash,
             CAST(CONCAT('0x', substr(sha256(CONCAT(
               CAST(doc_id AS STRING), ':', COALESCE(text, ''))), 1, 15))
               AS BIGINT) AS fp
      FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text_hash) AS BIGINT) AS n_unique_texts,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) - COUNT(DISTINCT text_hash) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
           CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_tokens,
           bit_xor(fp) AS content_fp
    FROM base
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def ns_dataset_card(spark, sf_dir):
    """Dataset card (operators.curation.dataset_card): the per-
    (source, split) documentation table a training corpus ships with —
    exact volume/dedup/token statistics plus an order-independent
    BIT_XOR content fingerprint drawn from sha256(id:text), the cheap
    "is this exactly the trained-on dataset?" reproducibility check.
    Every stat accumulates in the integer domain with single IEEE
    divisions at the end, and the fingerprint's hex→bigint conversion
    is pinned identical across engines — the whole card hash-matches
    the DuckDB oracle. One narrow projection into one partially-
    aggregated groupBy: no joins, no windows, no driver data."""
    docs = C.hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return C.dataset_card(docs, "doc_id", "text", ["source", "split"])


@query(
    "ns_corpus_shuffle",
    oracle="""
    SELECT doc_id,
           row_number() OVER (
             ORDER BY sha256(CAST(doc_id AS STRING)), doc_id
           ) AS pos
    FROM documents
    ORDER BY doc_id
    """,
)
def ns_corpus_shuffle(spark, sf_dir):
    """Deterministic corpus shuffle for training order, HASH-VERIFIED:
    every document gets its 1-based position in the total order of a
    content-free id hash — shuffle once, write in training order,
    reproducible across runs and engines (rand() is neither). The
    oracle's global row_number() is the one-task formulation Spark
    must not run at scale; the operator is the distributed
    re-expression (operators/partitioning.py:global_rank): range
    exchange + in-partition sort + per-partition counts (≤P rows to
    the driver) + a map-side offset pass. A hash match certifies the
    cross-partition offset stitching exactly."""
    from hybrid_cdc_demo_spark.operators.partitioning import global_rank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ranked = global_rank(
        docs,
        [F.sha2(F.col("doc_id").cast("string"), 256), F.col("doc_id")],
        rank_col="pos",
    )
    return ranked.select("doc_id", "pos").orderBy("doc_id")


@query(
    "ns_training_manifest",
    oracle="""
    WITH flags AS (
      SELECT doc_id,
             COALESCE(starts_with(lead(text) OVER (ORDER BY text, doc_id),
                                  text), FALSE) AS dup
      FROM documents
    ), sig AS (
      SELECT doc_id,
             LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0) AS ln_,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS pr,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS sr
      FROM documents
    ), surv AS (
      SELECT d.doc_id, d.source,
             len(string_split_regex(trim(d.text), '\\s+')) AS n_tok
      FROM documents d
      JOIN flags f ON f.doc_id = d.doc_id
      JOIN sig s ON s.doc_id = d.doc_id
      WHERE NOT f.dup
        AND (-1.4 + 1.0 * s.ln_ + 2.0 * s.pr + 8.0 * s.sr) > 0
    ), pos AS (
      SELECT doc_id, source, n_tok,
             row_number() OVER (
               ORDER BY sha256(CAST(doc_id AS STRING)), doc_id) AS pos
      FROM surv
    ), packed AS (
      SELECT doc_id, source, pos, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY pos) AS cum
      FROM pos
    )
    SELECT doc_id, source, pos,
           CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 512.0) AS BIGINT) AS bin_id
    FROM packed
    ORDER BY doc_id
    """,
)
def ns_training_manifest(spark, sf_dir):
    """End-to-end training-data manifest, HASH-VERIFIED through FOUR
    composed operators: sorted-neighbor prefix dedup (keep maximal
    texts) -> log-odds quality gate -> deterministic corpus shuffle
    (global_rank over the id hash) -> per-source next-fit packing into
    512-token bins. Every stage is the distributed form (range-sort
    successor pass, map-only scoring, bounded-offset enumeration,
    per-source window cumsum) while the oracle runs the plain
    single-node SQL — a hash match certifies the whole pipeline
    composition, not just each stage in isolation."""
    from hybrid_cdc_demo_spark.operators.curation import pack_sequences
    from hybrid_cdc_demo_spark.operators.classifier import score_documents
    from hybrid_cdc_demo_spark.operators.dedup import prefix_duplicate_flags
    from hybrid_cdc_demo_spark.operators.partitioning import global_rank

    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus pass (r10, guide §1.2/§2.4): the quality score and
    # token count are map-only signals, so they are computed BEFORE
    # the dedup pass's range exchange and carried through it — the
    # old shape scanned documents a second time for score_documents
    # and re-attached the flags with a corpus-wide doc_id join. The
    # flags are order-determined facts of (text, doc_id) alone, so
    # the carried bytes change nothing; survivors are the identical
    # NOT-dup AND keep set.
    scored = score_documents(docs).select(
        "doc_id",
        "text",
        "source",
        "keep",
        T.token_count("text").alias("n_tok"),
    )
    surv = (
        prefix_duplicate_flags(
            scored, partitions=8, carry_cols=("source", "keep", "n_tok")
        )
        .filter((F.col("is_prefix_dup") == 0) & F.col("keep"))
        .select("doc_id", "source", "n_tok")
    )
    ranked = global_rank(
        surv,
        [F.sha2(F.col("doc_id").cast("string"), 256), F.col("doc_id")],
        rank_col="pos",
        partitions=8,  # survivor slice is small; scale path leaves None
    )
    packed = pack_sequences(
        ranked, "n_tok", "pos", budget=512, partition_col="source"
    )
    return packed.select("doc_id", "source", "pos", "bin_id").orderBy("doc_id")
