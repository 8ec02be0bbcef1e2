"""North-star training-data-pipeline queries (SURVEY.md §2c Q25-Q27
extensions): dedup family, similarity search, text analysis,
multimodal plumbing — registered into the same QUERIES/ORACLE_SQL
contract as the relational inventory.

Oracle-checked where DuckDB can express the exact computation;
LSH/heuristic operators are rows-only here and property-tested against
exact baselines in tests/.

Ratio outputs are deliberately *unrounded*: p/q in IEEE double is
correctly-rounded division in both engines (bitwise equal), whereas
ROUND() on a near-boundary double can diverge (see catalog.q21 note).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.functions import text as T
from hybrid_cdc_demo_spark.operators import dedup as D
from hybrid_cdc_demo_spark.operators import similarity as S
from hybrid_cdc_demo_spark.operators.multimodal import documents_as_media, extract_features
from hybrid_cdc_demo_spark.operators.partitioning import spread
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table


@query(
    "ns_dedup_exact",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text ORDER BY canonical_id
    """,
)
def ns_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_canonical(docs, "text", "doc_id").orderBy("canonical_id")


@query("ns_dedup_minhash")  # property-tested vs exact Jaccard in tests/
def ns_dedup_minhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup(
        docs, "text", "doc_id", num_hashes=32, bands=16, threshold=0.5
    ).orderBy("id_a", "id_b")


@query("ns_dedup_simhash")
def ns_dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fps = D.simhash(docs, "text", "doc_id")
    return D.simhash_candidates(fps, max_hamming=10).orderBy("id_a", "id_b")


@query("ns_dedup_bucket_coverage")
def ns_dedup_bucket_coverage(spark, sf_dir):
    """LSH skew-guard coverage report (no-silent-caps): how many
    candidate buckets the minhash and simhash ``max_bucket`` guards
    would drop over the documents corpus, and how many candidate
    pairs that suppresses — the number a 100 TB run reads to decide
    whether boilerplate skew is costing real dedup recall. One row of
    scalar counters (guard threshold 200, the operators' default)."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus scan for BOTH fingerprint families (r11; previously
    # each branch re-read and re-tokenized the corpus): the MinHash
    # signature expression and the SimHash token hashes ride the same
    # projection, the Arrow fold carries the signature through, and
    # the folded frame (id + 32 longs + 1 long — fingerprint-sized,
    # never text) is checkpointed for the two band explodes. Both
    # families' bucket counts are value-identical to the two-scan
    # shape (same expressions, same fold — pinned in tests).
    both = D.simhash_fold_arrow(
        spread(docs).select(
            F.col("doc_id").alias("_id"),
            D.minhash_signature_expr("text", num_hashes=32).alias(
                "signature"
            ),
            D.simhash_token_hashes("text").alias("_hs"),
        ),
        "bigint",
        passthrough=(("signature", "array<bigint>"),),
    ).localCheckpoint(eager=False)
    mh_sizes = (
        D.band_rows(both.select("_id", "signature"), 16)
        .groupBy("band", "band_hash")
        .agg(F.count("*").alias("n"))
    )
    mh = D.bucket_coverage(mh_sizes, 200).select(
        F.col("buckets_total").alias("minhash_buckets_total"),
        F.col("buckets_dropped").alias("minhash_buckets_dropped"),
        F.col("pairs_suppressed").alias("minhash_pairs_suppressed"),
    )
    sh_sizes = (
        D.simhash_bands(both.select("_id", "simhash"))
        .groupBy("band", "band_val")
        .agg(F.count("*").alias("n"))
    )
    sh = D.bucket_coverage(sh_sizes, 200).select(
        F.col("buckets_total").alias("simhash_buckets_total"),
        F.col("buckets_dropped").alias("simhash_buckets_dropped"),
        F.col("pairs_suppressed").alias("simhash_pairs_suppressed"),
    )
    return mh.crossJoin(sh)


@query(
    "ns_dedup_ngram_jaccard",
    oracle="""
    WITH norm AS (
      SELECT doc_id AS id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id < 100
    ), grams AS (
      SELECT id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(t) - 2, 1)),
               i -> substring(t, i, 3))) AS gs
      FROM norm
    ), inv AS (
      SELECT id, unnest(gs) AS g FROM grams
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.s + sb.s - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN (SELECT id, len(gs) AS s FROM grams) sa ON sa.id = id_a
    JOIN (SELECT id, len(gs) AS s FROM grams) sb ON sb.id = id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.s + sb.s - i AS DOUBLE) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def ns_dedup_ngram(spark, sf_dir):
    """Exact char-trigram Jaccard pairs over a bounded slice (the
    inverted-index join is exact; at scale it runs on LSH candidates,
    not all-pairs — see operators.dedup.minhash_lsh_dedup). Unrounded
    quotient: int/int double division is bitwise-equal across engines,
    ROUND() on a boundary double is not."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, round_digits=None
    ).orderBy("id_a", "id_b")


@query(
    "ns_dedup_clusters",
    oracle="""
    WITH RECURSIVE norm AS (
      SELECT doc_id AS id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id < 100
    ), grams AS (
      SELECT id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(t) - 2, 1)),
               i -> substring(t, i, 3))) AS gs
      FROM norm
    ), inv AS (
      SELECT id, unnest(gs) AS g FROM grams
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      GROUP BY a.id, b.id
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN (SELECT id, len(gs) AS s FROM grams) sa ON sa.id = id_a
      JOIN (SELECT id, len(gs) AS s FROM grams) sb ON sb.id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.s + sb.s - i AS DOUBLE) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(id, reach) AS (
      SELECT id, id FROM norm
      UNION
      SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ), comp AS (
      SELECT id, MIN(reach) AS component FROM walk GROUP BY id
    )
    SELECT id AS doc_id,
           CAST(component AS BIGINT) AS component,
           COUNT(*) OVER (PARTITION BY component) AS cluster_size
    FROM comp ORDER BY doc_id
    """,
)
def ns_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS, hash-verified: the exact trigram-Jaccard
    pairs (the already-oracle-checked ns_dedup_ngram_jaccard edge set)
    closed under transitivity via min-label-propagation connected
    components (operators.dedup.connected_components), vs DuckDB's
    recursive-CTE transitive closure. Pairs alone under-delete when
    A~B~C but A!~C; this is the grouping stage every production dedup
    pipeline runs before picking one canonical doc per cluster."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, round_digits=None
    )
    comp = D.connected_components(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    )
    w = Window.partitionBy("component")
    return (
        comp.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


@query(
    "ns_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars_m,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
           CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
             / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
             / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS stop_ratio
    FROM documents ORDER BY doc_id
    """,
)
def ns_text_stats(spark, sf_dir):
    """Quality-scoring raw signals: char/token counts, punctuation and
    stopword ratios — all builtin string/array expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.orderBy("doc_id").select(
        "doc_id",
        T.char_count("text").alias("n_chars_m"),
        T.token_count("text").alias("n_tokens"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.stopword_ratio("text").alias("stop_ratio"),
    )


@query(
    "ns_text_quality",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             CAST(LENGTH(text) AS DOUBLE) AS n,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS pr,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS sr
      FROM documents
    )
    SELECT doc_id,
           (LEAST(n / 200.0, 1.0)
            + (1.0 - LEAST(pr * 5, 1.0))
            + (1.0 - LEAST(ABS(sr - 0.4), 1.0))) / 3 AS quality
    FROM sig ORDER BY doc_id
    """,
)
def ns_text_quality(spark, sf_dir):
    """Composite quality score — pure IEEE arithmetic over the
    oracle-verified ns_text_stats signals, emitted unrounded so the
    doubles are bitwise-reproducible in ANSI SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.orderBy("doc_id").select(
        "doc_id", T.quality_score("text", round_digits=None).alias("quality")
    )


@query(
    "ns_text_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def ns_text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.orderBy("doc_id").select(
        "doc_id", T.fingerprint("text").alias("fp")
    )


@query("ns_text_langid")  # heuristic — validated against the lang column in tests/
def ns_text_langid(spark, sf_dir):
    # spread: single-row-group local parquet scans as ONE partition;
    # a no-op on production inputs with many row groups
    docs = spread(load_table(spark, sf_dir, "documents"))
    # project BEFORE the sort: the n-gram scoring then runs in the
    # spread 32-partition stage; sorting 2 output columns is cheap
    return docs.select(
        "doc_id", T.lang_id("text").alias("lang_pred")
    ).orderBy("doc_id")


@query(
    "ns_tokens_bpeish",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def ns_tokens_bpeish(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.orderBy("doc_id").select(
        "doc_id", T.bpe_ish_token_count("text").alias("n_bpe_tokens")
    )


@query(
    "ns_corpus_curation",
    oracle="""
    WITH canon AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) rn
        FROM documents) WHERE rn = 1
    ), scored AS (
      SELECT lang,
             LENGTH(text) AS n_chars,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')))
               * 1.0 / LENGTH(text) AS punct_ratio
      FROM canon
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM scored
    WHERE n_chars >= 100 AND punct_ratio <= 0.1
    GROUP BY lang ORDER BY lang
    """,
)
def ns_corpus_curation(spark, sf_dir):
    """The composite training-data pipeline in one plan: exact dedup
    (canonical = min doc_id per text), quality gates (length +
    punctuation density), per-language corpus stats. Every stage is
    the operator already verified individually; the composition stays
    one Catalyst plan — dedup window, filter, and agg pipeline into
    two shuffles total."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    canon = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    scored = canon.select(
        "lang",
        T.char_count("text").alias("n_chars"),
        T.token_count("text").cast("long").alias("n_tokens"),
        T.punct_ratio("text").alias("punct_ratio"),
    )
    return (
        scored.filter((F.col("n_chars") >= 100) & (F.col("punct_ratio") <= 0.1))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "ns_corpus_mix",
    oracle="""
    WITH sig AS (
      SELECT doc_id, lang,
             CAST(LENGTH(text) AS DOUBLE) AS n,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS pr,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS sr
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             (LEAST(n / 200.0, 1.0)
              + (1.0 - LEAST(pr * 5, 1.0))
              + (1.0 - LEAST(ABS(sr - 0.4), 1.0))) / 3 AS quality
      FROM sig
    ), ranked AS (
      SELECT doc_id, lang, quality,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS INTEGER) AS rk
      FROM scored
    )
    SELECT doc_id, lang, quality, rk
    FROM ranked WHERE rk <= 20 ORDER BY lang, rk
    """,
)
def ns_corpus_mix(spark, sf_dir):
    """Stratified corpus sampling for training-data mixing: top-20
    docs per language by quality score — the per-stratum window rank
    is exactly how a production mix selects its best docs per source/
    language bucket. Ordering key is the UNROUNDED quality double
    (already bitwise-verified by ns_text_quality), tie-broken by
    doc_id, so both engines rank identically. One shuffle
    (partitionBy lang); at 100 TB the same plan holds — rank within
    partition never materializes the full sorted corpus."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            T.quality_score("text", round_digits=None).alias("quality"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .orderBy("lang", "rk")
    )


@query(
    "ns_vocab_topk",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
      FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token LIMIT 100
    """,
)
def ns_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-k (tokenizer/vocab-building stat): explode
    normalized tokens → count → top 100. Catalyst plans this as
    partial (map-side) aggregation + one shuffle on token +
    TakeOrdered — the canonical word-count shape that scales linearly;
    skewed head tokens are absorbed by the map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(T.normalized_text("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(100)
    )


@query(
    "ns_source_mix",
    oracle="""
    WITH per AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE) / CAST(SUM(total_tokens) OVER () AS DOUBLE) AS token_share
    FROM per ORDER BY source, lang
    """,
)
def ns_source_mix(spark, sf_dir):
    """Training-mix weights: per (source, language) doc/token counts
    and each cell's share of total tokens — the table a data-mixing
    config is written from. The unbounded window runs on the already-
    aggregated (source × lang) frame — a few rows, not the corpus —
    so the global-sum window is safe at any scale. token_share is an
    unrounded long/long→double quotient (bitwise-identical across
    engines)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text").cast("long")).alias("total_tokens"),
    )
    w = Window.partitionBy()
    return per.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        (
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(w).cast("double")
        ).alias("token_share"),
    ).orderBy("source", "lang")


@query("ns_simsearch_lsh")  # recall-tested vs brute force in tests/
def ns_simsearch_lsh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # min-id row via one TakeOrderedAndProject scan (r11): the old
    # agg-then-join extraction scanned embeddings twice just to find
    # the query vector (vec_id is unique — identical result).
    qdf = emb_d.orderBy("vec_id").limit(1).select(F.col("emb").alias("qv"))
    out = S.lsh_topk(
        emb, qdf, k=10, num_planes=8, multiprobe_bits=1
    )
    return out.select("vec_id", F.round("score", 4).alias("score"))


def _ivf_cache_root() -> str:
    """User-private cache root for persisted IVF indexes. Overridable
    via SPARK_GRAFT_IVF_DIR; the default is a per-uid mode-0700 dir so
    a world-shared tempdir path can't be pre-created/poisoned by
    another user on a shared machine."""
    import os
    import tempfile

    root = os.environ.get("SPARK_GRAFT_IVF_DIR") or os.path.join(
        tempfile.gettempdir(), f"hybrid-cdc-demo-spark-ivf-{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    os.chmod(root, 0o700)
    return root


def corpus_fingerprint(sf_dir: str, table: str = "embeddings") -> str:
    """Cheap content fingerprint of the corpus parquet (relative file
    names + sizes + mtimes). Stored in centroids.json so a regenerated
    corpus at the same path invalidates the index instead of silently
    serving stale top-k results."""
    import hashlib
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs
            if not f.startswith(("_", "."))
        )
    else:
        files = [path]
    h = hashlib.sha256()
    for f in files:
        st = os.stat(f)
        h.update(
            f"{os.path.relpath(f, path)}:{st.st_size}:{st.st_mtime_ns};".encode()
        )
    return h.hexdigest()[:16]


def ivf_index_path(sf_dir: str, num_cells: int = 16, seed: int = 42) -> str:
    """Deterministic per-corpus location for the persisted IVF index
    (build-once; queries reuse it across invocations)."""
    import hashlib
    import os

    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(_ivf_cache_root(), f"{key}-c{num_cells}-s{seed}")


def ensure_ivf_index(spark, sf_dir: str, num_cells: int = 16, seed: int = 42) -> str:
    """Build the persisted IVF index if absent OR stale (the warmup /
    one-time index job); no-op when the stored corpus fingerprint still
    matches the parquet on disk. Rebuild-on-mismatch is asserted in
    tests/test_ivf.py::test_stale_index_rebuilt_on_corpus_change."""
    import json
    import os

    path = ivf_index_path(sf_dir, num_cells, seed)
    fp = corpus_fingerprint(sf_dir)
    meta_path = os.path.join(path, "centroids.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("corpus_fingerprint") == fp:
            return path
    emb = load_table(spark, sf_dir, "embeddings")
    S.ivf_write(
        emb,
        path,
        num_cells=num_cells,
        seed=seed,
        extra_meta={"corpus_fingerprint": fp},
    )
    return path


def ensure_ivf_sq8_index(spark, sf_dir: str, num_cells: int = 16, seed: int = 42) -> str:
    """Build the persisted SQ8-quantized IVF index if absent or stale
    (same fingerprint protocol as ensure_ivf_index; separate cache
    subdir so both precision variants coexist)."""
    import json
    import os

    path = ivf_index_path(sf_dir, num_cells, seed) + "-sq8"
    fp = corpus_fingerprint(sf_dir)
    meta_path = os.path.join(path, "centroids.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("quantized") and meta.get("corpus_fingerprint") == fp:
            return path
    emb = load_table(spark, sf_dir, "embeddings")
    S.ivf_write_sq8(
        emb,
        path,
        num_cells=num_cells,
        seed=seed,
        extra_meta={"corpus_fingerprint": fp},
    )
    return path


@query("ns_simsearch_ivf_sq8")  # pinned: equals the full-precision probe
def ns_simsearch_ivf_sq8(spark, sf_dir):
    """IVF-SQ8 (public FAISS architecture): the persisted index stores
    int8 codes (4x less probe I/O than float32; 8x less than doubles),
    the probe scores CODES (cosine is scale-invariant so codes need no
    dequantization), and a k*4 shortlist re-ranks on full-precision
    vectors joined by id — both stores partition-pruned to the probed
    cells. Pinned contract: the result equals the full-precision
    ns_simsearch_ivf probe at the same cells/seed/nprobe
    (tests/test_query_contracts.py::test_ns_simsearch_ivf_sq8_pinned)."""
    path = ensure_ivf_sq8_index(spark, sf_dir, num_cells=16, seed=42)
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # min-id row via one TakeOrderedAndProject scan (r11): the old
    # agg-then-join extraction scanned embeddings twice just to find
    # the query vector (vec_id is unique — identical result).
    qdf = emb_d.orderBy("vec_id").limit(1).select(F.col("emb").alias("qv"))
    out = S.ivf_topk_sq8(spark, path, qdf, k=10, nprobe=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


@query("ns_simsearch_ivf")  # recall-tested vs brute force in tests/
def ns_simsearch_ivf(spark, sf_dir):
    """IVF scale path, persisted-index form: the corpus is clustered
    ONCE into partitionBy(_cell) parquet (ensure_ivf_index — the bench
    warmup builds it untimed, exactly like a production index job);
    each query then probes the nprobe nearest cells through partition
    pruning, so per-query cost excludes the index build. nprobe=10/16
    holds recall >= 0.9 even on the isotropic synthetic embeddings
    (tests/test_ivf.py::test_persisted_recall_vs_brute_force)."""
    path = ensure_ivf_index(spark, sf_dir, num_cells=16, seed=42)
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # min-id row via one TakeOrderedAndProject scan (r11): the old
    # agg-then-join extraction scanned embeddings twice just to find
    # the query vector (vec_id is unique — identical result).
    qdf = emb_d.orderBy("vec_id").limit(1).select(F.col("emb").alias("qv"))
    out = S.ivf_topk_persisted(spark, path, qdf, k=10, nprobe=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


@query(
    "ns_simsearch_ivf_fullprobe",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    scored AS (
      SELECT e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qv, q.qv))) AS raw_score
      FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, ROUND(raw_score, 4) AS score
    FROM scored ORDER BY raw_score DESC, vec_id LIMIT 10
    """,
)
def ns_simsearch_ivf_fullprobe(spark, sf_dir):
    """Persisted-IVF read path, HASH-VERIFIED: probing every cell
    (nprobe == num_cells) degrades IVF gracefully to exact search, so
    the result must equal brute-force cosine top-k — the same DuckDB
    oracle as q27. This pins the whole persisted path (ivf_write
    round-trip, sidecar centroids, _cell partition scan, in-cell
    ranking) to an exact ground truth, complementing the recall-based
    tests of the approximate nprobe<cells configuration."""
    path = ensure_ivf_index(spark, sf_dir, num_cells=16, seed=42)
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # min-id row via one TakeOrderedAndProject scan (r11): the old
    # agg-then-join extraction scanned embeddings twice just to find
    # the query vector (vec_id is unique — identical result).
    qdf = emb_d.orderBy("vec_id").limit(1).select(F.col("emb").alias("qv"))
    out = S.ivf_topk_persisted(spark, path, qdf, k=10, nprobe=16)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def _neardup_oracle(
    dim: int = 64,
    num_planes: int = 12,
    seed: int = 42,
    threshold: float = 0.8,
    max_bucket: int = 500,
) -> str:
    """GENERATED DuckDB mirror of the full SRP-LSH near-dup pipeline
    (r9 VERDICT #6 conversion — previously PINNED_NO_ORACLE). The SRP
    hyperplanes are seeded (operators/similarity.py:hyperplanes, fixed
    default_rng(42)), so the entire algorithm — sign-bit bucket id,
    max_bucket skew guard, within-bucket pairing, exact-cosine verify
    — is deterministic and mirrorable: the planes are injected as
    double literals (shortest-repr + ::DOUBLE, the bitwise-exact
    round-trip nested_double_lit uses on the engine side) and the
    EMITTED cosines use the same strict left fold in index order as
    Spark's F.aggregate, so the result agrees bitwise at ANY sf. Valid
    for 64-dim corpora (the testdata's embedding width at every SF;
    the engine side reads dim from data, the generated SQL fixes it).

    Two-stage cost structure (the SemDeDup-oracle lesson — a naive
    all-fold mirror took 468 s at 20k vectors because DuckDB lambda
    folds cost ~0.5 ms each): the n×num_planes bucket dots and a
    candidate-pair prefilter use list_dot_product (vectorized, 1300×
    faster; sign/bucket agreement verified 0 diffs on 20k rows — the
    fold and the pairwise sum differ by ~1e-15 relative, so a flipped
    sign needs |dot| at the rounding floor), with a 0.01 prefilter
    margin that no FP-order discrepancy can cross; only the surviving
    few candidates pay the bitwise-exact fold that produces the
    emitted value and the final threshold test."""
    from hybrid_cdc_demo_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, num_planes, seed)

    def lst(vals) -> str:
        return "[" + ", ".join(f"'{float(x)!r}'::DOUBLE" for x in vals) + "]"

    def fold_dot(vec: str, arr: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform({vec}, "
            f"(x,i) -> x * {arr}[i])), (a,b) -> a + b)"
        )

    bits = " + ".join(
        f"(CASE WHEN list_dot_product(e, {lst(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos_fast = (
        "list_dot_product(a.e, p.e) / "
        "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(p.e, p.e)))"
    )
    cos_exact = (
        f"ROUND({fold_dot('e_a', 'e_b')} / "
        f"(sqrt({fold_dot('e_a', 'e_a')}) * sqrt({fold_dot('e_b', 'e_b')})), 4)"
    )
    return f"""
    WITH v AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    bk AS (
      SELECT id, e, ({bits}) AS bucket FROM v
    ),
    ok AS (
      SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= {max_bucket}
    ),
    cand AS (
      -- pairs are unique by construction (one bucket row per id);
      -- Spark's .distinct() is mirrored on the final select
      SELECT a.id AS id_a, p.id AS id_b, a.e AS e_a, p.e AS e_b
      FROM bk a JOIN ok USING (bucket) JOIN bk p USING (bucket)
      WHERE a.id < p.id AND {cos_fast} >= {threshold} - 0.01
    )
    SELECT DISTINCT id_a, id_b, cos FROM (
      SELECT id_a, id_b, {cos_exact} AS cos FROM cand
    ) WHERE cos >= {threshold}
    ORDER BY id_a, id_b
    """


@query("ns_embedding_neardup", oracle=_neardup_oracle())
def ns_embedding_neardup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_neardup_pairs(emb, threshold=0.8).orderBy("id_a", "id_b")


@query(
    "ns_embedding_neardup_exact",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 300
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e))
              * sqrt(list_dot_product(b.e, b.e))) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= 0.3
    ORDER BY id_a, id_b
    """,
)
def ns_embedding_neardup_exact(spark, sf_dir):
    """Exact all-pairs cosine near-dup on a bounded id slice,
    HASH-VERIFIED against DuckDB — the exact ground truth the
    SRP-bucketed ns_embedding_neardup approximates. The slice bounds
    the O(n²) pair space (the 100 TB shape runs this same exact
    scoring only on LSH candidate pairs, operators/similarity.py
    embedding_neardup_pairs); both engines left-fold the double dot
    products, so the UNROUNDED quotient is bitwise-identical
    (empirically 0 of 44,850 pair scores differ)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).withColumn(
        # self-norm per vector (r10): the pair scan then folds one
        # cross dot per pair instead of three — same expression tree
        # as S.cosine, so the unrounded quotient stays bitwise-equal
        "n", S.norm_col(F.col("e"))
    )
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("n").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("n").alias("nb"),
    )
    cos = S.cosine_with_norms(
        F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= 0.3)
        .orderBy("id_a", "id_b")
    )


@query("ns_multimodal_features")
def ns_multimodal_features(spark, sf_dir):
    """Binary-column decode/feature plumbing via Arrow mapInPandas
    (deterministic fake codec; real codecs are stubbed out)."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    feats = extract_features(media, fake=True)
    return feats.orderBy("media_id").select(
        "media_id", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0")
    )


@query(
    "ns_multimodal_headers",
    oracle="""
    SELECT doc_id AS media_id, 'png' AS format,
           CAST(doc_id % 640 + 1 AS BIGINT) AS width,
           CAST(doc_id % 480 + 1 AS BIGINT) AS height
    FROM documents ORDER BY media_id
    """,
)
def ns_multimodal_headers(spark, sf_dir):
    """Media header sniffing with NOTHING stubbed: real PNG IHDR bytes
    are constructed per row with pure Spark expressions (hex→unhex
    yields the big-endian dimension words; signature/IHDR framing per
    the PNG spec), and operators.multimodal.parse_media_headers reads
    the container back byte-level via Arrow mapInPandas — the
    object-store ingest step that types and sizes media before any
    pixel decode. The oracle replays the generator arithmetic, so a
    hash match proves the parser inverts the spec encoding exactly;
    GIF/BMP/JPEG/WAV legs + corrupt-input classification are pinned in
    tests/test_multimodal.py."""
    from hybrid_cdc_demo_spark.operators.multimodal import parse_media_headers

    docs = load_table(spark, sf_dir, "documents")
    be32 = lambda col: F.unhex(F.lpad(F.hex(col), 8, "0"))  # noqa: E731
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),          # signature
        F.lit(b"\x00\x00\x00\x0dIHDR"),       # IHDR length=13 + type
        be32(F.col("doc_id") % 640 + 1),       # width (BE u32)
        be32(F.col("doc_id") % 480 + 1),       # height (BE u32)
        F.lit(b"\x08\x06\x00\x00\x00"),       # bit depth/color/etc
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("image/png").alias("mime_type"),
        png.alias("content"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return (
        parse_media_headers(media)
        .select("media_id", "format", "width", "height")
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# Repetition / novelty quality filters + embedding quantization
# ---------------------------------------------------------------------------


@query(
    "ns_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), b AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bigrams
      FROM w
    )
    SELECT doc_id,
           CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS dup_word_frac,
           CAST(list_max(list_transform(list_distinct(toks),
                  d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS top_word_frac,
           CASE WHEN len(bigrams) = 0 THEN 0.0
                ELSE CAST(len(bigrams) - len(list_distinct(bigrams)) AS DOUBLE)
                     / CAST(len(bigrams) AS DOUBLE) END AS dup_bigram_frac
    FROM b ORDER BY doc_id
    """,
)
def ns_repetition(spark, sf_dir):
    """Within-document repetition signals (the public Gopher/MassiveText
    quality-rule family): duplicate-word fraction, most-frequent-word
    fraction, duplicate-bigram fraction. Pure per-row array
    expressions — zero shuffles, zero UDFs, embarrassingly parallel at
    any corpus size; ratios emitted unrounded (single IEEE divisions,
    bitwise-equal across engines). The token array is projected ONCE
    and the three signals read the materialized column — tokenizing
    per-signal would re-split the text three times."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", T.words_lower("text").alias("w"))
        .select(
            "doc_id",
            T.dup_frac(F.col("w")).alias("dup_word_frac"),
            T.max_run_frac(F.col("w")).alias("top_word_frac"),
            T.dup_frac(T.ngram_array(F.col("w"), 2)).alias("dup_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "ns_ngram_novelty",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM w
    ), a AS (
      SELECT doc_id, gram,
             MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
      FROM g
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM a GROUP BY doc_id ORDER BY doc_id
    """,
)
def ns_ngram_novelty(spark, sf_dir):
    """Cross-document n-gram novelty: per document, the fraction of its
    distinct word trigrams that FIRST appear in it (min doc_id over the
    corpus) — the inverted-index cousin of dedup, used to score how
    much new text a document adds to a corpus. Scale shape: one
    shuffle on gram for the window-min (the canonical inverted-index
    build; partial map-side dedup via array_distinct BEFORE the
    explode keeps the shuffled stream at distinct-grams-per-doc), one
    shuffle for the per-doc regroup. novelty = int-sum / int-count in
    one IEEE division — hash-exact."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", T.words_lower("text").alias("w")).select(
        "doc_id",
        F.explode(F.array_distinct(T.ngram_array(F.col("w"), 3))).alias("gram"),
    )
    from pyspark.sql import Window

    first = F.min("doc_id").over(Window.partitionBy("gram"))
    return (
        grams.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            (
                F.sum(
                    F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@query(
    "ns_embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e
    )
    SELECT vec_id, scale,
           CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(list_sum(list_transform(v,
                       x -> CAST(floor(x / scale) AS BIGINT))) AS BIGINT)
           END AS qsum
    FROM s ORDER BY vec_id
    """,
)
def ns_embedding_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column (the standard
    ANN memory-compression step: per-vector scale = max|x|/127, code =
    floor(x/scale)). Per-row transform/aggregate only — no shuffle, no
    UDF; at 100 TB this is the map stage that shrinks a float32 vector
    store 4× before indexing. Verified exactly: scale is one IEEE
    division of a float-widened max, codes use floor (identical in
    both engines, unlike round's half-up vs half-even), and the
    checksum is an integer fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    df = emb.select("vec_id", v.alias("v")).withColumn(
        "scale",
        F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0),
    )
    qsum = F.aggregate(
        F.transform("v", lambda x: F.floor(x / F.col("scale"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        df.select(
            "vec_id",
            "scale",
            F.when(F.col("scale") == 0, F.lit(0).cast("long"))
            .otherwise(qsum)
            .alias("qsum"),
        )
        .orderBy("vec_id")
    )


@query(
    "ns_group_normalize",
    oracle="""
    WITH b AS (
      SELECT user_id, event_id, value,
             MIN(value) OVER (PARTITION BY user_id) AS mn,
             MAX(value) OVER (PARTITION BY user_id) AS mx
      FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN mx = mn THEN 0.0
                ELSE (value - mn) / (mx - mn) END AS value_norm
    FROM b ORDER BY user_id, event_id
    """,
)
def ns_group_normalize(spark, sf_dir):
    """Per-group feature normalization via grouped-map applyInPandas —
    the third leg of the declared UDF surface (SURVEY.md §2d: scalar
    pandas_udf = HMAC, applyInPandasWithState = running totals,
    mapInPandas = frame/media decode, grouped-map = this). Min-max
    scaling is deliberately chosen over z-score because min/max + one
    IEEE division is bitwise-reproducible against the SQL oracle
    (stddev accumulation order is not).

    Dispatch is BUCKETED: grouping directly on user_id ships ~1.5k
    tiny groups through Arrow, and per-group (pandas frame build +
    Python call) overhead dominated the runtime 10× over the window
    formulation (measured 6.7 s vs 0.66 s at sf0.1 — PERF.md #8).
    Grouping on pmod(xxhash64(user_id), 64) instead gives 64 large
    Arrow batches — the same one-shuffle plan — and the per-USER
    min-max runs as a vectorized pandas groupby-transform INSIDE each
    bucket (every user still lands wholly in one bucket, so semantics
    are unchanged). This is the standard small-groups fix for
    grouped-map UDFs; at 100 TB the bucket count scales with the
    cluster, not the group count. A window function would also express
    THIS op; the operator exists to carry the per-group Python escape
    hatch for logic SQL genuinely cannot express."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    bucketed = ev.withColumn(
        "_bucket", F.pmod(F.xxhash64("user_id"), F.lit(64)).cast("int")
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        g = pdf.groupby("user_id")["value"]
        mn = g.transform("min")
        rng = g.transform("max") - mn
        out = pdf[["user_id", "event_id"]].copy()
        # rng==0 groups: (value-mn)=0 and rng→NaN under where(), so the
        # quotient is NaN there; fillna restores the declared 0.0
        out["value_norm"] = (
            (pdf["value"] - mn) / rng.where(rng != 0)
        ).fillna(0.0)
        return out

    out = bucketed.groupBy("_bucket").applyInPandas(
        norm, "user_id long, event_id long, value_norm double"
    )
    return out.orderBy("user_id", "event_id")


@query("ns_winnowing")  # pinned in test_query_contracts (no xxhash64 in DuckDB)
def ns_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003): per-document set of window-min rolling-hash shingles — the
    plagiarism/overlap-detection fingerprint that, unlike the whole-
    document SHA (ns_text_fingerprint), survives partial edits.
    Per-row array expressions only (let-bound, functions/text.py), no
    shuffle; deterministic (xxhash64, fixed normalization) so the
    pinned contract can assert exact per-doc counts."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", T.winnowing_fingerprint("text").alias("fp"))
        .withColumn("n_fp", F.size("fp"))
        .orderBy("doc_id")
    )


@query(
    "ns_blocklist_filter",
    oracle="""
    SELECT e.event_id, e.user_id
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = e.user_id AND c.c_acctbal < 0)
    ORDER BY e.event_id
    """,
)
def ns_blocklist_filter(spark, sf_dir):
    """Bloom-accelerated blocklist filtering (operators/bloom.py):
    drop every event whose user is on the banned list (customers with
    negative balance) WITHOUT shuffling the event stream — the
    takedown/banned-id/decontamination membership pattern. The Bloom
    bitmap (~10 bits per blocked key) broadcasts at sizes where a
    hash-relation broadcast join cannot; definitely-absent rows pass
    map-only, and only the maybe fraction (true hits + ~1% false
    positives) is exact-verified with an anti-join — so the result is
    bit-for-bit the plain NOT EXISTS the oracle runs. The blocklist
    count (Bloom sizing input) is a driver-side aggregate over the
    dim table — bounded metadata, same class as the IVF centroid
    read."""
    from hybrid_cdc_demo_spark.operators.bloom import blocklist_filter
    from hybrid_cdc_demo_spark.sources.tables import table_num_rows

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    banned = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    survivors = blocklist_filter(
        spark,
        events,
        "user_id",
        banned,
        "c_custkey",
        # Bloom sizing needs only an UPPER BOUND on the blocked-key
        # count: the dim table's parquet-footer row count is free (no
        # Spark job), where the old exact banned.count() paid a full
        # customer scan per call. Oversizing only lowers the false-
        # positive rate; the exact verify anti-join keeps the result
        # bit-identical either way (r10, guide §1.2).
        expected_items=table_num_rows(sf_dir, "customer"),
    )
    return survivors.orderBy("event_id")


@query(
    "ns_prefix_dedup",
    oracle="""
    SELECT doc_id,
           CAST(COALESCE(
             starts_with(lead(text) OVER (ORDER BY text, doc_id), text),
             FALSE) AS INT) AS is_prefix_dup
    FROM documents
    ORDER BY doc_id
    """,
)
def ns_prefix_dedup(spark, sf_dir):
    """Sorted-neighbor prefix-containment dedup, HASH-VERIFIED against
    the single-window oracle: a document is flagged iff its full text
    survives elsewhere as an equal or longer string (keep-longest drops
    the flags; exact-dup runs keep one). The oracle's global window is
    the one-task formulation Spark must NOT run at scale — the operator
    re-expresses it as range-repartition + in-partition sort (one
    exchange, a global sort's exact plan) + a map-side Arrow successor
    pass, with only the P partition-head texts crossing to the driver
    (see operators/dedup.py:prefix_duplicate_flags). A hash match here
    certifies the distributed neighbor stitching, partition boundaries
    included."""
    docs = load_table(spark, sf_dir, "documents")
    return D.prefix_duplicate_flags(docs, "text", "doc_id").orderBy("doc_id")


@query(
    "ns_dedup_substring",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), wins AS (
      SELECT doc_id, i AS pos, array_to_string(w[i:i+7], ' ') AS g
      FROM toks, unnest(generate_series(1, len(w) - 7)) AS t(i)
    ), dup AS (
      SELECT g FROM wins GROUP BY g HAVING COUNT(*) >= 2
    ), flagged AS (
      SELECT doc_id, pos FROM wins WHERE g IN (SELECT g FROM dup)
    ), merged AS (
      SELECT doc_id, pos,
             max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM flagged
    ), cov AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_windows,
             CAST(SUM(pos + 8 - GREATEST(pos, COALESCE(prev_end, pos))) AS BIGINT)
               AS covered_tokens
      FROM merged GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(GREATEST(len(w) - 7, 0) AS BIGINT) AS n_windows,
           COALESCE(c.dup_windows, 0) AS dup_windows,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           CAST(len(w) AS BIGINT) - COALESCE(c.covered_tokens, 0) AS kept_tokens,
           CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE)
             / CAST(len(w) AS DOUBLE) AS dup_frac
    FROM toks t LEFT JOIN cov c USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def ns_dedup_substring(spark, sf_dir):
    """Exact-substring span dedup (Lee et al. 2021 ExactSubstr as
    token windows), HASH-VERIFIED: per-document duplicated-window and
    covered-token accounting for 8-token spans repeated anywhere in
    the corpus. The Spark side counts 64-bit xxhash64 fingerprints of
    the window grams (8-byte shuffle keys instead of ~8-word strings
    — the scale trick), flags windows with a left-semi equi-join, and
    unions the flagged [pos, pos+8) intervals with an O(flagged)
    running-max window — never a per-token explode. Integer counts
    plus one int/int double division keep both engines bitwise-equal."""
    docs = load_table(spark, sf_dir, "documents")
    return D.span_dedup_stats(docs, "text", "doc_id", k=8).orderBy("doc_id")
