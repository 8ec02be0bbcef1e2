"""Every registered query must be verified somewhere: either a DuckDB
oracle (the parametrized tests/test_oracle_parity.py sweep covers ALL
of ORACLE_SQL) or an explicit pinned contract here/elsewhere in tests/.

The completeness check makes the set CLOSED: registering a new query
without an oracle or a pin fails loudly instead of silently shipping
an unverified operator (the round-2 gap where 7 registered queries ran
only in the bench).

Pinned snapshots are taken at sf0.001 — the corpus is deterministic
driver testdata, so row counts, schemas, and aggregate invariants are
stable across runs and machines.
"""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.plans import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"

#: queries verified WITHOUT a DuckDB oracle → where their pin lives.
#:
#: WHY each remains pinned (r9 VERDICT #6 — the boundary of what is
#: mechanically convertible to a generated oracle, documented per pin;
#: ns_embedding_neardup crossed it this round — its SRP planes are
#: seeded literals and every step folds deterministically, so the full
#: LSH pipeline is now a generated DuckDB mirror in northstar.py):
#:
#: * xxhash64 family (ns_winnowing, ns_dedup_minhash, ns_dedup_simhash,
#:   ns_multimodal_features' fingerprint column): the signatures hash
#:   with Spark's xxhash64 builtin; DuckDB's hash() is a different
#:   64-bit function and DuckDB ships no xxhash64 — no SQL mirror can
#:   reproduce the signatures. Verified instead by property tests
#:   (banded-candidate recall vs exact Jaccard / planted near-dups)
#:   and, for minhash, the ns_dedup_bucket_coverage companion oracle
#:   that hash-verifies the banding arithmetic itself.
#: * recall-pinned ANN ladder (ns_simsearch_lsh/ivf/ivf_sq8/ivfpq/opq/
#:   ivfopq/refine, ns_opq_rotation, ns_dedup_bucket_coverage): the
#:   CLAIM is approximate (recall vs the exact top-k, which IS
#:   oracle-backed via ns_simsearch_brute); an equality oracle would
#:   assert the wrong thing. Where equality does hold, it is pinned
#:   bitwise in-suite (PQ/OPQ train+encode vs generated SQL in
#:   test_pq.py; refine's exact-d2 rescoring).
#: * sketch-tolerance pair (q05_approx_distinct, ns_sketch_cardinality,
#:   ns_quantile_sketch): HLL/KLL estimates — SURVEY §2c declares them
#:   tolerance-checked (<5% / rank-error bounds) against the exact
#:   answer, which is the oracle-backed quantity.
#: * ns_pca_project: the eigenbasis comes from LAPACK eigh — not
#:   unrollable as SQL iterations (Jacobi sweeps are order-dependent
#:   rotations, no fixed small iteration count). The r9 suggestion of
#:   injecting the eigenbasis as literals fails across scale points:
#:   the vec_id<500 training slice is a DIFFERENT 500 vectors at each
#:   sf (verified: per-sf md5 of the ordered slice differs), so a
#:   static literal basis can only ever match one sf while the sweep
#:   certifies five. What IS mechanically checkable is oracle-backed:
#:   the Gram matrix (ns_gram_matrix, hash-exact fold) and the
#:   projection-given-basis (same fold as the oracle-green kmeans/PQ
#:   dot products); the eigh step between them is pinned by
#:   orthonormality/variance/determinism contracts in test_linalg.py.
#: * ns_text_langid: classification over hand-tuned n-gram heuristic
#:   tables — mirrorable only by restating the entire table in SQL,
#:   which would duplicate (not independently check) the rules; pinned
#:   on a labeled fixture instead.
PINNED_NO_ORACLE = {
    "q05_approx_distinct": "test_oracle_parity.py::test_approx_distinct_within_tolerance",
    "ns_dedup_minhash": "test_dedup.py (property vs exact Jaccard)",
    "ns_dedup_simhash": "test_dedup.py (planted near-dups)",
    "ns_simsearch_ivf": "test_ivf.py (recall, persisted parity, pruning)",
    "ns_simsearch_lsh": "test_query_contracts.py::test_ns_simsearch_lsh_pinned",
    "ns_text_langid": "test_query_contracts.py::test_ns_text_langid_pinned",
    "ns_multimodal_features": "test_query_contracts.py::test_ns_multimodal_features_pinned",
    "ns_winnowing": "test_query_contracts.py::test_ns_winnowing_pinned",
    "ns_simsearch_ivf_sq8": "test_query_contracts.py::test_ns_simsearch_ivf_sq8_pinned",
    "ns_sketch_cardinality": "test_sketches.py (tolerance vs exact + union consistency)",
    "ns_quantile_sketch": "test_sketches.py (rank error vs exact quantiles)",
    "ns_dedup_bucket_coverage": "test_query_contracts.py::test_ns_dedup_bucket_coverage_pinned",
    "ns_pca_project": "test_linalg.py::test_ns_pca_project_contract",
    "ns_simsearch_ivfpq": "test_pq.py::test_ns_simsearch_ivfpq_contract",
    "ns_opq_rotation": "test_pq.py::TestOPQ (orthogonality, error decrease, contract)",
    "ns_simsearch_opq": "test_pq.py::TestOPQ (recall >= plain PQ, contract)",
    "ns_simsearch_ivfopq": "test_pq.py::TestIVFOPQ (recall >= IVF-PQ, orthogonality, pruning, contract)",
    "ns_simsearch_refine": "test_pq.py::TestRefineAndBinary (exact d2 bitwise, recall >= ADC, self-retrieval)",
}


def test_every_registered_query_is_verified():
    no_oracle = set(QUERIES) - set(ORACLE_SQL)
    unpinned = no_oracle - set(PINNED_NO_ORACLE)
    assert not unpinned, (
        f"queries with neither oracle nor pinned contract: {sorted(unpinned)}"
    )
    stale = set(PINNED_NO_ORACLE) - no_oracle
    assert not stale, f"pinned entries that now have oracles or vanished: {sorted(stale)}"


def test_ns_simsearch_lsh_pinned(spark):
    rows = QUERIES["ns_simsearch_lsh"](spark, SF).collect()
    df = QUERIES["ns_simsearch_lsh"](spark, SF)
    assert df.dtypes == [("vec_id", "bigint"), ("score", "double")]
    assert len(rows) == 10
    # the query vector is the min-id embedding → must rank itself first
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == 1.0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


def test_ns_embedding_neardup_pinned(spark):
    df = QUERIES["ns_embedding_neardup"](spark, SF)
    assert df.dtypes == [("id_a", "bigint"), ("id_b", "bigint"), ("cos", "double")]
    # isotropic random corpus at threshold 0.8 → NO pairs; a regression
    # that starts emitting junk pairs (or crashes) is loud here
    assert df.count() == 0

    # planted duplicates through the SAME operator must be found
    from hybrid_cdc_demo_spark.operators.similarity import embedding_neardup_pairs

    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = list(base)
    near[0] += 0.01
    other = [rng.uniform(-1, 1) for _ in range(16)]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, other)],
        "vec_id int, embedding array<float>",
    )
    pairs = embedding_neardup_pairs(emb, threshold=0.95, num_planes=4).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["cos"] >= 0.95


def test_ns_embedding_neardup_oracle_on_planted_pairs(spark, tmp_path):
    """The generated SRP-LSH oracle (northstar._neardup_oracle) must
    agree with the Spark pipeline on a corpus where near-dup pairs
    EXIST — the sf0.01 corpus is isotropic (both sides emit 0 rows,
    a vacuous equality), so this plants clusters of perturbed 64-dim
    vectors and compares the full (id_a, id_b, cos) result sets."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(11)
    rows = []
    vid = 0
    for _ in range(30):  # 30 clusters of 3 near-identical vectors
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for _ in range(3):
            rows.append(
                (vid, [x + rng.uniform(-0.01, 0.01) for x in base])
            )
            vid += 1
    for _ in range(100):  # isotropic background
        rows.append((vid, [rng.uniform(-1, 1) for _ in range(64)]))
        vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    pdf["embedding"] = pdf["embedding"].map(
        lambda v: [float(x) for x in v]
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(
        pdf,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    s = (
        QUERIES["ns_embedding_neardup"](spark, str(tmp_path))
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    o = (
        con.execute(ORACLE_SQL["ns_embedding_neardup"])
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(s) > 0, "planted corpus must produce pairs"
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o)
    assert (s["id_a"].values == o["id_a"].values).all()
    assert (s["id_b"].values == o["id_b"].values).all()
    assert (s["cos"].values == o["cos"].values).all()  # bitwise


def test_ns_text_langid_pinned(spark):
    df = QUERIES["ns_text_langid"](spark, SF)
    assert df.dtypes == [("doc_id", "bigint"), ("lang_pred", "string")]
    dist = {
        r["lang_pred"]: r["count"]
        for r in df.groupBy("lang_pred").count().collect()
    }
    # the synthetic corpus is English-vocabulary word soup for EVERY
    # lang label (the labels do not reflect the text), so the honest
    # contract is the deterministic prediction distribution, not label
    # accuracy
    assert dist == {"en": 466, "und": 34}

    # on genuinely distinctive text the heuristic must separate its
    # supported languages and fall back to 'und' otherwise
    from hybrid_cdc_demo_spark.functions.text import lang_id

    fixtures = [
        ("en", "the cat sat and it is clear that the plan is good"),
        ("de", "der hund und die katze das ist nicht ein problem"),
        ("fr", "le chat et la maison est une belle chose pour nous"),
        ("es", "el perro y la casa es una cosa que vemos por aqui"),
        ("und", "xyzzy plugh quux frobnicate"),
    ]
    got = (
        spark.createDataFrame(fixtures, "expected string, text string")
        .select("expected", lang_id("text").alias("pred"))
        .collect()
    )
    for r in got:
        assert r["pred"] == r["expected"], (r["expected"], r["pred"])


def test_ns_multimodal_features_pinned(spark):
    df = QUERIES["ns_multimodal_features"](spark, SF)
    assert df.dtypes == [
        ("media_id", "bigint"),
        ("n_bytes", "bigint"),
        ("f0", "double"),
    ]
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.countDistinct("f0").alias("f0_distinct"),
    ).collect()[0]
    assert agg["n"] == 500
    assert agg["total_bytes"] == 153156  # deterministic fake codec
    assert agg["min_bytes"] > 0
    assert agg["f0_distinct"] == 1  # fake codec emits constant f0


def test_ns_winnowing_pinned(spark):
    """Winnowing fingerprints are deterministic (xxhash64 + fixed
    normalization): every document yields a non-empty fingerprint set
    no larger than its window count, identical docs yield identical
    sets, and edited docs keep most fingerprints (the property the
    operator exists for)."""
    df = QUERIES["ns_winnowing"](spark, SF)
    assert df.dtypes == [
        ("doc_id", "bigint"),
        ("fp", "array<bigint>"),
        ("n_fp", "int"),
    ]
    rows = df.collect()
    from hybrid_cdc_demo_spark.sources.tables import load_table

    assert len(rows) == load_table(spark, SF, "documents").count()
    assert all(r["n_fp"] >= 1 and r["n_fp"] == len(set(r["fp"])) for r in rows)
    # rerun → identical (determinism across jobs)
    again = {r["doc_id"]: r["fp"] for r in QUERIES["ns_winnowing"](spark, SF).collect()}
    assert all(again[r["doc_id"]] == r["fp"] for r in rows)


def test_ns_simsearch_ivf_sq8_pinned(spark):
    """The SQ8 probe must return EXACTLY the full-precision persisted
    probe's results at the same cells/seed/nprobe — int8 codes plus
    the float re-rank lose nothing; any approximation is the cell
    probe's (shared by both variants)."""
    sq8 = QUERIES["ns_simsearch_ivf_sq8"](spark, SF).collect()
    full = QUERIES["ns_simsearch_ivf"](spark, SF).collect()
    assert [(r["vec_id"], r["score"]) for r in sq8] == [
        (r["vec_id"], r["score"]) for r in full
    ]


def test_ns_dedup_bucket_coverage_pinned(spark):
    """Skew-guard coverage counters are deterministic scalars: the tiny
    deterministic corpus has no hot bucket (nothing dropped, nothing
    suppressed), totals are positive, and the report cross-checks the
    operators' own dropped_out accounting."""
    df = QUERIES["ns_dedup_bucket_coverage"](spark, SF)
    assert df.dtypes == [
        ("minhash_buckets_total", "bigint"),
        ("minhash_buckets_dropped", "bigint"),
        ("minhash_pairs_suppressed", "bigint"),
        ("simhash_buckets_total", "bigint"),
        ("simhash_buckets_dropped", "bigint"),
        ("simhash_pairs_suppressed", "bigint"),
    ]
    row = df.collect()[0]
    assert row["minhash_buckets_total"] > 0
    assert row["simhash_buckets_total"] > 0
    assert row["minhash_buckets_dropped"] == 0
    assert row["simhash_buckets_dropped"] == 0
    assert row["minhash_pairs_suppressed"] == 0
    assert row["simhash_pairs_suppressed"] == 0

    # the query's numbers agree with the candidates' own accounting
    from hybrid_cdc_demo_spark.operators import dedup as D
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    report = {}
    D.minhash_lsh_candidates(
        D.minhash_signatures(docs, "text", "doc_id", num_hashes=32),
        dropped_out=report,
    ).count()
    assert report["buckets_total"] == row["minhash_buckets_total"]
    assert report["buckets_dropped"] == 0
