"""prefix_duplicate_flags: the distributed sorted-neighbor operator.

Corpus-wide parity is hash-checked by the oracle sweep
(ns_prefix_dedup); these tests pin the semantics on planted corpora
and — the part the oracle can't isolate — the PARTITION-BOUNDARY
stitching, by forcing many tiny range partitions so planted
prefix-pairs straddle them.
"""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.dedup import prefix_duplicate_flags


def _flags(spark, rows, partitions=None):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prefix_duplicate_flags(df, "text", "doc_id", partitions=partitions)
    return {r["doc_id"]: r["is_prefix_dup"] for r in out.collect()}


def test_planted_prefix_chain(spark):
    got = _flags(
        spark,
        [(1, "abc"), (2, "abcdef"), (3, "abcdefgh"), (4, "zzz"), (5, "q")],
    )
    # chain: 1 < 2 < 3 all flagged except the maximal 3; 4, 5 unique
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


def test_exact_duplicates_keep_one(spark):
    got = _flags(spark, [(1, "same"), (2, "same"), (3, "same"), (4, "x")])
    assert sum(got.values()) == 2  # all but one "same" flagged
    assert got[3] == 0 or got[4] == 0  # the kept run member is the last by id
    assert got[4] == 0


def test_not_a_prefix_not_flagged(spark):
    # shares a prefix but diverges — must NOT be flagged
    got = _flags(spark, [(1, "abcX"), (2, "abcY"), (3, "ab_different")])
    assert got == {1: 0, 2: 0, 3: 0}


def test_boundary_stitching_many_partitions(spark):
    # 40 chained pairs forced across 16 tiny range partitions: every
    # (base, base+suffix) pair must be found even when the range
    # boundary falls between its two members
    rows = []
    for i in range(40):
        rows.append((2 * i, f"doc{i:03d}"))
        rows.append((2 * i + 1, f"doc{i:03d} extended"))
    got = _flags(spark, rows, partitions=16)
    assert all(got[2 * i] == 1 for i in range(40)), "a base lost its extension"
    assert all(got[2 * i + 1] == 0 for i in range(40))


def test_more_partitions_than_rows(spark):
    got = _flags(spark, [(1, "a"), (2, "ab")], partitions=8)
    assert got == {1: 1, 2: 0}


def test_single_row(spark):
    assert _flags(spark, [(7, "only")]) == {7: 0}


def test_row_count_preserved(spark, sf_dir):
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = prefix_duplicate_flags(docs)
    assert out.count() == docs.count()
    assert out.dtypes == [("doc_id", "bigint"), ("is_prefix_dup", "int")]


def test_plan_single_range_exchange(spark):
    # the corpus-side plan: one range exchange (the sort), the head
    # aggregation runs on its own bounded pass — no corpus-wide
    # single-partition window anywhere
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    out = prefix_duplicate_flags(df, "text", "doc_id", partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_differential_vs_bruteforce_random_corpora(spark):
    """Semantic contract on adversarial random corpora (dense prefix
    structure over a 2-letter alphabet): flagged iff SOME other doc's
    text extends mine (longer with my text as prefix, or equal with a
    larger id). The operator computes this via the sorted-successor
    trick + distributed stitching — the brute force is the definition."""
    import random

    for seed, parts in [(1, 3), (2, 7), (3, 16)]:
        rng = random.Random(seed)
        rows = [
            (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 6))))
            for i in range(60)
        ]
        want = {
            i: int(
                any(
                    (t2.startswith(t1) and len(t2) > len(t1))
                    or (t2 == t1 and j > i)
                    for j, t2 in rows
                    if j != i
                )
            )
            for i, t1 in rows
        }
        got = _flags(spark, rows, partitions=parts)
        assert got == want, f"seed={seed} parts={parts}"


def test_empty_corpus(spark):
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ])
    )
    assert prefix_duplicate_flags(empty).count() == 0


def test_carry_cols_ride_unchanged_and_flags_identical(spark):
    """carry_cols (r10): extra per-row columns must come out exactly
    as they went in — same value on the same doc_id, across batch and
    partition boundaries (the three yield paths) — and the flags must
    be bit-identical to the carry-free run."""
    import random

    rng = random.Random(11)
    rows = [
        (
            i,
            "".join(rng.choice("ab") for _ in range(rng.randint(0, 6))),
            f"src{i % 3}",
            i % 2 == 0,
            i * 10,
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "source", "keep", "n_tok"]
    )
    for parts in (3, 16):
        out = prefix_duplicate_flags(
            df, "text", "doc_id", partitions=parts,
            carry_cols=("source", "keep", "n_tok"),
        )
        got = {r["doc_id"]: r for r in out.collect()}
        assert len(got) == 60
        for i, _t, src, keep, n_tok in rows:
            r = got[i]
            assert (r["source"], r["keep"], r["n_tok"]) == (src, keep, n_tok)
        plain = prefix_duplicate_flags(
            df.select("doc_id", "text"), "text", "doc_id", partitions=parts
        )
        want = {r["doc_id"]: r["is_prefix_dup"] for r in plain.collect()}
        assert {i: r["is_prefix_dup"] for i, r in got.items()} == want
