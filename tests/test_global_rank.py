"""global_rank: distributed total-order enumeration
(operators/partitioning.py). Corpus-wide parity is hash-checked by
the oracle sweep (ns_corpus_shuffle); here we pin the semantics and
the cross-partition offset stitching under adversarial partition
counts.
"""

import decimal

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.partitioning import global_rank


def _rank(spark, rows, cols=("v", "i"), partitions=None):
    df = spark.createDataFrame(rows, ["i", "v"])
    out = global_rank(df, list(cols), rank_col="pos", partitions=partitions)
    return {r["i"]: r["pos"] for r in out.collect()}


def test_matches_sorted_order(spark):
    rows = [(1, "c"), (2, "a"), (3, "b"), (4, "aa")]
    got = _rank(spark, rows)
    # sorted by v: a(2) < aa(4) < b(3) < c(1)
    assert got == {2: 1, 4: 2, 3: 3, 1: 4}


def test_positions_are_a_permutation_across_partition_counts(spark):
    import random

    rng = random.Random(9)
    rows = [(i, rng.random()) for i in range(500)]
    want = {
        i: k + 1
        for k, (i, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    for parts in (1, 3, 16, 64):
        got = _rank(spark, rows, partitions=parts)
        assert got == want, f"partitions={parts}"


def test_more_partitions_than_rows(spark):
    got = _rank(spark, [(1, "x"), (2, "y")], partitions=32)
    assert got == {1: 1, 2: 2}


def test_keeps_all_columns(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["i", "v", "w"])
    out = global_rank(df, ["v"], rank_col="pos")
    assert set(out.columns) == {"i", "v", "w", "pos"}
    assert out.dtypes[-1] == ("pos", "bigint")


def test_plan_has_no_global_window(spark):
    df = spark.range(100).select(
        F.col("id").alias("i"), F.rand(7).alias("v")
    )
    plan = (
        global_rank(df, ["v", "i"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "MapInPandas" in plan


class TestGlobalRankCumsum:
    def _run(self, spark, rows, partitions):
        import decimal

        from hybrid_cdc_demo_spark.operators.partitioning import (
            global_rank_cumsum,
        )

        df = spark.createDataFrame(rows, ["i", "v"]).select(
            "i", F.col("v").cast("decimal(18,6)").alias("v")
        )
        out = global_rank_cumsum(
            df, ["v", "i"], "v", partitions=partitions
        ).collect()
        got = {r["i"]: (r["pos"], r["cum"]) for r in out}
        # reference: single-process prefix sum in (v, i) order
        ref = {}
        run = decimal.Decimal(0)
        for pos, (i, v) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0])), start=1
        ):
            run += decimal.Decimal(str(v)).quantize(decimal.Decimal("0.000001"))
            ref[i] = (pos, run)
        return got, ref

    def test_matches_reference_across_partition_counts(self, spark):
        import random

        rng = random.Random(17)
        rows = [(i, round(rng.uniform(0, 100), 2)) for i in range(300)]
        for parts in (1, 3, 8, 64):
            got, ref = self._run(spark, rows, parts)
            assert {k: (p, decimal.Decimal(c)) for k, (p, c) in got.items()} == {
                k: (p, c) for k, (p, c) in ref.items()
            }, f"partitions={parts}"

    def test_ties_keep_exact_totals(self, spark):
        rows = [(i, 1.5) for i in range(10)]
        got, ref = self._run(spark, rows, 4)
        # every prefix is an exact multiple of 1.5 — no float drift
        assert sorted(c for _, c in got.values()) == sorted(
            c for _, c in ref.values()
        )

    def test_empty_partitions_do_not_shift_offsets(self, spark):
        rows = [(1, 5.0), (2, 3.0)]
        got, ref = self._run(spark, rows, 16)  # far more partitions than rows
        assert {k: v[0] for k, v in got.items()} == {2: 1, 1: 2}
        assert got[1][1] == ref[1][1]

    def test_total_col_is_exact_grand_total(self, spark):
        """total_col (r10) emits the exact Decimal grand total the
        control-frame fold already computed: equal on every row, equal
        to the last row's cum, equal to the order-free exact sum."""
        import random

        from hybrid_cdc_demo_spark.operators.partitioning import (
            global_rank_cumsum,
        )

        rng = random.Random(5)
        rows = [(i, round(rng.uniform(0, 100), 2)) for i in range(200)]
        df = spark.createDataFrame(rows, ["i", "v"]).select(
            "i", F.col("v").cast("decimal(18,6)").alias("v")
        )
        out = global_rank_cumsum(
            df, ["v", "i"], "v", partitions=8, total_col="tot"
        ).collect()
        want = sum(
            (decimal.Decimal(str(v)).quantize(decimal.Decimal("0.000001"))
             for _, v in rows),
            decimal.Decimal(0),
        )
        totals = {decimal.Decimal(r["tot"]) for r in out}
        assert totals == {want}
        last = max(out, key=lambda r: r["pos"])
        assert decimal.Decimal(last["cum"]) == want

