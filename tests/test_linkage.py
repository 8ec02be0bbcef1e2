"""Contract tests for the deletion-neighborhood fuzzy join. The
differential recall proof vs a brute-force cross product runs in
test_oracle_parity.py::test_oracle_parity[ns_fuzzy_join]; these pin
the operator-level properties on crafted edge cases the TPC-H-shaped
corpus can't exercise (indels, duplicates, the no-cross-product plan).
"""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators.linkage import deletion_variants, fuzzy_join


def _pairs(df):
    return {(r["lid"], r["rid"], r["dist"]) for r in df.collect()}


@pytest.fixture(scope="module")
def crafted(spark):
    left = spark.createDataFrame(
        [(1, "1234"), (2, "abcd"), (3, "zzzz"), (4, "a")],
        "lid int, ltext string",
    )
    right = spark.createDataFrame(
        [
            (10, "1234"),   # identical -> dist 0
            (11, "1235"),   # substitution -> dist 1
            (12, "12345"),  # insertion -> dist 1
            (13, "123"),    # deletion -> dist 1
            (14, "1256"),   # dist 2 -> excluded
            (15, ""),       # empty vs "a" -> dist 1
        ],
        "rid int, rtext string",
    )
    return left, right


def test_fuzzy_join_finds_all_edit_kinds(spark, crafted):
    """Substitution, insertion, AND deletion neighbors must all be
    found — the indel cases are what naive same-length Hamming
    blocking misses."""
    left, right = crafted
    got = _pairs(fuzzy_join(left, right, "ltext", "rtext", "lid", "rid"))
    assert got == {
        (1, 10, 0),
        (1, 11, 1),
        (1, 12, 1),
        (1, 13, 1),
        (4, 15, 1),
    }


def test_fuzzy_join_emits_each_pair_once(spark, crafted):
    """Identical strings share every variant (quadratic candidate
    duplication) — the output must still be one row per pair."""
    left, right = crafted
    out = fuzzy_join(left, right, "ltext", "rtext", "lid", "rid")
    assert out.count() == out.distinct().count() == 5


def test_fuzzy_join_plan_has_no_cross_product(spark, crafted):
    left, right = crafted
    plan = (
        fuzzy_join(left, right, "ltext", "rtext", "lid", "rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_rejects_unsupported_budget(spark, crafted):
    left, right = crafted
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "ltext", "rtext", "lid", "rid", max_dist=2)


def test_deletion_variants_shape(spark):
    row = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc")).alias("v"))
        .collect()[0]
    )
    assert set(row["v"]) == {"abc", "bc", "ac", "ab"}
