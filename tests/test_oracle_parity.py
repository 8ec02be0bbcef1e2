"""Differential tests: every oracle-declared query must match DuckDB
on the same parquet inputs (sf0.001 for speed; the driver re-runs the
same contract at sf0.01)."""

import pytest

from hybrid_cdc_demo_spark.plans import ORACLE_SQL, QUERIES
from hybrid_cdc_demo_spark.testing import run_parity


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, sf_dir, name):
    run_parity(spark, sf_dir, name, QUERIES[name], ORACLE_SQL[name])


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from hybrid_cdc_demo_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    exact = (
        load_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("cd"))
        .collect()[0]["cd"]
    )
    approx = QUERIES["q05_approx_distinct"](spark, sf_dir).collect()[0]["cd_approx"]
    assert abs(approx - exact) / exact < 0.05
