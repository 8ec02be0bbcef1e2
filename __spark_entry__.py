"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join revenue query at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the declared
inventory from SURVEY.md §2c (implemented in
hybrid_cdc_demo_spark.plans.catalog).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hybrid_cdc_demo_spark.plans import ORACLE_SQL, QUERIES
from hybrid_cdc_demo_spark.session import configure_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return QUERIES["q07_join_multiway"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checked query."""
    return dict(ORACLE_SQL)
