"""Engine facade: one SparkSession + registered testdata views.

API parity goal (SURVEY.md §2c): ``engine.sql(q)`` and the DataFrame
builders in :mod:`hybrid_cdc_demo_spark.plans.catalog` lower to the
same Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hybrid_cdc_demo_spark.session import configure_session, get_spark
from hybrid_cdc_demo_spark.sources.tables import load_table, register_views


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = configure_session(spark) if spark is not None else get_spark()
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
