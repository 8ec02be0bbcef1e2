from hybrid_cdc_demo_spark.plans.catalog import ORACLE_SQL, QUERIES  # noqa: F401
