from hybrid_cdc_demo_spark.plans.catalog import ORACLE_SQL, QUERIES  # noqa: F401
import hybrid_cdc_demo_spark.plans.northstar  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.curation_queries  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.stats_queries  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.ml_queries  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.layout_queries  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.linkage_queries  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.retrieval_queries  # noqa: F401,E402  (registers entries)
import hybrid_cdc_demo_spark.plans.tokenizer_queries  # noqa: F401,E402  (registers entries)
