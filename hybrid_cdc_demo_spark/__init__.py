"""hybrid_cdc_demo_spark — a PySpark-native analytics + CDC engine.

A from-scratch re-expression of the capabilities of the reference
`NhaLeTruc/hybrid-cdc-demo` (a Cassandra→warehouse CDC replication
pipeline, see /root/reference) on top of Apache Spark:

* batch relational query surface (DataFrame/SQL via Catalyst),
* Structured Streaming CDC pipeline (validate → mask → latest-wins
  merge, exactly-once via batchId ledger, DLQ, retry),
* schema-evolution registry (diff / compatibility / type mapping),
* large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal column plumbing).

Everything is declared through the DataFrame API so Catalyst/Tungsten
(predicate pushdown, column pruning, AQE, whole-stage codegen) pick
the physical plan; Python UDFs appear only as Arrow-vectorized
pandas_udfs where Spark lacks a builtin (e.g. HMAC-SHA256).
"""

__version__ = "0.1.0"

from hybrid_cdc_demo_spark.session import get_spark  # noqa: F401
from hybrid_cdc_demo_spark.engine import Engine  # noqa: F401
