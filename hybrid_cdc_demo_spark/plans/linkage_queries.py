"""Record-linkage queries — the blocked fuzzy join, differentially
verified against a BRUTE-FORCE oracle: DuckDB scores the full cross
product, Spark runs the deletion-neighborhood blocking, and the hash
compare proves the blocking lost zero pairs (the FastSS k=1 recall
guarantee, made empirical)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.linkage import fuzzy_join
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table


@query(
    "ns_fuzzy_join",
    oracle="""
    SELECT c_custkey, s_suppkey, CAST(d AS INT) AS dist
    FROM (
      SELECT c.c_custkey, s.s_suppkey,
             levenshtein(substring(c.c_name, 10), substring(s.s_name, 10)) AS d
      FROM customer c CROSS JOIN supplier s
      WHERE c.c_custkey < 5000
    )
    WHERE d <= 1
    ORDER BY c_custkey, s_suppkey
    """,
)
def ns_fuzzy_join(spark, sf_dir):
    """Entity resolution customer<->supplier on the 9-digit name
    suffix, edit distance <= 1. Spark runs deletion-neighborhood
    blocking (an equi-join on (len+1) variants per record — no cross
    product anywhere in the plan) + bounded-levenshtein verify; the
    oracle scores ALL pairs brute-force, so a hash match certifies
    exact recall. The id slice bounds the oracle's O(n*m) cost, not
    ours — the blocked plan is linear in candidates at any scale.
    Sequential TPC-H-style identifiers are the adversarial case for
    prefix blocking (every record shares the leading zeros), which is
    why the neighborhood family is the right production choice."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 5000)
        .select("c_custkey", F.expr("substring(c_name, 10)").alias("c_suffix"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.expr("substring(s_name, 10)").alias("s_suffix")
    )
    return (
        fuzzy_join(cust, supp, "c_suffix", "s_suffix", "c_custkey", "s_suppkey")
        .select("c_custkey", "s_suppkey", F.col("dist").cast("int").alias("dist"))
        .orderBy("c_custkey", "s_suppkey")
    )
