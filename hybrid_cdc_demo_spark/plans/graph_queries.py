"""Graph-analytics north-star queries over the word co-occurrence
graph (nodes = tokens, edges = adjacent-word pairs): triangle census
(HASH-VERIFIED) and PageRank (contract-pinned — iteration-order float
sums, see operators/graph.py docstring)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.graph import (
    pagerank,
    token_edges,
    triangle_stats,
)
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table


@query(
    "ns_graph_triangles",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), big AS (
      SELECT DISTINCT least(w[i], w[i + 1]) AS a,
                      greatest(w[i], w[i + 1]) AS b
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
      WHERE w[i] <> w[i + 1]
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM big UNION ALL SELECT b AS node FROM big)
      GROUP BY node
    ), tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM big e1
      JOIN big e2 ON e1.b = e2.a
      JOIN big e3 ON e3.a = e1.a AND e3.b = e2.b
    ), wed AS (
      SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM big) AS n_edges,
           tri.n_triangles,
           wed.n_wedges,
           CASE WHEN wed.n_wedges > 0
                THEN CAST(3.0 AS DOUBLE)
                     * CAST(tri.n_triangles AS DOUBLE)
                     / CAST(wed.n_wedges AS DOUBLE) END AS global_clustering
    FROM tri CROSS JOIN wed
    """,
)
def ns_graph_triangles(spark, sf_dir):
    """Triangle census of the token co-occurrence graph,
    HASH-VERIFIED: exact triangle and wedge counts plus the global
    clustering coefficient. The Spark side counts via DEGREE-ORDERED
    ORIENTATION (wedge fan-out bounded by oriented out-degree —
    O(sqrt E) even on power-law hubs); the oracle uses the simpler
    a<b<c join, which must agree exactly — the equality IS the test
    that orientation counts every triangle exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    return triangle_stats(token_edges(docs))


@query("ns_pagerank_tokens")  # contract-pinned in tests/test_graph.py
def ns_pagerank_tokens(spark, sf_dir):
    """Top-20 tokens by PageRank over the directed bigram graph —
    the iterative-graph workload class (join + aggregate per round,
    lineage truncated by localCheckpoint). Float rank sums are
    iteration-order FP, so this is contract-pinned (mass
    conservation, hand-graph differential, top-set stability) rather
    than hash-matched; ranks round to 6 dp for stable presentation."""
    docs = load_table(spark, sf_dir, "documents")
    ranks = pagerank(token_edges(docs, directed=True), iterations=10)
    top = ranks.select(
        "node", F.round(F.col("rank"), 6).alias("rank_6dp")
    ).orderBy(F.desc("rank_6dp"), F.col("node")).limit(20)
    return top
