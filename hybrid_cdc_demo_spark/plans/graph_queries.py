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


def _pagerank_oracle_sql(iterations: int = 10, damping: float = 0.85) -> str:
    """GENERATED DuckDB oracle for damped PageRank: the k power-
    iteration passes unrolled as a CTE chain (the same generated-SQL
    trick as the PQ training oracles, VERDICT r8 #5). Every
    elementwise operation mirrors operators/graph.py:pagerank exactly
    — same damping literal, same dangling-mass redistribution, same
    1/n initialization — so the only engine difference is floating
    SUM order (ulp-level), which the 6-dp presentation rounding
    absorbs: ranks are O(1e-2..1e-5) with accumulated order error
    ~1e-13, six orders below the rounding quantum."""
    d = repr(damping)
    parts = [
        """
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), edges AS MATERIALIZED (
      SELECT DISTINCT w[i] AS src, w[i + 1] AS dst
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
      WHERE w[i] <> w[i + 1]
    ), nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
    ), nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS DOUBLE) AS outd FROM edges GROUP BY src
    ),
    r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(iterations):
        parts.append(
            f""",
    d{i} AS MATERIALIZED (
      SELECT COALESCE(SUM(r.rank), 0.0) AS dm
      FROM r{i} r LEFT JOIN outdeg o ON r.node = o.src
      WHERE o.src IS NULL
    ), c{i} AS MATERIALIZED (
      SELECT e.dst, SUM(r.rank / o.outd) AS cin
      FROM edges e
      JOIN r{i} r ON e.src = r.node
      JOIN outdeg o ON o.src = e.src
      GROUP BY e.dst
    ), r{i + 1} AS MATERIALIZED (
      SELECT n.node,
             (1.0 - {d}) / (SELECT n FROM nn)
             + {d} * (COALESCE(c.cin, 0.0)
                      + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst
    )"""
        )
    parts.append(
        f"""
    SELECT node, ROUND(rank, 6) AS rank_6dp
    FROM r{iterations}
    ORDER BY rank_6dp DESC, node
    LIMIT 20"""
    )
    return "".join(parts)


@query("ns_pagerank_tokens", oracle=_pagerank_oracle_sql(iterations=10))
def ns_pagerank_tokens(spark, sf_dir):
    """Top-20 tokens by PageRank over the directed bigram graph —
    the iterative-graph workload class (join + aggregate per round,
    lineage truncated by localCheckpoint). HASH-VERIFIED against a
    GENERATED DuckDB oracle (the 10 damped power-iteration passes
    unrolled as CTEs — see _pagerank_oracle_sql); the 6-dp rounding
    absorbs the ulp-level SUM-order difference between engines while
    pinning every algorithmic choice (damping, dangling mass,
    initialization) bit-for-bit. The differential contract tests in
    tests/test_graph.py (mass conservation, hand-graph) remain as
    the structural safety net."""
    docs = load_table(spark, sf_dir, "documents")
    ranks = pagerank(token_edges(docs, directed=True), iterations=10)
    top = ranks.select(
        "node", F.round(F.col("rank"), 6).alias("rank_6dp")
    ).orderBy(F.desc("rank_6dp"), F.col("node")).limit(20)
    return top
