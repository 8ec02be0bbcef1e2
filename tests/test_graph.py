"""Graph operators (operators/graph.py): triangle counting vs a
brute-force reference on random graphs, PageRank vs a serial power
iteration, and the ns_pagerank_tokens contract pin."""

import itertools
import random

import pytest

from hybrid_cdc_demo_spark.operators.graph import (
    pagerank,
    token_edges,
    triangle_stats,
)
from hybrid_cdc_demo_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _edges_df(spark, edges):
    rows = [(min(u, v), max(u, v)) for u, v in edges]
    return spark.createDataFrame(sorted(set(rows)), ["a", "b"])


class TestTriangles:
    def _brute(self, edges):
        es = {frozenset(e) for e in edges}
        nodes = sorted({n for e in es for n in e})
        deg = {n: sum(1 for e in es if n in e) for n in nodes}
        tri = sum(
            1
            for trio in itertools.combinations(nodes, 3)
            if all(
                frozenset(p) in es for p in itertools.combinations(trio, 2)
            )
        )
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        return len(nodes), len(es), tri, wedges

    def test_random_graphs_match_bruteforce(self, spark):
        rng = random.Random(7)
        for trial in range(3):
            nodes = [f"n{i}" for i in range(12)]
            edges = {
                (u, v)
                for u, v in itertools.combinations(nodes, 2)
                if rng.random() < 0.3
            }
            (row,) = triangle_stats(_edges_df(spark, edges)).collect()
            n, e, t, w = self._brute(edges)
            assert (
                row["n_nodes"],
                row["n_edges"],
                row["n_triangles"],
                row["n_wedges"],
            ) == (n, e, t, w), f"trial {trial}"
            if w:
                assert row["global_clustering"] == pytest.approx(3 * t / w)

    def test_star_graph_has_no_triangles(self, spark):
        # hub with 6 spokes: 15 wedges, 0 triangles — the degree
        # orientation must not blow up or double count on the hub
        edges = [("hub", f"s{i}") for i in range(6)]
        (row,) = triangle_stats(_edges_df(spark, edges)).collect()
        assert row["n_triangles"] == 0 and row["n_wedges"] == 15
        assert row["global_clustering"] == 0.0

    def test_complete_graph_k4(self, spark):
        edges = list(itertools.combinations(["a", "b", "c", "d"], 2))
        (row,) = triangle_stats(_edges_df(spark, edges)).collect()
        assert row["n_triangles"] == 4 and row["n_wedges"] == 12
        assert row["global_clustering"] == pytest.approx(1.0)


class TestPageRank:
    def _serial(self, edges, nodes, iters=10, d=0.85):
        n = len(nodes)
        out = {}
        for s, _ in edges:
            out[s] = out.get(s, 0) + 1
        r = {v: 1.0 / n for v in nodes}
        for _ in range(iters):
            contrib = {v: 0.0 for v in nodes}
            for s, t in edges:
                contrib[t] += r[s] / out[s]
            dangling = sum(r[v] for v in nodes if v not in out)
            r = {
                v: (1 - d) / n + d * (contrib[v] + dangling / n)
                for v in nodes
            }
        return r

    def test_matches_serial_power_iteration(self, spark):
        edges = [
            ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        ]  # d is a source; no sinks except none (c->a closes)
        nodes = ["a", "b", "c", "d"]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
        want = self._serial(edges, nodes)
        assert set(got) == set(want)
        for v in nodes:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_dangling_mass_conserved(self, spark):
        edges = [("a", "b"), ("b", "c")]  # c is dangling
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = pagerank(df, iterations=12).collect()
        assert sum(r["rank"] for r in got) == pytest.approx(1.0, abs=1e-9)

    def test_driver_gate_matches_distributed_path(self, spark):
        """The r10 size-gated driver replay must agree with the
        distributed loop to float-accumulation precision (the only
        permitted difference is SUM order — the same deviation class
        the 6-dp oracle rounding absorbs), on a graph with dangling
        nodes, a source, and a cycle."""
        import random

        rng = random.Random(3)
        names = [f"n{i}" for i in range(40)]
        edges = list({
            (rng.choice(names), rng.choice(names)) for _ in range(150)
        })
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        drv = {
            r["node"]: r["rank"]
            for r in pagerank(df, iterations=10).collect()
        }
        dist = {
            r["node"]: r["rank"]
            for r in pagerank(
                df, iterations=10, driver_threshold_edges=0
            ).collect()
        }
        assert set(drv) == set(dist)
        for v, want in dist.items():
            assert drv[v] == pytest.approx(want, abs=1e-12), v

    def test_ns_pagerank_tokens_contract(self, spark):
        df = QUERIES["ns_pagerank_tokens"](spark, SF)
        rows = df.collect()
        assert df.dtypes == [("node", "string"), ("rank_6dp", "double")]
        assert len(rows) == 20
        ranks = [r["rank_6dp"] for r in rows]
        assert ranks == sorted(ranks, reverse=True)
        assert all(r > 0 for r in ranks)
        # rerun is deterministic at the pinned rounding
        again = QUERIES["ns_pagerank_tokens"](spark, SF).collect()
        assert [(r["node"], r["rank_6dp"]) for r in rows] == [
            (r["node"], r["rank_6dp"]) for r in again
        ]
