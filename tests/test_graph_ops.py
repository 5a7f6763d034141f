"""Invariants for pipeline/graph.hits, seed_distance and
recrawl.budget_allocation (values are oracle-checked; these pin the
properties and cross-engine assumptions the oracles rely on)."""

import duckdb
import pytest

from distributed_web_crawler_spark.pipeline import recrawl
from distributed_web_crawler_spark.pipeline.graph import (
    HOST_EDGE_FNS, hits, irregular_graph, seed_distance)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _py_edges(n_nodes=32):
    edges = []
    for node in range(n_nodes):
        for a, b in HOST_EDGE_FNS:
            if (node + 3 * a + b) % 5 != 0:
                edges.append((node, (node * a + b) % n_nodes))
    return edges


def test_irregular_graph_matches_python_rule(docs, spark):
    nodes, edges = irregular_graph(docs, n_nodes=32)
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == sorted(_py_edges())
    degs = {d for _, d in ((s, sum(1 for e in got if e[0] == s))
                           for s in range(32))}
    assert len(degs) > 1  # genuinely variable-degree


def test_hits_matches_python_power_iteration(docs):
    edges = _py_edges()
    h = {n: 1.0 for n in range(32)}
    for _ in range(4):
        a = {n: 0.0 for n in range(32)}
        for s, d in edges:
            a[d] += h[s]
        h = {n: 0.0 for n in range(32)}
        for s, d in edges:
            h[s] += a[d]
    amax, hmax = max(a.values()), max(h.values())
    want = {n: (round(a[n] / amax, 6), round(h[n] / hmax, 6))
            for n in range(32)}
    nodes, e = irregular_graph(docs, n_nodes=32)
    got = {r.node: (r.authority, r.hub)
           for r in hits(nodes, e, iterations=4).collect()}
    assert got == want
    assert len({v[0] for v in got.values()}) > 4  # non-degenerate spread


def test_seed_distance_matches_python_bfs(docs):
    edges = _py_edges()
    dist = {n: (0 if n % 8 == 0 else None) for n in range(32)}
    for _ in range(6):
        nxt = dict(dist)
        for s, d in edges:
            if dist[s] is not None:
                cand = dist[s] + 1
                if nxt[d] is None or cand < nxt[d]:
                    nxt[d] = cand
        dist = nxt
    want = {n: (-1 if v is None else v) for n, v in dist.items()}
    nodes, e = irregular_graph(docs, n_nodes=32)
    got = {r.node: r.dist
           for r in seed_distance(nodes, e, seed_mod=8,
                                  iterations=6).collect()}
    assert got == want
    assert 0 in got.values() and max(got.values()) >= 1


def test_least_min_null_semantics_match_across_engines(spark):
    """The BFS oracle relies on least()/min() skipping NULLs the same
    way in Spark and DuckDB."""
    s = spark.sql("SELECT least(CAST(NULL AS INT), 2) AS l").collect()
    assert s[0].l == 2
    d = duckdb.sql("SELECT least(CAST(NULL AS INT), 2) AS l").fetchone()
    assert d[0] == 2


def test_budget_allocation_sums_exactly(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    rows = recrawl.budget_allocation(orders, budget=1000).collect()
    assert sum(r.quota for r in rows) == 1000
    for r in rows:
        assert r.extra in (0, 1)
        assert r.quota == r.base_quota + r.extra
        assert r.base_quota >= 0
