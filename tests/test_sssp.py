"""K-hop Bellman-Ford tests: equality with a sequential Dijkstra once
K >= hop diameter, the K-bounded invariant for small K, reachability
semantics, and parallelism determinism."""

import heapq

import numpy as np

from data_model_spark.operators.sssp import sssp_khop


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long, w long")


def _dijkstra(edges, source):
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _bf_k(edges, source, k):
    """Sequential K-hop reference (min weight over <= k-edge walks)."""
    dist = {source: 0}
    for _ in range(k):
        nd = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nd.get(d, 1 << 62):
                nd[d] = dist[s] + w
        dist = nd
    return dist


def _random_graph(seed, n=30, m=120):
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(0, n)), int(rng.integers(0, n)), int(rng.integers(1, 50)))
        for _ in range(m)
    ]


def test_matches_dijkstra_when_k_covers_diameter(spark):
    edges = _random_graph(11)
    got = {
        r.node: r.dist
        for r in sssp_khop(_edges_df(spark, edges), 0, k=30).collect()
    }
    assert got == _dijkstra(edges, 0)


def test_k_bounded_semantics(spark):
    # path graph 0-1-2-3 (w=1 each) plus a heavy shortcut 0->3 (w=10):
    # k=1 sees only the shortcut; k=3 finds the light path
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    df = _edges_df(spark, edges)
    d1 = {r.node: r.dist for r in sssp_khop(df, 0, k=1).collect()}
    d3 = {r.node: r.dist for r in sssp_khop(df, 0, k=3).collect()}
    assert d1 == {0: 0, 1: 1, 3: 10}
    assert d3 == {0: 0, 1: 1, 2: 2, 3: 3}


def test_k_bounded_matches_reference_mid_convergence(spark):
    edges = _random_graph(5, n=25, m=60)
    for k in (1, 2, 3):
        got = {
            r.node: r.dist
            for r in sssp_khop(_edges_df(spark, edges), 0, k=k).collect()
        }
        assert got == _bf_k(edges, 0, k), k


def test_unreachable_absent(spark):
    edges = [(0, 1, 5), (2, 3, 1)]  # 2,3 in a separate component
    got = {r.node: r.dist for r in sssp_khop(_edges_df(spark, edges), 0, k=4).collect()}
    assert got == {0: 0, 1: 5}


def test_deterministic_across_parallelism(spark):
    edges = _random_graph(42, n=40, m=200)
    df = _edges_df(spark, edges)
    a = sorted(map(tuple, sssp_khop(df.repartition(1), 0, k=6).collect()))
    b = sorted(map(tuple, sssp_khop(df.repartition(17), 0, k=6).collect()))
    assert a == b and len(a) > 10
