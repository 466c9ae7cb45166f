"""Pivot-sampled betweenness (two-phase kernel Brandes) vs a pure-Python
Brandes oracle with the same level bound."""

import random
from collections import deque

from subgraph_isomorphism_pregel_spark.operators.betweenness import betweenness


def brandes(n, adj, sources, max_hops=16):
    bc = {v: 0.0 for v in range(n)}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for u in adj.get(w, ()):
                if u in dist and dist[u] == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def run(spark, n, und_edges, pivots, max_hops=16, P=3):
    edges = sorted(set(und_edges) | {(b, a) for a, b in und_edges})
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    vdf = spark.createDataFrame([(i, 0) for i in range(n)], "id long, label int")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out, _ = betweenness(spark, vdf, edf, pivots, max_hops=max_hops, num_partitions=P)
    got = {r["id"]: r["bc"] for r in out.collect()}
    want = brandes(n, adj, pivots, max_hops)
    return got, {v: round(want[v], 6) for v in range(n)}


def test_betweenness_random_matches_brandes(spark):
    for seed in (3, 9):
        rng = random.Random(seed)
        n = 24
        und = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.14}
        got, want = run(spark, n, und, pivots=[0, 7, 13])
        assert got == want, f"seed {seed}"


def test_betweenness_path_exact(spark):
    # path 0-1-2-3-4, pivot 0: delta(v) = #targets beyond v = 4 - v
    und = [(i, i + 1) for i in range(4)]
    got, want = run(spark, 5, und, pivots=[0], P=2)
    assert got == want == {0: 0.0, 1: 3.0, 2: 2.0, 3: 1.0, 4: 0.0}


def test_betweenness_hop_bound(spark):
    # bound 2 on a path: vertices beyond hop 2 contribute nothing
    und = [(i, i + 1) for i in range(5)]
    got, want = run(spark, 6, und, pivots=[0], max_hops=2, P=2)
    assert got == want
    assert got[3] == 0.0 and got[1] == 1.0


def test_betweenness_partitioning_invariance(spark):
    rng = random.Random(21)
    n = 18
    und = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.18}
    a, want = run(spark, n, und, pivots=[0, 5], P=2)
    b, _ = run(spark, n, und, pivots=[0, 5], P=5)
    assert a == b == want
