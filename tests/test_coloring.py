"""Jones–Plassmann greedy coloring — oracle is the sequential greedy scan
in ascending (md5 priority, id) order, which the parallel rounds must
reproduce exactly."""

import hashlib
import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.coloring import greedy_coloring


def _random_graph(seed: int, n: int, m: int):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _greedy_oracle(n, edges, salt):
    def prio(x):
        return (hashlib.md5(f"{x}:{salt}".encode()).hexdigest(), x)

    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for x in sorted(range(n), key=prio):
        used = {out[y] for y in adj[x] if y in out}
        c = 0
        while c in used:
            c += 1
        out[x] = c
    return out


def _dfs(spark, n, edges):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return v, e


@pytest.mark.parametrize("seed,n,m,salt", [(1, 50, 120, "a"), (2, 90, 260, "b")])
def test_coloring_matches_sequential_greedy(spark, seed, n, m, salt):
    edges = _random_graph(seed, n, m)
    v, e = _dfs(spark, n, edges)
    col, _ = greedy_coloring(v, e, salt=salt)
    got = {r.id: r.color for r in col.collect()}
    assert got == _greedy_oracle(n, edges, salt)


def test_coloring_is_proper_and_bounded(spark):
    edges = _random_graph(3, 80, 200)
    v, e = _dfs(spark, 80, edges)
    col, _ = greedy_coloring(v, e, salt="p")
    got = {r.id: r.color for r in col.collect()}
    assert set(got) == set(range(80))  # completion: every vertex colored
    for a, b in edges:
        assert got[a] != got[b]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert max(got.values()) <= max(deg.values())  # greedy bound Δ+1


def test_coloring_fixed_rounds_is_prefix(spark):
    edges = _random_graph(5, 70, 170)
    v, e = _dfs(spark, 70, edges)
    partial, r = greedy_coloring(v, e, rounds=2, salt="q")
    full, _ = greedy_coloring(v, e, salt="q")
    p = {(x.id, x.color) for x in partial.collect()}
    assert r == 2 and p
    assert p.issubset({(x.id, x.color) for x in full.collect()})


def test_coloring_isolated_and_edgeless(spark):
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    col, rounds = greedy_coloring(v, e, salt="z")
    got = {r.id: r.color for r in col.collect()}
    # isolated vertices (2,3,4) all color 0 in round 1
    assert got[2] == got[3] == got[4] == 0
    assert {got[0], got[1]} == {0, 1}
    assert rounds <= 2


def test_coloring_partitioning_invariance(spark):
    edges = _random_graph(7, 60, 140)
    v, e = _dfs(spark, 60, edges)
    a, _ = greedy_coloring(v.repartition(1), e.repartition(1), salt="s")
    b, _ = greedy_coloring(v.repartition(8), e.repartition(16, "dst"), salt="s")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
