"""SCC (forward-backward coloring on the BSP kernel) vs a pure-Python
Tarjan oracle, plus the fixture the driver gate uses."""

import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.scc import scc
from subgraph_isomorphism_pregel_spark.sources.graph import dag_cycles_graph

SF_DIR = "/root/testdata/sf0.001"


def tarjan_min_scc(n, edges):
    """id -> min vertex id in its SCC (iterative Tarjan)."""
    adj = {u: [] for u in range(n)}
    for a, b in edges:
        adj[a].append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]
    for root in range(n):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def run_scc(spark, n, edges, P=2):
    verts = spark.createDataFrame([(i, 0) for i in range(n)], "id long, label int")
    e = spark.createDataFrame(list(edges), "src long, dst long")
    out, _ = scc(spark, verts, e, num_partitions=P)
    return {r["id"]: r["scc"] for r in out.collect()}


def test_scc_toy(spark):
    # cycle {0,1,2} -> cycle {3,4} -> chain 5 -> 6
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (0, 3), (4, 5), (5, 6)]
    got = run_scc(spark, 7, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 6}


def test_scc_singleton_chain_multi_round(spark):
    # a pure path: every vertex its own SCC, decided one color round at a
    # time (the coloring algorithm's worst case — exercises many phases)
    n = 8
    edges = [(i, i + 1) for i in range(n - 1)]
    got = run_scc(spark, n, edges)
    assert got == {i: i for i in range(n)}


def test_scc_random_matches_tarjan(spark):
    for seed in (1, 7, 13):
        rng = random.Random(seed)
        n = 30
        edges = {
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.08
        }
        want = tarjan_min_scc(n, edges)
        got = run_scc(spark, n, edges, P=3)
        assert got == want, f"seed {seed}"


def test_scc_partitioning_invariance(spark):
    rng = random.Random(42)
    n = 25
    edges = {(a, b) for a in range(n) for b in range(n) if a != b and rng.random() < 0.1}
    a = run_scc(spark, n, edges, P=2)
    b = run_scc(spark, n, edges, P=5)
    assert a == b == tarjan_min_scc(n, edges)


def test_scc_dag_cycles_fixture(spark):
    """The gated fixture at sf0.001: every complete group except the broken
    group 1 is one 50-vertex SCC; group 1 fragments; result matches Tarjan."""
    v, e = dag_cycles_graph(spark, SF_DIR)
    n = v.count()
    edges = [(r["src"], r["dst"]) for r in e.collect()]
    want = tarjan_min_scc(n, edges)
    out, _ = scc(spark, v, e)
    got = {r["id"]: r["scc"] for r in out.collect()}
    assert got == want
    # sanity on the designed shape: group 0 is a single SCC rooted at 0
    assert all(got[i] == 0 for i in range(50))
    # group 1: a 45-cycle SCC plus a 5-singleton tail chain
    assert {got[i] for i in range(50, 100)} == {50, 95, 96, 97, 98, 99}
