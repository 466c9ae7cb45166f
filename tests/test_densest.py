"""Densest subgraph (Bahmani parallel peeling) — oracle is the identical
peel recurrence in plain Python plus a planted-clique recovery check and
the 2(1+eps) approximation bound on brute-forced small graphs."""

import itertools
import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.densest import densest_subgraph


def _peel_oracle(rows):
    E = {tuple(sorted(p)) for p in rows if p[0] != p[1]}
    hist = []
    r = 0
    while True:
        V = {x for p in E for x in p}
        n, m = len(V), len(E)
        if n:
            hist.append((r, m, n))
        if m == 0:
            break
        r += 1
        deg = {}
        for u, v in E:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {x for x in V if 2 * deg[x] * n > 5 * m}
        E = {(u, v) for u, v in E if u in keep and v in keep}
    return max(hist, key=lambda t: (t[1] / t[2], -t[0]))


def test_densest_recovers_planted_clique(spark):
    clique = list(itertools.combinations(range(8), 2))
    periphery = [(i, i + 1) for i in range(8, 60)] + [(0, 8)]
    e = spark.createDataFrame(clique + periphery, "src long, dst long")
    best, stats = densest_subgraph(e)
    assert sorted(x.id for x in best.collect()) == list(range(8))
    assert stats["m"] == 28 and stats["n"] == 8 and stats["density"] == 3.5


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_densest_matches_peel_oracle(spark, seed):
    rng = random.Random(seed)
    rows = list(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(60), rng.randrange(60)) for _ in range(350))
            if a != b
        }
    )
    e = spark.createDataFrame(rows, "src long, dst long")
    _, stats = densest_subgraph(e)
    br, bm, bn = _peel_oracle(rows)
    assert (stats["round"], stats["m"], stats["n"]) == (br, bm, bn)


def test_densest_approximation_bound(spark):
    """Peel density >= OPT / 2.5 (the 2(1+eps) guarantee with eps=1/4),
    with OPT brute-forced over all subsets of a small graph."""
    rng = random.Random(9)
    n = 10
    rows = list(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(30))
            if a != b
        }
    )
    e = spark.createDataFrame(rows, "src long, dst long")
    _, stats = densest_subgraph(e)
    opt = 0.0
    verts = sorted({x for p in rows for x in p})
    for k in range(1, len(verts) + 1):
        for sub in itertools.combinations(verts, k):
            s = set(sub)
            m = sum(1 for u, v in rows if u in s and v in s)
            opt = max(opt, m / len(s))
    assert stats["density"] >= opt / 2.5 - 1e-12


def test_densest_fixed_rounds_prefix_and_empty(spark):
    rows = [(i, i + 1) for i in range(20)]
    e = spark.createDataFrame(rows, "src long, dst long")
    best0, st0 = densest_subgraph(e, rounds=0)
    # zero rounds: the only prefix is the full graph
    assert st0["round"] == 0 and st0["n"] == 21 and st0["m"] == 20
    assert best0.count() == 21
    empty = spark.createDataFrame([], "src long, dst long")
    b, st = densest_subgraph(empty)
    assert b.count() == 0 and st["n"] == 0
