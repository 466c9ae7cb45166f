"""Luby MIS: independence + maximality invariants, pure-python round
replay, and partitioning stability."""

import hashlib
import random
from collections import defaultdict

import pytest

from subgraph_isomorphism_pregel_spark.operators.mis import maximal_independent_set


def mis_oracle(vs, es, rounds=None, salt=""):
    nbrs = defaultdict(set)
    for s, t in es:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    und = set(vs)
    mis, exc = set(), set()
    r = 0
    while und and (rounds is None or r < rounds):
        r += 1

        def p(x):
            return (hashlib.md5(f"{x}:{r}:{salt}".encode()).hexdigest(), x)

        winners = {
            v
            for v in und
            if all(p(v) < p(u) for u in nbrs[v] & und)
        }
        newly = {u for w in winners for u in nbrs[w] & und} - winners
        mis |= winners
        exc |= newly
        und -= winners | newly
    out = {v: "mis" for v in mis}
    out.update({v: "excluded" for v in exc})
    out.update({v: "undecided" for v in und})
    return out


def random_graph(n=50, p=0.1, seed=2, iso=2):
    rng = random.Random(seed)
    vs = list(range(n + iso))
    es = sorted(
        {(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p}
    )
    return vs, es


def to_dfs(spark, vs, es):
    v = spark.createDataFrame([(x,) for x in vs], "id long")
    e = spark.createDataFrame(es, "src long, dst long") if es else spark.createDataFrame(
        [], "src long, dst long"
    )
    return v, e


def test_mis_completion_matches_oracle_and_invariants(spark):
    vs, es = random_graph()
    v, e = to_dfs(spark, vs, es)
    got = {
        r["id"]: r["status"]
        for r in maximal_independent_set(v, e, salt="t").collect()
    }
    assert got == mis_oracle(vs, es, salt="t")
    assert "undecided" not in set(got.values())
    nbrs = defaultdict(set)
    for s, t in es:
        nbrs[s].add(t)
        nbrs[t].add(s)
    chosen = {x for x, s in got.items() if s == "mis"}
    # independence: no edge inside the set
    assert all(not (nbrs[x] & chosen) for x in chosen)
    # maximality: every excluded vertex has a chosen neighbor
    assert all(nbrs[x] & chosen for x, s in got.items() if s == "excluded")
    # isolated vertices are always chosen
    assert all(got[x] == "mis" for x in vs if not nbrs[x])


def test_mis_fixed_rounds_matches_oracle(spark):
    vs, es = random_graph(n=40, seed=5)
    v, e = to_dfs(spark, vs, es)
    got = {
        r["id"]: r["status"]
        for r in maximal_independent_set(v, e, rounds=1, salt="t").collect()
    }
    assert got == mis_oracle(vs, es, rounds=1, salt="t")


def test_mis_stable_under_repartition(spark):
    vs, es = random_graph(n=30, seed=9)
    v, e = to_dfs(spark, vs, es)
    a = sorted(map(tuple, maximal_independent_set(v, e, salt="q").collect()))
    b = sorted(
        map(
            tuple,
            maximal_independent_set(
                v.repartition(7), e.repartition(5), salt="q"
            ).collect(),
        )
    )
    assert a == b
