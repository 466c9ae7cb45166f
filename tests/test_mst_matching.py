"""Borůvka minimum spanning forest + lex-first maximal matching.

Oracles are plain-Python: Kruskal with union-find under the same
(w, u, v) total order for the forest, and the sequential greedy scan in
ascending (md5 priority, u, v) order for the matching — the definitions
the distributed rounds must reproduce exactly.
"""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.matching import maximal_matching
from subgraph_isomorphism_pregel_spark.operators.mst import boruvka_msf


def _random_graph(seed: int, n: int, m: int, components: int = 1):
    """Random weighted graph; `components` > 1 keeps id ranges disjoint so
    the expected result is a spanning FOREST."""
    rng = random.Random(seed)
    edges = set()
    size = n // components
    tries = 0
    while len(edges) < m and tries < 20 * m:
        tries += 1
        c = rng.randrange(components)
        lo = c * size
        a, b = lo + rng.randrange(size), lo + rng.randrange(size)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    weights = rng.sample(range(1, 100_000), len(edges))
    return [(u, v, float(w)) for (u, v), w in zip(sorted(edges), weights)]


def _kruskal(rows, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for u, v, w in sorted(rows, key=lambda t: (t[2], t[0], t[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def _greedy_matching(rows, salt):
    def prio(u, v):
        return hashlib.md5(f"{u}:{v}:{salt}".encode()).hexdigest()

    free = set()
    for u, v, *_ in rows:
        free.add(u)
        free.add(v)
    out = set()
    for u, v, *_ in sorted(rows, key=lambda t: (prio(t[0], t[1]), t[0], t[1])):
        if u in free and v in free:
            out.add((u, v))
            free.discard(u)
            free.discard(v)
    return out


@pytest.mark.parametrize("seed,n,m", [(1, 40, 90), (2, 80, 200), (3, 120, 180)])
def test_boruvka_matches_kruskal(spark, seed, n, m):
    rows = _random_graph(seed, n, m)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    forest, rounds = boruvka_msf(e)
    got = {(r.u, r.v, r.w) for r in forest.collect()}
    assert got == _kruskal(rows, n)
    assert rounds <= math.ceil(math.log2(n)) + 1


def test_boruvka_forest_on_disconnected(spark):
    rows = _random_graph(11, 90, 160, components=3)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    forest, _ = boruvka_msf(e)
    got = {(r.u, r.v, r.w) for r in forest.collect()}
    assert got == _kruskal(rows, 90)


def test_boruvka_duplicate_and_reversed_edges(spark):
    """Both directions + parallel duplicates collapse to the min weight."""
    rows = _random_graph(5, 50, 110)
    doubled = rows + [(v, u, w + 7.0) for u, v, w in rows]
    e = spark.createDataFrame(doubled, "src long, dst long, w double")
    forest, _ = boruvka_msf(e)
    got = {(r.u, r.v, r.w) for r in forest.collect()}
    assert got == _kruskal(rows, 50)


def test_boruvka_partitioning_invariance(spark):
    rows = _random_graph(9, 60, 140)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    a, _ = boruvka_msf(e.repartition(1))
    b, _ = boruvka_msf(e.repartition(16, "dst"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_boruvka_ties_resolved_by_total_order(spark):
    """Equal weights everywhere: the unique MSF under (w, u, v) is still
    well-defined and Kruskal under the same order agrees."""
    rows = [(u, v, 1.0) for u, v, _ in _random_graph(13, 40, 100)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    forest, _ = boruvka_msf(e)
    got = {(r.u, r.v, r.w) for r in forest.collect()}
    assert got == _kruskal(rows, 40)


def test_boruvka_max_rounds_partial(spark):
    """An early cap yields a sub-forest of the true MSF (every picked edge
    is an MSF edge — the cut property holds per round)."""
    rows = _random_graph(21, 100, 220)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    partial, r = boruvka_msf(e, max_rounds=1)
    assert r == 1
    got = {(x.u, x.v, x.w) for x in partial.collect()}
    full = _kruskal(rows, 100)
    assert got and got.issubset(full)


@pytest.mark.parametrize("seed,n,m,salt", [(4, 40, 90, "a"), (6, 90, 210, "b")])
def test_matching_matches_sequential_greedy(spark, seed, n, m, salt):
    rows = _random_graph(seed, n, m)
    e = spark.createDataFrame(rows, "src long, dst long, w double").select("src", "dst")
    m_df, _ = maximal_matching(e, salt=salt)
    got = {(r.u, r.v) for r in m_df.collect()}
    assert got == _greedy_matching(rows, salt)


def test_matching_is_maximal_and_valid(spark):
    rows = _random_graph(8, 70, 150)
    e = spark.createDataFrame(rows, "src long, dst long, w double").select("src", "dst")
    m_df, _ = maximal_matching(e, salt="x")
    pairs = [(r.u, r.v) for r in m_df.collect()]
    used = [x for p in pairs for x in p]
    assert len(used) == len(set(used))  # a matching: no shared endpoints
    sat = set(used)
    for u, v, _ in rows:  # maximal: no edge with both endpoints free
        assert u in sat or v in sat


def test_matching_fixed_rounds_is_prefix(spark):
    """The fixed-round form returns a prefix of the greedy scan: every
    round-r edge is in the full matching, stamped with its round."""
    rows = _random_graph(10, 80, 180)
    e = spark.createDataFrame(rows, "src long, dst long, w double").select("src", "dst")
    partial, r1 = maximal_matching(e, rounds=1, salt="p")
    full, _ = maximal_matching(e, salt="p")
    p = {(x.u, x.v) for x in partial.collect()}
    assert r1 == 1 and p
    assert p.issubset({(x.u, x.v) for x in full.collect()})
    assert {x.matched_round for x in partial.collect()} == {1}


def test_matching_partitioning_invariance(spark):
    rows = _random_graph(15, 60, 130)
    e = spark.createDataFrame(rows, "src long, dst long, w double").select("src", "dst")
    a, _ = maximal_matching(e.repartition(1), salt="q")
    b, _ = maximal_matching(e.repartition(16, "src"), salt="q")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_weighted_ring_fixture_msf_is_the_path(spark, tmp_path):
    """The planted construction: the unique MSF of weighted_ring_graph is
    the path 0—1—…—(n-1) with its formula weights."""
    import pandas as pd

    n = 64
    pd.DataFrame({"p_partkey": range(1, n + 1)}).to_parquet(tmp_path / "part.parquet")
    from subgraph_isomorphism_pregel_spark.sources.graph import weighted_ring_graph

    e = weighted_ring_graph(spark, str(tmp_path))
    forest, rounds = boruvka_msf(e, local_finish_max=0)
    got = sorted(map(tuple, forest.collect()))
    want = sorted((i, i + 1, float(1 + i % 7)) for i in range(n - 1))
    assert got == want
    assert 1 < rounds <= math.ceil(math.log2(n)) + 1


def test_boruvka_distributed_ladder_path(spark, monkeypatch):
    """Force the distributed pointer-jump ladder (threshold 0) and check it
    agrees with the driver-side flatten on the same graph."""
    from subgraph_isomorphism_pregel_spark.operators import mst as mst_mod

    rows = _random_graph(17, 80, 180)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    a, _ = boruvka_msf(e)
    monkeypatch.setattr(mst_mod, "PTR_COLLECT_MAX", 0)
    b, _ = boruvka_msf(e, local_finish_max=0)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert {tuple(x) for x in b.collect()} == _kruskal(rows, 80)


def test_boruvka_local_finish_parity(spark):
    """The Kruskal cutover returns exactly the forest the remaining
    distributed rounds would (unique MSF under the total order), in fewer
    distributed rounds."""
    rows = _random_graph(23, 120, 260)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    cut_forest, cut_rounds = boruvka_msf(e)  # default cutover: round 1 then local
    lad_forest, lad_rounds = boruvka_msf(e, local_finish_max=0)
    assert sorted(map(tuple, cut_forest.collect())) == sorted(
        map(tuple, lad_forest.collect())
    )
    assert {tuple(x) for x in cut_forest.collect()} == _kruskal(rows, 120)
    assert cut_rounds < lad_rounds
