"""Butterfly (bipartite 4-cycle) counting vs a brute-force oracle."""

import random
from itertools import combinations

from subgraph_isomorphism_pregel_spark.operators.triangles import butterflies


def brute_butterflies(edges):
    """Count 4-cycles (u1,v1,u2,v2) with u's left, v's right, u1<u2, v1<v2."""
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
    total = 0
    for u1, u2 in combinations(sorted(nbrs), 2):
        c = len(nbrs[u1] & nbrs[u2])
        total += c * (c - 1) // 2
    return total


def test_butterflies_matches_bruteforce_and_side_invariance(spark):
    rng = random.Random(11)
    edges = {(u, 1000 + v) for u in range(20) for v in range(15) if rng.random() < 0.3}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    want = brute_butterflies(edges)
    got_src = butterflies(df, center="src").collect()[0]["butterflies"]
    got_dst = butterflies(df, center="dst").collect()[0]["butterflies"]
    assert got_src == got_dst == want


def test_butterflies_known_small(spark):
    # K_{2,2} = exactly one butterfly; adding a third right vertex to both
    # left vertices makes C(3,2) = 3
    df = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10), (1, 11)], "src long, dst long"
    )
    assert butterflies(df).collect()[0]["butterflies"] == 1
    df2 = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 10), (1, 11), (1, 12)], "src long, dst long"
    )
    assert butterflies(df2).collect()[0]["butterflies"] == 3


def test_butterflies_empty_and_hub_cap(spark):
    df = spark.createDataFrame([(0, 10), (1, 11)], "src long, dst long")
    assert butterflies(df).collect()[0]["butterflies"] == 0
    # hub cap: dropping the degree-3 centers removes every butterfly
    df2 = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 10), (1, 11), (1, 12)], "src long, dst long"
    )
    capped = butterflies(df2, max_center_degree=2).collect()[0]["butterflies"]
    assert capped == 0
