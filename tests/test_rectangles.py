"""Exact 4-cycle (rectangle) counting vs a brute-force oracle."""

import random
from itertools import combinations

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.triangles import rectangle_stats


def brute_c4(edges):
    """Count non-induced 4-cycles by enumerating opposite-corner pairs:
    each cycle u-x-w-y-u contributes C(cn,2) at both {u,w} and {x,y}."""
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    total = 0
    for u, w in combinations(sorted(nbrs), 2):
        c = len(nbrs[u] & nbrs[w])
        total += c * (c - 1) // 2
    assert total % 2 == 0
    return total // 2


def _sym(spark, pairs):
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def test_rectangles_known_shapes(spark):
    # a single square has exactly one 4-cycle; K4 has three
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    row = rectangle_stats(spark, _sym(spark, square)).collect()[0]
    assert row["c4_count"] == 1 and row["max_copaths"] == 2

    k4 = list(combinations(range(4), 2))
    assert rectangle_stats(spark, _sym(spark, k4)).collect()[0]["c4_count"] == 3

    # a triangle has none (no pair has two common neighbors)
    tri = [(0, 1), (1, 2), (2, 0)]
    assert rectangle_stats(spark, _sym(spark, tri)).collect()[0]["c4_count"] == 0


def test_rectangles_random_matches_bruteforce(spark):
    rng = random.Random(7)
    edges = {
        (u, v)
        for u in range(24)
        for v in range(u + 1, 24)
        if rng.random() < 0.22
    }
    row = rectangle_stats(spark, _sym(spark, edges)).collect()[0]
    assert row["c4_count"] == brute_c4(edges)
    # n_wedges is sum over ordered endpoint pairs of common-neighbor counts
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    want_wedges = sum(
        len(nbrs[u] & nbrs[w]) for u, w in combinations(sorted(nbrs), 2)
    )
    assert row["n_wedges"] == want_wedges


def test_rectangles_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    row = rectangle_stats(spark, empty).collect()[0]
    assert (row["n_wedges"], row["max_copaths"], row["c4_count"]) == (0, 0, 0)
