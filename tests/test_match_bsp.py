"""BSP-mode matcher parity: the kernel-based vertex program must produce the
same mapping counts as the join formulation (pseudo=False) on the full toy
query set and on a random graph — the survey's milestone-4/5 design claim
(SURVEY §7), exercised on irregular frontier payloads."""

import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher
from subgraph_isomorphism_pregel_spark.operators.match_bsp import match_count_bsp
from subgraph_isomorphism_pregel_spark.sources.graph import toy_graph

from .test_match import QUERIES

A, B, C = ord("a"), ord("b"), ord("c")


@pytest.fixture(scope="module")
def toy_counts(spark):
    """Join-mode counts (pseudo=False — BSP mode enumerates every vertex)."""
    v, e = toy_graph(spark)
    m = SubgraphMatcher(spark, v, e)
    counts = {
        name: m.count(qv, qe, pseudo=False) for name, (qv, qe) in QUERIES.items()
    }
    m.unpersist()
    return v, e, counts


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_bsp_equals_join_mode_on_toy(spark, toy_counts, name):
    v, e, counts = toy_counts
    qv, qe = QUERIES[name]
    assert match_count_bsp(spark, v, e, qv, qe, num_partitions=4) == counts[name]


def test_bsp_on_random_graph(spark):
    rng = random.Random(7)
    n = 40
    verts = [(i, rng.choice([A, B, C])) for i in range(n)]
    edges = set()
    for _ in range(120):
        a, b = rng.sample(range(n), 2)
        edges |= {(a, b), (b, a)}
    v = spark.createDataFrame(verts, "id long, label int")
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    # branching query (route phase exercised: parent of node 3 is node 1)
    qv = {1: A, 2: B, 3: C, 4: B}
    qe = {(1, 2), (2, 1), (1, 3), (3, 1), (3, 4), (4, 3)}
    m = SubgraphMatcher(spark, v, e)
    try:
        expect = m.count(qv, qe, pseudo=False)
    finally:
        m.unpersist()
    assert match_count_bsp(spark, v, e, qv, qe, num_partitions=8) == expect
