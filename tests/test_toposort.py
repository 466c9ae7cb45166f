import pytest
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.toposort import (
    build_order,
    dag_levels,
)


def _graph(spark, n, edges):
    v = spark.createDataFrame(
        [(i, i % 3) for i in range(n)], "id long, label int"
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    return v, e


def ref_levels(n, edges):
    """Longest path ending at each vertex, O(V*E) relaxation."""
    lvl = [0] * n
    for _ in range(n):
        moved = False
        for s, d in edges:
            if lvl[s] + 1 > lvl[d]:
                lvl[d] = lvl[s] + 1
                moved = True
        if not moved:
            break
    return lvl


def test_dag_levels_diamond(spark):
    # 0 -> {1,2} -> 3, plus a skip edge 0->3: level(3)=2 (longest path wins)
    v, e = _graph(spark, 4, [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)])
    out, _ = dag_levels(spark, v, e, num_partitions=2)
    got = {r["id"]: r["level"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_dag_levels_matches_reference_random(spark):
    import random

    rng = random.Random(7)
    n = 40
    edges = sorted(
        {
            (a, b)
            for _ in range(120)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )  # src < dst => acyclic
    v, e = _graph(spark, n, edges)
    out, _ = dag_levels(spark, v, e, num_partitions=3)
    got = {r["id"]: r["level"] for r in out.collect()}
    want = ref_levels(n, edges)
    assert got == {i: want[i] for i in range(n)}


def test_dag_levels_raises_on_cycle(spark):
    v, e = _graph(spark, 3, [(0, 1), (1, 2), (2, 0)])
    with pytest.raises(ValueError, match="did not converge"):
        dag_levels(spark, v, e, num_partitions=2, max_rounds=8)


def test_build_order_contracts_cycles(spark):
    # cycle {0,1,2} -> 3 -> cycle {4,5} -> 6 ; 7 isolated
    edges = [
        (0, 1), (1, 2), (2, 0),
        (2, 3),
        (3, 4), (4, 5), (5, 4),
        (5, 6),
    ]
    v, e = _graph(spark, 8, edges)
    out, _ = build_order(spark, v, e, num_partitions=2)
    rows = {r["id"]: (r["comp"], r["level"]) for r in out.collect()}
    assert rows[0] == (0, 0) and rows[1] == (0, 0) and rows[2] == (0, 0)
    assert rows[3] == (3, 1)
    assert rows[4] == (4, 2) and rows[5] == (4, 2)
    assert rows[6] == (6, 3)
    assert rows[7] == (7, 0)


def test_build_order_plain_dag_is_levels(spark):
    v, e = _graph(spark, 5, [(0, 1), (1, 2), (0, 3), (3, 4), (1, 4)])
    out, _ = build_order(spark, v, e, num_partitions=2)
    lv, _ = dag_levels(spark, v, e, num_partitions=2)
    a = {r["id"]: r["level"] for r in out.collect()}
    b = {r["id"]: r["level"] for r in lv.collect()}
    assert a == b
    comps = {r["comp"] for r in out.collect()}
    assert comps == {0, 1, 2, 3, 4}  # all singletons
