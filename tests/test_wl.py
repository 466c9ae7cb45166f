"""Weisfeiler-Leman refinement vs an exact python replay, plus the
canonical WL properties (permutation invariance, known 1-WL blindness on
regular graphs)."""

import hashlib
import random

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.wl import wl_histogram, wl_refine


def py_wl(labels, pairs, rounds):
    """labels: {id: label}; pairs: undirected edge set. Returns {id: color}."""
    adj = {v: [] for v in labels}
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    c = {v: md5(str(l)) for v, l in labels.items()}
    for _ in range(rounds):
        c = {
            v: md5(c[v] + "|" + ",".join(sorted(c[u] for u in adj[v])))
            for v in labels
        }
    return c


def _graph(spark, labels, pairs):
    v = spark.createDataFrame(
        sorted(labels.items()), "id long, label int"
    )
    e = spark.createDataFrame(sorted(pairs), "src long, dst long")
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return v, e


def test_wl_matches_python_replay(spark):
    rng = random.Random(31)
    labels = {i: i % 3 for i in range(18)}
    pairs = {
        (u, v)
        for u in range(18)
        for v in range(u + 1, 18)
        if rng.random() < 0.2
    }
    v, e = _graph(spark, labels, pairs)
    for rounds in (0, 1, 3):
        got = {r["id"]: r["color"] for r in wl_refine(v, e, rounds).collect()}
        assert got == py_wl(labels, pairs, rounds), rounds


def test_wl_structural_classes_and_isolates(spark):
    # path 0-1-2-3, uniform labels: the automorphism classes {0,3} and
    # {1,2} get equal colors, the classes differ; isolate 9 is its own class
    labels = {i: 0 for i in [0, 1, 2, 3, 9]}
    v, e = _graph(spark, labels, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["color"] for r in wl_refine(v, e, 2).collect()}
    assert got[0] == got[3] and got[1] == got[2]
    assert len({got[0], got[1], got[9]}) == 3


def test_wl_histogram_permutation_invariant_and_regular_blindness(spark):
    rng = random.Random(5)
    labels = {i: 0 for i in range(12)}
    pairs = {
        (u, v)
        for u in range(12)
        for v in range(u + 1, 12)
        if rng.random() < 0.3
    }
    perm = list(range(12))
    rng.shuffle(perm)
    v1, e1 = _graph(spark, labels, pairs)
    v2, e2 = _graph(spark, labels, {(perm[u], perm[v]) for u, v in pairs})
    h1 = sorted(map(tuple, wl_histogram(v1, e1, 3).collect()))
    h2 = sorted(map(tuple, wl_histogram(v2, e2, 3).collect()))
    assert h1 == h2  # isomorphic graphs -> identical fingerprints

    # the documented 1-WL limit: C6 and 2xC3 are both 2-regular and
    # share one color class — the fingerprint CANNOT separate them
    # (that is the matcher's job; WL is the cheap pre-filter)
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    c3x2 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    va, ea = _graph(spark, {i: 0 for i in range(6)}, c6)
    vb, eb = _graph(spark, {i: 0 for i in range(6)}, c3x2)
    ha = sorted(map(tuple, wl_histogram(va, ea, 3).collect()))
    hb = sorted(map(tuple, wl_histogram(vb, eb, 3).collect()))
    assert ha == hb
