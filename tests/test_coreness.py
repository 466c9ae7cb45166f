"""Core decomposition (H-index iteration) vs a python peeling oracle."""

import heapq
import random

import numpy as np
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.coreness import (
    _segment_hindex,
    coreness,
)


def peel_coreness(pairs):
    """Exact core numbers by min-degree peeling (lazy-delete heap)."""
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    core, removed, k = {}, set(), 0
    h = [(d, v) for v, d in deg.items()]
    heapq.heapify(h)
    while h:
        d, v = heapq.heappop(h)
        if v in removed or d != deg[v]:
            continue
        k = max(k, deg[v])
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(h, (deg[u], u))
    return core


def _graph(spark, pairs, extra_ids=()):
    e = spark.createDataFrame(sorted(pairs), "src long, dst long")
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ids = sorted({x for p in pairs for x in p} | set(extra_ids))
    v = spark.createDataFrame([(i, 0) for i in ids], "id long, label int")
    return v, e


def test_segment_hindex_closed_form():
    pos = np.array([0, 0, 1, 1, 1, 2, 0])
    val = np.array([3, 2, 5, 4, 2, 1, 3])
    cnt = np.array([1, 1, 1, 2, 1, 1, 1])
    upos, h = _segment_hindex(pos, val, cnt)
    assert upos.tolist() == [0, 1, 2] and h.tolist() == [2, 3, 1]


def test_coreness_known_shapes(spark):
    # triangle with a pendant tail and an isolated vertex:
    # triangle vertices core 2, tail core 1, isolated core 0
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    v, e = _graph(spark, pairs, extra_ids=[9])
    out, _ = coreness(spark, v, e, num_partitions=4)
    got = {r["id"]: r["coreness"] for r in out.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 9: 0}


def test_coreness_random_matches_peeling(spark):
    rng = random.Random(19)
    pairs = {
        (u, v)
        for u in range(40)
        for v in range(u + 1, 40)
        if rng.random() < 0.12
    }
    v, e = _graph(spark, pairs)
    out, metrics = coreness(spark, v, e, num_partitions=4)
    got = {r["id"]: r["coreness"] for r in out.collect()}
    want = peel_coreness(pairs)
    # vertices absent from any edge pair are not in `want`
    assert {k: c for k, c in got.items() if k in want} == want
    assert all(c == 0 for k, c in got.items() if k not in want)
    # monotone lattice: converged (last superstep reports zero changes)
    last = max(m["superstep"] for m in metrics)
    assert (
        sum(m["active_vertices"] for m in metrics if m["superstep"] == last)
        == 0
    )


def py_onion(pairs, extra_ids=()):
    """Wave replay: t = running max of min alive degree; each wave removes
    all deg <= t, assigning (layer, t)."""
    adj = {v: set() for v in extra_ids}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {x: len(ns) for x, ns in adj.items()}
    alive, t, lay, out = set(adj), -1, 0, {}
    while alive:
        t = max(t, min(deg[x] for x in alive))
        wave = [x for x in alive if deg[x] <= t]
        lay += 1
        for x in wave:
            out[x] = (lay, t)
            alive.discard(x)
        for x in wave:
            for u in adj[x]:
                if u in alive:
                    deg[u] -= 1
    return out


def test_onion_layers_matches_replay_and_coreness(spark):
    from subgraph_isomorphism_pregel_spark.operators.onion import onion_layers

    rng = random.Random(41)
    pairs = {
        (u, v)
        for u in range(36)
        for v in range(u + 1, 36)
        if rng.random() < 0.14
    }
    v, e = _graph(spark, pairs, extra_ids=[99])  # plus an isolate
    out, metrics = onion_layers(spark, v, e, num_partitions=4)
    got = {r["id"]: (r["layer"], r["coreness"]) for r in out.collect()}
    want = py_onion(pairs, extra_ids=[99])
    assert got == want
    # the isolate is its own first wave at threshold 0
    assert got[99] == (1, 0)
    # onion coreness == peeling coreness (cross-implementation identity)
    core = peel_coreness(pairs)
    assert {k: c for k, (_, c) in got.items() if k in core} == core
    # every vertex assigned (converged = nothing alive; the final
    # superstep may legitimately remove the last wave)
    assert all(l >= 1 and c >= 0 for l, c in got.values())
