"""Skew handling (FIXTURES.md §5): star-heavy hub graph — identical results
across partition counts, bounded hub inboxes (the per-source-partition partial
aggregation = salting), and the skew-ratio metric present."""

import random

from subgraph_isomorphism_pregel_spark.operators.components import connected_components
from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank

from .oracles import components_oracle, pagerank_oracle


def hub_graph(n=200, seed=5):
    """One hub (vertex 0) adjacent to ~30% of vertices + background ER."""
    rng = random.Random(seed)
    es = set()
    for v in range(1, n):
        if rng.random() < 0.3:
            es.add((0, v))
            es.add((v, 0))
    for _ in range(n):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((a, b))
            es.add((b, a))
    return list(range(n)), sorted(es)


def test_hub_graph_partition_invariance_and_skew_metric(spark):
    vs, es = hub_graph()
    v = spark.createDataFrame([(x, x % 3) for x in vs], "id long, label int")
    e = spark.createDataFrame(es, "src long, dst long")

    want = pagerank_oracle(vs, es, fixed_steps=25)
    results = {}
    for P in (1, 8, 32):
        scores, metrics = pagerank(spark, v, e, num_partitions=P, fixed_steps=25)
        got = {r["id"]: r["score"] for r in scores.collect()}
        results[P] = got
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6, (P, k)
        assert all("skew_ratio" in m for m in metrics)
        if P > 1:
            # the hub makes some partition's inbox heavier than the mean
            assert max(m["skew_ratio"] for m in metrics) > 1.0
            # salting bound: any vertex's inbox is at most P partial rows, so
            # no partition's message count can exceed P * its vertex count
            for m in metrics:
                assert m["messages_received"] <= P * len(vs)
    for P in (8, 32):
        assert all(abs(results[P][k] - results[1][k]) < 1e-9 for k in results[1])

    comp, _ = connected_components(spark, v, e, num_partitions=8)
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == components_oracle(vs, es)


def test_matcher_on_hub_graph(spark):
    """Frontier skew: a path-2 query through a hub creates deg(hub)^2
    partial embeddings rooted at one vertex. The join matcher must stay
    correct (AQE skew splitting handles the hot build side) and the
    factorized/pruned path must agree with brute force."""
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    from .oracles import match_count_oracle

    vs, es = hub_graph(n=120, seed=9)
    data_v = {x: x % 3 for x in vs}
    v = spark.createDataFrame(sorted(data_v.items()), "id long, label int")
    e = spark.createDataFrame(es, "src long, dst long")
    m = SubgraphMatcher(spark, v, e)
    try:
        # star through the hub label (0): two leaves + a tail
        queries = [
            ({1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (1, 3), (3, 1)}),
            ({1: 0, 2: 1, 3: 1}, {(1, 2), (2, 1), (1, 3), (3, 1)}),
            ({1: 1, 2: 0, 3: 1, 4: 2},
             {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)}),
        ]
        for qv, qe in queries:
            want = match_count_oracle(data_v, set(es), qv, qe)
            assert m.count(qv, qe, pseudo=False) == want
            assert m.count(qv, qe, pseudo=True, prune=True) == want
            assert m.count(qv, qe, pseudo=False, backward="semijoin") == want
    finally:
        m.unpersist()
