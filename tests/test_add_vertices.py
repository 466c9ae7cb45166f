"""Runtime vertex addition (reference F9): growing the graph incrementally
must be indistinguishable from building it whole — verified by running
PageRank and connected components on both and comparing results exactly."""

import numpy as np
import pytest

from subgraph_isomorphism_pregel_spark.operators.components import cc_program
from subgraph_isomorphism_pregel_spark.operators.pagerank import (
    Pregel,
    build_parts,
    pagerank_program,
    scores_df,
)
from subgraph_isomorphism_pregel_spark.operators.pregel import add_vertices


def _graph(spark, vs, es):
    v = spark.createDataFrame(sorted(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    return v, e


def test_incremental_equals_full_build(spark):
    P = 4
    # old ids straddle the new ones (100+ block) so the append lands UNSORTED
    # within blocks — full build sorts ids, grown appends; positions differ
    # but results must not
    vs0 = {i: i % 3 for i in range(12)} | {100 + i: i % 3 for i in range(4)}
    es0 = {(i, (i + 1) % 12) for i in range(12)} | {((i + 1) % 12, i) for i in range(12)}
    es0 |= {(100 + i, i) for i in range(4)} | {(i, 100 + i) for i in range(4)}
    # growth: 4 new vertices incl. one landing in every pid, edges old<->new
    vs1 = {20: 0, 21: 1, 22: 2, 23: 0}
    es1 = {(20, 21), (21, 20), (0, 20), (20, 0), (5, 22), (22, 5), (23, 11), (11, 23)}

    v0, e0 = _graph(spark, vs0, es0)
    parts = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts, nv, ne, P)

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    full = build_parts(spark, vall, eall, P)

    def run_both(prog_fn, steps, carry0=None):
        outs = []
        for p in (grown, full):
            prog = prog_fn()
            final, _ = Pregel(spark, p, P).run(prog, max_steps=steps, carry0=carry0)
            outs.append(final)
        return outs

    n = len(vs0) + len(vs1)
    a, b = run_both(lambda: pagerank_program(n, P, fixed_steps=6), 6, {"dangling": 0.0})
    ra = {r["id"]: r["score"] for r in scores_df(a).collect()}
    rb = {r["id"]: r["score"] for r in scores_df(b).collect()}
    assert set(ra) == set(rb) == set(vall.toPandas()["id"])
    for k in ra:
        assert abs(ra[k] - rb[k]) < 1e-12, k

    a, b = run_both(lambda: cc_program(P), 50)
    from subgraph_isomorphism_pregel_spark.operators.components import components_df

    ca = {r["id"]: r["component"] for r in components_df(a).collect()}
    cb = {r["id"]: r["component"] for r in components_df(b).collect()}
    assert ca == cb
    # 20-21 formed their own island joined to 0 via (0,20): all one component
    assert len(set(ca.values())) == 1


def test_bsp_match_on_grown_parts(spark):
    """Regression (ADVICE r2): match_bsp binary-searches ids, but blocks
    grown via add_vertices have UNSORTED ids — the per-block sorter must make
    BSP counts on grown parts equal join-mode counts on the full graph.
    Queries include a cycle (backward-edge check) and same-label twins."""
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher
    from subgraph_isomorphism_pregel_spark.operators.match_bsp import match_count_bsp

    P = 4
    vs0 = {i: i % 3 for i in range(12)} | {100 + i: i % 3 for i in range(4)}
    es0 = {(i, (i + 1) % 12) for i in range(12)} | {((i + 1) % 12, i) for i in range(12)}
    es0 |= {(100 + i, i) for i in range(4)} | {(i, 100 + i) for i in range(4)}
    vs1 = {20: 0, 21: 1, 22: 2, 23: 0}
    es1 = {(20, 21), (21, 20), (0, 20), (20, 0), (5, 22), (22, 5), (23, 11), (11, 23)}

    v0, e0 = _graph(spark, vs0, es0)
    parts = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts, nv, ne, P).cache()

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    queries = {
        "path3": ({1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (2, 3), (3, 2)}),
        "tri": (
            {1: 0, 2: 1, 3: 2},
            {(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)},
        ),
        "cycle4": (
            {1: 0, 2: 1, 3: 2, 4: 0},
            {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)},
        ),
        "twin": ({1: 1, 2: 0, 3: 0}, {(1, 2), (2, 1), (1, 3), (3, 1)}),
    }
    m = SubgraphMatcher(spark, vall, eall)
    try:
        for name, (qv, qe) in queries.items():
            want = m.count(qv, qe, pseudo=False)
            got = match_count_bsp(
                spark, vall, eall, qv, qe, num_partitions=P, parts=grown
            )
            assert got == want, (name, got, want)
    finally:
        m.unpersist()
        grown.unpersist()


def test_add_vertices_rejects_bad_edges(spark):
    P = 2
    v0, e0 = _graph(spark, {0: 0, 1: 1}, {(0, 1), (1, 0)})
    parts = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, {2: 0}, {(2, 99), (99, 2)})
    with pytest.raises(Exception, match="absent"):
        add_vertices(spark, parts, nv, ne, P).collect()


def test_warm_restart_after_delta(spark):
    """pagerank_warm seeded from the pre-delta fixed point converges to
    the SAME scores as a cold run on the grown graph (power iteration has
    one fixed point; the start only changes the step count) — in FEWER
    supersteps, which is the point of warm-starting a nightly delta."""
    from subgraph_isomorphism_pregel_spark.operators.pagerank import (
        pagerank,
        pagerank_warm,
    )

    P = 4
    # skewed IN-degrees (directed arithmetic fanout) so the fixed point is
    # far from uniform — on a symmetric ring uniform IS the fixed point and
    # a cold start would trivially win
    vs0 = {i: i % 3 for i in range(40)}
    # (i^2+1)%40 collides heavily (quadratic residues), so in-degree ranges
    # 0..several — coprime LINEAR maps would be permutations and make the
    # transition doubly stochastic (uniform fixed point) again
    es0 = {(i, (i * i + 1) % 40) for i in range(40)} | {
        (i, (7 * i + 3) % 40) for i in range(40)
    }
    es0 = {(a, b) for a, b in es0 if a != b}
    v0, e0 = _graph(spark, vs0, es0)

    prior, m0 = pagerank(spark, v0, e0, num_partitions=P, tol=1e-8)
    prior = prior.cache()

    vs1 = {200: 0, 201: 1}
    es1 = {(200, 201), (201, 200), (0, 200), (200, 0)}
    parts0 = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts0, nv, ne, P).cache()

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    cold, mc = pagerank(spark, vall, eall, num_partitions=P, tol=1e-8)
    warm, mw = pagerank_warm(
        spark, grown, prior, n_vertices=42, num_partitions=P, tol=1e-8
    )

    rc = {r["id"]: r["score"] for r in cold.collect()}
    rw = {r["id"]: r["score"] for r in warm.collect()}
    assert set(rc) == set(rw)
    for k in rc:
        assert abs(rc[k] - rw[k]) < 1e-6, k
    steps_cold = len({m["superstep"] for m in mc})
    steps_warm = len({m["superstep"] for m in mw})
    assert steps_warm < steps_cold, (steps_warm, steps_cold)


def test_warm_restart_identity_is_instant(spark):
    """Warm-starting from the fixed point of the SAME graph re-converges
    immediately (<= 2 supersteps at the same tol)."""
    from subgraph_isomorphism_pregel_spark.operators.pagerank import (
        pagerank,
        pagerank_warm,
    )

    P = 4
    vs = {i: 0 for i in range(30)}
    es = {(i, (i + 1) % 30) for i in range(30)} | {((i + 1) % 30, i) for i in range(30)}
    v, e = _graph(spark, vs, es)
    scores, _ = pagerank(spark, v, e, num_partitions=P, tol=1e-8)
    parts = build_parts(spark, v, e, P)
    warm, mw = pagerank_warm(
        spark, parts, scores, n_vertices=30, num_partitions=P, tol=1e-8
    )
    assert len({m["superstep"] for m in mw}) <= 2
    rw = {r["id"]: r["score"] for r in warm.collect()}
    rs = {r["id"]: r["score"] for r in scores.collect()}
    for k in rs:
        assert abs(rs[k] - rw[k]) < 1e-7, k


def test_warm_cc_local_delta_is_fast_and_exact(spark):
    """Incremental CC: attaching one new vertex to a long path re-labels in
    O(1) supersteps warm (only the delta frontier floods) vs O(diameter)
    cold; untouched far-range int64 labels survive bit-exact (the get_indexer
    path — a float64 roundtrip would corrupt ids past 2^53)."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        connected_components,
        connected_components_warm,
    )

    P = 4
    n = 60
    BIG = 10**15 + 7
    a_ids = list(range(n))
    b_ids = [BIG + i for i in range(n)]

    def path_edges(ids):
        es = set()
        for x, y in zip(ids, ids[1:]):
            es |= {(x, y), (y, x)}
        return es

    vs0 = {i: 0 for i in a_ids + b_ids}
    es0 = path_edges(a_ids) | path_edges(b_ids)
    v0, e0 = _graph(spark, vs0, es0)
    prior, m0 = connected_components(spark, v0, e0, num_partitions=P)
    prior = prior.cache()

    vs1 = {500: 0}
    es1 = {(a_ids[-1], 500), (500, a_ids[-1])}
    parts0 = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts0, nv, ne, P).cache()

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    cold, mc = connected_components(spark, vall, eall, num_partitions=P)
    touched = spark.createDataFrame([(a_ids[-1],), (500,)], "id long")
    warm, mw = connected_components_warm(spark, grown, prior, touched, P)

    rc = {r["id"]: r["component"] for r in cold.collect()}
    rw = {r["id"]: r["component"] for r in warm.collect()}
    assert rc == rw
    assert all(rw[i] == BIG for i in b_ids)  # untouched big-int labels exact
    steps_cold = len({m["superstep"] for m in mc})
    steps_warm = len({m["superstep"] for m in mw})
    assert steps_warm <= 4 < steps_cold, (steps_warm, steps_cold)


def test_warm_cc_merge_delta_exact(spark):
    """A delta that MERGES two components must still reach the cold fixed
    point (the wave crosses the whole absorbed component — exactness is the
    claim here, not speed)."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        connected_components,
        connected_components_warm,
    )

    P = 4
    a_ids = list(range(20))
    b_ids = [1000 + i for i in range(20)]

    def path_edges(ids):
        es = set()
        for x, y in zip(ids, ids[1:]):
            es |= {(x, y), (y, x)}
        return es

    vs0 = {i: 0 for i in a_ids + b_ids}
    es0 = path_edges(a_ids) | path_edges(b_ids)
    v0, e0 = _graph(spark, vs0, es0)
    prior, _ = connected_components(spark, v0, e0, num_partitions=P)
    prior = prior.cache()

    vs1 = {600: 0}
    es1 = {(a_ids[-1], 600), (600, a_ids[-1]), (b_ids[-1], 600), (600, b_ids[-1])}
    parts0 = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts0, nv, ne, P)

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    cold, _ = connected_components(spark, vall, eall, num_partitions=P)
    touched = spark.createDataFrame(
        [(a_ids[-1],), (b_ids[-1],), (600,)], "id long"
    )
    warm, _ = connected_components_warm(spark, grown, prior, touched, P)
    rc = {r["id"]: r["component"] for r in cold.collect()}
    rw = {r["id"]: r["component"] for r in warm.collect()}
    assert rc == rw
    assert set(rw.values()) == {0}


def test_warm_sssp_shortcut_delta(spark):
    """Incremental SSSP: a delta vertex that shortcuts the far end of a
    path re-relaxes only the shortcut's reach (meet-in-the-middle), not
    the whole eccentricity — distances equal the cold bounded run, in
    fewer supersteps."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp, sssp_warm

    P = 4
    n = 50
    ids = list(range(n))
    es0 = set()
    for x, y in zip(ids, ids[1:]):
        es0 |= {(x, y), (y, x)}
    vs0 = {i: 0 for i in ids}
    v0, e0 = _graph(spark, vs0, es0)
    prior, m0 = sssp(spark, v0, e0, source=0, max_hops=64, num_partitions=P)
    prior = prior.cache()

    vs1 = {300: 0}
    es1 = {(0, 300), (300, 0), (300, n - 1), (n - 1, 300)}
    parts0 = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts0, nv, ne, P).cache()

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    cold, mc = sssp(spark, vall, eall, source=0, max_hops=64, num_partitions=P)
    touched = spark.createDataFrame([(0,), (300,), (n - 1,)], "id long")
    warm, mw = sssp_warm(
        spark, grown, prior, touched, source=0, max_hops=64, num_partitions=P
    )
    rc = {r["id"]: r["dist"] for r in cold.collect()}
    rw = {r["id"]: r["dist"] for r in warm.collect()}
    assert rc == rw
    assert rw[n - 1] == 2 and rw[300] == 1
    # exactness is the claim here: this shortcut re-relaxes HALF the path
    # (meet-in-the-middle), so warm and cold step counts are comparable —
    # the step saving is asserted on the local-delta test below


def test_warm_sssp_local_delta_is_fast(spark):
    """A delta leaf hanging off the near end of a long path re-relaxes in
    O(1) supersteps warm vs O(eccentricity) cold."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp, sssp_warm

    P = 4
    n = 50
    ids = list(range(n))
    es0 = set()
    for x, y in zip(ids, ids[1:]):
        es0 |= {(x, y), (y, x)}
    vs0 = {i: 0 for i in ids}
    v0, e0 = _graph(spark, vs0, es0)
    prior, _ = sssp(spark, v0, e0, source=0, max_hops=64, num_partitions=P)
    prior = prior.cache()

    vs1 = {300: 0}
    es1 = {(5, 300), (300, 5)}
    parts0 = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts0, nv, ne, P)

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    cold, mc = sssp(spark, vall, eall, source=0, max_hops=64, num_partitions=P)
    touched = spark.createDataFrame([(5,), (300,)], "id long")
    warm, mw = sssp_warm(
        spark, grown, prior, touched, source=0, max_hops=64, num_partitions=P
    )
    rc = {r["id"]: r["dist"] for r in cold.collect()}
    rw = {r["id"]: r["dist"] for r in warm.collect()}
    assert rc == rw and rw[300] == 6
    steps_cold = len({m["superstep"] for m in mc})
    steps_warm = len({m["superstep"] for m in mw})
    assert steps_warm <= 4 < steps_cold, (steps_warm, steps_cold)


def test_warm_sssp_respects_hop_bound(spark):
    """The warm run re-applies the hop bound on OUTPUT: mid-path vertices
    beyond max_hops from the source stay unlabeled exactly as in the cold
    bounded run, even though the warm wave may pass near them."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp, sssp_warm

    P = 4
    n = 40
    ids = list(range(n))
    es0 = set()
    for x, y in zip(ids, ids[1:]):
        es0 |= {(x, y), (y, x)}
    vs0 = {i: 0 for i in ids}
    v0, e0 = _graph(spark, vs0, es0)
    prior, _ = sssp(spark, v0, e0, source=0, max_hops=10, num_partitions=P)
    prior = prior.cache()

    vs1 = {300: 0}
    es1 = {(0, 300), (300, 0), (300, n - 1), (n - 1, 300)}
    parts0 = build_parts(spark, v0, e0, P)
    nv, ne = _graph(spark, vs1, es1)
    grown = add_vertices(spark, parts0, nv, ne, P)

    vall, eall = _graph(spark, {**vs0, **vs1}, es0 | es1)
    cold, _ = sssp(spark, vall, eall, source=0, max_hops=10, num_partitions=P)
    touched = spark.createDataFrame([(0,), (300,), (n - 1,)], "id long")
    warm, _ = sssp_warm(
        spark, grown, prior, touched, source=0, max_hops=10, num_partitions=P
    )
    rc = {r["id"]: r["dist"] for r in cold.collect()}
    rw = {r["id"]: r["dist"] for r in warm.collect()}
    assert rc == rw
    # both ends labeled through the shortcut, the middle stays out of bound
    assert 20 not in rw and rw[n - 1] == 2
