"""Subgraph matcher: golden toy count (== 4, /root/reference/README.md:83),
brute-force oracle cross-checks, pseudo on/off equality, order invariance."""

import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher
from subgraph_isomorphism_pregel_spark.plans.sketch_tree import (
    DEFER_MAX_TERMS,
    PlanDowngradeWarning,
    build_plan,
    deferred_term_count,
)
from subgraph_isomorphism_pregel_spark.sources.graph import (
    TOY_QUERY_TEXT,
    parse_query_text,
    toy_graph,
)

from .oracles import match_count_oracle

A, B, C, D = ord("a"), ord("b"), ord("c"), ord("d")

# hand-built queries over the toy graph's label alphabet
QUERIES = {
    # the reference's own query: 4-cycle a-c-b-c (golden count 4)
    "cycle4_golden": parse_query_text(TOY_QUERY_TEXT),
    # 3-path a-c-b
    "path3": ({1: A, 2: C, 3: B}, {(1, 2), (2, 1), (2, 3), (3, 2)}),
    # star d(b, b, a): exercises same-label injectivity among siblings
    "star_bba": (
        {1: D, 2: B, 3: B, 4: A},
        {(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1)},
    ),
    # triangle with a pendant (pseudo-able leaf, unique label)
    "tri_pendant": (
        {1: B, 2: C, 3: B, 4: D},
        {(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (1, 4), (4, 1)},
    ),
    # single vertex
    "single": ({1: D}, set()),
    # the reference's flagship deferred-conflict shape: path a-c-b-c — the
    # trailing c is a leaf whose label collides with an ENUMERATED c, so it
    # is counted deferred with adjacency subtraction (SIBranch.h:161-248)
    "acbc_path": (
        {1: A, 2: C, 3: B, 4: C},
        {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)},
    ),
    # two same-label leaves on DIFFERENT branches: counted deferred as
    # |A||B| - |A∩B| (cross-branch inclusion-exclusion)
    "twin_c_leaves": (
        {1: B, 2: D, 3: B, 4: C, 5: C},
        {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (3, 5), (5, 3)},
    ),
    # same-label leaf pair under ONE parent plus an enumerated same-label
    # vertex adjacent to that parent: falling factorial with witness
    # subtraction (the enumerated c shrinks the leaves' candidate pool)
    "cc_under_d_with_c": (
        {1: D, 2: C, 3: C, 4: C, 5: B},
        {(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1), (4, 5), (5, 4)},
    ),
    # GENERAL deferred shapes (round 3): three same-label leaves under three
    # DIFFERENT parents on a path — previously fell back to enumeration, now
    # the Venn-atom polynomial counts them deferred
    "triple_b_leaves": (
        {1: A, 2: C, 3: D, 4: B, 5: B, 6: B},
        {(1, 2), (2, 1), (2, 3), (3, 2),
         (1, 4), (4, 1), (2, 5), (5, 2), (3, 6), (6, 3)},
    ),
    # two parents with UNEQUAL multiplicities (k=2 and k=1): two b-leaves on
    # one parent, one b-leaf on the other
    "b2_b1_two_parents": (
        {1: A, 2: C, 3: B, 4: B, 5: B},
        {(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1), (2, 5), (5, 2)},
    ),
    # dense: 3 parents x 1 leaf each PLUS an enumerated same-label internal
    # vertex (witness subtraction hits the exact Venn atoms)
    "triple_d_leaves_with_d": (
        {1: D, 2: A, 3: B, 4: D, 5: D, 6: D},
        {(1, 2), (2, 1), (2, 3), (3, 2),
         (1, 4), (4, 1), (2, 5), (5, 2), (3, 6), (6, 3)},
    ),
    # one parent with THREE same-label leaves plus a same-label enumerated
    # vertex elsewhere (falling factorial k=3 with witness)
    "bbb_under_d": (
        {1: D, 2: B, 3: B, 4: B, 5: B, 6: C},
        {(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1),
         (1, 5), (5, 1), (5, 6), (6, 5)},
    ),
    # 2-vertex query, both same label: the leaf defers against the ROOT as
    # its enumerated same-label witness (degenerate group, m=1, k=1)
    "bb_edge": ({1: B, 2: B}, {(1, 2), (2, 1)}),
}


@pytest.fixture(scope="module")
def toy(spark):
    v, e = toy_graph(spark)
    m = SubgraphMatcher(spark, v, e)
    data_v = {r["id"]: r["label"] for r in v.collect()}
    data_e = {(r["src"], r["dst"]) for r in e.collect()}
    yield m, data_v, data_e
    m.unpersist()


def test_golden_mapping_count_is_4(toy):
    m, _, _ = toy
    qv, qe = QUERIES["cycle4_golden"]
    assert m.count(qv, qe) == 4


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_toy_queries_match_bruteforce(toy, name):
    m, data_v, data_e = toy
    qv, qe = QUERIES[name]
    want = match_count_oracle(data_v, data_e, qv, qe)
    assert m.count(qv, qe, pseudo=True) == want
    assert m.count(qv, qe, pseudo=False) == want
    # column pruning + factorized counting must not change counts
    assert m.count(qv, qe, pseudo=True, prune=True) == want
    assert m.count(qv, qe, pseudo=False, prune=True) == want


def test_backward_semijoin_equals_adjlist(toy):
    """The hub-safe semijoin backward check must count exactly like the
    adjlist array_contains check (cycle4 is the query with backward edges)."""
    m, data_v, data_e = toy
    for name in ("cycle4_golden", "tri_pendant"):
        qv, qe = QUERIES[name]
        want = match_count_oracle(data_v, data_e, qv, qe)
        assert m.count(qv, qe, backward="semijoin") == want
        assert m.count(qv, qe, backward="semijoin", prune=True) == want


@pytest.mark.parametrize("order", ["degree", "anti-degree", "random", "candidate"])
def test_order_invariance(toy, order):
    m, data_v, data_e = toy
    qv, qe = QUERIES["cycle4_golden"]
    assert m.count(qv, qe, order=order) == 4


def test_random_graphs_vs_oracle(spark):
    rng = random.Random(7)
    n, p, n_labels = 30, 0.15, 3
    vs = {i: rng.randrange(n_labels) for i in range(n)}
    es = set()
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                es.add((i, j))
                es.add((j, i))
    v = spark.createDataFrame(list(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)
    queries = [
        # path of 3 distinct labels
        ({0: 0, 1: 1, 2: 2}, {(0, 1), (1, 0), (1, 2), (2, 1)}),
        # triangle with repeated label
        ({0: 0, 1: 0, 2: 1}, {(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)}),
        # star with two same-label leaves (deferred, one parent)
        ({0: 1, 1: 0, 2: 0, 3: 2}, {(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)}),
        # path 0-1-0 with a label-2 leaf on each end (deferred, two parents)
        (
            {0: 0, 1: 1, 2: 0, 3: 2, 4: 2},
            {(0, 1), (1, 0), (1, 2), (2, 1), (0, 3), (3, 0), (2, 4), (4, 2)},
        ),
        # leaf label colliding with an enumerated vertex (witness subtraction)
        (
            {0: 0, 1: 1, 2: 2, 3: 1},
            {(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)},
        ),
    ]
    try:
        for qv, qe in queries:
            want = match_count_oracle(vs, es, qv, qe)
            assert m.count(qv, qe, pseudo=True) == want
            assert m.count(qv, qe, pseudo=False) == want
            assert m.count(qv, qe, pseudo=True, prune=True) == want
    finally:
        m.unpersist()


def test_plan_shape():
    qv, qe = QUERIES["cycle4_golden"]
    plan = build_plan(qv, qe, order="degree")
    assert plan.nodes[0].parent_pos is None
    assert plan.n_query_vertices == 4
    # the 4-cycle closes with exactly one backward edge
    assert sum(len(n.backward_pos) for n in plan.nodes) == 1


def test_plan_defers_nonunique_leaves():
    """Deferred shapes must actually plan as deferred groups (not silently
    fall back to enumeration), or the factorization is untested."""
    # a-c-b-c: one c leaf deferred against one enumerated c witness
    qv, qe = QUERIES["acbc_path"]
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.nodes) == 2  # only a-side chain enumerated... see below
    assert len(plan.deferred) == 1
    (g,) = plan.deferred
    assert g.label == C and len(g.parents) == 1 and g.parents[0][1] == 1
    assert len(g.enum_pos) == 1

    # twin c leaves on two branches: one two-parent group, k=1 each
    qv, qe = QUERIES["twin_c_leaves"]
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.deferred) == 1
    (g,) = plan.deferred
    assert g.label == C and len(g.parents) == 2
    assert all(k == 1 for _, k in g.parents)
    assert g.enum_pos == ()

    # cc pair under one parent with an enumerated c witness
    qv, qe = QUERIES["cc_under_d_with_c"]
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.deferred) == 1
    (g,) = plan.deferred
    assert g.label == C and g.parents[0][1] == 2 and len(g.enum_pos) == 1

    # star_bba: two same-label leaves under one parent (no witnesses)
    qv, qe = QUERIES["star_bba"]
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.deferred) == 1
    assert plan.deferred[0].parents[0][1] == 2

    # three same-label leaves across two parents: unsupported shape must
    # two parents with UNEQUAL multiplicities now defers as a general group
    # (round 2 fell back to enumeration here)
    qv = {1: D, 2: C, 3: C, 4: B, 5: C}
    qe = {(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1), (4, 5), (5, 4)}
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.deferred) == 1
    (g,) = plan.deferred
    assert g.label == C and sorted(k for _, k in g.parents) == [1, 2]
    assert len(plan.nodes) == 2  # only d and b enumerated

    # three same-label leaves under three parents: one 3-parent group
    qv, qe = QUERIES["triple_b_leaves"]
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.deferred) == 1
    (g,) = plan.deferred
    assert g.label == B and len(g.parents) == 3
    assert all(k == 1 for _, k in g.parents)

    # beyond the expansion bound (5 distinct parents = 2^20 terms) falls
    # back LOUDLY: PlanDowngradeWarning + recorded on plan.downgraded
    qv = {1: A, 2: C, 3: D, 4: C, 5: D} | {10 + i: B for i in range(5)}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 5), (5, 4)}
    for i, p in enumerate([1, 2, 3, 4, 5]):
        qe |= {(p, 10 + i), (10 + i, p)}
    with pytest.warns(PlanDowngradeWarning):
        plan = build_plan(qv, qe, order="degree")
    assert plan.deferred == ()
    assert plan.downgraded == ((B, 5, 5),)
    assert len(plan.nodes) == 10  # everything enumerated


def test_relabeling_invariance(spark):
    """Match counts are invariant under a vertex-id relabeling of the data
    graph (SURVEY.md §5.3)."""
    import random

    from subgraph_isomorphism_pregel_spark.sources.graph import toy_graph

    v, e = toy_graph(spark)
    rows_v = [(r["id"], r["label"]) for r in v.collect()]
    rows_e = [(r["src"], r["dst"]) for r in e.collect()]
    rng = random.Random(11)
    perm = {old: new for old, new in
            zip([x[0] for x in rows_v],
                rng.sample([100 + 7 * i for i in range(len(rows_v))], len(rows_v)))}
    v2 = spark.createDataFrame([(perm[i], l) for i, l in rows_v], "id long, label int")
    e2 = spark.createDataFrame([(perm[a], perm[b]) for a, b in rows_e], "src long, dst long")
    qv, qe = QUERIES["cycle4_golden"]
    m2 = SubgraphMatcher(spark, v2, e2)
    try:
        assert m2.count(qv, qe) == 4
    finally:
        m2.unpersist()


def test_randomized_query_shapes_vs_oracle(spark):
    """Fuzz the planner/matcher over RANDOM connected query graphs (3-5
    vertices, 3 labels) — the fixed-shape tests above can miss interactions
    between pseudo counting, deferral shapes, pruning, and backward edges;
    random trees + random extra edges walk the shape space."""
    rng = random.Random(20260816)
    n, p, n_labels = 24, 0.18, 3
    vs = {i: rng.randrange(n_labels) for i in range(n)}
    es = set()
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                es.add((i, j))
                es.add((j, i))
    v = spark.createDataFrame(list(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)

    def random_query():
        k = rng.randrange(3, 7)
        # half the trials use only 2 labels: forces same-label leaf groups
        # under multiple parents (the general deferred shapes)
        nl = rng.choice([2, n_labels])
        qv = {i: rng.randrange(nl) + ord("0") for i in range(k)}
        # random spanning tree keeps it connected
        qe = set()
        for i in range(1, k):
            parent = rng.randrange(i)
            qe |= {(i, parent), (parent, i)}
        # sprinkle extra (backward) edges
        for _ in range(rng.randrange(0, 3)):
            a, b = rng.sample(range(k), 2)
            qe |= {(a, b), (b, a)}
        return qv, qe

    # labels in the data graph are 0..2; map query labels back onto them
    try:
        for trial in range(12):
            qv, qe = random_query()
            qv = {u: (l - ord("0")) for u, l in qv.items()}
            want = match_count_oracle(vs, es, qv, qe)
            got_plain = m.count(qv, qe, pseudo=False)
            got_pseudo = m.count(qv, qe, pseudo=True)
            got_pruned = m.count(qv, qe, pseudo=True, prune=True)
            assert got_plain == want, (trial, qv, qe, got_plain, want)
            assert got_pseudo == want, (trial, qv, qe, got_pseudo, want)
            assert got_pruned == want, (trial, qv, qe, got_pruned, want)
    finally:
        m.unpersist()


@pytest.mark.parametrize("seed", [77, 20260817])
def test_fuzz_leaf_heavy_deferred_shapes(spark, seed):
    """Targeted fuzz for the general deferred-conflict machinery: random
    trees whose internal spine is short and whose leaves are many, drawn
    from TWO labels — maximizing same-label leaf groups spread over
    multiple parents with multiplicities (the Venn-atom polynomial path).
    Every count compared to brute force with pseudo on/off and prune."""
    rng = random.Random(seed)
    n, p = 26, 0.16
    vs = {i: rng.randrange(3) for i in range(n)}
    es = set()
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                es.add((i, j))
                es.add((j, i))
    v = spark.createDataFrame(list(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)

    def leafy_query():
        spine = rng.randrange(2, 4)          # 2-3 internal vertices
        n_leaves = rng.randrange(2, 5)       # 2-4 leaves
        k = spine + n_leaves
        qv = {i: rng.randrange(2) for i in range(k)}
        qe = set()
        for i in range(1, spine):            # path spine
            qe |= {(i, i - 1), (i - 1, i)}
        for leaf in range(spine, k):         # each leaf on a random spine vertex
            parent = rng.randrange(spine)
            qe |= {(leaf, parent), (parent, leaf)}
        return qv, qe

    try:
        for trial in range(10):
            qv, qe = leafy_query()
            want = match_count_oracle(vs, es, qv, qe)
            for kw in (dict(pseudo=False), dict(pseudo=True),
                       dict(pseudo=True, prune=True)):
                got = m.count(qv, qe, **kw)
                assert got == want, (trial, qv, sorted(qe), kw, got, want)
    finally:
        m.unpersist()


def _random_graph(spark, seed, n=24, p=0.18, n_labels=3):
    rng = random.Random(seed)
    vs = {i: rng.randrange(n_labels) for i in range(n)}
    es = set()
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                es.add((i, j))
                es.add((j, i))
    v = spark.createDataFrame(list(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    return vs, es, v, e


def test_quad_parent_deferred_udf_tier(spark):
    """4 parents x 1 leaf each = exactly 4096 polynomial terms: the densest
    shape the plan guard admits, evaluated through the Arrow-batched
    pandas-UDF tier (> CODEGEN_MAX_TERMS) instead of a Column tree."""
    assert deferred_term_count((1, 1, 1, 1)) == 4096 <= DEFER_MAX_TERMS
    # path 1-2-3-4 (labels 0,1,0,1) with one label-2 leaf on each
    qv = {1: 0, 2: 1, 3: 0, 4: 1, 5: 2, 6: 2, 7: 2, 8: 2}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)}
    for leaf, parent in ((5, 1), (6, 2), (7, 3), (8, 4)):
        qe |= {(leaf, parent), (parent, leaf)}
    plan = build_plan(qv, qe, order="degree")
    assert len(plan.deferred) == 1
    (g,) = plan.deferred
    assert len(g.parents) == 4 and all(k == 1 for _, k in g.parents)
    assert plan.downgraded == ()

    vs, es, v, e = _random_graph(spark, seed=1, n=20, p=0.3)
    m = SubgraphMatcher(spark, v, e)
    try:
        want = match_count_oracle(vs, es, qv, qe)
        assert want > 0  # seed chosen so the shape actually occurs
        assert m.count(qv, qe, pseudo=True) == want
        assert m.count(qv, qe, pseudo=True, prune=True) == want
    finally:
        m.unpersist()


def test_dense_group_downgrades_with_warning_and_counts_exactly(spark):
    """The ADVICE round-3 explosive shape: 4 parents x 2 leaves each is
    C(9,7)^4 ~= 1.68M terms — must fall back to enumeration with an
    explicit PlanDowngradeWarning (never hang the driver) and still count
    exactly."""
    assert deferred_term_count((2, 2, 2, 2)) == 36**4 > DEFER_MAX_TERMS
    qv = {1: 0, 2: 1, 3: 0, 4: 1}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)}
    leaf = 5
    for parent in (1, 2, 3, 4):
        for _ in range(2):
            qv[leaf] = 2
            qe |= {(leaf, parent), (parent, leaf)}
            leaf += 1
    with pytest.warns(PlanDowngradeWarning):
        plan = build_plan(qv, qe, order="degree")
    assert plan.deferred == ()
    assert plan.downgraded == ((2, 4, 8),)

    # deterministic graph: data path 0-1-2-3 (labels 0,1,0,1) + 8 label-2
    # vertices adjacent to every path vertex -> count = 1 * P(8,8) = 40320
    data_v = {0: 0, 1: 1, 2: 0, 3: 1} | {10 + i: 2 for i in range(8)}
    data_e = set()
    for a, b in ((0, 1), (1, 2), (2, 3)):
        data_e |= {(a, b), (b, a)}
    for w in range(10, 18):
        for x in range(4):
            data_e |= {(w, x), (x, w)}
    v = spark.createDataFrame(list(data_v.items()), "id long, label int")
    e = spark.createDataFrame(sorted(data_e), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)
    try:
        want = match_count_oracle(data_v, data_e, qv, qe)
        assert want == 40320
        with pytest.warns(PlanDowngradeWarning):
            assert m.count(qv, qe, pseudo=True) == want
    finally:
        m.unpersist()


def test_backward_auto_resolution_and_lazy_adjlist(spark):
    """backward='auto' picks adjlist below the hub threshold and the
    hub-safe semijoin above it; the collected-adjacency table is only ever
    built when an adjlist plan actually runs."""
    from subgraph_isomorphism_pregel_spark.sources.graph import toy_graph

    v, e = toy_graph(spark)
    m = SubgraphMatcher(spark, v, e)
    qv, qe = QUERIES["cycle4_golden"]
    try:
        plan = build_plan(qv, qe, order="degree")
        assert any(nd.backward_pos for nd in plan.nodes)
        assert m.resolve_backward(plan, "auto") == "adjlist"  # tiny degrees
        assert m.resolve_backward(plan, "auto", hub_threshold=1) == "semijoin"
        # no backward constraints -> adjlist trivially, hub or not
        path_plan = build_plan(*QUERIES["path3"], order="degree")
        assert m.resolve_backward(path_plan, "auto", hub_threshold=1) == "adjlist"
        # explicit choices pass through untouched
        assert m.resolve_backward(plan, "semijoin") == "semijoin"

        # laziness: a semijoin run never materializes the adjacency arrays
        assert m._adjlist is None
        n_semi = m.count(qv, qe, backward="semijoin")
        assert m._adjlist is None
        n_adj = m.count(qv, qe, backward="adjlist")
        assert m._adjlist is not None
        assert n_semi == n_adj == 4
    finally:
        m.unpersist()


def test_deferred_group_applies_before_plan_end(spark):
    """A deferred group whose parents/witnesses are all mapped early is
    applied at that point — its columns stop blocking _prune's prefix
    merging for the rest of the plan — and counts stay exact."""
    # root 1 (label 0) with two deferred label-2 leaves, then a 3-node tail
    qv = {1: 0, 2: 2, 3: 2, 4: 1, 5: 0, 6: 1}
    qe = {(1, 2), (2, 1), (1, 3), (3, 1),
          (1, 4), (4, 1), (4, 5), (5, 4), (5, 6), (6, 5)}
    plan = build_plan(qv, qe, order="degree")
    g = next(gr for gr in plan.deferred if gr.label == 2)
    # the label-2 group is ready at the root; enumerated nodes follow it
    assert max([p for p, _ in g.parents] + list(g.enum_pos)) < len(plan.nodes) - 1

    vs, es, v, e = _random_graph(spark, seed=2, n=22, p=0.25)
    m = SubgraphMatcher(spark, v, e)
    try:
        want = match_count_oracle(vs, es, qv, qe)
        assert want > 0
        assert m.count(qv, qe, pseudo=True) == want
        assert m.count(qv, qe, pseudo=True, prune=True) == want
        assert m.count(qv, qe, pseudo=False) == want
    finally:
        m.unpersist()


def test_branch_factorized_counting_vs_oracle(spark):
    """Branch-factorized counting (independent branch enumeration +
    inclusion-exclusion assembly of cross-branch same-label pairs — the
    Spark form of the reference's marked-choice branch assembly for
    ENUMERATED vertices, SIBranch.h:161-248) must match brute force and
    the join pipeline on tree queries, and decline non-trees."""
    vs, es, v, e = _random_graph(spark, seed=5, n=24, p=0.22)
    m = SubgraphMatcher(spark, v, e)
    tree_queries = [
        # two 2-node branches with BOTH levels conflicting cross-branch
        # (internal same-label pair + leaf same-label pair, p=2)
        (
            {1: 0, 2: 1, 3: 2, 4: 1, 5: 2},
            {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)},
        ),
        # three single-vertex branches, two sharing a label (p=1)
        ({1: 1, 2: 0, 3: 0, 4: 2}, {(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1)}),
        # asymmetric: one deep branch + one leaf colliding with an
        # INTERNAL vertex of the other branch (the exact shape VERDICT r3
        # called out as eager-only)
        (
            {1: 0, 2: 1, 3: 2, 4: 0, 5: 1},
            {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 5), (5, 1)},
        ),
        # no cross-branch conflicts at all (pure multiplication, p=0)
        (
            {1: 0, 2: 1, 3: 2, 4: 2},
            {(1, 2), (2, 1), (1, 3), (3, 1), (3, 4), (4, 3)},
        ),
    ]
    try:
        used = 0
        for qv, qe in tree_queries:
            want = match_count_oracle(vs, es, qv, qe)
            got = m.count_tree_factorized(qv, qe)
            assert got is not None, (qv, qe)
            assert got == want, (qv, qe, got, want)
            assert m.count(qv, qe, factorize=True) == want
            used += want > 0
        assert used >= 3  # the shapes actually occur in the data graph
        # non-tree: declines, and count(factorize=True) falls back exactly
        qv = {1: 0, 2: 1, 3: 2, 4: 1}
        qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)}
        assert m.count_tree_factorized(qv, qe) is None
        assert m.count(qv, qe, factorize=True) == match_count_oracle(vs, es, qv, qe)
    finally:
        m.unpersist()


def test_branch_factorized_fuzz_random_trees(spark):
    """Fuzz: random labeled trees (4-7 vertices, 2-3 labels) on a random
    data graph — factorized counts must equal brute force whenever the
    shape is accepted; shapes it declines must still count right through
    the fallback."""
    vs, es, v, e = _random_graph(spark, seed=9, n=22, p=0.25)
    m = SubgraphMatcher(spark, v, e)
    rng = random.Random(20260817)
    try:
        accepted = 0
        for trial in range(12):
            k = rng.randrange(4, 8)
            nl = rng.choice([2, 3])
            qv = {i: rng.randrange(nl) for i in range(k)}
            qe = set()
            for i in range(1, k):
                parent = rng.randrange(i)
                qe |= {(i, parent), (parent, i)}
            want = match_count_oracle(vs, es, qv, qe)
            got = m.count_tree_factorized(qv, qe)
            if got is not None:
                accepted += 1
                assert got == want, (trial, qv, sorted(qe), got, want)
            assert m.count(qv, qe, factorize=True) == want, (trial, qv, sorted(qe))
        assert accepted >= 6  # most random trees must take the factorized path
    finally:
        m.unpersist()


def test_branch_factorized_cyclic_branches(spark):
    """Factorization only needs the root to be an ARTICULATION point —
    branches may contain cycles (their sub-frontiers run the backward-edge
    checks). Two triangles sharing one vertex, with both non-root levels
    conflicting cross-branch, plus order='candidate' passthrough."""
    # bowtie: root 1 (label 0); triangle A = 1-2-3, triangle B = 1-4-5;
    # labels make (2,4) and (3,5) cross-branch same-label pairs
    qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    qe = set()
    for a, b in ((1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (5, 1)):
        qe |= {(a, b), (b, a)}
    vs, es, v, e = _random_graph(spark, seed=3, n=22, p=0.3)
    m = SubgraphMatcher(spark, v, e)
    try:
        want = match_count_oracle(vs, es, qv, qe)
        assert want > 0
        got = m.count_tree_factorized(qv, qe)
        assert got == want, (got, want)
        assert m.count_tree_factorized(qv, qe, order="candidate") == want
        assert m.count(qv, qe, factorize=True) == want
        # a 4-cycle (no articulation point) still declines
        qv2 = {1: 0, 2: 1, 3: 2, 4: 1}
        qe2 = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)}
        assert m.count_tree_factorized(qv2, qe2) is None
    finally:
        m.unpersist()


def test_branch_factorized_fuzz_cyclic(spark):
    """Fuzz with random connected queries (trees + extra edges): whenever
    the factorizer accepts a shape, it must match brute force."""
    vs, es, v, e = _random_graph(spark, seed=17, n=20, p=0.3)
    m = SubgraphMatcher(spark, v, e)
    rng = random.Random(4077)
    try:
        accepted = 0
        for trial in range(12):
            k = rng.randrange(4, 7)
            qv = {i: rng.randrange(3) for i in range(k)}
            qe = set()
            for i in range(1, k):
                parent = rng.randrange(i)
                qe |= {(i, parent), (parent, i)}
            for _ in range(rng.randrange(0, 3)):  # extra edges -> cycles
                a, b = rng.sample(range(k), 2)
                qe |= {(a, b), (b, a)}
            want = match_count_oracle(vs, es, qv, qe)
            got = m.count_tree_factorized(qv, qe)
            if got is not None:
                accepted += 1
                assert got == want, (trial, qv, sorted(qe), got, want)
        assert accepted >= 4
    finally:
        m.unpersist()


def test_factorize_auto_cost_model(spark):
    """factorize='auto' must pick the pipeline on a uniform low-degree
    graph (branch product ~ branch sum) and the factorized assembly on a
    hub graph whose pipeline frontier is the product of branch counts —
    the two regimes the bench measures."""
    qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}

    # uniform: the random graph's label-pair fanouts are all ~n*p/3
    vs, es, v, e = _random_graph(spark, seed=5, n=24, p=0.22)
    m = SubgraphMatcher(spark, v, e)
    try:
        assert m.should_factorize(qv, qe) is False
        # auto still counts correctly through the pipeline
        assert m.count(qv, qe, factorize="auto") == match_count_oracle(vs, es, qv, qe)
    finally:
        m.unpersist()

    # hub: 1 anchor - 30 mids - 20 leaves each from a shared pool of 100
    hub_v = {0: 0} | {i: 1 for i in range(1, 31)} | {100 + j: 2 for j in range(100)}
    hub_e = set()
    for i in range(1, 31):
        hub_e |= {(0, i), (i, 0)}
        for j in range(20):
            leaf = 100 + (i * 7 + j * 3) % 100
            hub_e |= {(i, leaf), (leaf, i)}
    v2 = spark.createDataFrame(list(hub_v.items()), "id long, label int")
    e2 = spark.createDataFrame(sorted(hub_e), "src long, dst long")
    m2 = SubgraphMatcher(spark, v2, e2)
    try:
        # UNPRUNED, the pipeline frontier IS the branch cross product:
        # auto must switch to the assembly. PRUNED, the prefix merge
        # releases the first branch's witnesses before the second extends
        # (the round-5 implicit-factorization finding), so the simulated
        # stream stays ~30x the branch sum — below FACTORIZE_RATIO at
        # this tiny scale — and the pipeline keeps the job.
        assert m2.should_factorize(qv, qe, prune=False) is True
        assert m2.should_factorize(qv, qe, prune=True) is False
        want = match_count_oracle(hub_v, hub_e, qv, qe)
        # default prune=False -> the factorized assembly runs
        assert m2.count(qv, qe, factorize="auto") == want
        # pruned -> the pipeline runs; counts agree either way
        assert m2.count(qv, qe, factorize="auto", prune=True) == want
    finally:
        m2.unpersist()

    # bench-scale hub shape (1 anchor - 300 mids - 100 leaves each from a
    # 2000-leaf shared pool): even PRUNED the merge cannot get the stream
    # below ~200x the branch sum, and auto must pick the assembly — the
    # measured 2.8x bench win (decision only; the count is benched)
    bh_mid = spark.range(1, 301).selectExpr("0 as src", "id as dst")
    bh_leaf = spark.range(1, 301).selectExpr(
        "id as src", "explode(sequence(0, 99)) as j"
    ).selectExpr("src", "100000 + (src * 37 + j * 13) % 2000 as dst")
    bh_fwd = bh_mid.union(bh_leaf)
    bh_e = bh_fwd.union(bh_fwd.selectExpr("dst as src", "src as dst")).distinct()
    bh_v = (
        spark.range(0, 1).selectExpr("id", "0 as label")
        .union(spark.range(1, 301).selectExpr("id", "1 as label"))
        .union(spark.range(100000, 102000).selectExpr("id", "2 as label"))
    )
    m2b = SubgraphMatcher(spark, bh_v, bh_e)
    try:
        assert m2b.should_factorize(qv, qe, prune=True) is True
    finally:
        m2b.unpersist()

    # a biconnected query can never factorize, whatever the stats say
    qv3 = {1: 0, 2: 1, 3: 2, 4: 1}
    qe3 = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)}
    m3 = SubgraphMatcher(spark, v2, e2)
    try:
        assert m3.should_factorize(qv3, qe3) is False
    finally:
        m3.unpersist()


def test_factorized_scans_for_articulation_vertex(spark):
    """When the order-chosen plan root does not split the query, the
    decomposition scans for another articulation vertex (counting is
    root-agnostic): a bowtie rooted at a triangle corner by
    order='random' (min id) must still factorize at the center."""
    # ids chosen so order='random' roots at corner 1, not center 9
    qv = {1: 1, 2: 2, 9: 0, 4: 1, 5: 2}
    qe = set()
    for a, b in ((9, 1), (1, 2), (2, 9), (9, 4), (4, 5), (5, 9)):
        qe |= {(a, b), (b, a)}
    vs, es, v, e = _random_graph(spark, seed=3, n=22, p=0.3)
    m = SubgraphMatcher(spark, v, e)
    try:
        want = match_count_oracle(vs, es, qv, qe)
        assert want > 0
        got = m.count_tree_factorized(qv, qe, order="random")
        assert got == want, (got, want)
    finally:
        m.unpersist()


def test_factorize_auto_fuzz_on_skewed_graph(spark):
    """Random connected queries against a SKEWED data graph (a few hubs +
    a uniform fringe): count(factorize='auto') must equal brute force on
    every shape, whichever strategy the cost model picks — the regime
    where the estimator actually flips between pipeline and assembly."""
    rng = random.Random(90210)
    vs = {i: rng.randrange(3) for i in range(40)}
    es = set()
    for h in (0, 1, 2):  # three hubs wired to most of the graph
        for j in range(3, 40):
            if rng.random() < 0.8:
                es.add((h, j))
                es.add((j, h))
    for i in range(3, 40):  # sparse fringe
        for j in range(i + 1, 40):
            if rng.random() < 0.05:
                es.add((i, j))
                es.add((j, i))
    v = spark.createDataFrame(list(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)
    try:
        picks = set()
        for trial in range(10):
            k = rng.randrange(4, 7)
            qv = {i: rng.randrange(3) for i in range(k)}
            qe = set()
            for i in range(1, k):
                parent = rng.randrange(i)
                qe |= {(i, parent), (parent, i)}
            if rng.random() < 0.4:
                a, b = rng.sample(range(k), 2)
                qe |= {(a, b), (b, a)}
            want = match_count_oracle(vs, es, qv, qe)
            picks.add(m.should_factorize(qv, qe))
            got = m.count(qv, qe, factorize="auto")
            assert got == want, (trial, qv, sorted(qe), got, want)
    finally:
        m.unpersist()


def test_deferred_tuple_broadcast_in_plan(spark):
    """The deferred-group fix-up probes the label-l adjacency with ONE
    join against the melted distinct frontier-tuple set, and that probe
    must run as a BROADCAST hash join — by AQE's runtime re-plan in the
    default configuration (executed plan), or by explicit hints when
    defer_broadcast=True (static plan, for non-AQE deployments) — never
    a shuffle of the full adjacency per parent leg. Counts agree in both
    modes."""
    vs, es, v, e = _random_graph(spark, seed=2, n=22, p=0.25)
    m = SubgraphMatcher(spark, v, e)
    # two same-label leaves under two different parents (multi-parent
    # Venn path, so the general legs/masks machinery runs)
    qv = {1: 0, 2: 1, 3: 2, 4: 0, 5: 0}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2),
          (1, 4), (4, 1), (2, 5), (5, 2)}
    try:
        from subgraph_isomorphism_pregel_spark.plans.sketch_tree import build_plan as bp

        plan = bp(qv, qe, order="degree")
        assert plan.deferred  # the shape actually defers
        want = match_count_oracle(vs, es, qv, qe)

        # default (AQE): broadcasts appear in the EXECUTED plan
        f = m.frontier(plan, prune=True)
        assert int(f.groupBy().sum("cnt").collect()[0][0] or 0) == want
        ex = f._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" in ex
        assert ex.count("BroadcastHashJoin") >= 2, ex

        # explicit hints: broadcasts already in the STATIC plan
        m.defer_broadcast = True
        f2 = m.frontier(bp(qv, qe, order="degree"), prune=True)
        phys = f2._jdf.queryExecution().sparkPlan().toString()
        assert phys.count("BroadcastHashJoin") >= 2, phys
        assert int(f2.groupBy().sum("cnt").collect()[0][0] or 0) == want
    finally:
        m.defer_broadcast = False
        m.unpersist()


def test_embeddings_factorized_expand_parity(spark):
    """embeddings_factorized(): the compressed branch tables expanded back
    must equal the flat enumeration as a row multiset — including queries
    with cross-branch same-label pairs (inequality filters at expansion) —
    and the API declines on biconnected queries."""
    from subgraph_isomorphism_pregel_spark.operators.match import (
        FactorizedEmbeddings,
    )

    # star with two same-label chains: pairs (2,4) label 1 and (3,5) label 2
    qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}
    for seed in (3, 7):
        vs, es, v, e = _random_graph(spark, seed=seed, n=22, p=0.24)
        m = SubgraphMatcher(spark, v, e)
        try:
            fe = m.embeddings_factorized(qv, qe)
            assert isinstance(fe, FactorizedEmbeddings) and len(fe.pairs) == 2
            cols = [f"u_{u}" for u in sorted(qv)]
            got = sorted(
                tuple(r[c] for c in cols) for r in fe.expand().collect()
            )
            want = sorted(
                tuple(r[c] for c in cols)
                for r in m.embeddings(qv, qe).collect()
            )
            assert got == want, seed
            assert len(got) == m.count(qv, qe, pseudo=False)
        finally:
            m.unpersist()

    vs, es, v, e = _random_graph(spark, seed=11, n=20, p=0.3)
    m = SubgraphMatcher(spark, v, e)
    try:
        # 5 same-label leaves -> 10 cross-branch pairs: counting's assembly
        # declines past max_pairs (2^10 terms) but the compressed
        # materialization accepts any number (pairs are plain filters)
        qv5 = {1: 0, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
        qe5 = set()
        for leaf in range(2, 7):
            qe5 |= {(1, leaf), (leaf, 1)}
        assert m.count_tree_factorized(qv5, qe5) is None
        fe = m.embeddings_factorized(qv5, qe5)
        assert fe is not None and len(fe.pairs) == 10
        assert fe.expand().count() == m.count(qv5, qe5, pseudo=False)

        # biconnected: no articulation split -> None
        qv2 = {1: 0, 2: 1, 3: 2, 4: 1}
        qe2 = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)}
        assert m.embeddings_factorized(qv2, qe2) is None
    finally:
        m.unpersist()


def test_embeddings_warns_on_product_dominated_frontier(spark):
    """embeddings() cannot factorize (each output row IS one embedding of
    the branch cross product) — on a hub-shaped graph where the cost model
    says the frontier is product-dominated it must warn loudly; on a
    uniform graph it must stay silent."""
    import warnings as _w

    qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}

    hub_v = {0: 0} | {i: 1 for i in range(1, 31)} | {100 + j: 2 for j in range(100)}
    hub_e = set()
    for i in range(1, 31):
        hub_e |= {(0, i), (i, 0)}
        for j in range(20):
            leaf = 100 + (i * 7 + j * 3) % 100
            hub_e |= {(i, leaf), (leaf, i)}
    v = spark.createDataFrame(list(hub_v.items()), "id long, label int")
    e = spark.createDataFrame(sorted(hub_e), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)
    try:
        with pytest.warns(PlanDowngradeWarning, match="cross product"):
            m.embeddings(qv, qe)  # warning fires at plan build, pre-action
    finally:
        m.unpersist()

    vs, es, v2, e2 = _random_graph(spark, seed=5, n=24, p=0.22)
    m2 = SubgraphMatcher(spark, v2, e2)
    try:
        with _w.catch_warnings():
            _w.simplefilter("error", PlanDowngradeWarning)
            df = m2.embeddings(qv, qe)  # uniform graph: no warning
        assert df.count() == match_count_oracle(vs, es, qv, qe)
    finally:
        m2.unpersist()


def test_nested_factorized_star_of_stars(spark):
    """MULTI-LEVEL branch factorization (the reference's staged branch
    numbers, SIQuery.h:429-486): a star-of-stars — root, two same-label
    mids, each mid two same-label children shared ACROSS mids — must
    factorize at the root AND again inside each branch at the mid, with
    counts exact vs brute force at every nesting setting."""
    rng = random.Random(11)
    vs = {i: rng.randrange(3) for i in range(24)}
    es = set()
    for i in range(24):
        for j in range(i + 1, 24):
            if rng.random() < 0.3:
                es.add((i, j))
                es.add((j, i))
    v = spark.createDataFrame(list(vs.items()), "id long, label int")
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    m = SubgraphMatcher(spark, v, e)
    qv = {0: 0, 1: 1, 2: 1, 11: 2, 12: 2, 21: 2, 22: 2}
    qe = set()
    for a, b in ((0, 1), (0, 2), (1, 11), (1, 12), (2, 21), (2, 22)):
        qe |= {(a, b), (b, a)}
    try:
        want = match_count_oracle(vs, es, qv, qe)
        assert want > 0
        # instrument: count assembly levels actually taken
        calls = []
        orig = m._assemble_grouped

        def spy(*a, **kw):
            calls.append(a[2])  # the split vertex w
            return orig(*a, **kw)

        m._assemble_grouped = spy
        assert m.count_tree_factorized(qv, qe, nested=True) == want
        # top split at the root plus one nested split per branch (at a mid)
        assert len(calls) >= 3, calls
        m._assemble_grouped = orig
        assert m.count_tree_factorized(qv, qe, nested=False) == want
        assert m.count_tree_factorized(qv, qe, nested="auto") == want
        assert m.count(qv, qe, pseudo=True, prune=True) == want
    finally:
        m.unpersist()


def test_nested_factorized_fuzz_depth2_trees(spark):
    """Fuzz: random depth-2 trees (root -> mids -> leaves) with shared
    labels across subtrees — nested=True must equal brute force on every
    accepted shape; nested='auto'/False must agree."""
    vs, es, v, e = _random_graph(spark, seed=13, n=22, p=0.3)
    m = SubgraphMatcher(spark, v, e)
    rng = random.Random(515)
    try:
        accepted = 0
        for trial in range(7):
            n_mid = rng.choice([2, 3])
            qv = {0: 0}
            qe = set()
            nxt = 1
            for mi in range(n_mid):
                mid = nxt
                nxt += 1
                qv[mid] = rng.choice([1, 2])
                qe |= {(0, mid), (mid, 0)}
                for _ in range(rng.choice([1, 2])):
                    leaf = nxt
                    nxt += 1
                    qv[leaf] = rng.choice([1, 2])
                    qe |= {(mid, leaf), (leaf, mid)}
            want = match_count_oracle(vs, es, qv, qe)
            got = m.count_tree_factorized(qv, qe, nested=True)
            if got is None:
                continue
            accepted += 1
            assert got == want, (trial, qv, sorted(qe), got, want)
            # nested='auto' must agree whichever side the cost model picks
            # (nested=False is the single-level path other tests pin down)
            assert m.count_tree_factorized(qv, qe, nested="auto") == want, (trial, qv)
        assert accepted >= 4
    finally:
        m.unpersist()
