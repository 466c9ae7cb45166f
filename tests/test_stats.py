"""Exact grouped quantiles vs a sorted-list replay of the rank-ceil rule."""

import math
import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.stats import group_quantiles


def brute(rows, qs):
    from decimal import Decimal

    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vals in by_g.items():
        vals.sort()
        for q in qs:
            # exact rank ceil(q*n) over q's decimal ratio — python's double
            # product has the same ulp-high failure as Spark's (0.07*100)
            num, den = Decimal(str(q)).as_integer_ratio()
            rank = (num * len(vals) + den - 1) // den
            out[(g, q)] = vals[rank - 1]
    return out


def test_group_quantiles_matches_brute(spark):
    rng = random.Random(11)
    rows = [(f"g{i % 3}", rng.randrange(0, 1000)) for i in range(500)]
    rows += [("g3", 42)]  # single-element group: every quantile is 42
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    qs = [0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        (r["lang"], r["q"]): r["value"]
        for r in group_quantiles(df, "lang", "n_chars", qs=qs).collect()
    }
    assert got == brute(rows, qs)
    assert all(got[("g3", q)] == 42 for q in qs)
    # q=1.0 is the group max
    assert got[("g0", 1.0)] == max(v for g, v in rows if g == "g0")


def test_group_quantiles_duplicate_values(spark):
    """Duplicates: only the VALUE at the rank matters, never the row."""
    rows = [("a", 1)] * 10 + [("a", 9)] * 10
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    got = {
        r["q"]: r["value"]
        for r in group_quantiles(df, "lang", "n_chars", qs=[0.5, 0.51]).collect()
    }
    assert got == {0.5: 1, 0.51: 9}


def test_group_quantiles_ulp_exact_rank(spark):
    """q*n landing an ulp ABOVE the exact integer must not shift the rank:
    0.07 * 100 = 7.000000000000001 as doubles, so a double-ceil picks rank
    8 — the exact-decimal rule demands rank 7."""
    assert math.ceil(0.07 * 100) == 8  # the trap this test pins down
    rows = [("a", v) for v in range(1, 101)]  # value == rank
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    got = {
        r["q"]: r["value"]
        for r in group_quantiles(df, "lang", "n_chars", qs=[0.07, 0.29]).collect()
    }
    assert got == {0.07: 7, 0.29: 29}


def test_group_quantiles_bad_inputs(spark):
    df = spark.createDataFrame([("a", 1)], "lang string, n_chars long")
    with pytest.raises(ValueError):
        group_quantiles(df, "lang", "n_chars", qs=[0.0])
    with pytest.raises(ValueError):
        group_quantiles(df, "lang", "n_chars", qs=[])


def test_graph_stats_known_graph(spark):
    """Hand-checkable directed triangle-with-tail: 0->1,1->2,2->0,0->2,2->3."""
    from subgraph_isomorphism_pregel_spark.operators.stats import graph_stats

    es = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3)]
    e = spark.createDataFrame(es, "src long, dst long")
    r = graph_stats(e).collect()[0]
    assert r["n_vertices"] == 4 and r["n_edges"] == 5
    assert r["max_out_degree"] == 2
    assert r["avg_out_degree"] == 1.25
    # reciprocal pairs: (2,0)/(0,2) -> 2 of 5 edges
    assert r["reciprocity"] == 0.4
    # dx/dy with out-degs {0:2,1:1,2:2,3:0}: pairs (2,1),(1,2),(2,2),(2,2),(2,0)
    import math

    xs, ys = [2, 1, 2, 2, 2], [1, 2, 2, 2, 0]
    m = 5
    num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(
        (m * sum(x * x for x in xs) - sum(xs) ** 2)
        * (m * sum(y * y for y in ys) - sum(ys) ** 2)
    )
    assert r["assortativity_r"] == round(num / den, 6)


def test_graph_stats_degenerate_assortativity(spark):
    """Uniform degrees -> zero variance -> assortativity pinned to 0.0."""
    from subgraph_isomorphism_pregel_spark.operators.stats import graph_stats

    es = [(0, 1), (1, 0)]
    e = spark.createDataFrame(es, "src long, dst long")
    r = graph_stats(e).collect()[0]
    assert r["reciprocity"] == 1.0
    assert r["assortativity_r"] == 0.0


def test_modularity_matches_python(spark):
    """Two dense blocks + one bridge: Q matches a pure-Python Newman sum."""
    from subgraph_isomorphism_pregel_spark.operators.stats import modularity

    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    pairs += [(a, b) for a in range(4, 8) for b in range(4, 8) if a < b]
    pairs += [(0, 4)]
    edges = pairs + [(b, a) for a, b in pairs]
    labels = [(i, i // 4) for i in range(8)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    ldf = spark.createDataFrame(labels, "id long, comm long")
    row = modularity(ldf, edf).collect()[0]
    # python recomputation in the same exact-rational form
    m2 = len(edges)
    comm = dict(labels)
    i2 = sum(1 for a, b in edges if comm[a] == comm[b])
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    dc = {}
    for v, c in labels:
        dc[c] = dc.get(c, 0) + deg.get(v, 0)
    want_q = i2 / m2 - sum(d * d for d in dc.values()) / (m2 * m2)
    assert row["n_communities"] == 2
    assert row["intra_directed"] == i2
    assert row["q_modularity"] == want_q
    assert 0.3 < row["q_modularity"] < 0.5


def test_modularity_single_community_is_nonpositive(spark):
    from subgraph_isomorphism_pregel_spark.operators.stats import modularity

    edges = [(0, 1), (1, 0), (1, 2), (2, 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    ldf = spark.createDataFrame([(i, 0) for i in range(3)], "id long, comm long")
    row = modularity(ldf, edf).collect()[0]
    assert row["n_communities"] == 1
    assert row["q_modularity"] == 0.0  # all intra, one community: 1 - 1


def brute_rich_club(edges, ks):
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    out = {}
    for k in ks:
        rich = {x for x, d in deg.items() if d > k}
        e_k = sum(1 for u, v in und if u in rich and v in rich)
        n_k = len(rich)
        phi = round(2.0 * e_k / (n_k * (n_k - 1)), 6) if n_k >= 2 else 0.0
        out[k] = (n_k, e_k, phi)
    return out


def test_rich_club_matches_bruteforce(spark):
    from subgraph_isomorphism_pregel_spark.operators.stats import rich_club

    # hub core: 4-clique {0,1,2,3} plus pendant leaves on 0 and 4..9 chain
    edges = (
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(0, 10), (0, 11), (0, 12), (4, 5), (5, 6), (6, 7), (3, 4)]
    )
    ks = [0, 1, 2, 3]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.k: (r.n_k, r.e_k, r.phi_r) for r in rich_club(edf, ks=ks).collect()}
    assert got == brute_rich_club(edges, ks)
    # the 4-clique is a perfect rich club above degree 2
    assert got[2][2] == 1.0


def test_rich_club_direction_and_dupes_ignored(spark):
    from subgraph_isomorphism_pregel_spark.operators.stats import rich_club

    a = spark.createDataFrame([(0, 1), (1, 0), (1, 2), (1, 2)], "src long, dst long")
    b = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    assert rich_club(a, ks=[0, 1]).collect() == rich_club(b, ks=[0, 1]).collect()


def test_rich_club_contracts(spark):
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.stats import rich_club

    edf = spark.createDataFrame([(0, 1)], "src long, dst long")
    with _pytest.raises(ValueError):
        rich_club(edf, ks=[])
    with _pytest.raises(ValueError):
        rich_club(edf, ks=[-1])
    # threshold above every degree: empty club, phi = 0
    row = rich_club(edf, ks=[5]).collect()[0]
    assert (row.n_k, row.e_k, row.phi_r) == (0, 0, 0.0)


def test_zscore_anomalies_matches_bruteforce(spark):
    import math

    from subgraph_isomorphism_pregel_spark.operators.stats import zscore_anomalies

    rows = (
        [(i, "a", 10.0 + (i % 3)) for i in range(20)]
        + [(100, "a", 500.0)]            # clear outlier in group a
        + [(200 + i, "b", 1.0) for i in range(5)]
        + [(300, "b", 1.0)]              # constant group b: std 0, no rows
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_id: r.z_r for r in zscore_anomalies(df, threshold=3.0).collect()}

    qs = {e: math.floor(v * 100.0 + 0.5) for e, g, v in rows if g == "a"}
    n = len(qs)
    s = sum(qs.values())
    ss = sum(q * q for q in qs.values())
    den = math.sqrt(float(n) * float(ss) - float(s) * float(s))
    want = {
        e: round((float(n) * float(q) - float(s)) / den, 6)
        for e, q in qs.items()
        if abs(round((float(n) * float(q) - float(s)) / den, 6)) > 3.0
    }
    assert got == want and 100 in got
    # constant group produced nothing (den == 0 guard)
    assert all(e < 200 for e in got)


def test_zscore_anomalies_contracts(spark):
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.stats import zscore_anomalies

    df = spark.createDataFrame([(0, "a", 1.0)], "event_id long, event_type string, value double")
    with _pytest.raises(ValueError):
        zscore_anomalies(df, threshold=0.0)
    with _pytest.raises(ValueError):
        zscore_anomalies(df, quant_scale=0)
