"""Exact grouped quantiles vs a sorted-list replay of the rank-ceil rule."""

import math
import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.stats import group_quantiles


def brute(rows, qs):
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vals in by_g.items():
        vals.sort()
        for q in qs:
            out[(g, q)] = vals[math.ceil(q * len(vals)) - 1]
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


def test_group_quantiles_bad_inputs(spark):
    df = spark.createDataFrame([("a", 1)], "lang string, n_chars long")
    with pytest.raises(ValueError):
        group_quantiles(df, "lang", "n_chars", qs=[0.0])
    with pytest.raises(ValueError):
        group_quantiles(df, "lang", "n_chars", qs=[])
