"""Weisfeiler-Leman (1-WL) color refinement — the classic graph-isomorphism
filter and structural-role feature, the natural companion of a subgraph-
isomorphism engine (the reference's LDF candidate filter is the 0-round
special case: label alone; each WL round strengthens it with neighborhood
structure — /root/reference/src/SItypes/SIQuery.h candidate filtering).

    color_0(v)   = md5(label(v))
    color_t+1(v) = md5( color_t(v) || '|' ||
                        ','-join(SORTED multiset of neighbor color_t) )

Two non-isomorphic neighborhoods get different colors with overwhelming
probability; equal colors after k rounds certify equal k-hop unfolding
trees. Per-vertex colors are GNN-style structural roles; the color-class
histogram is a graph fingerprint (two graphs with different histograms are
non-isomorphic — the cheap pre-check before running the matcher).

Engine-exactness: md5 and lexicographic string sort are identical in
Spark and DuckDB, so every round's colors hash-gate bit-for-bit.

Input contract: edges symmetrized and distinct, no self loops; vertices
carry (id, label).

Scale shape: each round is ONE join (edges ⋈ colors on src — both sides
hash-partitioned on the same key, AQE reuses the exchange) and ONE
groupBy(dst) whose collect_list is bounded by the vertex degree; the
concat + md5 are codegen. k rounds = k joins, no driver-side data. Hub
vertices make long sorted strings (O(deg) bytes) — the same cost class as
any neighborhood aggregation; cap rounds small (1-WL stabilizes in
diameter-many rounds, 2-3 in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wl_refine(vertices: DataFrame, edges: DataFrame, rounds: int = 3) -> DataFrame:
    """(id, color) — per-vertex 1-WL color after `rounds` refinements."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    colors = vertices.select(
        "id", F.md5(F.col("label").cast("string")).alias("color")
    )
    for _ in range(rounds):
        nb = (
            edges.join(colors.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list("color"))
                ).alias("nbs")
            )
            .withColumnRenamed("dst", "id")
        )
        colors = (
            colors.join(nb, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat(
                        F.col("color"),
                        F.lit("|"),
                        F.coalesce(F.col("nbs"), F.lit("")),
                    )
                ).alias("color"),
            )
        )
    return colors


def wl_histogram(vertices: DataFrame, edges: DataFrame, rounds: int = 3) -> DataFrame:
    """(color, n) — the WL color-class histogram, the graph fingerprint:
    different histograms certify non-isomorphic graphs, so this is the
    O(k·E) pre-check before the exponential matcher runs."""
    return (
        wl_refine(vertices, edges, rounds)
        .groupBy("color")
        .agg(F.count("*").alias("n"))
    )
