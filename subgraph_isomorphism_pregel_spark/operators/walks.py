"""Deterministic random walks — the corpus generator for graph-embedding
training (DeepWalk/node2vec-style), derandomized the same way the sampling
and LSH operators are: every step's choice is the neighbor minimizing an
md5 hash of (origin, walk_no, step, candidate, salt), so walks are
reproducible on any partitioning and any engine, and multiple walks per
vertex decorrelate through walk_no exactly like independent seeds.

    node(o, w, 0) = o
    node(o, w, t) = argmin_{v in N(node(o,w,t-1))}
                        md5("{o}:{w}:{t}:{v}:{salt}")   (ties -> smallest v)

Spark shape per step: frontier ⋈ edges equi-join on the current node, then
a groupBy argmin via min(struct(bucket, dst)) — map-side partial
aggregation, never a window over the candidate stream. walk_len is small
(4-16), so the driver loop unions walk_len+1 position tables. A walker at
a dead end (no out-neighbors) stops early: its rows simply end.

Scale: each step shuffles |frontier| + its candidate fan-out rows, grouped
by (origin, walk_no) — the same key every step, so AQE can reuse the
layout; candidate volume = sum of out-degrees of frontier nodes (one walk
per origin touches each hub at most walk_len times — no d^2 blowup)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_vertex: int = 1,
    starts: DataFrame | None = None,
    salt: str = "",
) -> DataFrame:
    """-> (origin, walk_no int, step int, node) long-format walk table.

    edges: directed (src, dst) — walks follow out-edges; symmetrize upstream
    for undirected semantics. starts: optional (id) DataFrame of origins
    (default: every distinct src)."""
    if walk_len < 1 or walks_per_vertex < 1:
        raise ValueError("walk_len and walks_per_vertex must be >= 1")
    e = edges.select("src", "dst").distinct()
    if starts is None:
        starts = e.select(F.col("src").alias("id")).distinct()
    frontier = starts.select(
        F.col("id").alias("origin"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk_no"),
    ).withColumn("node", F.col("origin"))
    out = frontier.select("origin", "walk_no", F.lit(0).alias("step"), "node")
    for t in range(1, walk_len + 1):
        cand = frontier.join(e, frontier["node"] == e["src"]).select(
            "origin", "walk_no", "dst"
        )
        bucket = F.md5(
            F.concat_ws(
                ":",
                F.col("origin"),
                F.col("walk_no"),
                F.lit(t),
                F.col("dst"),
                F.lit(salt),
            )
        )
        nxt = (
            cand.withColumn("b", bucket)
            .groupBy("origin", "walk_no")
            .agg(F.min(F.struct(F.col("b"), F.col("dst"))).alias("m"))
            .select("origin", "walk_no", F.col("m.dst").alias("node"))
            # each frontier feeds BOTH the output union and the next hop —
            # without a persist the union's action recomputes every prefix
            # chain (O(T^2) joins); frontiers are |starts|*W rows, tiny
            .persist()
        )
        out = out.unionAll(
            nxt.select("origin", "walk_no", F.lit(t).alias("step"), "node")
        )
        frontier = nxt
    return out
