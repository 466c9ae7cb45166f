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

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut(df: DataFrame, workdir: str, name: str) -> DataFrame:
    """Materialize a per-step frontier to parquet and read it back: each
    frontier feeds BOTH the output union and the next hop, so it must be
    computed once — a persist() would do that too, but the walk returns
    lazily, so there is no point the operator could unpersist and every
    call would leak CacheManager entries for the session's lifetime (the
    same reason the other iterative operators cut through parquet)."""
    path = f"{workdir}/{name}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


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
    workdir = tempfile.mkdtemp(prefix="walks_")
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
        nxt = _cut(
            cand.withColumn("b", bucket)
            .groupBy("origin", "walk_no")
            .agg(F.min(F.struct(F.col("b"), F.col("dst"))).alias("m"))
            .select("origin", "walk_no", F.col("m.dst").alias("node")),
            workdir,
            f"f{t}",
        )
        out = out.unionAll(
            nxt.select("origin", "walk_no", F.lit(t).alias("step"), "node")
        )
        frontier = nxt
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 4,
    p: float = 4.0,
    q: float = 0.25,
    walks_per_vertex: int = 1,
    starts: DataFrame | None = None,
    salt: str = "",
) -> DataFrame:
    """Second-order (node2vec) biased walks, fully derandomized:
    (origin, walk_no, step, node) with the p/q bias of Grover & Leskovec —
    from current node c with predecessor s, a neighbor d weighs

        1/p  if d == s                (return)
        1    if edge (s, d) exists    (stay close: distance 1 from s)
        1/q  otherwise                (explore: distance 2 from s)

    and the step draws d by inverse-CDF over the neighbors IN ID ORDER
    against the uniform u = md5(origin:walk_no:step:salt)/16^8 — one hash
    per (walk, step), so the walk is reproducible on any partitioning and
    replayable in SQL. With dyadic p and q (the 4.0 / 0.25 defaults) every
    cumulative weight is an exact double, making even the CDF comparison
    engine-exact. The first step (no predecessor) is uniform.

    Spark shape per step: frontier ⋈ out-edges, a LEFT SEMI-shaped marker
    join against edges for the (s, d) distance-1 test, one windowed
    cumulative sum per (origin, walk_no) — the window sees only the
    current node's out-neighbors, so hubs cost their degree, never d².
    """
    if walk_len < 1 or walks_per_vertex < 1:
        raise ValueError("walk_len and walks_per_vertex must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    from pyspark.sql import Window

    workdir = tempfile.mkdtemp(prefix="n2v_")
    e = edges.select("src", "dst").distinct()
    if starts is None:
        starts = e.select(F.col("src").alias("id")).distinct()
    frontier = (
        starts.select(
            F.col("id").alias("origin"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("walk_no"),
        )
        .withColumn("node", F.col("origin"))
        .withColumn("prev", F.lit(None).cast("long"))
    )
    out = frontier.select("origin", "walk_no", F.lit(0).alias("step"), "node")
    back = e.select(F.col("src").alias("bs"), F.col("dst").alias("bd")).withColumn(
        "near", F.lit(True)
    )
    for t in range(1, walk_len + 1):
        cand = frontier.join(e, frontier["node"] == e["src"]).select(
            "origin", "walk_no", "prev", F.col("dst").alias("d")
        )
        cand = cand.join(
            back,
            (cand["prev"] == back["bs"]) & (cand["d"] == back["bd"]),
            "left",
        ).select("origin", "walk_no", "prev", "d", "near")
        wgt = (
            F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(F.col("d") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("near").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("origin"),
                            F.col("walk_no"),
                            F.lit(t),
                            F.lit(salt),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(float(16**8))
        )
        part = Window.partitionBy("origin", "walk_no")
        cum = part.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        scored = cand.select(
            "origin",
            "walk_no",
            "d",
            F.sum(wgt).over(cum).alias("cw"),
            F.sum(wgt).over(part).alias("tot"),
            u.alias("u"),
        )
        nxt = _cut(
            scored.where(F.col("cw") >= F.col("u") * F.col("tot"))
            .groupBy("origin", "walk_no")
            .agg(F.min("d").alias("node")),
            workdir,
            f"f{t}",
        )
        out = out.unionAll(
            nxt.select("origin", "walk_no", F.lit(t).alias("step"), "node")
        )
        prev_map = frontier.select(
            "origin", "walk_no", F.col("node").alias("prev")
        )
        frontier = nxt.join(prev_map, ["origin", "walk_no"]).select(
            "origin", "walk_no", "node", "prev"
        )
    return out
