"""K-hop neighborhood extraction with optional deterministic fanout
sampling — the GNN minibatch primitive (GraphSAGE-style ego-nets).

    khop(origin, 0) = {origin}
    khop(origin, t) = nodes first reached at hop t, following out-edges of
                      hop t-1's frontier; with a fanout cap m_t, each
                      (origin, frontier-node) expansion keeps only its m_t
                      neighbors with the smallest md5("{o}:{t}:{u}:{v}:{salt}")
                      (ties -> smallest v) — the same hash-derandomization as
                      operators/walks.py, so sampled neighborhoods are
                      reproducible across partitionings and engines.

Output is (origin, node, dist): each node appears once per origin at its
FIRST (shortest sampled) hop distance.

Spark shape per hop: frontier ⋈ edges equi-join; the fanout cap is a
row_number window over (origin, frontier-node) — candidate volume per task
is one expansion's neighbor list, so window skew equals degree skew, which
the cap itself then truncates; dedup against the seen set is a left-anti
join on (origin, node). Hop count is small (GNN samplers use 2-3), so the
driver loop unions k+1 distance tables. Total sampled volume is bounded by
|starts| * prod(fanouts) — independent of graph degree, which is the whole
point at web scale."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .walks import _cut


def khop_neighbors(
    edges: DataFrame,
    k: int = 2,
    starts: DataFrame | None = None,
    fanout: int | list[int] | None = None,
    salt: str = "",
) -> DataFrame:
    """-> (origin, node, dist int) ego-net table. edges: directed (src, dst).

    starts: optional (id) DataFrame of origins (default: every distinct
    src). fanout: per-hop neighbor cap — an int (same cap each hop), a list
    of k ints, or None for the exact k-hop closure."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if isinstance(fanout, int):
        fanout = [fanout] * k
    if fanout is not None and len(fanout) != k:
        raise ValueError(f"fanout must have {k} entries")
    workdir = tempfile.mkdtemp(prefix="khop_")
    e = edges.select("src", "dst").distinct()
    if starts is None:
        starts = e.select(F.col("src").alias("id")).distinct()
    frontier = starts.select(F.col("id").alias("origin"), F.col("id").alias("node"))
    seen = frontier
    out = frontier.select("origin", "node", F.lit(0).alias("dist"))
    for t in range(1, k + 1):
        cand = frontier.join(e, frontier["node"] == e["src"]).select(
            "origin", F.col("node").alias("cur"), "dst"
        )
        if fanout is not None:
            bucket = F.md5(
                F.concat_ws(
                    ":",
                    F.col("origin"),
                    F.lit(t),
                    F.col("cur"),
                    F.col("dst"),
                    F.lit(salt),
                )
            )
            w = Window.partitionBy("origin", "cur").orderBy(
                bucket.asc(), F.col("dst").asc()
            )
            cand = cand.withColumn("rn", F.row_number().over(w)).where(
                F.col("rn") <= fanout[t - 1]
            )
        # reused by the output union, the seen set, AND the next hop — cut
        # to parquet so the union's action never recomputes prefix chains
        # (a persist() could never be released and would leak a cache
        # entry per hop per call — see walks._cut)
        new = _cut(
            cand.select("origin", F.col("dst").alias("node"))
            .distinct()
            .join(seen, ["origin", "node"], "left_anti"),
            workdir,
            f"h{t}",
        )
        out = out.unionAll(new.select("origin", "node", F.lit(t).alias("dist")))
        seen = seen.unionAll(new)
        frontier = new
    return out
