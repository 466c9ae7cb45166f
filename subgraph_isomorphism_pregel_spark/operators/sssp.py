"""Single-source shortest paths (unweighted BFS hop distance) on the kernel.

Not in the reference's algorithm set — added breadth for the link-graph
engine: the canonical min-plus vertex program (reference framework analog:
the same vote-to-halt / changed-frontier protocol the reference's Vertex.h
implements, /root/reference/src/basic/Vertex.h:83-94).

Semantics are explicitly BOUNDED: distances up to `max_hops` supersteps;
vertices further than that (or unreachable) carry no row. The DuckDB oracle
twin implements the identical bound with a recursive CTE (`WHERE dist <
max_hops`), so the contract is exact on both sides regardless of graph
diameter — no unroll-depth assumption (the defect the round-1 CC oracle had).
Converges early (active = 0) when the frontier empties before the bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts

UNREACHED = -1


def sssp_program(source: int, P: int) -> VertexProgram:
    SENTINEL = np.iinfo(np.int64).max

    def init(part):
        ids = part["ids"]
        dist = np.full(len(ids), UNREACHED, dtype=np.int64)
        changed = np.zeros(len(ids), dtype=np.int32)
        at_src = ids == source
        dist[at_src] = 0
        changed[at_src] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": 0,
            "active": int(changed.sum()),
        }

    def scatter(part, step, carry):
        dist = part["dist"]
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        changed = part["changed"].astype(bool)
        if not changed.any() or s_dpos.size == 0:
            return None
        # partition-local min-combine by dense destination position, ONE
        # packed row per destination partition (multicast batching); edges
        # sit in the build-time scatter layout — slice + mask, no per-step sort
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi]
            m = changed[sp]
            if not m.any():
                continue
            block_pos = s_dpos[lo:hi][m]
            mins = np.full(int(block_pos.max()) + 1, SENTINEL)
            np.minimum.at(mins, block_pos, dist[sp[m]] + 1)
            nz = np.nonzero(mins != SENTINEL)[0]
            rows.append((int(p), nz.astype(np.int32), mins[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "dist"])

    def update(part, inbox: pd.DataFrame, step, carry):
        dist = part["dist"].copy()
        changed = np.zeros(len(dist), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["dist"].values])
            n_msgs = len(pos)
            cand = np.full(len(dist), SENTINEL)
            np.minimum.at(cand, pos, val)
            better = (cand < SENTINEL) & ((dist == UNREACHED) | (cand < dist))
            dist[better] = cand[better]
            changed[better] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name="sssp",
        state_schema="dist array<long>, changed array<int>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, dist array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def distances_df(parts: DataFrame) -> DataFrame:
    """(id, dist) for vertices reached within the bound; unreached dropped."""
    z = F.explode(F.arrays_zip("ids", "dist")).alias("z")
    return (
        parts.select(z)
        .select(F.col("z.ids").alias("id"), F.col("z.dist").alias("dist"))
        .where(F.col("dist") >= 0)
    )


def sssp(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    source: int,
    max_hops: int = 64,
    num_partitions: int | None = 32,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Hop distances from `source`, bounded at max_hops supersteps."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        sssp_program(source, num_partitions),
        max_steps=max_hops,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    return distances_df(final), metrics
