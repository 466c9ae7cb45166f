"""k-core decomposition by iterative peeling on the BSP kernel.

The k-core of an undirected graph is the maximal induced subgraph in which
every vertex has degree >= k. Peeling computes it: repeatedly remove every
vertex whose residual degree drops below k; each removal decrements its
neighbors' residual degrees; converge when no vertex is removed in a
superstep. O(E) total message work across the whole run (every edge is
decremented at most once), O(peel-depth) supersteps — the standard
delta-style Pregel formulation (same wake/halt protocol as the reference's
vote_to_halt machinery, /root/reference/src/basic/Vertex.h:83-94, applied
to a new program the reference does not ship — link-graph breadth, like
sssp).

Scale: per superstep only the just-removed frontier scatters, messages are
partition-combined packed decrement rows (ONE row per (src block, dst
partition)), and the structure/state tables stay pid-bucketed — zero
exchanges beyond the message shuffle, like every other kernel program.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts


def kcore_program(P: int, k: int) -> VertexProgram:
    def init(part):
        deg = np.diff(np.asarray(part["indptr"])).astype(np.int64)
        newly = (deg < k).astype(np.int32)
        return {
            "deg": deg,
            "removed": newly.copy(),
            "changed": newly,
            "msgs_in": 0,
            "active": int(newly.sum()),
        }

    def scatter(part, step, carry):
        # every just-removed vertex decrements each neighbor's residual
        # degree once: partition-local add-combine by dense destination
        # position, one packed row per destination partition
        changed = part["changed"].astype(bool)
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        if not changed.any() or s_dpos.size == 0:
            return None
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
            dec = np.zeros(int(block_pos.max()) + 1, dtype=np.int64)
            np.add.at(dec, block_pos, 1)
            nz = np.nonzero(dec)[0]
            rows.append((int(p), nz.astype(np.int32), dec[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "dec"])

    def update(part, inbox: pd.DataFrame, step, carry):
        deg = part["deg"].copy()
        removed = part["removed"].copy()
        changed = np.zeros(len(deg), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["dec"].values])
            n_msgs = len(pos)
            np.subtract.at(deg, pos, val)
            newly = (removed == 0) & (deg < k)
            removed[newly] = 1
            changed[newly] = 1
        return {
            "deg": deg,
            "removed": removed,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name=f"kcore_{k}",
        state_schema=(
            "deg array<long>, removed array<int>, changed array<int>, "
            "msgs_in long, active long"
        ),
        msg_schema="pid int, dpos array<int>, dec array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def kcore_df(parts: DataFrame) -> DataFrame:
    """(id) — the vertices of the k-core, i.e. never removed by peeling."""
    z = F.explode(F.arrays_zip("ids", "removed")).alias("z")
    return (
        parts.select(z)
        .where(F.col("z.removed") == 0)
        .select(F.col("z.ids").alias("id"))
    )


def kcore(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    num_partitions: int | None = 32,
    max_steps: int = 500,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Vertices of the k-core of the (symmetric) edge set, plus kernel
    metrics. The graph must contain both directions of every edge (all
    fixture graphs do)."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        kcore_program(num_partitions, k),
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    return kcore_df(final), metrics
