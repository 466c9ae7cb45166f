"""Topological layering ("build order") for dependency graphs.

`dag_levels` computes, for every vertex of a DAG, the length of the longest
directed path ENDING at it — the classic build-system scheduling primitive:
level k = everything that can compile in wave k once waves 0..k-1 are done.
It is the max-plus dual of the kernel's Bellman-Ford SSSP: every vertex
starts at level 0 and repeatedly raises its out-neighbors to
max(level(src) + 1); on a DAG the changed frontier empties after exactly
`depth` supersteps.  A cycle never converges, so hitting `max_rounds` with a
non-empty frontier raises instead of returning wrong levels.

`build_order` lifts that to ARBITRARY directed graphs the way build tools
do: contract every strongly connected component (kernel SCC,
forward-backward coloring) to one node, layer the condensation — which is
always a DAG — and hand each original vertex its component's level.
Vertices in the same mutually-recursive clique share a wave.

Scale shape: two kernel runs (SCC over V+E, layering over the condensation,
which is no larger and usually far smaller) plus two hash joins to relabel
edges by component — the joins shuffle on vertex id exactly once each.
Reference analog: none (the reference has no DAG scheduling); the vertex
program reuses its vote-to-halt protocol
(/root/reference/src/basic/Vertex.h:83-94).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts
from .scc import scc


def levels_program(P: int) -> VertexProgram:
    def init(part):
        nv = len(part["ids"])
        return {
            "level": np.zeros(nv, dtype=np.int64),
            "changed": np.ones(nv, dtype=np.int32),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        level = np.asarray(part["level"])
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        changed = np.asarray(part["changed"]).astype(bool)
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
            # partition-local MAX-combine by dense destination position
            maxs = np.full(int(block_pos.max()) + 1, -1, dtype=np.int64)
            np.maximum.at(maxs, block_pos, level[sp[m]] + 1)
            nz = np.nonzero(maxs >= 0)[0]
            rows.append((int(p), nz.astype(np.int32), maxs[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "level"])

    def update(part, inbox: pd.DataFrame, step, carry):
        level = np.asarray(part["level"]).copy()
        changed = np.zeros(len(level), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["level"].values])
            n_msgs = len(pos)
            cand = np.full(len(level), -1, dtype=np.int64)
            np.maximum.at(cand, pos, val)
            better = cand > level
            level[better] = cand[better]
            changed[better] = 1
        return {
            "level": level,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name="dag_levels",
        state_schema="level array<long>, changed array<int>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, level array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def dag_levels(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> tuple[DataFrame, list[dict]]:
    """(id, level) for a DAG; raises ValueError when the frontier is still
    active after max_rounds (a cycle, or max_rounds < graph depth)."""
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(edges.count())
    )
    parts = build_parts(spark, vertices, edges, P)
    final, metrics = Pregel(spark, parts, P).run(levels_program(P), max_steps=max_rounds)
    last = max((m["superstep"] for m in metrics), default=0)
    still_active = sum(
        m["active_vertices"] for m in metrics if m["superstep"] == last
    )
    if still_active > 0:
        raise ValueError(
            f"dag_levels did not converge in {max_rounds} rounds "
            f"({still_active} active) — cyclic input or bound too small"
        )
    out = final.select(F.explode(F.arrays_zip("ids", "level")).alias("z")).select(
        F.col("z.ids").alias("id"), F.col("z.level").alias("level")
    )
    return out, metrics


def build_order(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> tuple[DataFrame, list[dict]]:
    """(id, comp, level) for an arbitrary directed graph: comp = SCC id
    (min member), level = longest-path layer of that component in the SCC
    condensation.  Two kernel runs + two relabeling joins."""
    comp, m1 = scc(spark, vertices, edges, num_partitions=num_partitions)
    relabeled = (
        edges.join(comp.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("scc", "csrc")
        .join(
            comp.select(F.col("id").alias("dst"), F.col("scc").alias("cdst")),
            "dst",
        )
        .where(F.col("csrc") != F.col("cdst"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .distinct()
    )
    relabeled = relabeled.persist()
    try:
        cverts = comp.select(F.col("scc").alias("id")).distinct().withColumn(
            "label", F.lit(0).cast("int")
        )
        cp = (
            num_partitions
            if num_partitions is not None
            else auto_partitions(relabeled.count())
        )
        levels, m2 = dag_levels(
            spark, cverts, relabeled, num_partitions=cp, max_rounds=max_rounds
        )
    finally:
        relabeled.unpersist()
    out = comp.join(
        levels.select(F.col("id").alias("scc"), "level"), "scc"
    ).select("id", F.col("scc").alias("comp"), "level")
    return out, m1 + m2
