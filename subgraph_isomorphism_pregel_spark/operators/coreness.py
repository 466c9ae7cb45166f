"""Core decomposition (per-vertex core numbers) by distributed H-index
iteration on the BSP kernel.

coreness(v) is the largest k such that v belongs to the k-core. Instead of
the inherently sequential global peel, each vertex iterates the
neighborhood H-index operator (Montresor et al. 2013 "Distributed k-core
decomposition"; Lü et al. 2016 prove the fixed point):

    c_0(v)   = deg(v)
    c_t+1(v) = H({ c_t(u) : u in N(v) })

where H(multiset) is the largest h with at least h members >= h. The
sequence is monotonically non-increasing and its fixed point is exactly
the core number — a convergence-detected kernel program like connected
components (same wake/halt protocol as the reference's vote_to_halt
machinery, /root/reference/src/basic/Vertex.h:83-94, applied to a program
the reference does not ship — link-graph breadth, like sssp/kcore).

Input contract: `edges` symmetrized and distinct, no self loops.

Scale: every superstep each vertex ships its current estimate as packed
(dest position, value, count) rows — one row group per (source block,
destination partition), the LP message shape — and the structure/state
tables stay pid-bucketed (zero exchanges beyond the message shuffle). The
estimate lattice is finite and monotone, so sweeps-to-fixpoint is small
(4 on the gated fixture; O(peel-depth) worst case). The refinement for
hub-heavy graphs at extreme scale — delta sends plus per-edge cached
neighbor estimates (O(E) state) — is documented, not needed at the
measured sweep counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts


def _segment_hindex(pos, val, cnt):
    """H-index per destination position from (pos, val, cnt) triples:
    sort desc by val within pos, running count, candidate min(val, cum),
    segment max. Returns (unique positions, h values)."""
    order = np.lexsort((-val, pos))
    p_o, v_o, c_o = pos[order], val[order], cnt[order].astype(np.int64)
    starts = np.ones(len(p_o), dtype=bool)
    starts[1:] = p_o[1:] != p_o[:-1]
    start_idx = np.nonzero(starts)[0]
    cum = np.cumsum(c_o)
    offset = (cum[start_idx] - c_o[start_idx])[np.cumsum(starts) - 1]
    cand = np.minimum(v_o, cum - offset)
    return p_o[start_idx], np.maximum.reduceat(cand, start_idx)


def coreness_program(P: int) -> VertexProgram:
    def init(part):
        deg = np.diff(np.asarray(part["indptr"])).astype(np.int64)
        return {"c": deg, "msgs_in": 0, "active": int(len(deg))}

    def scatter(part, step, carry):
        # every vertex ships its current estimate each sweep (the receiver
        # recomputes H over the FULL neighbor multiset, so partial resends
        # would need per-edge cached values — the documented refinement)
        c = part["c"]
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        if s_dpos.size == 0:
            return None
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            pairs = np.stack(
                [s_dpos[lo:hi].astype(np.int64), c[s_spos[lo:hi]]], axis=1
            )
            uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
            rows.append(
                (
                    int(p),
                    uniq[:, 0].astype(np.int32),
                    uniq[:, 1],
                    cnt.astype(np.int32),
                )
            )
        return pd.DataFrame(rows, columns=["pid", "dpos", "val", "cnt"])

    def update(part, inbox: pd.DataFrame, step, carry):
        c = part["c"].copy()
        changed = 0
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["val"].values])
            cnt = np.concatenate([np.asarray(x) for x in inbox["cnt"].values])
            n_msgs = len(pos)
            upos, h = _segment_hindex(pos, val, cnt)
            changed = int((c[upos] != h).sum())
            c[upos] = h
        return {"c": c, "msgs_in": int(n_msgs), "active": changed}

    return VertexProgram(
        name="coreness",
        state_schema="c array<long>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, val array<long>, cnt array<int>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def coreness_df(parts: DataFrame) -> DataFrame:
    z = F.explode(F.arrays_zip("ids", "c")).alias("z")
    return parts.select(z).select(
        F.col("z.ids").alias("id"), F.col("z.c").alias("coreness")
    )


def coreness(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = 32,
    max_steps: int = 128,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """(id, coreness) per vertex, plus the kernel metrics rows."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        coreness_program(num_partitions),
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    return coreness_df(final), metrics
