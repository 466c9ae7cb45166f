"""Connected components by hash-min label flooding (undirected graphs).

Each vertex starts with component = own id; every changed vertex floods its
component id to neighbors; receivers keep the min. Converges in O(diameter)
supersteps; only the changed frontier scatters (the Spark analog of the
reference's vote_to_halt / message-wake protocol,
/root/reference/src/basic/Vertex.h:83-94)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, build_parts


def cc_program(P: int) -> VertexProgram:
    def init(part):
        nv = len(part["ids"])
        return {
            "comp": part["ids"].astype(np.int64),
            "changed": np.ones(nv, dtype=np.int32),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        comp, indptr, indices = part["comp"], part["indptr"], part["indices"]
        changed = part["changed"].astype(bool)
        if not changed.any() or indices.size == 0:
            return None
        outdeg = np.diff(indptr)
        src_idx = np.repeat(np.arange(len(comp)), outdeg)
        mask = changed[src_idx]
        dst = indices[mask]
        val = comp[src_idx][mask]
        if dst.size == 0:
            return None
        # partition-local min-combine before the shuffle, then ONE packed
        # row per destination partition (reference multicast batching,
        # /root/reference/src/basic/Vertex.h:102-106)
        dsts, inv = np.unique(dst, return_inverse=True)
        mins = np.full(len(dsts), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, val)
        dpid = (dsts % P).astype(np.int32)
        order = np.argsort(dpid, kind="stable")
        dpid_s, dsts_s, mins_s = dpid[order], dsts[order], mins[order]
        bounds = np.searchsorted(dpid_s, np.arange(P + 1))
        rows = [
            (int(p), dsts_s[bounds[p]:bounds[p + 1]], mins_s[bounds[p]:bounds[p + 1]])
            for p in range(P)
            if bounds[p + 1] > bounds[p]
        ]
        return pd.DataFrame(rows, columns=["pid", "dst", "comp"])

    def update(part, inbox: pd.DataFrame, step, carry):
        ids, comp = part["ids"], part["comp"].copy()
        changed = np.zeros(len(ids), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            # fold per-source-partition packed partial minima
            dst = np.concatenate([np.asarray(x) for x in inbox["dst"].values])
            val = np.concatenate([np.asarray(x) for x in inbox["comp"].values])
            n_msgs = len(dst)
            pos = np.searchsorted(ids, dst)
            cand = np.full(len(ids), np.iinfo(np.int64).max)
            np.minimum.at(cand, pos, val)
            better = cand < comp
            comp[better] = cand[better]
            changed[better] = 1
        return {
            "comp": comp,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name="connected_components",
        state_schema="comp array<long>, changed array<int>, msgs_in long, active long",
        msg_schema="pid int, dst array<long>, comp array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
    )


def components_df(parts: DataFrame) -> DataFrame:
    z = F.explode(F.arrays_zip("ids", "comp")).alias("z")
    return parts.select(z).select(
        F.col("z.ids").alias("id"), F.col("z.comp").alias("component")
    )


def connected_components(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int = 32,
    max_steps: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        cc_program(num_partitions),
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    return components_df(final), metrics
