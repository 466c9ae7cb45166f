"""Synchronous label propagation (community detection flavor).

Deterministic semantics (matched by the unrolled SQL oracle):
  lab_0(v) = v's id
  lab_t+1(v) = the label with the highest count among v's neighbors' lab_t,
               ties broken by the SMALLEST label; isolated vertices keep lab_t.
Runs a fixed number of rounds (synchronous LP on bipartite graphs oscillates,
so a fixed k is the well-defined variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts


def lp_program(P: int, rounds: int) -> VertexProgram:
    def init(part):
        nv = len(part["ids"])
        return {"lab": part["ids"].astype(np.int64), "msgs_in": 0, "active": nv}

    def scatter(part, step, carry):
        lab = part["lab"]
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        if s_dpos.size == 0:
            return None
        # pre-count (dense destination position, label) pairs per destination
        # partition so each (dst, label) pair ships at most once per source
        # partition; the build-time scatter layout already groups edges by
        # destination partition — unique runs per slice, no per-step sort of
        # the static dpid array
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            pairs = np.stack(
                [s_dpos[lo:hi].astype(np.int64), lab[s_spos[lo:hi]]], axis=1
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
        return pd.DataFrame(rows, columns=["pid", "dpos", "lab", "cnt"])

    def update(part, inbox: pd.DataFrame, step, carry):
        lab = part["lab"].copy()
        changed = 0
        n_msgs = 0
        if len(inbox):
            # fold per-source-partition packed partial counts
            d = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            l = np.concatenate([np.asarray(x) for x in inbox["lab"].values])
            c = np.concatenate([np.asarray(x) for x in inbox["cnt"].values])
            n_msgs = len(d)
            pairs = np.stack([d, l], axis=1)
            uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
            csum = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(csum, inv, c)
            pos, labs, cnt = uniq[:, 0], uniq[:, 1], csum
            # winner per destination position: max count, tie -> min label
            order = np.lexsort((labs, -cnt, pos))
            pos_o, labs_o = pos[order], labs[order]
            first = np.ones(len(pos_o), dtype=bool)
            first[1:] = pos_o[1:] != pos_o[:-1]
            win_pos, win_lab = pos_o[first], labs_o[first]
            changed = int((lab[win_pos] != win_lab).sum())
            lab[win_pos] = win_lab
        return {"lab": lab, "msgs_in": int(n_msgs), "active": changed}

    return VertexProgram(
        name="label_propagation",
        state_schema="lab array<long>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, lab array<long>, cnt array<int>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: step >= rounds,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def labels_df(parts: DataFrame) -> DataFrame:
    z = F.explode(F.arrays_zip("ids", "lab")).alias("z")
    return parts.select(z).select(
        F.col("z.ids").alias("id"), F.col("z.lab").alias("lp_label")
    )


def label_propagation(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    num_partitions: int | None = 32,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        lp_program(num_partitions, rounds),
        max_steps=rounds,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    return labels_df(final), metrics
