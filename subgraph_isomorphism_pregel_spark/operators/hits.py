"""HITS (hubs & authorities) as a vertex program over the BSP kernel.

Semantics (simultaneous normalized power iteration, matched exactly by the
numpy oracle in tests and the unrolled SQL oracle in __spark_entry__):

    hub_0(u) = 1 for every u with an out-edge
    auth_0(v) = 1 for every v with an in-edge
    auth_t(v) = sum_{u->v} hub_{t-1}(u)  / ||hub_{t-1}||_2
    hub_t(u)  = sum_{u->v} auth_{t-1}(v) / ||auth_{t-1}||_2
    output: each role L2-normalized by its own final norm

The directed graph is DOUBLED before partitioning: node 2u is u's hub role,
node 2v+1 is v's auth role, and every original edge u->v becomes the pair
(2u -> 2v+1), (2v+1 -> 2u).  One superstep of the kernel then performs one
full HITS iteration for BOTH roles at once — the same packed-multicast
scatter, CSR layout, and zero-exchange cogroup as PageRank, with per-role
L2 norms flowing through the scalar carry (one P-row collect per step, like
PageRank's dangling mass).  Reference analog: the alternating score passes
of the ref's superstep loop (/root/reference/src/pregel/Worker.h — message
rounds per phase); here a phase is a role-parity mask, not a program fork.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts


def hits_program(P: int, fixed_steps: int) -> VertexProgram:
    def init(part):
        nv = len(part["ids"])
        # role parity lives in state (like PageRank's dang_pos): update()
        # never sees the structure table, and scatter() only the declared
        # struct_cols — positions of hub-role vertices are enough for both
        hub_pos = np.nonzero(np.asarray(part["ids"]) % 2 == 0)[0].astype(np.int64)
        return {
            "value": np.ones(nv),
            "hub_pos": hub_pos,
            "hub_ss_partial": float(len(hub_pos)),
            "auth_ss_partial": float(nv - len(hub_pos)),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        value = np.asarray(part["value"], dtype=np.float64)
        s_spos, s_dpos = part["s_spos"], part["s_dpos"]
        s_bounds = part["s_bounds"]
        if s_dpos.size == 0:
            return None
        # normalize at send time by the sender's own role norm — values in
        # state stay un-normalized sums, so nothing ever overflows and the
        # stored iterate is exactly what the SQL oracle's r{t} tables hold
        hub_mask = np.zeros(len(value), dtype=bool)
        hub_mask[np.asarray(part["hub_pos"], dtype=np.int64)] = True
        hn = np.sqrt(max(float(carry.get("hub_ss", 1.0)), 1e-300))
        an = np.sqrt(max(float(carry.get("auth_ss", 1.0)), 1e-300))
        rate = np.where(hub_mask, value / hn, value / an)
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            dense = np.bincount(s_dpos[lo:hi], weights=rate[s_spos[lo:hi]])
            nz = np.nonzero(dense)[0]
            rows.append((int(p), nz.astype(np.int32), dense[nz]))
        return pd.DataFrame(rows, columns=["pid", "dpos", "contrib"])

    def update(part, inbox: pd.DataFrame, step, carry):
        value = np.asarray(part["value"], dtype=np.float64)
        contrib = np.zeros(len(value))
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["contrib"].values])
            n_msgs = len(pos)
            np.add.at(contrib, pos, val)
        hub_pos = np.asarray(part["hub_pos"], dtype=np.int64)
        hub_mask = np.zeros(len(value), dtype=bool)
        hub_mask[hub_pos] = True
        return {
            "value": contrib,
            "hub_pos": hub_pos,
            "hub_ss_partial": float((contrib[hub_mask] ** 2).sum()),
            "auth_ss_partial": float((contrib[~hub_mask] ** 2).sum()),
            "msgs_in": int(n_msgs),
            "active": int(len(value)),
        }

    def carry_fn(srow):
        return {
            "hub_ss": float(srow["hub_ss_partial"] or 0.0),
            "auth_ss": float(srow["auth_ss_partial"] or 0.0),
        }

    def converged(srow, step):
        return step >= fixed_steps

    return VertexProgram(
        name="hits",
        state_schema=(
            "value array<double>, hub_pos array<long>, hub_ss_partial double, auth_ss_partial double, "
            "msgs_in long, active long"
        ),
        msg_schema="pid int, dpos array<int>, contrib array<double>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[
            ("hub_ss_partial", F.sum),
            ("auth_ss_partial", F.sum),
            ("msgs_in", F.sum),
            ("active", F.sum),
        ],
        carry_fn=carry_fn,
        converged=converged,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def hits(
    spark: SparkSession,
    edges: DataFrame,
    steps: int = 5,
    num_partitions: int | None = 32,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """HITS over a DIRECTED edge list -> ((id, role, score) DataFrame, metrics).

    Hub rows exist for every distinct src, authority rows for every distinct
    dst; each role's scores are L2-normalized.  `steps` is the number of full
    HITS iterations (both roles advance each superstep)."""
    if steps < 1:
        raise ValueError("hits needs steps >= 1")
    e = edges.select("src", "dst").distinct()
    # doubled encoding: hub(u) = 2u, auth(v) = 2v+1; each edge becomes its
    # forward (hub->auth) and reverse (auth->hub) doubled edge
    fwd = e.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    rev = e.select(
        (F.col("dst") * 2 + 1).alias("src"), (F.col("src") * 2).alias("dst")
    )
    # the doubled tables derive from a DISTINCT (a shuffle of the caller's
    # raw edge plan) and feed four consumers — the partition sizing count,
    # the role counts, and both sides of the CSR build cogroup; persist so
    # the dedup shuffle runs once instead of ~four times
    de = fwd.unionAll(rev).persist()
    dv = de.select(F.col("src").alias("id")).distinct().withColumn(
        "label", (F.col("id") % 2).cast("int")
    ).persist()
    try:
        if num_partitions is None:
            num_partitions = auto_partitions(de.count())
        # initial per-role sums of squares (all-ones start): the role counts
        counts = {
            int(r["label"]): int(r["n"])
            for r in dv.groupBy("label").agg(F.count("*").alias("n")).collect()
        }
        parts = build_parts(spark, dv, de, num_partitions)
        prog = hits_program(num_partitions, fixed_steps=steps)
        kern = Pregel(spark, parts, num_partitions)
        final, metrics = kern.run(
            prog,
            max_steps=steps,
            checkpoint_dir=checkpoint_dir,
            resume=resume,
            checkpoint_every=checkpoint_every,
            carry0={
                "hub_ss": float(counts.get(0, 0)),
                "auth_ss": float(counts.get(1, 0)),
            },
        )
    finally:
        de.unpersist()
        dv.unpersist()
    z = F.explode(F.arrays_zip("ids", "value")).alias("z")
    doubled = final.select(z).select(
        F.col("z.ids").alias("did"), F.col("z.value").alias("value")
    )
    scored = doubled.select(
        F.floor(F.col("did") / 2).alias("id"),
        F.when(F.col("did") % 2 == 0, F.lit("hub")).otherwise(F.lit("auth")).alias("role"),
        "value",
    )
    norms = scored.groupBy("role").agg(
        F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("norm")
    )
    return (
        scored.join(F.broadcast(norms), "role").select(
            "id",
            "role",
            (F.col("value") / F.when(F.col("norm") > 0, F.col("norm")).otherwise(F.lit(1.0))).alias("score"),
        ),
        metrics,
    )
