"""Strongly connected components (directed graphs) on the BSP kernel.

Forward–backward coloring (the standard Pregel-style SCC of Orzan/Slota,
built on the same vote-to-halt protocol the reference's framework implements,
/root/reference/src/basic/Vertex.h:83-94 — the reference itself ships only
undirected algorithms, so this is engine breadth, not parity): repeat

  1. FWD   — flood min vertex id along FORWARD edges through the undecided
             subgraph to a fixpoint: color(v) = min undecided id reaching v.
  2. SEED  — every color root (color(v) == v) marks itself reached.
  3. BWD   — flood "reached" along REVERSE edges, passing only between
             vertices of the SAME color, to a fixpoint.
  4. DECIDE— undecided ∧ reached ⇒ scc = color (exactly SCC(root): v is
             fwd-reachable from the root — color(v) = root — and
             bwd-reachable — v reaches the root); the remaining undecided
             reset color to their own id and the loop restarts.

until every vertex is decided.  Correctness of step 4: for v in SCC(r),
every u reaching v also reaches r (via v →* r), so color(v) = color(r) = r,
and every vertex on a v→r path is itself in SCC(r) — the restricted BWD
flood reaches all of SCC(r) and nothing else.  Consequently scc(v) is the
MINIMUM vertex id in v's SCC (roots are their round's minima, and rounds
remove whole SCCs), which is the exact contract the DuckDB closure oracle
checks.

Direction rides the kernel as a DATA-CARRIED edge attribute: the structure
is built over the union multiset {(u,v,dir=1) : u→v ∈ E} ∪ {(v,u,dir=0) :
u→v ∈ E} with build_parts(edge_cols={"dir": "int"}), so one static scatter
layout serves both flood directions — phase FWD masks slots dir==1, phase
BWD dir==0.  The phase machine lives in the carry: update() stamps the phase
it ran into a per-partition scalar stat, and carry_fn derives the next
phase from (phase, active) on the driver — the same one-collect-per-step
aggregator round-trip every other program uses.  SEED and DECIDE need each
vertex's own id, which lives only in the structure table: their scatter
emits SELF-messages (a vertex's dense position in its own block is its
state index), so per-vertex ids never ride the per-step state checkpoint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts

UNDECIDED = -1

# carry["phase"] values
FWD, SEED, BWD, DECIDE = 0, 1, 2, 3


def scc_program(P: int) -> VertexProgram:
    SENTINEL = np.iinfo(np.int64).max

    def init(part):
        ids = np.asarray(part["ids"], dtype=np.int64)
        nv = len(ids)
        return {
            "scc": np.full(nv, UNDECIDED, dtype=np.int64),
            "color": ids.copy(),
            "reached": np.zeros(nv, dtype=np.int32),
            "changed": np.ones(nv, dtype=np.int32),
            "msgs_in": 0,
            "active": nv,
            "undecided": nv,
            "phase": FWD,
        }

    def scatter(part, step, carry):
        ph = int(carry.get("phase", FWD))
        scc = np.asarray(part["scc"])
        color = np.asarray(part["color"])
        undec = scc == UNDECIDED

        if ph == SEED:
            # color roots self-mark: position within the block IS the
            # vertex's dense address, so this stays one local message row
            ids = np.asarray(part["ids"], dtype=np.int64)
            roots = np.nonzero(undec & (color == ids))[0]
            if roots.size == 0:
                return None
            return pd.DataFrame(
                [(int(part["pid"]), roots.astype(np.int32), color[roots])],
                columns=["pid", "dpos", "color"],
            )
        if ph == DECIDE:
            # undecided-and-unreached survive this round: self-send their own
            # id as the reset color (update has no access to the id array)
            reached = np.asarray(part["reached"]).astype(bool)
            rest = np.nonzero(undec & ~reached)[0]
            if rest.size == 0:
                return None
            ids = np.asarray(part["ids"], dtype=np.int64)
            return pd.DataFrame(
                [(int(part["pid"]), rest.astype(np.int32), ids[rest])],
                columns=["pid", "dpos", "color"],
            )

        s_spos, s_dpos = part["s_spos"], part["s_dpos"]
        s_bounds, s_dir = part["s_bounds"], np.asarray(part["s_dir"])
        changed = np.asarray(part["changed"]).astype(bool)
        if ph == FWD:
            senders = changed & undec
            want_dir = 1
        else:  # BWD
            senders = changed & np.asarray(part["reached"]).astype(bool)
            want_dir = 0
        if not senders.any() or s_dpos.size == 0:
            return None
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi]
            m = senders[sp] & (s_dir[lo:hi] == want_dir)
            if not m.any():
                continue
            block_pos = s_dpos[lo:hi][m]
            vals = color[sp[m]]
            if ph == FWD:
                # min-combine per dense destination position (multicast
                # batching, reference Vertex.h:102-106)
                mins = np.full(int(block_pos.max()) + 1, SENTINEL)
                np.minimum.at(mins, block_pos, vals)
                nz = np.nonzero(mins != SENTINEL)[0]
                rows.append((int(p), nz.astype(np.int32), mins[nz]))
            else:
                # BWD must keep DISTINCT colors per destination — a receiver
                # of colors {3, 7} with color 7 is reached by the 7, which a
                # min-combine would discard. Dedup (pos, color) pairs.
                key = np.stack([block_pos.astype(np.int64), vals])
                uniq = np.unique(key, axis=1)
                rows.append(
                    (int(p), uniq[0].astype(np.int32), uniq[1].astype(np.int64))
                )
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "color"])

    def update(part, inbox: pd.DataFrame, step, carry):
        ph = int(carry.get("phase", FWD))
        scc = np.asarray(part["scc"]).copy()
        color = np.asarray(part["color"]).copy()
        reached = np.asarray(part["reached"]).copy()
        changed = np.zeros(len(scc), dtype=np.int32)
        undec = scc == UNDECIDED
        n_msgs = 0
        pos = val = None
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["color"].values])
            n_msgs = len(pos)

        if ph == FWD:
            if pos is not None:
                cand = np.full(len(scc), SENTINEL)
                np.minimum.at(cand, pos, val)
                better = undec & (cand < color)
                color[better] = cand[better]
                changed[better] = 1
        elif ph == SEED:
            if pos is not None:
                reached[pos] = 1
                changed[pos] = 1
        elif ph == BWD:
            if pos is not None:
                ok = (color[pos] == val) & undec[pos] & (reached[pos] == 0)
                sel = pos[ok]
                reached[sel] = 1
                changed[sel] = 1
        else:  # DECIDE
            dec = undec & (reached == 1)
            scc[dec] = color[dec]
            if pos is not None:
                # exactly the undecided-and-unreached set: reset for the
                # next FWD round
                color[pos] = val
                reached[pos] = 0
                changed[pos] = 1

        return {
            "scc": scc,
            "color": color,
            "reached": reached,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
            "undecided": int((scc == UNDECIDED).sum()),
            "phase": ph,
        }

    def carry_fn(srow):
        ph = int(srow.get("phase") or 0)
        act = int(srow.get("active") or 0)
        if ph == FWD:
            nxt = FWD if act > 0 else SEED
        elif ph == SEED:
            nxt = BWD
        elif ph == BWD:
            nxt = BWD if act > 0 else DECIDE
        else:
            nxt = FWD
        return {"phase": nxt}

    return VertexProgram(
        name="scc",
        state_schema=(
            "scc array<long>, color array<long>, reached array<int>, "
            "changed array<int>, msgs_in long, active long, "
            "undecided long, phase int"
        ),
        msg_schema="pid int, dpos array<int>, color array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[
            ("msgs_in", F.sum),
            ("active", F.sum),
            ("undecided", F.sum),
            ("phase", F.max),
        ],
        carry_fn=carry_fn,
        converged=lambda srow, step: int(srow.get("undecided") or 0) == 0,
        struct_cols=("ids", "s_spos", "s_dpos", "s_bounds", "s_dir"),
    )


def scc(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = None,
    max_steps: int = 500,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """SCC ids for a DIRECTED graph: (id, scc) with scc = min vertex id in
    the strongly connected component (singletons map to themselves).

    edges(src, dst) is the directed edge set; vertices(id, label) must cover
    every endpoint. Returns (result DataFrame, kernel metrics rows)."""
    both = edges.select("src", "dst", F.lit(1).alias("dir")).unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(0).alias("dir")
        )
    )
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(both.count())
    )
    parts = build_parts(spark, vertices, both, P, edge_cols={"dir": "int"})
    final, metrics = Pregel(spark, parts, P).run(
        scc_program(P),
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
        carry0={"phase": FWD},
    )
    out = final.select(
        F.explode(F.arrays_zip("ids", "scc")).alias("z")
    ).select(
        F.col("z.ids").alias("id"), F.col("z.scc").alias("scc")
    )
    return out, metrics
