"""Onion decomposition — synchronized adaptive-threshold peeling on the
BSP kernel, yielding per-vertex (layer, coreness).

The onion layer (Hébert-Dufresne et al. 2016) refines coreness: wave 1
removes every vertex whose residual degree is <= the current global
threshold t (t = running max of the minimum alive degree), wave 2 the
vertices exposed by wave 1, and so on; a vertex's layer is its wave index
and its coreness is the threshold at removal — exactly the peeling core
number, which makes this a SECOND, structurally different coreness
implementation cross-checked against the H-index fixed point
(operators/coreness.py) under the same SQL oracle.

Kernel mapping (delta-style like kcore, plus the F8 aggregator road the
reference drives its control decisions over — aggregator + rebroadcast,
/root/reference/src/basic/Aggregator.h):
  - scatter ships ONE packed decrement row per (source block, destination
    partition) for the vertices removed last step;
  - update applies decrements, then removes this step's wave at the
    carry's threshold t;
  - carry_fn re-derives (t, next_layer) from pure stats: while a step
    removed vertices, t stays (== max assigned core); a step that removed
    nothing has no decrements in flight, so t safely raises to the
    minimum alive degree. Each raise costs one idle superstep — the
    synchronization the reference pays in its aggregator round.

Total message work is O(E) across the whole run (each edge decrements
once); supersteps = #layers + #threshold raises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts

_NO_ALIVE = 1 << 62  # min-degree sentinel for partitions with nothing alive


def onion_program(P: int) -> VertexProgram:
    def init(part):
        deg = np.diff(np.asarray(part["indptr"])).astype(np.int64)
        nv = len(deg)
        return {
            "deg": deg,
            "removed": np.zeros(nv, dtype=np.int32),
            "layer": np.full(nv, -1, dtype=np.int64),
            "core": np.full(nv, -1, dtype=np.int64),
            "changed": np.zeros(nv, dtype=np.int32),
            "msgs_in": 0,
            "active": 0,
            "alive": int(nv),
            "max_core": -1,
            "max_layer": 0,
            "min_alive": int(deg.min()) if nv else _NO_ALIVE,
        }

    def scatter(part, step, carry):
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
        layer = part["layer"].copy()
        core = part["core"].copy()
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["dec"].values])
            n_msgs = len(pos)
            np.subtract.at(deg, pos, val)
        t = int(carry.get("t", -1))
        next_layer = int(carry.get("next_layer", 1))
        wave = (removed == 0) & (deg <= t)
        removed[wave] = 1
        layer[wave] = next_layer
        core[wave] = t
        alive = removed == 0
        return {
            "deg": deg,
            "removed": removed,
            "layer": layer,
            "core": core,
            "changed": wave.astype(np.int32),
            "msgs_in": int(n_msgs),
            "active": int(wave.sum()),
            "alive": int(alive.sum()),
            "max_core": int(core.max()) if len(core) else -1,
            # clamp the -1 unassigned sentinel: layers are 1-based
            "max_layer": int(max(layer.max(), 0)) if len(layer) else 0,
            "min_alive": int(deg[alive].min()) if alive.any() else _NO_ALIVE,
        }

    def carry_fn(srow):
        removed_now = int(srow["active"] or 0)
        max_core = int(srow["max_core"] if srow["max_core"] is not None else -1)
        min_alive = int(srow["min_alive"] if srow["min_alive"] is not None else _NO_ALIVE)
        if removed_now > 0 or min_alive >= _NO_ALIVE:
            t = max_core  # mid-peel (or done): threshold holds
        else:
            # nothing removed and nothing in flight: raise to the floor
            t = max(max_core, min_alive)
        return {
            "t": t,
            "next_layer": int(srow["max_layer"] or 0) + 1,
        }

    return VertexProgram(
        name="onion",
        state_schema=(
            "deg array<long>, removed array<int>, layer array<long>, "
            "core array<long>, changed array<int>, msgs_in long, "
            "active long, alive long, max_core long, max_layer long, "
            "min_alive long"
        ),
        msg_schema="pid int, dpos array<int>, dec array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[
            ("msgs_in", F.sum),
            ("active", F.sum),
            ("alive", F.sum),
            ("max_core", F.max),
            ("max_layer", F.max),
            ("min_alive", F.min),
        ],
        carry_fn=carry_fn,
        converged=lambda srow, step: int(srow["alive"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def onion_df(parts: DataFrame) -> DataFrame:
    z = F.explode(F.arrays_zip("ids", "layer", "core")).alias("z")
    return parts.select(z).select(
        F.col("z.ids").alias("id"),
        F.col("z.layer").alias("layer"),
        F.col("z.core").alias("coreness"),
    )


def onion_layers(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = 32,
    max_steps: int = 4096,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """(id, layer, coreness) per vertex, plus the kernel metrics rows."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        onion_program(num_partitions),
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
        carry0={"t": -1, "next_layer": 1},
    )
    return onion_df(final), metrics
