"""Maximal independent set — Luby's algorithm, hash-derandomized.

Classic parallel MIS (Luby 1986): each round, an undecided vertex joins
the MIS iff its priority is smaller than every undecided neighbor's; MIS
neighbors then drop out. Priorities here are md5("{id}:{round}:{salt}")
HEX STRINGS compared lexicographically with (priority, id) tie-break —
fully deterministic, reproducible on any partitioning and engine (the
same derandomization as sampling.py/walks.py), and collision-free because
the vertex id itself breaks any md5 ties.

Round r over undecided set U_r:
    winners = { v in U_r : (p_r(v), v) < min_{u in N(v) ∩ U_r} (p_r(u), u) }
              (vertices with no undecided neighbor win unconditionally)
    excluded += (N(winners) ∩ U_r) \\ winners
    U_{r+1} = U_r \\ winners \\ excluded

Spark shape per round: two semi-joins restrict the edge list to
undecided-undecided pairs, one groupBy min(struct) computes each vertex's
best undecided neighbor (map-side partial min — hub fan-in combines before
the shuffle), winners come from one left join + codegen struct compare,
and the exclusion wave is a semi-join + two anti-joins. Luby needs
O(log n) rounds w.h.p., so the driver loop is short. Each round's winner /
excluded / undecided tables are cut to parquet and read back — the
undecided set feeds FIVE operators next round, so without the cut the
logical plan fans out ~5x per round and the analyzer chokes by round 4
(the same reason the BSP kernel round-trips its state, pregel.py; a
localCheckpoint cut degrades the Spark 4.1 driver — see that docstring).
The tables are one long column of at most |V| rows, so the cut is
negligible I/O."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _priority(col, r: int, salt: str):
    return F.md5(F.concat_ws(":", col, F.lit(r), F.lit(salt)))


def maximal_independent_set(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int | None = None,
    salt: str = "",
) -> DataFrame:
    """-> (id, status) with status in {'mis', 'excluded', 'undecided'}.

    vertices: (id ...); edges: directed rows of an UNDIRECTED graph (both
    directions derived here; self-loops ignored). rounds=None iterates to
    completion ('undecided' never appears); a fixed `rounds` runs exactly
    that many Luby rounds (the SQL-oracle form — output still exact)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    e = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    e = e.persist()
    spark = vertices.sparkSession
    workdir = tempfile.mkdtemp(prefix="mis_rounds_")

    def cut(df, name):
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    und = cut(vertices.select("id").distinct(), "u0")
    n_und = und.count()
    mis = None
    exc = None
    r = 0
    while True:
        r += 1
        if rounds is not None and r > rounds:
            break
        if n_und == 0:
            # fixed point in BOTH modes: every later round runs the full
            # join pipeline over empty tables and provably adds nothing
            # (empty undecided set -> empty winners), so a fixed `rounds`
            # run stops here with the identical output
            break
        # undecided-undecided edges only: both endpoints still in play
        ee = e.join(und.withColumnRenamed("id", "src"), "src", "left_semi").join(
            und.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
        best = (
            ee.select(
                F.col("dst").alias("id"),
                F.struct(
                    _priority(F.col("src"), r, salt).alias("p"),
                    F.col("src").alias("i"),
                ).alias("t"),
            )
            .groupBy("id")
            .agg(F.min("t").alias("nbr"))
        )
        own = F.struct(
            _priority(F.col("id"), r, salt).alias("p"), F.col("id").alias("i")
        )
        winners = cut(
            und.join(best, "id", "left")
            .where(F.col("nbr").isNull() | (own < F.col("nbr")))
            .select("id"),
            f"w{r}",
        )
        # newly_exc ⊆ und by construction, so next round's undecided set only
        # needs THIS round's removals — never an anti-join against the full
        # accumulated exclusion history
        newly_exc = cut(
            e.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(winners, "id", "left_anti")
            .join(und, "id", "left_semi"),
            f"x{r}",
        )
        mis = winners if mis is None else mis.unionAll(winners)
        exc = newly_exc if exc is None else exc.unionAll(newly_exc)
        nxt = cut(
            und.join(winners, "id", "left_anti").join(newly_exc, "id", "left_anti"),
            f"u{r}",
        )
        n_next = nxt.count()
        if rounds is None and n_next == n_und:
            # no progress is impossible (the global-minimum vertex always
            # wins) — guard against an infinite loop on adversarial input
            und = nxt
            break
        n_und = n_next
        und = nxt
    parts = [
        (mis, "mis"),
        (exc, "excluded"),
        (und, "undecided"),
    ]
    out = None
    for df, status in parts:
        if df is None:
            continue
        tagged = df.select("id", F.lit(status).alias("status"))
        out = tagged if out is None else out.unionAll(tagged)
    e.unpersist()
    return out
