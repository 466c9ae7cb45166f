"""Greedy graph coloring — Jones–Plassmann, hash-derandomized.

The sequential greedy coloring (visit vertices in a fixed order, take the
smallest color unused by already-colored neighbors) is inherently ordered.
Jones–Plassmann (1993) parallelizes it without changing the RESULT: give
every vertex a fixed priority, and in each round color exactly the
vertices all of whose still-uncolored neighbors have lower priority. A
vertex's color depends only on its higher-priority neighbors' colors, so
the parallel schedule reproduces the sequential greedy coloring in
priority order exactly — the same derandomization family as lex-first
matching (matching.py) and lex-first MIS. Priorities are md5("{id}:{salt}")
hex strings with an (priority, id) tie-break, FIXED across rounds (fixed
priorities are what make the greedy equivalence hold; Luby-style per-round
re-randomization would break it). Two adjacent vertices are never ready in
the same round (one outranks the other), so every round's coloring is
conflict-free by construction.

The round count is the length of the longest priority-decreasing path —
O(log n / log log n) w.h.p. on bounded-degree graphs with random
priorities — and each round is:

  ready — restrict edges to uncolored-uncolored, groupBy min(struct(p,id))
          per endpoint (map-side combining), one left join + struct
          compare: uncolored vertices that outrank every uncolored
          neighbor.
  mex   — already-colored neighbor colors per ready vertex via
          collect_set, then the smallest absent color as a pure-codegen
          fold: aggregate(array_sort(colors), 0, (acc, c) ->
          IF(c = acc, acc + 1, acc)) — the classic sorted-mex scan, no
          Python and no explode.
  apply — colored += ready, uncolored -= ready; both cut to parquet (the
          mis.py lineage discipline).

Color count equals the sequential greedy bound (≤ Δ+1); use the salt to
draw different greedy orders. Parity-plus over the reference (no coloring
there); coloring is the classic Pregel symmetry-breaking workload.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _priority(col, salt: str):
    return F.md5(F.concat_ws(":", col, F.lit(salt)))


def greedy_coloring(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int | None = None,
    salt: str = "",
) -> tuple[DataFrame, int]:
    """-> ((id, color) for every vertex colored so far, rounds_run).

    vertices: (id ...); edges: rows of an UNDIRECTED graph — either or
    both directions (symmetrized here); self-loops ignored. rounds=None
    runs to completion (every vertex colored); a fixed `rounds` returns
    the deterministic prefix colored within that many Jones–Plassmann
    rounds — the SQL-oracle form, idempotent past the fixed point.
    """
    spark = edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="coloring_")

    def cut(df: DataFrame, name: str) -> DataFrame:
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    e = cut(
        e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        "e0",
    )
    # ONE state table (id, color: null = uncolored), rewritten per round —
    # the round-4 two-table form (per-round `newly` cut + shrinking `unc`
    # cut + a colored-union of r leaf scans) paid two parquet writes, a
    # count job and ~8 broadcast/shuffle stages per round; this form is one
    # write, one shuffle and three broadcasts (measured 20.3s -> see
    # OPTIMIZATION_r06.md), writes the same O(V) bytes per round the old
    # `unc` cut already wrote, and keeps the plan O(1)-deep in rounds.
    state = cut(
        vertices.select("id").distinct().select("id", F.lit(None).cast("int").alias("color")),
        "s0",
    )
    n_unc = state.count()
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if n_unc == 0:
            break
        r += 1
        # decorate each (src, dst) edge with the source's color, then fold
        # BOTH per-destination aggregates in one pass: the best uncolored
        # neighbor priority (Jones-Plassmann readiness) and the set of
        # already-taken neighbor colors (greedy mex input)
        est = e.join(
            state.select(
                F.col("id").alias("src"),
                F.col("color").alias("c_src"),
                _priority(F.col("id"), salt).alias("p_src"),
            ),
            "src",
        )
        agg = est.groupBy(F.col("dst").alias("id")).agg(
            F.min(
                F.when(
                    F.col("c_src").isNull(),
                    F.struct(F.col("p_src").alias("p"), F.col("src").alias("i")),
                )
            ).alias("nbr"),
            F.collect_set("c_src").alias("cs"),
        )
        own = F.struct(_priority(F.col("id"), salt).alias("p"), F.col("id").alias("i"))
        # ready: uncolored vertices outranking every uncolored neighbor;
        # their color is the mex over the sorted neighbor-color set
        # (collect_set drops the null c_src entries of uncolored neighbors)
        mex = F.aggregate(
            F.array_sort(F.coalesce("cs", F.array().cast("array<int>"))),
            F.lit(0),
            lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
        )
        new_color = F.when(
            F.col("color").isNull()
            & (F.col("nbr").isNull() | (own < F.col("nbr"))),
            mex,
        ).otherwise(F.col("color"))
        obs = Observation(f"coloring_r{r}_{workdir[-8:]}")
        nxt = (
            state.join(agg, "id", "left")
            .select("id", new_color.alias("color"))
            .observe(obs, F.count(F.when(F.col("color").isNull(), 1)).alias("unc"))
        )
        # the cut write is also the action that fires the observation —
        # no separate count job per round
        state = cut(nxt, f"s{r}")
        n_unc = int(obs.get["unc"])
    colored = state.where(F.col("color").isNotNull())
    return colored.select("id", F.col("color").cast("int").alias("color")), r
