"""Densest subgraph — Bahmani-Kumar-Vattani parallel peeling.

Charikar's greedy (repeatedly remove the minimum-degree vertex, keep the
best prefix) 2-approximates the densest subgraph but is inherently
sequential. The parallel form (Bahmani et al., VLDB 2012) peels EVERY
vertex whose degree is at most 2(1+eps) times the current average density
m/n in one round — a constant fraction of vertices each round, so
O(log n) rounds for a 2(1+eps)-approximation.

Everything that decides the output is integer-exact:
  peel test    deg(v) <= 2(1+eps) * m/n  with eps = 1/4 becomes
               2 * deg(v) * n <= 5 * m   — one integer comparison.
  best round   densities compared as the IEEE double m/n (both engines
               divide the same exact integers — correctly rounded, hence
               bit-identical), ties to the EARLIER round.

Spark shape per round: one groupBy(vertex) degree count (map-side
combine), one filtered survivor set, two semi-joins to restrict the edge
table; survivors cut to parquet (the mis.py lineage discipline). The
driver sees only (n, m) per round. The best round's vertex cut is
re-read at the end — no recomputation.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densest_subgraph(
    edges: DataFrame,
    rounds: int | None = None,
) -> tuple[DataFrame, dict]:
    """-> ((id) vertices of the best-density prefix, stats).

    edges: rows of an UNDIRECTED graph — either or both directions
    (canonicalized u<v and dedup'd here); self-loops ignored. rounds=None
    peels to empty; a fixed `rounds` peels exactly that many rounds and
    picks the best among the prefixes seen — the SQL-oracle form,
    idempotent once the graph is empty. stats = {"m": edges, "n": verts,
    "density": m/n, "round": best_round, "rounds_run": r}.
    """
    spark = edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="densest_")

    def cut(df: DataFrame, name: str) -> DataFrame:
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = cut(
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct(),
        "e0",
    )
    verts = cut(
        e.select(F.col("u").alias("id")).unionAll(e.select(F.col("v").alias("id"))).distinct(),
        "v0",
    )
    history: list[tuple[int, int, int]] = []  # (round, m, n)
    r = 0
    m = e.count()
    n = verts.count()
    while True:
        if n > 0:
            history.append((r, m, n))
        if rounds is not None and r >= rounds:
            break
        if m == 0 or n == 0:
            break
        r += 1
        deg = (
            e.select(F.col("u").alias("id")).unionAll(e.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # survivors: 2*deg*n > 5*m  (deg > 2(1+1/4) m/n, integer-exact);
        # vertices with no remaining edge have deg 0 and are peeled
        keep = cut(
            deg.where(2 * F.col("deg") * F.lit(n) > 5 * F.lit(m)).select("id"),
            f"v{r}",
        )
        e = cut(
            e.join(keep.select(F.col("id").alias("u")), "u", "left_semi").join(
                keep.select(F.col("id").alias("v")), "v", "left_semi"
            ),
            f"e{r}",
        )
        verts = keep
        m = e.count()
        n = verts.count()
    if not history:
        return spark.createDataFrame([], "id long"), {
            "m": 0, "n": 0, "density": 0.0, "round": 0, "rounds_run": r,
        }
    # best density as the IEEE double m/n, ties to the earlier round —
    # the same argmax the SQL twin computes on the same exact integers
    best_round, best_m, best_n = max(
        history, key=lambda t: (t[1] / t[2], -t[0])
    )
    best = spark.read.parquet(f"{workdir}/v{best_round}")
    stats = {
        "m": best_m,
        "n": best_n,
        "density": best_m / best_n,
        "round": best_round,
        "rounds_run": r,
    }
    return best, stats
