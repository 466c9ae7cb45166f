"""Maximal matching — lexicographically-first via parallel local minima.

The sequential greedy matching (scan edges in ascending priority order,
take an edge iff both endpoints are still free) is inherently ordered —
useless on a cluster. But its RESULT is reproducible in parallel rounds:
an edge is accepted in a round iff it is the minimum-priority surviving
edge at BOTH of its endpoints; accepted edges remove their endpoints
(and all incident edges) from play. Every round's accepted set is a
prefix-closed subset of the greedy scan, and the fixpoint is EXACTLY the
lexicographically-first maximal matching — the same derandomization
trick as lex-first MIS, applied to the line graph. Priorities are
md5("u:v:salt") hex strings with an (priority, u, v) tie-break: fixed
across rounds (unlike Luby MIS, which re-randomizes — re-randomizing
here would break the greedy equivalence), fully deterministic on any
partitioning and engine.

A local-minimum edge always exists among survivors (the globally minimal
surviving edge is one), so every round makes progress and the loop
terminates in at most |matching| rounds; with hash-random priorities the
expected round count is O(log E) (each round removes a constant fraction
of surviving edges in expectation — the standard Luby analysis on the
line graph).

Spark shape per round: one explode-to-endpoints + groupBy min(struct)
(map-side combining — a hub's edges partially reduce before the
shuffle), one double equi-join to test "minimum at both ends", two
anti-joins to drop saturated endpoints. Surviving-edge tables are cut to
parquet per round (the mis.py / ktruss.py lineage discipline).

Parity-plus over the reference (no matching algorithms there); the
classic Pregel-style matching workload, expressed as DataFrame rounds.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _priority(u, v, salt: str):
    return F.md5(F.concat_ws(":", u, v, F.lit(salt)))


def maximal_matching(
    edges: DataFrame,
    rounds: int | None = None,
    salt: str = "",
) -> tuple[DataFrame, int]:
    """-> ((u, v, matched_round) lex-first maximal matching, rounds_run).

    edges: (src, dst) rows of an UNDIRECTED graph — either or both
    directions, duplicates fine (canonicalized u<v and dedup'd here);
    self-loops ignored. rounds=None runs to the fixpoint (a maximal
    matching); a fixed `rounds` runs exactly that many local-minima
    rounds and returns the (deterministic, prefix-of-greedy) partial
    matching — the SQL-oracle form.
    """
    spark = edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="matching_")

    def cut(df: DataFrame, name: str) -> DataFrame:
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def cut_counted(df: DataFrame, name: str) -> tuple[DataFrame, int]:
        # the survivor count rides the cut write as an Observation — the
        # old loop re-read the fresh parquet with a limit(1).count() job
        # per round just to test emptiness
        obs = Observation(f"mm_{name}_{workdir[-6:]}")
        out = cut(df.observe(obs, F.count(F.lit(1)).alias("n")), name)
        return out, int(obs.get["n"])

    s, n_s = cut_counted(
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .withColumn("p", _priority(F.col("u"), F.col("v"), salt)),
        "s0",
    )
    matched: DataFrame | None = None
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        if n_s == 0:
            break
        r += 1
        t = F.struct("p", "u", "v").alias("t")
        ends = s.select(F.col("u").alias("x"), t).unionAll(
            s.select(F.col("v").alias("x"), t)
        )
        vmin = ends.groupBy("x").agg(F.min("t").alias("m"))
        acc = cut(
            s.join(
                vmin.select(F.col("x").alias("u"), F.col("m").alias("mu")), "u"
            )
            .join(vmin.select(F.col("x").alias("v"), F.col("m").alias("mv")), "v")
            .where(
                (F.struct("p", "u", "v") == F.col("mu"))
                & (F.struct("p", "u", "v") == F.col("mv"))
            )
            .select("u", "v"),
            f"a{r}",
        )
        new = acc.select("u", "v", F.lit(r).alias("matched_round"))
        matched = new if matched is None else matched.unionAll(new)
        sat = acc.select(F.col("u").alias("x")).unionAll(
            acc.select(F.col("v").alias("x"))
        )
        s, n_s = cut_counted(
            s.join(sat.select(F.col("x").alias("u")), "u", "left_anti").join(
                sat.select(F.col("x").alias("v")), "v", "left_anti"
            ),
            f"s{r}",
        )
    if matched is None:
        matched = spark.createDataFrame([], "u long, v long, matched_round int")
    return matched, r
