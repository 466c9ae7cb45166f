"""Link prediction over an undirected graph: common-neighbor and
Adamic-Adar scores for non-adjacent vertex pairs.

    cn(u,v) = |N(u) ∩ N(v)|
    aa(u,v) = sum_{z in N(u) ∩ N(v)} 1 / ln(deg(z))

Spark shape: one self-join of the (symmetrized) edge list on the wedge
center z — the same join CUBE as triangle counting — with the per-vertex
degree broadcast into the wedge stream, one (u,v) aggregation, and a
left-anti join against the edge list to drop already-adjacent pairs.
Scores are rounded to 6dp BEFORE ranking (the cosine_topk convention) so
the global top-k is engine-independent; ties break on (u,v).

deg(z) >= 2 for any wedge center (it touches u and v), so ln(deg) never
hits zero.

Scale notes: wedge volume is sum_z deg(z)^2 — a hub z of degree d emits d^2
rows. `max_center_degree` drops super-hub centers before the join (the
standard web-graph mitigation: a z adjacent to everything carries ~no
signal, 1/ln(deg) -> 0, but costs d^2 shuffle rows); filtering happens on
the broadcast degree table so the pruned wedges are never materialized.
The final top-k is a TakeOrdered (no global sort materialization)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def adamic_adar_topk(
    edges: DataFrame,
    k: int = 20,
    max_center_degree: int | None = None,
) -> DataFrame:
    """edges: directed rows of an UNDIRECTED graph (symmetrized upstream or
    here — both directions are derived). -> top-k (u, v, cn, aa_r, rank)
    non-adjacent pairs by Adamic-Adar score."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    e = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "z")
    if max_center_degree is not None:
        deg = deg.where(F.col("deg") <= max_center_degree)
    wedges = (
        e.select(F.col("src").alias("z"), F.col("dst").alias("u"))
        .join(e.select(F.col("src").alias("z"), F.col("dst").alias("v")), "z")
        .where(F.col("u") < F.col("v"))
        .join(F.broadcast(deg), "z")
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.round(F.sum(1.0 / F.log(F.col("deg").cast("double"))), 6).alias("aa_r"),
    )
    adj = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    cand = scores.join(adj, ["u", "v"], "left_anti")
    top = cand.orderBy(F.desc("aa_r"), F.asc("u"), F.asc("v")).limit(k)
    # rank window runs over only the k surviving rows (single tiny task)
    w = Window.orderBy(F.desc("aa_r"), F.asc("u"), F.asc("v"))
    return top.select("u", "v", "cn", "aa_r", F.row_number().over(w).alias("rank"))
