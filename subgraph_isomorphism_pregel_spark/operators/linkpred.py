"""Link prediction and graph construction over an undirected graph:
common-neighbor / Adamic-Adar scores for non-adjacent vertex pairs, the
weighted one-mode co-occurrence projection of a bipartite membership
table (co-purchase / co-citation graph building), and deterministic
hash-sampled negative edges (the link-prediction training table).

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


def _wedge_cube(
    edges: DataFrame, max_center_degree: int | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared construction for the neighborhood-overlap scorers ->
    (e, deg, wedges): the symmetrized self-loop-free edge list, the
    per-vertex degree table keyed `z`, and the u < v wedge stream joined
    with its center's degree, centers past `max_center_degree` pruned
    BEFORE the self-join (the broadcast degree filter — pruned wedges are
    never materialized)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    e = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "z")
    cdeg = deg if max_center_degree is None else deg.where(
        F.col("deg") <= max_center_degree
    )
    wedges = (
        e.select(F.col("src").alias("z"), F.col("dst").alias("u"))
        .join(e.select(F.col("src").alias("z"), F.col("dst").alias("v")), "z")
        .where(F.col("u") < F.col("v"))
        .join(F.broadcast(cdeg), "z")
    )
    return e, deg, wedges


def _ranked_topk(cand: DataFrame, score_col: str, k: int) -> DataFrame:
    """Global top-k by (score desc, u, v) with a dense 1-based rank — the
    orderBy+limit is a TakeOrdered; the rank window then runs over only
    the k surviving rows (single tiny task)."""
    order = [F.desc(score_col), F.asc("u"), F.asc("v")]
    top = cand.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.select("u", "v", "cn", score_col, F.row_number().over(w).alias("rank"))


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
    e, _deg, wedges = _wedge_cube(edges, max_center_degree)
    scores = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.round(F.sum(1.0 / F.log(F.col("deg").cast("double"))), 6).alias("aa_r"),
    )
    adj = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    cand = scores.join(adj, ["u", "v"], "left_anti")
    return _ranked_topk(cand, "aa_r", k)


def jaccard_topk(
    edges: DataFrame,
    k: int = 20,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Top-k non-adjacent pairs by neighborhood Jaccard coefficient

        jac(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
                 = cn / (deg(u) + deg(v) - cn)

    -> (u, v, cn, jac_r, rank). Same wedge cube as adamic_adar_topk (one
    self-join on the wedge center), but the weight needs the ENDPOINT
    degrees, not the center's: the union size comes from two broadcast
    joins of the degree table onto the aggregated (u, v, cn) rows — one
    row per candidate pair, not per wedge, so the extra joins touch the
    post-aggregation stream only (un-hinted: at web scale the degree
    table is one row per vertex — too big to force-broadcast — so AQE
    picks broadcast at small SF and shuffle-hash past the threshold). cn >= 1 for any emitted pair, so the
    denominator deg(u)+deg(v)-cn >= 1 — never zero. jac is one IEEE
    division of exact integers rounded to 6dp before ranking, so the
    global top-k is engine-independent; ties break on (u, v).

    Scale: identical wedge volume to adamic_adar_topk (sum_z deg(z)^2);
    `max_center_degree` prunes super-hub centers before the join. NOTE
    that unlike Adamic-Adar, dropping a center z shrinks cn but NOT the
    degrees in the denominator, so pruned Jaccard stays a lower bound."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e, deg, wedges = _wedge_cube(edges, max_center_degree)
    scores = wedges.groupBy("u", "v").agg(F.count("*").alias("cn"))
    adj = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    cand = (
        scores.join(adj, ["u", "v"], "left_anti")
        .join(deg.select(F.col("z").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("z").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")).cast("double"),
                6,
            ).alias("jac_r"),
        )
    )
    return _ranked_topk(cand, "jac_r", k)


def cooccurrence_projection(
    members: DataFrame,
    group_col: str = "group_id",
    item_col: str = "item_id",
    max_group_size: int = 1024,
    min_weight: int = 1,
) -> DataFrame:
    """(item_a, item_b, weight) — weighted ONE-MODE projection of a
    bipartite membership table (group contains item): an undirected edge
    between two items weighted by the number of groups holding both.
    The co-purchase / co-citation / co-occurrence graph builder — the
    usual first step before running the link-graph algorithms on
    entity-affinity data.

    Spark shape: one distinct over (group, item), then a self-join on the
    group key with item_a < item_b and a (item_a, item_b) count — the
    group-size filter, the self-join, and nothing else shuffle, and they
    all hash on the same group key so the exchange is reused. Pure
    codegen throughout.

    Scale guard: a group of n members emits n*(n-1)/2 pairs, so one
    10^6-member hub group would emit ~5*10^11 rows. `max_group_size`
    drops oversized groups BEFORE the self-join (the standard projection
    mitigation — giant groups carry ~no pairwise signal); the cut is a
    group-keyed semi-filter, so pruned pairs are never materialized.
    `min_weight` prunes the long tail of weight-1 edges after the count."""
    if max_group_size < 2:
        raise ValueError("max_group_size must be >= 2")
    m = members.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    keep = (
        m.groupBy("g")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") <= max_group_size)
        .select("g")
    )
    m = m.join(keep, "g")
    pairs = (
        m.select("g", F.col("i").alias("item_a"))
        .join(m.select("g", F.col("i").alias("item_b")), "g")
        .where(F.col("item_a") < F.col("item_b"))
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("weight"))
        .where(F.col("weight") >= min_weight)
        .orderBy("item_a", "item_b")
    )


def negative_edges(
    edges: DataFrame,
    k: int = 3,
    salt: str = "v1",
    oversample: int | None = None,
) -> DataFrame:
    """(src, neg_dst, j) — up to k deterministic hash-sampled NON-edges per
    source vertex: the negative-sampling table for link-prediction / GNN
    training. Candidate j for source u targets the vertex whose dense rank
    is md5(u:j:salt)[:8] mod |V|; candidates that hit a real edge, a self
    loop, or a repeated target (same (src, neg_dst) at a higher j) are
    dropped, and the first k survivors by j are kept — fully deterministic
    across partitioning, cluster size, and engine (md5 is the only
    randomness), so training-set negatives are reproducible.

    Spark shape: pure codegen — one sequence-explode over sources (k +
    padding candidates each), the hash mapped through a dense-rank vertex
    table, one left-anti join against the edge list, two src-partitioned
    windows. The dense rank (the id→position map negative sampling
    fundamentally needs when ids aren't contiguous) is computed
    DISTRIBUTEDLY: range-partition by id, rank locally per partition,
    then add broadcast per-partition offsets — a global
    row_number().over(orderBy(id)) would drag every vertex into one task.
    The rank depends only on id order, not on where the sampled range
    boundaries land, so the output stays deterministic; everything
    downstream is linear in k·|V|.

    `oversample` pads the candidate list (default 3k+8); a source adjacent
    to nearly everything can still return fewer than k rows — deterministic
    truncation, not an error."""
    if k < 1:
        raise ValueError("k must be >= 1")
    m = oversample if oversample is not None else 3 * k + 8
    if m < k:
        raise ValueError("oversample must be >= k")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = verts.count()
    P = max(1, min(2048, edges.sparkSession.sparkContext.defaultParallelism * 2))
    ranged = verts.repartitionByRange(P, "id").withColumn(
        "p", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "lr", F.row_number().over(Window.partitionBy("p").orderBy("id")) - 1
    )
    # per-partition offsets: a P-row table, its prefix sum a trivial
    # single-task window (RangePartitioner numbers partitions in id order)
    off = (
        local.groupBy("p")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("c").over(
                    Window.orderBy("p").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
    )
    vr = local.join(F.broadcast(off.select("p", "off")), "p").select(
        "id", (F.col("lr") + F.col("off")).alias("r")
    )
    cand = e.select("src").distinct().select(
        "src", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("src"), F.col("j"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n
    )
    cand = (
        cand.withColumn("r", bucket)
        .join(vr, "r")
        .select("src", "j", F.col("id").alias("neg_dst"))
        .where(F.col("src") != F.col("neg_dst"))
    )
    first = Window.partitionBy("src", "neg_dst").orderBy("j")
    cand = (
        cand.withColumn("dup", F.row_number().over(first))
        .where(F.col("dup") == 1)
        .drop("dup")
    )
    cand = cand.join(
        e.select("src", F.col("dst").alias("neg_dst")), ["src", "neg_dst"], "left_anti"
    )
    rk = Window.partitionBy("src").orderBy("j")
    return (
        cand.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= k)
        .select("src", "neg_dst", "j")
        .orderBy("src", "j")
    )
