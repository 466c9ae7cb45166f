"""Exact triangle counting via degree-ordered adjacency intersection.

Pure DataFrame plan (Catalyst: two shuffle joins + whole-stage-codegen
array_intersect — no Python in the hot path):

  1. orient each undirected edge from the lower (degree, id) endpoint to the
     higher — every triangle becomes exactly one oriented wedge closure, and
     out-degrees are bounded by O(sqrt(E)) on skewed graphs (the standard
     compact-forward trick, which is the scalable answer to hub vertices);
  2. adj+ = collect_list of oriented out-neighbors per vertex (sorted);
  3. join oriented edges with adj+ on both endpoints;
     triangles through edge (u,v) = |adj+(u) ∩ adj+(v)|.

Global count = sum; per-vertex counts = explode each common neighbor w and
credit u, v, w each once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """edges (both directions) -> one direction per undirected edge,
    low (deg, id) -> high (deg, id)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "id")
    e = (
        edges.join(deg.withColumnRenamed("deg", "sdeg"), edges.src == deg.id)
        .drop("id")
        .join(
            deg.withColumnRenamed("deg", "ddeg").withColumnRenamed("id", "id2"),
            F.col("dst") == F.col("id2"),
        )
        .drop("id2")
    )
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return e.where(keep).select("src", "dst")


def triangle_edges(edges: DataFrame) -> DataFrame:
    """(u, v, common) — oriented edges with the array of closing vertices."""
    o = _oriented(edges)
    adj = o.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    a1 = adj.withColumnRenamed("src", "u1").withColumnRenamed("nbrs", "nbrs1")
    a2 = adj.withColumnRenamed("src", "u2").withColumnRenamed("nbrs", "nbrs2")
    return (
        o.join(a1, o.src == a1.u1)
        .join(a2, o.dst == a2.u2)
        .select(
            F.col("src"),
            F.col("dst"),
            F.array_intersect("nbrs1", "nbrs2").alias("common"),
        )
        .where(F.size("common") > 0)
    )


def triangle_count(spark: SparkSession, edges: DataFrame) -> int:
    row = triangle_edges(edges).agg(F.sum(F.size("common")).alias("n")).collect()[0]
    return int(row["n"] or 0)


def clustering_coefficient(
    spark: SparkSession, vertices: DataFrame, edges: DataFrame
) -> DataFrame:
    """(id, deg, tri, coeff_r) — local clustering coefficient per vertex:
    tri(v) / C(deg(v), 2), rounded to 6dp; 0.0 for deg < 2. The per-vertex
    GNN/feature-table companion of triangle counting: the triangle pass is
    the oriented-intersection plan above, the degree a single groupBy, and
    the division pure codegen."""
    tri = triangles_per_vertex(spark, vertices, edges)
    deg = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("deg"))
        .withColumnRenamed("src", "id")
    )
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            "tri",
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                F.round(F.col("tri") / (F.col("deg") * (F.col("deg") - 1) / 2.0), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff_r"),
        )
    )


def triangles_per_vertex(spark: SparkSession, vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """(id, tri) — number of triangles each vertex participates in (0 included)."""
    te = triangle_edges(edges)
    # all three corner credits in ONE pass over te (a union of selects
    # re-executes the full triangle_edges plan per branch): src and dst
    # each credited size(common), every closing vertex credited 1
    _c = lambda i, c: F.struct(i.alias("id"), c.alias("c"))
    corners = te.select(
        F.explode(
            F.concat(
                F.array(
                    _c(F.col("src"), F.size("common")),
                    _c(F.col("dst"), F.size("common")),
                ),
                F.transform("common", lambda w: _c(w, F.lit(1))),
            )
        ).alias("t")
    ).select("t.id", "t.c")
    counts = corners.groupBy("id").agg(F.sum("c").alias("tri"))
    return (
        vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("tri", F.lit(0)).alias("tri"))
    )


def kclique_count(spark: SparkSession, edges: DataFrame, k: int = 4) -> int:
    """Exact k-clique count via ordered extension over the degree-oriented
    DAG (the kClist / ordered-enumeration scheme; k=3 IS the triangle plan
    above). Input contract matches triangle_count: the distinct directed
    closure of an undirected simple graph (both directions, no self loops,
    no duplicates — duplicate rows would inflate degrees and adjacency
    arrays).

    Each clique is counted exactly once: a k-clique's vertices sorted by
    (degree, id) admit exactly one extension path — the initial oriented
    edge is its two smallest vertices and every exploded candidate is an
    out-neighbor of ALL current members, hence larger than each of them in
    the orientation order. The candidate set (sorted array_intersect of
    the members' out-neighbor arrays) only ever shrinks, so the frontier
    after i extensions is bounded by the (i+2)-clique count — and oriented
    out-degrees are O(sqrt(E)) even on hub graphs, the same guarantee the
    triangle plan rides. Per extension: one join against the adjacency
    table + one codegen array_intersect; no Python anywhere.
    """
    if k < 3:
        raise ValueError(f"kclique_count: k must be >= 3, got {k}")
    o = _oriented(edges)
    adj = o.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    c = (
        o.join(adj.select(F.col("src").alias("u1"), F.col("nbrs").alias("n1")),
               o.src == F.col("u1"))
        .join(adj.select(F.col("src").alias("u2"), F.col("nbrs").alias("n2")),
              o.dst == F.col("u2"))
        .select(F.array_intersect("n1", "n2").alias("cands"))
        .where(F.size("cands") > 0)
    )
    for _ in range(k - 3):
        c = (
            c.select(F.explode("cands").alias("w"), F.col("cands"))
            .join(adj.select(F.col("src").alias("w2"), F.col("nbrs").alias("nw")),
                  F.col("w") == F.col("w2"))
            .select(F.array_intersect("cands", "nw").alias("cands"))
            .where(F.size("cands") > 0)
        )
    row = c.agg(F.sum(F.size("cands")).alias("n")).collect()[0]
    return int(row["n"] or 0)


def butterflies(
    edges: DataFrame,
    center: str = "src",
    max_center_degree: int | None = None,
) -> DataFrame:
    """One-row (butterflies long): number of butterflies — bipartite
    4-cycles, the bipartite analog of triangles — in a bipartite edge set
    (one row per edge, src on one side, dst on the other).

    butterflies = Σ over same-side pairs (x < y) of C(codeg(x, y), 2):
    wedges through each `center`-side vertex pair off its neighbors, the
    codegree table counts common centers per endpoint pair, and each pair
    of common centers closes one 4-cycle. The total is side-invariant, so
    `center` only picks WHICH side fans out in the wedge self-join — choose
    the side whose Σ deg² is smaller (that sum IS the wedge volume). One
    self-join shuffle + one aggregate; no Python.

    max_center_degree (optional) drops hub centers before the self-join —
    a center of degree d contributes C(d, 2) wedge rows, so one 10^6-degree
    hub is 5·10^11 rows; capped counting is then a documented undercount,
    the standard scale valve (same knob as adamic_adar_topk).
    """
    other = "dst" if center == "src" else "src"
    e = edges.select(F.col(center).alias("c"), F.col(other).alias("x")).distinct()
    if max_center_degree is not None:
        deg = e.groupBy("c").agg(F.count("*").alias("d"))
        e = e.join(
            F.broadcast(deg.where(F.col("d") <= max_center_degree).select("c")), "c"
        )
    a = e.alias("a")
    b = e.select(F.col("c"), F.col("x").alias("y")).alias("b")
    codeg = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.x") < F.col("b.y")))
        .groupBy("a.x", "b.y")
        .agg(F.count("*").alias("cd"))
    )
    return codeg.agg(
        F.coalesce(
            F.sum(F.expr("cd * (cd - 1) DIV 2")), F.lit(0).cast("long")
        ).alias("butterflies")
    )


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    rounds: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """k-truss edge peeling: canonical surviving edges (u < v) after
    `rounds` waves of removing every edge in fewer than k-2 triangles.

    Each wave recomputes per-edge triangle support from the degree-ordered
    intersection pass (triangle_edges) and credits all THREE edges of each
    triangle — support is orientation-independent, so the oracle can count
    common neighbors without replicating the degree orientation.  Fixed
    `rounds` gives the same bounded-unroll contract as kcore: past the
    fixed point a wave is idempotent, so a generous bound equals the true
    k-truss and the SQL twin unrolls the identical number of waves.

    Each wave is cut to parquet and read back (the mis.py lineage-cut
    pattern): the surviving edge set feeds FIVE consumers per wave (the
    symmetrize union twice, both triangle-join sides, the filter join), so
    a persist-only loop grows the LOGICAL plan ~5x per wave and Catalyst
    analysis goes exponential — measured as a single-threaded driver spin
    after ~8 stacked waves even on a 10-edge graph.

    Early exit: a wave that removes zero edges is the fixed point, and
    every later wave is idempotent by construction (same edge set -> same
    supports -> same filter), so skipping the remaining waves returns the
    IDENTICAL edge set the full unroll would — the bounded-`rounds`
    contract (and the SQL twin's fixed unroll) is unaffected.  The count
    is read off the parquet footer of the cut we already pay for, so the
    check costs no extra scan of the data pages.
    """
    import tempfile

    workdir = tempfile.mkdtemp(prefix="ktruss_rounds_")

    def cut(df: DataFrame, tag: str) -> DataFrame:
        path = f"{workdir}/{tag}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = cut(
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") < F.col("v"))
        .distinct(),
        "wave_000",
    )
    n_prev = e.count()
    for _r in range(rounds):
        sym = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        te = triangle_edges(sym)
        # all three edge credits of every triangle in ONE pass over te: a
        # union of three selects re-executes the whole triangle_edges plan
        # (adjacency groupBy + both joins) per branch, so build the credit
        # rows as a codegen struct array instead — (src,dst) credited
        # size(common) once, (src,w) and (dst,w) credited 1 per closing w
        _edge = lambda a, b, c: F.struct(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v"), c.alias("c")
        )
        credits = te.select(
            F.explode(
                F.concat(
                    F.array(_edge(F.col("src"), F.col("dst"), F.size("common"))),
                    F.transform("common", lambda w: _edge(F.col("src"), w, F.lit(1))),
                    F.transform("common", lambda w: _edge(F.col("dst"), w, F.lit(1))),
                )
            ).alias("t")
        ).select("t.u", "t.v", "t.c")
        supp = credits.groupBy("u", "v").agg(F.sum("c").alias("supp"))
        e = cut(
            e.join(supp, ["u", "v"], "left")
            .where(F.coalesce(F.col("supp"), F.lit(0)) >= k - 2)
            .select("u", "v"),
            f"wave_{_r + 1:03d}",
        )
        n_now = e.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return e


def rectangle_stats(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One row (n_wedges, max_copaths, c4_count) — exact 4-cycle
    (rectangle) count via wedge aggregation, the unipartite sibling of
    `butterflies`:

      1. wedge = a length-2 path u - x - w keyed by its ORDERED endpoint
         pair (u < w); generated by the self-join of the symmetrized edge
         table on the center x, so a hub center becomes many rows across
         tasks (AQE skew-split handles it) instead of one giant in-row
         pair array;
      2. co-path counts n(u, w) = # distinct centers = # common neighbors;
      3. every 4-cycle u - x - w - y - u is two common neighbors {x, y} of
         BOTH opposite-corner pairs {u, w} and {x, y}, so

             c4 = (1/2) * sum over u<w of C(n(u, w), 2),

         all in exact int64 arithmetic (the sum is provably even).

    Input contract: `edges` symmetrized and distinct, no self loops (the
    triangle module's contract).

    Scale shape: total wedge volume is sum_x C(deg(x), 2) — the inherent
    cost of exact rectangle counting (Chiba-Nishizeki); both shuffles are
    map-side combinable (the wedge join co-partitions on x, the co-path
    groupBy on (u, w)), and the final aggregate is one row. On graphs with
    unbounded hubs, cap or sample centers above a degree threshold before
    the join (biased estimator) — not done here: this operator is the
    exact kernel."""
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    a = e.select(F.col("src").alias("x"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("x"), F.col("dst").alias("w"))
    cn = (
        a.join(b, "x")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("n"))
    )
    return cn.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_wedges"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_copaths"),
        F.coalesce(F.expr("sum(n * (n - 1) DIV 2) DIV 2"), F.lit(0)).alias(
            "c4_count"
        ),
    )
