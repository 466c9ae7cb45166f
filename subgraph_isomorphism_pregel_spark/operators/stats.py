"""Exact grouped quantiles — corpus length/score distributions per stratum.

Approximate quantiles (approx_percentile / t-digest) are not
engine-reproducible; this is the EXACT discrete quantile under the
explicit convention

    Q(q) = the value at rank ceil(q * n) (1-based, ascending)

which both engines express with the same row_number construction —
deterministic even with duplicate values because only the VALUE at the
rank is returned. One window shuffle per group column (group cardinality
= strata count, so the per-partition sort is per-stratum). For a 100 TB
single-group quantile use partial histograms instead; per-stratum
distributions (the curation use-case) are exactly this shape."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row global graph summary over a DIRECTED edge list:

    n_vertices, n_edges, avg_out_degree, max_out_degree, reciprocity
    (fraction of edges whose reverse also exists), assortativity_r
    (degree assortativity: Pearson correlation of (out-deg(src),
    out-deg(dst)) over edges, rounded to 6dp).

    Engine-exact by construction: every aggregate (degree sums, sum of
    products, squared sums, reciprocal-edge count) is INTEGER — order-free
    — and floating point appears only in the final one-row expression,
    where IEEE division/sqrt of identical integers is bit-identical on
    any engine. Plan: one degree groupBy, one self-join for reciprocity
    (left-semi on the reversed pair), one edge-level join to attach both
    endpoint degrees, a single global aggregate."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "id")
    verts = e.select(F.col("src").alias("id")).unionAll(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = e.join(rev, ["src", "dst"], "left_semi").count()
    dd = (
        e.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "dx"), "src")
        .join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dy"),
            "dst",
            "left",
        )
        .select(F.col("dx"), F.coalesce("dy", F.lit(0)).alias("dy"))
    )
    agg = dd.agg(
        F.count("*").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n_v = verts.count()
    m = F.col("m")
    num = m * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (m * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (m * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        agg.crossJoin(deg.agg(F.max("deg").alias("max_out_degree")))
        .select(
            F.lit(n_v).cast("long").alias("n_vertices"),
            m.alias("n_edges"),
            F.round(m.cast("double") / n_v, 6).alias("avg_out_degree"),
            "max_out_degree",
            F.round(F.lit(n_recip).cast("double") / m, 6).alias("reciprocity"),
            F.round(
                F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
            ).alias("assortativity_r"),
        )
    )


def rich_club(edges: DataFrame, ks: list[int] | None = None) -> DataFrame:
    """Rich-club coefficient phi(k) over an UNDIRECTED graph (directed
    input is symmetrized): with N_k = #vertices of degree > k and E_k =
    #edges whose BOTH endpoints have degree > k,

        phi(k) = 2 * E_k / (N_k * (N_k - 1))

    — the density of the subgraph induced by the hubs; phi -> 1 means the
    high-degree core is a near-clique (the "rich club" of web/citation
    graphs, Colizza et al. 2006).

    Spark shape: NOT one induced-subgraph pass per k. One degree groupBy,
    one join attaching both endpoint degrees to each canonical (u < v)
    edge, then two tiny histograms — vertex count by degree and edge
    count by min(deg_u, deg_v) — and every phi(k) is a suffix sum over
    those histograms, evaluated by a broadcast range-join of the k list
    (|ks| rows) against histogram rows. Adding thresholds costs nothing;
    the data is scanned once regardless of |ks|. Integer arithmetic until
    the final one-row-per-k division (engine-exact, rounded 6dp)."""
    if ks is None:
        ks = [1, 2, 4, 8, 16, 32]
    if not ks or any(k < 0 for k in ks):
        raise ValueError("ks must be non-empty, thresholds >= 0")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        und.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .select(F.least("du", "dv").alias("mindeg"))
    )
    vhist = deg.groupBy("deg").agg(F.count("*").alias("nv"))
    ehist = ed.groupBy("mindeg").agg(F.count("*").alias("ne"))
    kdf = und.sparkSession.createDataFrame([(int(k),) for k in sorted(set(ks))], "k long")
    n_k = (
        kdf.join(F.broadcast(vhist), vhist.deg > kdf.k, "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("nv"), F.lit(0)).alias("n_k"))
    )
    e_k = (
        kdf.join(F.broadcast(ehist), ehist.mindeg > kdf.k, "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ne"), F.lit(0)).alias("e_k"))
    )
    return (
        n_k.join(e_k, "k")
        .select(
            "k",
            "n_k",
            "e_k",
            F.round(
                F.when(
                    F.col("n_k") >= 2,
                    (2.0 * F.col("e_k")) / (F.col("n_k") * (F.col("n_k") - 1)).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("phi_r"),
        )
        .orderBy("k")
    )


def zscore_anomalies(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
    quant_scale: int = 100,
) -> DataFrame:
    """(id, group, value, z_r) — rows whose value sits more than
    `threshold` population standard deviations from their group's mean:
    the per-metric outlier screen of a telemetry / data-quality pipeline.

    Engine-exact by the integer-moments trick: values are quantized to
    int64 at `quant_scale` (round-half-up), the three per-group moments
    (n, sum q, sum q^2) are INTEGER aggregates — order-free — and the
    z-score is evaluated in doubles from those integers in one fixed
    operation order,

        z = (n*q - s) / sqrt(n*ss - s*s)

    (the n-scaled form of (q - mean)/std_pop), so both engines produce
    identical bits. int64 headroom: sum(q^2) must stay below 2^63 —
    ~10^8 rows per group at |value| <= 10^5 and scale 100; past that,
    re-quantize coarser or move the moments to partial-histogram form.

    Spark shape: one map-side-combined groupBy over the group key (a
    |groups|-row table), broadcast back into the scan, one filter — the
    event data is scanned twice and shuffled never (the moment aggregate
    moves |groups| rows)."""
    if threshold <= 0 or quant_scale <= 0:
        raise ValueError("threshold and quant_scale must be positive")
    q = F.floor(F.col(value_col) * F.lit(float(quant_scale)) + F.lit(0.5)).cast(
        "long"
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"),
        q.alias("q"),
    )
    mom = base.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("ss"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    q_d = F.col("q").cast("double")
    den = F.sqrt(n_d * ss_d - s_d * s_d)
    z = F.when(den > 0, (n_d * q_d - s_d) / den).otherwise(F.lit(0.0))
    return (
        base.join(F.broadcast(mom), "grp")
        .withColumn("z_r", F.round(z, 6))
        .where(F.abs("z_r") > threshold)
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            F.col("value").alias(value_col),
            "z_r",
        )
        .orderBy(id_col)
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """-> (group, q double, value) exact discrete quantiles per group.

    Convention: Q(q) = value at rank ceil(q*n), with the rank computed in
    INTEGER arithmetic over q's exact decimal ratio — ceil of the IEEE
    double q*n rounds up a rank whenever the product lands an ulp above
    the exact integer (0.07*100 = 7.000000000000001 -> rank 8, not 7)."""
    from decimal import Decimal

    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("qs must be fractions in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(group_col, value_col).withColumn(
        "rn", F.row_number().over(w)
    )
    counts = ranked.groupBy(group_col).agg(F.max("rn").alias("n"))
    r = ranked.join(counts, group_col)
    out = None
    for q in qs:
        num, den = Decimal(str(q)).as_integer_ratio()
        part = r.where(
            F.col("rn") == F.expr(f"({num} * n + {den - 1}) DIV {den}")
        ).select(
            group_col,
            F.lit(float(q)).alias("q"),
            F.col(value_col).alias("value"),
        )
        out = part if out is None else out.unionAll(part)
    return out


def modularity(
    labels: DataFrame, edges: DataFrame, label_col: str = "comm"
) -> DataFrame:
    """One-row community-quality score: (n_communities, intra_directed,
    q_modularity) for a labeling (id, <label_col>) over a SYMMETRIC edge
    set (both directions present, the repo's undirected convention).

    Newman modularity Q = Σ_c [e_c/m − (deg_c/2m)²], computed in the
    exact-rational form Q = i2/m2 − Σdeg_c²/(m2·m2) where m2 = |directed
    edges| = 2m and i2 = directed intra-community edges — every aggregate
    is an INTEGER, so the only float operations are two divisions and one
    subtraction on bit-identical operands: the score hash-gates exactly
    against the SQL twin (same trick as graph_stats' assortativity).
    Three aggregates, no collect; communities of isolated vertices count
    with degree 0."""
    deg = (
        edges.groupBy("src").agg(F.count("*").alias("d")).withColumnRenamed("src", "id")
    )
    a = labels.select(F.col("id").alias("src"), F.col(label_col).alias("__la"))
    b = labels.select(F.col("id").alias("dst"), F.col(label_col).alias("__lb"))
    m2 = edges.agg(F.count("*").alias("m2"))
    i2 = (
        edges.join(a, "src")
        .join(b, "dst")
        .agg(
            F.coalesce(
                F.sum((F.col("__la") == F.col("__lb")).cast("long")), F.lit(0)
            ).alias("i2")
        )
    )
    degc = (
        labels.join(deg, "id", "left")
        .groupBy(label_col)
        .agg(F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("dc"))
    )
    bsum = degc.agg(
        F.count("*").alias("n_communities"),
        F.coalesce(F.sum(F.col("dc") * F.col("dc")), F.lit(0)).alias("sum_dc2"),
    )
    return (
        m2.crossJoin(i2)
        .crossJoin(bsum)
        .select(
            F.col("n_communities"),
            F.col("i2").alias("intra_directed"),
            (
                F.col("i2") / F.col("m2")
                - F.col("sum_dc2") / (F.col("m2") * F.col("m2"))
            ).alias("q_modularity"),
        )
    )


def graph_diff(before: DataFrame, after: DataFrame) -> DataFrame:
    """Edge-level diff of two graph snapshots: (src, dst, change) with
    change in {'added', 'removed'} — unchanged edges are absent.

    The commit-to-commit question on the source-code dependency graph
    ("what did this commit do to the link structure?"): derive the edge
    table at two corpus revisions (sources/corpus.py `synth_corpus(rev=...)`)
    and diff them. The reference has no snapshot notion (one static load,
    /root/reference/src/basic/Worker.h:304-344); this extends its runtime
    vertex-addition capability (F9) to declarative snapshot analytics.

    Scale shape: ONE shuffle total. Both sides are tagged with a presence
    bit and bit_or-aggregated on (src, dst) — map-side partial aggregation
    collapses duplicates before the exchange, so neither side needs its own
    distinct(), and the full outer join / two anti-joins a naive diff would
    run (two to three shuffles of both inputs) never happen. Output: mask
    1 = removed (before only), 2 = added (after only), 3 = unchanged
    (dropped)."""
    a = before.select("src", "dst", F.lit(1).alias("__t"))
    b = after.select("src", "dst", F.lit(2).alias("__t"))
    return (
        a.unionByName(b)
        .groupBy("src", "dst")
        .agg(F.bit_or("__t").alias("__m"))
        .where(F.col("__m") != 3)
        .select(
            "src",
            "dst",
            F.when(F.col("__m") == 2, F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("change"),
        )
    )
