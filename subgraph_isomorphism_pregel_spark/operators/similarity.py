"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k (the correctness baseline). The dot
  product is computed by exploding (vec position, value) pairs and summing in
  double precision with a deterministic rounding, so the DuckDB oracle can
  reproduce it bit-for-bit (array-order float sums differ between engines
  otherwise).
- embedding_dup_pairs: all pairs above a cosine threshold (near-duplicate
  detection by embedding).
- lsh_topk: random-hyperplane LSH bucketing with Philox-seeded numpy
  hyperplanes; only intra-bucket pairs are scored. Approximate and
  non-SQL-expressible, so it keeps a pytest recall check only.
- ann_topk_lsh: the ORACLE-CHECKED ANN path — md5-Rademacher hyperplanes
  over 2^20-quantized int64 dots (deterministic, engine-exact), one bucket
  per vector, exact in-bucket cosine + row_number rank. Shares
  _rademacher_dots with embedding_dup_pairs_lsh: default impl is a
  zero-shuffle numpy GEMM, bit-identical to the SQL-expression twin.

At 10^12 scale, brute force is O(n^2) and dead; LSH buckets + per-bucket
numpy GEMM is the shape that survives (bucket count scales with n, bucket
size bounded)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_pairs(emb: DataFrame) -> DataFrame:
    """(vec_id, pos, val, norm): exploded positions with the L2 norm."""
    e = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    norms = e.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm"))
    return e.join(norms, "vec_id")


def cosine_topk(emb: DataFrame, k: int = 5, n_queries: int | None = 20) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): exact top-k cosine neighbors for
    each query vector (vec_id < n_queries; None = all), self excluded.
    Ties broken by neighbor_id; cos rounded to 6dp BEFORE ranking so the
    ranking is engine-independent."""
    p = _norm_pairs(emb)
    q = p.select(
        F.col("vec_id").alias("query_id"),
        "pos",
        F.col("val").alias("qval"),
        F.col("norm").alias("qnorm"),
    )
    if n_queries is not None:
        q = q.where(F.col("query_id") < n_queries)
    d = p.select(
        F.col("vec_id").alias("neighbor_id"),
        "pos",
        F.col("val").alias("nval"),
        F.col("norm").alias("nnorm"),
    )
    dots = (
        q.join(d, "pos")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id", "qnorm", "nnorm")
        .agg(F.sum(F.col("qval") * F.col("nval")).alias("dot"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("dot") / (F.col("qnorm") * F.col("nnorm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
        .orderBy("query_id", "rank")
    )


def _rademacher_signs(dim: int, n_planes: int) -> np.ndarray:
    """±1 sign matrix (dim x n_planes): sign(plane, pos) = +1 iff the first
    hex digit of md5("<plane>:<pos>") is in 89abcdef — byte-identical to the
    SQL expression `substr(md5(pl || ':' || pos), 1, 1) IN ('8'..'f')`."""
    import hashlib

    S = np.empty((dim, n_planes), dtype=np.int64)
    for pl in range(n_planes):
        for pos in range(dim):
            h = hashlib.md5(f"{pl}:{pos}".encode()).hexdigest()
            S[pos, pl] = 1 if h[0] in "89abcdef" else -1
    return S


def _rademacher_dots(emb: DataFrame, n_planes: int, impl: str = "packed") -> DataFrame:
    """(vec_id, dot0..dot{n_planes-1}): EXACT int64 signed projections of
    the 2^20-quantized vector onto md5-derived Rademacher hyperplanes —
    deterministic and engine-exact, so DuckDB reproduces them bit-for-bit
    (integer sums are associative; no float order-dependence).

    impl='packed' (default, the scale path): one zero-shuffle mapInPandas
    pass — each Arrow batch quantizes to int64 and multiplies by the
    (dim x planes) ±1 sign matrix with one integer GEMM. impl='sql' is the
    pure-expression variant kept as a cross-check (pytest asserts exact
    equality); it explodes n·dim rows through a groupBy shuffle — at 10^9
    vectors x 512 dims that is 5·10^11 shuffle rows, dead at scale."""
    if impl == "packed":
        cols = ["vec_id"] + [f"dot{pl}" for pl in range(n_planes)]

        def project(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            S = None
            for pdf in it:
                if len(pdf) == 0:
                    continue
                M = np.vstack(pdf["embedding"].values).astype(np.float64)
                if S is None:
                    S = _rademacher_signs(M.shape[1], n_planes)
                # floor(val * 2^20) is ONE IEEE multiply + exact floor —
                # identical to the SQL CAST(floor(val*1048576.0) AS BIGINT)
                Q = np.floor(M * float(1 << 20)).astype(np.int64)
                D = Q @ S  # exact int64 GEMM
                out = {"vec_id": pdf["vec_id"].values}
                for pl in range(n_planes):
                    out[f"dot{pl}"] = D[:, pl]
                yield pd.DataFrame(out)

        return emb.select("vec_id", "embedding").mapInPandas(
            project, ", ".join(f"{c} long" for c in cols)
        )

    p = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    q = p.withColumn(
        "qv", F.floor(F.col("val") * F.lit(float(1 << 20))).cast("long")
    )

    def sgn_is_pos(pl: int):
        h = F.md5(F.concat(F.lit(f"{pl}:"), F.col("pos").cast("string")))
        return F.substring(h, 1, 1).isin(*"89abcdef")

    # the Rademacher sign depends only on (plane, pos): dim rows, not
    # n·dim — materialize the tiny sign table once and broadcast-join it,
    # instead of recomputing n_planes md5 hashes per exploded data row
    signs = q.select("pos").distinct().select(
        "pos",
        *[
            F.when(sgn_is_pos(pl), F.lit(1)).otherwise(F.lit(-1)).alias(f"s{pl}")
            for pl in range(n_planes)
        ],
    )
    return (
        q.join(F.broadcast(signs), "pos")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(F.col("qv") * F.col(f"s{pl}")).alias(f"dot{pl}")
                for pl in range(n_planes)
            ]
        )
    )


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    bands: int = 4,
    rows_per_band: int = 4,
    impl: str = "packed",
) -> DataFrame:
    """(vec_a, vec_b, cos): near-duplicate pairs by embedding — the SCALE
    path. Banded random-hyperplane LSH generates candidate pairs; exact
    cosine verifies ONLY candidates. No all-pairs join anywhere: work is
    O(n · planes + candidate pairs), so it survives 10^9 vectors where the
    brute-force `embedding_dup_pairs` (kept as the small-n oracle baseline)
    is O(n^2) and dead.

    Deterministic + engine-exact so a DuckDB oracle reproduces it
    bit-for-bit: values quantize to int64 (floor(val * 2^20) — one IEEE
    multiply identical everywhere), hyperplane signs are Rademacher ±1
    derived from md5(plane:pos), dot products are exact integer sums (no
    float order-dependence), and the sign bits fold into `bands` bucket
    keys. Recall for a pair at cosine c is 1-(1-p^r)^b with
    p = 1 - acos(c)/pi (~0.98 at c=0.95 with 4x4)."""
    n_planes = bands * rows_per_band
    dots = _rademacher_dots(emb, n_planes, impl=impl)
    band_cols = []
    for b in range(bands):
        key = F.lit(0)
        for j in range(rows_per_band):
            key = key + F.when(F.col(f"dot{b * rows_per_band + j}") > 0, 1 << j).otherwise(0)
        band_cols.append(key.alias(f"band{b}"))
    # melt all bands in ONE pass over the projection table and self-join on
    # (band, bucket): the per-band union of joins re-executed the Rademacher
    # dot-product plan twice per band (2*bands executions); the melted
    # self-join runs it twice with an identical (bi, bk) exchange both sides
    melted = dots.select(
        "vec_id", F.posexplode(F.array(*band_cols)).alias("bi", "bk")
    )
    l = melted.select(F.col("vec_id").alias("vec_a"), "bi", "bk")
    r = melted.select(F.col("vec_id").alias("vec_b"), "bi", "bk")
    cand = (
        l.join(r, ["bi", "bk"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )

    # exact cosine verification restricted to candidate pairs — the dot
    # product stays JVM-side as one codegen zip_with/aggregate per pair (one
    # row per candidate), instead of exploding |pair| * dim rows through a
    # shuffle-groupBy (same positional double sum the SQL twin computes)
    ev = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )
    a = ev.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("an")
    )
    bb = ev.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("bn")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        cand.join(a, "vec_a")
        .join(bb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(dot / (F.col("an") * F.col("bn")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """(vec_a, vec_b, cos): unordered pairs with cosine >= threshold.

    Brute-force all-pairs — the small-n oracle BASELINE; use
    embedding_dup_pairs_lsh for anything that has to scale."""
    p = _norm_pairs(emb)
    a = p.select(F.col("vec_id").alias("vec_a"), "pos", F.col("val").alias("av"), F.col("norm").alias("an"))
    b = p.select(F.col("vec_id").alias("vec_b"), "pos", F.col("val").alias("bv"), F.col("norm").alias("bn"))
    return (
        a.join(b, "pos")
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b", "an", "bn")
        .agg(F.sum(F.col("av") * F.col("bv")).alias("dot"))
        .select(
            "vec_a",
            "vec_b",
            F.round(F.col("dot") / (F.col("an") * F.col("bn")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def ann_topk_lsh(
    emb: DataFrame, k: int = 5, n_planes: int = 6, impl: str = "packed"
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): approximate top-k cosine
    neighbors restricted to each vector's single deterministic
    hyperplane-LSH bucket — the ORACLE-CHECKED ANN path.

    Same determinization as embedding_dup_pairs_lsh (2^20-quantized int64
    dots against md5-Rademacher hyperplanes), with the n_planes sign bits
    folded into ONE bucket key; candidates are scored with an exact
    JVM-side zip_with/aggregate cosine (rounded to 6dp BEFORE ranking) and
    ranked per query by row_number over (cos desc, neighbor_id asc). Every
    step is a deterministic relational expression, so a DuckDB twin
    reproduces the result exactly — unlike lsh_topk, whose Philox
    hyperplanes + per-bucket numpy GEMM get a rows-only check. Vectors
    alone in their bucket yield no rows (same as lsh_topk).

    Scale: work is one broadcast sign join + one groupBy per vector plus
    O(sum of bucket size^2) candidate scoring — never all-pairs; bucket
    count (2^n_planes) grows with the corpus via n_planes."""
    dots = _rademacher_dots(emb, n_planes, impl=impl)
    bucket = F.lit(0)
    for j in range(n_planes):
        bucket = bucket + F.when(F.col(f"dot{j}") > 0, 1 << j).otherwise(0)
    bkt = dots.select("vec_id", bucket.alias("bucket"))

    ev = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    ).join(bkt, "vec_id")
    qa = ev.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bucket",
    )
    nb = ev.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"),
        F.col("nrm").alias("nn"), "bucket",
    )
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        qa.join(nb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qn") * F.col("nn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
        .orderBy("query_id", "rank")
    )


def ivf_topk(
    emb: DataFrame, k: int = 5, n_lists: int = 8, n_probe: int = 2
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): IVF-flat approximate top-k —
    the inverted-file ANN shape (the other classic scale path besides LSH).

    Coarse quantizer: the vectors with the n_lists smallest ACTUAL vec_ids
    serve as fixed centroids (deterministic; a production index trains
    them offline — k-means iterations would introduce engine-dependent
    float means, which this operator deliberately avoids). Selecting by
    rank rather than `vec_id < n_lists` keeps offset or sparse id spaces
    working (they'd otherwise silently get fewer or zero centroids —
    ADVICE r3). Every vector is
    ASSIGNED to its nearest centroid by EXACT integer distance on the
    2^20-quantized values (sum of squared int64 deltas — associative, so
    DuckDB reproduces the assignment bit-for-bit); every query PROBES its
    n_probe nearest lists and scores only vectors assigned there with the
    exact 6dp-rounded cosine, ranked by row_number.

    Scale shape: centroid table is tiny (broadcast); assignment is one
    narrow pass over the data; candidate scoring is an equi-join on
    list_id touching ~n_probe/n_lists of the corpus per query — never
    all-pairs. Work scales with n·n_lists + candidate pairs."""
    qarr = F.expr(
        "transform(cast(embedding as array<double>),"
        " v -> CAST(floor(v * 1048576.0) AS BIGINT))"
    )
    base = emb.select("vec_id", qarr.alias("qv"))
    # n_lists smallest actual ids (tiny global sort-limit, broadcast below)
    cent = (
        base.orderBy("vec_id")
        .limit(n_lists)
        .select(F.col("vec_id").alias("list_id"), F.col("qv").alias("qc"))
    )
    # exact int64 squared distance, whole-stage codegen (deltas < 2^21,
    # squared < 2^42, dim-summed < 2^52 — no overflow)
    dist = F.aggregate(
        F.zip_with("qv", "qc", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = base.join(F.broadcast(cent)).select(
        "vec_id", "list_id", dist.alias("d")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("list_id"))
    rk = d.withColumn("r", F.row_number().over(w))
    assign = rk.where(F.col("r") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "list_id"
    )
    probes = rk.where(F.col("r") <= n_probe).select(
        F.col("vec_id").alias("query_id"), "list_id"
    )
    # each vector is assigned to exactly one list, so (query, neighbor)
    # pairs are already unique across probed lists
    cand = probes.join(assign, "list_id").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id")

    ev = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    )
    qa = ev.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qvec"),
        F.col("nrm").alias("qn"),
    )
    nb = ev.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nvec"),
        F.col("nrm").alias("nn"),
    )
    dot = F.aggregate(
        F.zip_with("qvec", "nvec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(qa, "query_id")
        .join(nb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qn") * F.col("nn")), 6).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: values from a seeded
    Philox generator keyed only by (dim, n_planes)."""
    rng = np.random.Generator(np.random.Philox(key=1234567 + dim * 31 + n_planes))
    return rng.standard_normal((n_planes, dim))


def lsh_buckets(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """(vec_id, bucket): sign pattern of the vector against n_planes
    deterministic hyperplanes — vectorized numpy over Arrow batches."""
    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["embedding"].values).astype(np.float64)
            if H is None:
                H = _hyperplanes(M.shape[1], n_planes)
            signs = (M @ H.T) > 0
            bucket = signs @ (1 << np.arange(n_planes))
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "bucket": bucket.astype(np.int64)})

    return emb.select("vec_id", "embedding").mapInPandas(assign, "vec_id long, bucket long")


def lsh_topk(emb: DataFrame, k: int = 5, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: brute force restricted to LSH buckets.

    Each bucket is scored with one numpy GEMM inside applyInPandas — the
    per-partition dense math is the CSR-gather analog for embeddings."""
    with_b = emb.join(lsh_buckets(emb, n_planes), "vec_id")

    def score(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "rank": [], "cos": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "rank": "int32", "cos": "float64"})
        pdf = pdf.sort_values("vec_id")  # deterministic tie-breaking
        ids = pdf["vec_id"].values
        M = np.vstack(pdf["embedding"].values).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = np.round(M @ M.T, 6)
        np.fill_diagonal(S, -np.inf)
        kk = min(k, len(ids) - 1)
        out = []
        order = np.argsort(-S, axis=1, kind="stable")
        for i in range(len(ids)):
            for r in range(kk):
                j = order[i, r]
                out.append((ids[i], ids[j], r + 1, S[i, j]))
        return pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank", "cos"])

    return (
        with_b.groupBy("bucket")
        .applyInPandas(score, "query_id long, neighbor_id long, rank int, cos double")
        .orderBy("query_id", "rank")
    )


def quantize_embeddings(emb: DataFrame, bits: int = 8) -> DataFrame:
    """(vec_id, scale, codes_csv) — symmetric max-abs int8-style
    quantization of the embedding column: scale = max |x_i| (exact
    float->double widening), code_i = floor(x_i / scale * (2^(bits-1)-1)
    + 0.5) — the storage format embedding pipelines ship vectors in at
    the 100 TB scale (4x smaller than float32, dequantize = code *
    scale / qmax).

    Pure codegen transform over the array column, zero shuffles; codes
    are emitted as a CSV string so the row hash-gates identically against
    the DuckDB list_transform twin (all-zero vectors quantize to zeros
    with scale 0 via a guarded divisor).
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16]: {bits}")
    qmax = float((1 << (bits - 1)) - 1)
    s = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    s0 = F.when(s == 0.0, F.lit(1.0)).otherwise(s)
    codes = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") / s0 * F.lit(qmax) + F.lit(0.5)).cast(
            "int"
        ),
    )
    return emb.select(
        "vec_id",
        s.alias("scale"),
        F.concat_ws(",", F.transform(codes, lambda c: c.cast("string"))).alias(
            "codes_csv"
        ),
    ).orderBy("vec_id")


def pq_topk(
    emb: DataFrame,
    k: int = 5,
    m_sub: int = 8,
    k_codes: int = 8,
    n_queries: int | None = 20,
) -> DataFrame:
    """(query_id, neighbor_id, rank, adc): product-quantization ANN — the
    compressed-domain scale path (IVF-PQ's PQ half; completes the family
    next to hyperplane LSH and IVF-flat).

    Vectors are 2^20-quantized to int64, split into m_sub subvector blocks,
    and ENCODED: block j's code is the argmin exact-int64-squared-distance
    entry of codebook j (ties to the smallest code). Codebooks are the
    blocks of the k_codes smallest ACTUAL vec_ids (deterministic; a
    production index trains them offline with the tested fixed-point
    k-means — float-mean training here would be engine-dependent). Queries
    (the n_queries smallest vec_ids) score every vector ASYMMETRICALLY:
    adc = sum over blocks of the exact int64 squared distance between the
    query's block and the codebook entry the vector's code names — the
    standard ADC lookup, evaluated as pure codegen arithmetic against the
    broadcast codebook literal. Top-k per query by (adc asc, neighbor_id).

    Scale shape: the codebook is a driver literal (m_sub*k_codes*d_sub
    ints); encoding is ONE narrow zero-shuffle projection over the corpus
    (each vector -> m_sub small ints, a 32x memory cut at dim 64/float32);
    scoring touches candidates x m_sub lookups, never the original
    vectors. At 10^12 vectors the codes table IS the index: it fits where
    the raw vectors cannot, and the scan is bandwidth-bound on 8 bytes a
    row instead of 256. Everything is integer-exact, so the DuckDB twin
    reproduces codes and ADC distances bit-for-bit."""
    head = emb.select("embedding").first()
    if head is None:
        raise ValueError(f"pq_topk: need >= {k_codes} vectors, got 0")
    dim = len(head["embedding"])
    if dim % m_sub != 0:
        raise ValueError(f"pq_topk: m_sub={m_sub} must divide dim={dim}")
    d_sub = dim // m_sub
    qarr = F.expr(
        "transform(cast(embedding as array<double>),"
        " v -> CAST(floor(v * 1048576.0) AS BIGINT))"
    )
    base = emb.select("vec_id", qarr.alias("qv"))

    # codebooks: blocks of the k_codes smallest actual vec_ids (tiny collect)
    cb_rows = base.orderBy("vec_id").limit(k_codes).collect()
    if len(cb_rows) < k_codes:
        raise ValueError(f"pq_topk: need >= {k_codes} vectors, got {len(cb_rows)}")
    # cb[j][c] = python list of d_sub ints (block j of the c-th codebook row)
    cb = [
        [list(r["qv"][j * d_sub : (j + 1) * d_sub]) for r in cb_rows]
        for j in range(m_sub)
    ]

    def lit_arr(vals: list[int]):
        return F.array(*[F.lit(v).cast("long") for v in vals])

    def sqdist(block_col, entry: list[int]):
        return F.aggregate(
            F.zip_with(block_col, lit_arr(entry), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # encode: per block, argmin over the k_codes entries; ties resolve to
    # the smallest code via array_position's first-occurrence semantics
    code_cols = []
    for j in range(m_sub):
        block = F.slice("qv", j * d_sub + 1, d_sub)
        dists = F.array(*[sqdist(block, cb[j][c]) for c in range(k_codes)])
        code_cols.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    codes = base.select("vec_id", F.array(*code_cols).alias("codes"))

    queries = base.orderBy("vec_id")
    if n_queries is not None:
        queries = queries.limit(n_queries)
    queries = queries.select(F.col("vec_id").alias("query_id"), F.col("qv").alias("quv"))

    # ADC: for vector code c_j in block j, distance contribution is the
    # exact int64 sqdist between the query's block j and codebook[j][c_j];
    # CASE over the k_codes literals keeps the whole lookup in codegen
    contrib = []
    for j in range(m_sub):
        qblock = F.slice("quv", j * d_sub + 1, d_sub)
        cj = F.element_at("codes", j + 1)
        expr = F.lit(0).cast("long")
        for c in range(k_codes - 1, -1, -1):
            expr = F.when(cj == c, sqdist(qblock, cb[j][c])).otherwise(expr)
        contrib.append(expr)
    total = contrib[0]
    for e in contrib[1:]:
        total = total + e
    scored = (
        codes.join(F.broadcast(queries))
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), total.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc")
        .orderBy("query_id", "rank")
    )
