"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
sparse TF-IDF cosine, embedding cosine) — the training-data-pipeline suite.

Everything stays JVM-side (codegen array/string expressions + shuffle joins);
hashes are md5 hex strings so each operator has an exact DuckDB-SQL oracle.

Scale notes:
- exact dedup is one hash aggregation (map-side partial agg);
- shingle/minhash tables explode ~tokens-per-doc rows, then aggregate back to
  one row per (doc, band) — shuffle volume O(corpus tokens), the standard LSH
  pipeline shape;
- the pairwise verify joins only touch LSH-candidate buckets, never the full
  n^2 cross join (the cross join variant in similarity.py is the small-n
  baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, group_size): canonical = min doc_id among exact
    text duplicates (single hash-shuffle groupBy)."""
    groups = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(groups, "h")
        .select("doc_id", "canonical_id", "group_size")
        .orderBy("doc_id")
    )


def _shingle_array(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, sh): DISTINCT word k-gram shingles per document as one array
    column — row-local, zero shuffles."""
    t = tokens("text")
    sh = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(toks)-{k - 1}, 1)),"
        f" i -> concat_ws(' ', slice(toks, i, {k}))))"
    )
    return (
        docs.select("doc_id", t.alias("toks"))
        .where(F.size("toks") > 0)
        .select("doc_id", sh.alias("sh"))
    )


def _shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, s): distinct word k-gram shingles per document, one row per
    shingle (the join-shaped form used by Jaccard verification)."""
    return _shingle_array(docs, k).select("doc_id", F.explode("sh").alias("s"))


def decontaminate(
    train: DataFrame, benchmark: DataFrame, k: int = 3
) -> DataFrame:
    """(doc_id, n_hits, contaminated) — benchmark decontamination: for every
    training document, the number of its distinct word k-gram shingles that
    appear in ANY benchmark document, and the keep/drop verdict
    (contaminated = at least one shared shingle).  The standard eval-leakage
    scrub a pre-training corpus runs before a model ever sees the data.

    Scale shape: the benchmark shingle set is DISTINCT and small relative to
    the corpus (eval suites are megabytes, corpora are terabytes), so it
    broadcasts; the training side streams through a map-side hash join and
    one groupBy(doc_id) with partial aggregation — the full corpus is never
    shuffled on shingle."""
    tr = _shingles(train, k)
    bm = _shingles(benchmark, k).select("s").distinct()
    hits = (
        tr.join(F.broadcast(bm), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with word-k-gram Jaccard >= threshold.

    shingle equi-join (never a cross join) + per-doc shingle counts.

    The shingle frame is referenced twice in ONE plan; it is deliberately NOT
    persisted — recomputing the codegen explode is cheaper than pinning
    executor memory for the rest of the session (persist leaks accumulate
    across a multi-query run; at scale, checkpoint to storage instead)."""
    sh = _shingles(docs, k)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    common = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    ca = cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    cb = cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    out = (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return out


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 12, impl: str = "array"
) -> DataFrame:
    """(doc_id, h0..h{K-1}): K-permutation MinHash where permutation k is the
    lexicographic min of md5(k || ':' || shingle) — salt-keyed md5 instead of
    random linear permutations so the signature is reproducible anywhere.

    impl='array' (default, the scale path): the signature is row-local, so
    it is computed as array_min over a transform of the per-doc shingle
    array — pure whole-stage-codegen expressions, ZERO shuffles (the
    explode+groupBy form moves n·shingles rows through two exchanges for a
    per-row quantity). impl='explode' keeps that form as a cross-check
    (pytest asserts exact equality; binary UTF8 min ordering is identical
    in both)."""
    if impl == "array":
        sh = _shingle_array(docs)

        def salted(kk: int):
            # one-arg lambda: a two-arg lambda would make F.transform pass
            # the ARRAY INDEX as the second argument, clobbering the salt
            return lambda s: F.md5(F.concat(F.lit(f"{kk}:"), s))

        cols = [
            F.array_min(F.transform(F.col("sh"), salted(k))).alias(f"h{k}")
            for k in range(num_hashes)
        ]
        return sh.select("doc_id", *cols).orderBy("doc_id")
    sh = _shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("s")))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 12, bands: int = 4, threshold: float = 0.5
) -> DataFrame:
    """Candidate pairs from banded MinHash-LSH, verified with true Jaccard.

    (doc_a, doc_b, jaccard): pairs sharing >=1 of `bands` band-buckets AND
    true shingle Jaccard >= threshold. Only candidate buckets are verified."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    # candidate pairs: same bucket in any band. Melt all bands in ONE pass
    # (posexplode of the band-hash array) and self-join on (band, bucket):
    # a per-band union of joins would re-execute the signature plan (the
    # shingle explode + num_hashes aggregates) twice per band — 2*bands
    # executions — while the melted self-join runs it twice, with an
    # identical (bi, bk) exchange on both sides that AQE reuses
    melted = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("bi", "bk")
    )
    l = melted.select(F.col("doc_id").alias("doc_a"), "bi", "bk")
    r = melted.select(F.col("doc_id").alias("doc_b"), "bi", "bk")
    cand = (
        l.join(r, ["bi", "bk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify candidates with exact Jaccard (not persisted — see
    # ngram_jaccard_pairs)
    sh = _shingles(docs)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    ca = cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    cb = cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def simhash(docs: DataFrame, bits: int = 32, impl: str = "packed") -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash. Bit j is the majority vote over
    tokens of the high bit of hex digit j of md5(token) — i.e. +1 if
    md5(token)[j] in 89abcdef else -1, bit set iff the sum is positive.
    Docs with zero tokens produce no row (both impls, and the SQL twin).

    impl='packed' (default, the scale path): one zero-shuffle mapInPandas
    pass — each Arrow batch of documents is tokenized, hashed, and
    bit-packed locally in numpy. impl='sql' is the pure-expression variant
    kept as a cross-check; it explodes `bits` rows PER TOKEN through two
    shuffles (32x the shuffle volume — fine as an oracle twin, wrong as the
    default at corpus scale)."""
    if not 1 <= bits <= 32:
        # md5 hexdigest is 32 chars; beyond that the packed impl would raise
        # on reshape while the sql impl silently votes -1 — keep them aligned
        raise ValueError(f"simhash: bits must be in [1, 32], got {bits}")
    if impl == "sql":
        tok = docs.select("doc_id", F.explode(tokens("text")).alias("tk"))
        tok = tok.select("doc_id", F.md5("tk").alias("h"))
        j = F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("j")
        votes = tok.select("doc_id", j, F.col("h")).select(
            "doc_id",
            "j",
            F.when(F.substring("h", F.col("j"), F.lit(1)).isin(*"89abcdef"), 1)
            .otherwise(-1)
            .alias("v"),
        )
        bitsum = votes.groupBy("doc_id", "j").agg(F.sum("v").alias("sv"))
        return (
            bitsum.groupBy("doc_id")
            .agg(
                F.sum(
                    F.when(F.col("sv") > 0, F.pow(F.lit(2.0), F.col("j") - 1)).otherwise(0.0)
                )
                .cast("long")
                .alias("simhash")
            )
            .orderBy("doc_id")
        )

    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd

    hexhi = np.frombuffer(b"89abcdef", dtype="S1")
    weights = 1 << np.arange(bits, dtype=np.int64)

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition digest cache: token frequency is Zipfian, so the
        # md5 of a common token is computed once per partition instead of
        # once per occurrence (CPU, not shuffle — the hot cost here);
        # bounded by the partition's token vocabulary
        digest: dict[str, str] = {}

        def h(t: str) -> str:
            v = digest.get(t)
            if v is None:
                v = digest[t] = hashlib.md5(t.encode("utf-8")).hexdigest()[:bits]
            return v

        for pdf in it:
            ids, vals = [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                # token rule == functions.tokens(): trim spaces, split on a
                # single space, drop empties (matches F.trim + F.split ' ')
                toks = [t for t in (text or "").strip(" ").split(" ") if t]
                if not toks:
                    continue
                hx = "".join(h(t) for t in toks)
                mat = np.frombuffer(hx.encode(), dtype="S1").reshape(len(toks), bits)
                votes = 2 * np.isin(mat, hexhi).sum(axis=0) - len(toks)
                ids.append(doc_id)
                vals.append(int(weights[votes > 0].sum()))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(vals, dtype="int64")})

    return (
        docs.select("doc_id", "text")
        .mapInPandas(pack, "doc_id long, simhash long")
        .orderBy("doc_id")
    )


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, num_partitions: int = 8
) -> DataFrame:
    """(doc_id, canonical, is_survivor): survivor selection — the step an
    actual dedup pipeline needs AFTER pair generation. Near-dup relations
    are transitive in effect (a~b, b~c should keep ONE of {a,b,c}), so
    survivors are chosen per connected component of the pair graph: the
    BSP kernel's hash-min connected components assigns every doc the min
    doc_id reachable over dup pairs; that min is the canonical survivor.

    Scale: reuses the same CC vertex program that handles the billion-edge
    link graph — pair graphs from LSH dedup are sparse (bounded candidate
    generation), so this is a few supersteps over mostly-singleton
    components. Isolated docs (no dup pair) survive as their own
    canonical."""
    from .components import connected_components

    spark = docs.sparkSession
    v = docs.select(F.col("doc_id").alias("id"), F.lit(0).alias("label"))
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = fwd.unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    comp, _ = connected_components(spark, v, sym, num_partitions=num_partitions)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    ).orderBy("doc_id")


def dedup_spans(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, clean_text, n_removed) — exact duplicate-SPAN scrubbing,
    the substring-level dedup of pre-training corpora (spans repeated
    anywhere in the corpus are cut out of every document, not just whole
    near-dup documents dropped): a word k-gram occurring MORE THAN ONCE
    across the corpus (any two positions, same or different doc) marks all
    k token positions it covers in every occurrence; covered tokens are
    removed and the survivors rejoined.

    Scale shape: positions ride a row-local sequence+explode; the only
    shuffle on the wide data is one groupBy(shingle) count over the
    shingle table (map-side partial count — a Zipfian hot shingle combines
    before the wire) and one groupBy(doc_id) of covered positions. The
    duplicated-shingle table is a semi-join filter, never a cross join.
    k bounds the window exactly — no suffix automaton, no Python.
    """
    w = docs.select("doc_id", tokens("text").alias("ws"))
    n = F.size("ws")
    pos = w.where(n >= k).select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), n - F.lit(k))).alias("p"),
    )
    occ = pos.select(
        "doc_id",
        "p",
        F.concat_ws(" ", F.slice("ws", F.col("p") + 1, k)).alias("s"),
    )
    dup = (
        occ.groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("s")
    )
    covered = (
        occ.join(dup, "s", "left_semi")
        .select("doc_id", F.explode(F.sequence("p", F.col("p") + F.lit(k - 1))).alias("i"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("cov"))
    )
    return (
        w.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.filter(
                    "ws",
                    lambda x, i: ~F.array_contains(
                        F.coalesce("cov", F.array().cast("array<int>")), i
                    ),
                ),
            ).alias("clean_text"),
            F.size(F.coalesce("cov", F.array().cast("array<int>"))).alias("n_removed"),
        )
        .orderBy("doc_id")
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    max_df: int = 50,
) -> DataFrame:
    """(doc_a, doc_b, cos_r) — exact sparse TF-IDF cosine similarity for
    document pairs sharing at least one retained term, the term-space
    near-duplicate detector that complements MinHash (set overlap) and
    embedding cosine (dense space).

    Vector space: terms with document frequency <= `max_df` (the df prune
    is the standard stop-term cut AND the scale lever — it bounds each
    inverted-index posting list, so the shared-term pair join never sees a
    quadratic hot term; cosine is exact WITHIN this filtered space, and
    the SQL twin applies the identical cut). Weights w = tf * ln(N/df).

    Engine-exactness: per-term dot and norm contributions (w_a*w_b, w^2)
    are quantized at 1e-9 and summed as int64 (fixed_point_sum
    discipline), the two sqrt and one divide are the only float ops, and
    the threshold filters the ROUNDED score — bit-stable across engines
    and partitionings.

    Scale shape: two groupBys build (doc, term, w); one equi-join on term
    (posting lists bounded by max_df) + groupBy(pair) for dots; broadcast
    norms. Nothing all-pairs."""
    t = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfx = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = float(docs.count())
    wt = (
        tf.join(dfx, "term")
        .where(F.col("df") <= max_df)
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.lit(n_docs) / F.col("df"))).alias("w"),
        )
    )
    q = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("long")
    norms = wt.groupBy("doc_id").agg(
        F.sum(q(F.col("w") * F.col("w"))).alias("nq")
    )
    a = wt.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = wt.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(q(F.col("wa") * F.col("wb"))).alias("dq"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nq").alias("nqa"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nq").alias("nqb"))
    cos = F.round(
        (F.col("dq") / F.lit(1e9))
        / (
            F.sqrt(F.col("nqa") / F.lit(1e9))
            * F.sqrt(F.col("nqb") / F.lit(1e9))
        ),
        6,
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cos_r"))
        .where(F.col("cos_r") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
