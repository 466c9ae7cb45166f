"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: PageRank over the part–supplier dependency graph
derived from sf0.001, top-20 files by rank.

`queries()` — one callable per implemented operator (SURVEY.md §2 + the
training-data-pipeline suite); each takes (spark, sf_dir) and returns a
DataFrame whose column names match the oracle SQL exactly.

`oracle_sql()` — the DuckDB twin of each query. Graph queries share the two
deterministic graph constructions (bipartite supply graph from lineitem,
arithmetic labeled ring graph over part's key space) written identically in
SQL CTEs; iterative algorithms are unrolled to their fixed step counts.
Every gated query has an exact oracle — including the ANN path, whose
hyperplanes are md5-Rademacher signs over quantized int64 dots precisely so
DuckDB can replay them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.operators.components import connected_components
from subgraph_isomorphism_pregel_spark.operators.dedup import (
    dedup_exact,
    dedup_survivors,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from subgraph_isomorphism_pregel_spark.operators.labelprop import label_propagation
from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher
from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank
from subgraph_isomorphism_pregel_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    ivf_topk,
    lsh_topk,
)
from subgraph_isomorphism_pregel_spark.operators.textops import (
    collocations,
    fingerprint,
    langid,
    repetition_score,
    text_stats,
    tfidf_topk,
    token_count,
)
from subgraph_isomorphism_pregel_spark.operators.triangles import triangles_per_vertex
from subgraph_isomorphism_pregel_spark.sources.graph import ring_graph, supply_graph
from subgraph_isomorphism_pregel_spark.streaming.windowed import windowed_counts

PR_STEPS = 5  # fixed PageRank iterations for the SQL-oracle variant
LP_ROUNDS = 3


# ---------------------------------------------------------------- helpers

def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- queries

def q_pagerank_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = supply_graph(spark, sf_dir)
    scores, _ = pagerank(spark, v, e, num_partitions=16, fixed_steps=PR_STEPS)
    return scores.select("id", F.round("score", 8).alias("score_r")).orderBy("id")


PPR_SEEDS = 10  # seed set for the personalized-PageRank gate: smallest ids


def q_ppr_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the 10 smallest vertex ids — teleport
    uniform over the seed set, dangling mass returned to the seeds (0 on
    this symmetrized fixture, mirrored faithfully by the oracle)."""
    from subgraph_isomorphism_pregel_spark.operators.pagerank import (
        personalized_pagerank,
    )

    v, e = supply_graph(spark, sf_dir)
    seeds = [int(r[0]) for r in v.orderBy("id").limit(PPR_SEEDS).collect()]
    scores, _ = personalized_pagerank(
        spark, v, e, seeds, num_partitions=16, fixed_steps=PR_STEPS
    )
    return scores.select("id", F.round("score", 8).alias("score_r")).orderBy("id")


SPLIT_SALT = "v1"
STRATA_FRACS = {"en": 0.5, "zh": 1.0, "fr": 0.1}
STRATA_DEFAULT = 0.25
TOPK_PER_SOURCE = 10


def q_docs_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5-bucket on doc_id —
    same row lands in the same split on any partitioning or engine."""
    from subgraph_isomorphism_pregel_spark.operators.sampling import hash_split

    return (
        hash_split(_docs(spark, sf_dir), "doc_id", salt=SPLIT_SALT)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


def q_docs_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic down-sampling (keep 50% en, all zh, 10%
    fr, 25% of everything else) — the curation rebalancing primitive."""
    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        stratified_sample,
    )

    return (
        stratified_sample(
            _docs(spark, sf_dir),
            "lang",
            STRATA_FRACS,
            "doc_id",
            default_fraction=STRATA_DEFAULT,
            salt=SPLIT_SALT,
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def q_docs_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source quota (hash-ordered deterministic 'reservoir')."""
    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        hash_topk_per_group,
    )

    return (
        hash_topk_per_group(
            _docs(spark, sf_dir), "source", "doc_id", TOPK_PER_SOURCE, salt=SPLIT_SALT
        )
        .select("doc_id", "source", "sample_rank")
        .orderBy("source", "sample_rank")
    )


def q_clustering_coeff_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient on the ring graph."""
    from subgraph_isomorphism_pregel_spark.operators.triangles import (
        clustering_coefficient,
    )

    v, e = ring_graph(spark, sf_dir)
    return clustering_coefficient(spark, v, e).orderBy("id")


def q_wpagerank_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-transition PageRank on the ring graph, fixed PR_STEPS
    iterations; edge weight (src + dst) % 7 + 1."""
    from subgraph_isomorphism_pregel_spark.operators.pagerank import (
        weighted_pagerank,
    )

    v, e = ring_graph(spark, sf_dir)
    scores, _ = weighted_pagerank(
        spark, v, e, num_partitions=16, fixed_steps=PR_STEPS
    )
    return scores.select("id", F.round("score", 8).alias("score_r")).orderBy("id")


def q_negative_edges_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sampled negative (non-)edges on the ring graph —
    the reproducible link-prediction training table: 2 negatives per source,
    md5-bucketed through the dense vertex rank, real edges anti-joined out."""
    from subgraph_isomorphism_pregel_spark.operators.linkpred import negative_edges

    _, e = ring_graph(spark, sf_dir)
    return negative_edges(e, k=2, salt="v1")


KATZ_ALPHA = 0.05
KATZ_STEPS = 4


def q_katz_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality on the ring graph: exact int64 path counts
    on the kernel, alpha^t fold in fixed step order — floats enter only
    through the fold, so the scores hash-match the unrolled SQL replay."""
    from subgraph_isomorphism_pregel_spark.operators.eigen import katz_centrality

    v, e = ring_graph(spark, sf_dir)
    scores, _ = katz_centrality(
        spark, v, e, alpha=KATZ_ALPHA, steps=KATZ_STEPS, num_partitions=16
    )
    return scores.orderBy("id")


def q_graph_stats_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row global summary of the ring graph (degree moments,
    reciprocity, degree assortativity) — integer aggregates, float math
    only in the final expression, so the row is engine-exact."""
    from subgraph_isomorphism_pregel_spark.operators.stats import graph_stats

    _, e = ring_graph(spark, sf_dir)
    return graph_stats(e)


QUANTILE_QS = (0.5, 0.9, 0.99)


def q_doc_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language n_chars quantiles (rank-ceil convention)."""
    from subgraph_isomorphism_pregel_spark.operators.stats import group_quantiles

    return group_quantiles(
        _docs(spark, sf_dir), "lang", "n_chars", qs=list(QUANTILE_QS)
    ).orderBy("lang", "q")


WSSSP_UNROLL = 18  # >= measured 15-superstep convergence on the sf0.01 ring


def q_wsssp_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (min-plus Bellman-Ford on the kernel) from
    vertex 0 over the ring graph; edge weight (src + dst) % 7 + 1."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import weighted_sssp

    v, e = ring_graph(spark, sf_dir)
    d, _ = weighted_sssp(spark, v, e, source=0, max_rounds=64, num_partitions=16)
    return d.orderBy("id")


LANDMARK_HOPS = 16  # bounded-distance contract, mirrored by the oracle CTEs
BC_HOPS = 10  # betweenness level bound (kernel AND the unrolled oracle)
KTRUSS_K = 4  # truss order for the gated peel
KTRUSS_ROUNDS = 3  # bounded unroll, idempotent past the fixed point (kcore pattern)


def q_ktruss_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss edge peel on the ring graph (3 waves — idempotent at the
    fixture's fixed point); the oracle unrolls the identical waves with an
    orientation-free common-neighbor support count."""
    from subgraph_isomorphism_pregel_spark.operators.triangles import ktruss

    v, e = ring_graph(spark, sf_dir)
    return ktruss(spark, e, k=KTRUSS_K, rounds=KTRUSS_ROUNDS).orderBy("u", "v")


def q_betweenness_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-sampled Brandes betweenness (pivots 0 and n/2) on the ring
    graph — two-phase kernel program (level-synchronous σ BFS + descending
    δ accumulation); oracle = unrolled Brandes in SQL, same level bound."""
    from subgraph_isomorphism_pregel_spark.operators.betweenness import betweenness

    v, e = ring_graph(spark, sf_dir)
    n = v.count()
    bc, _ = betweenness(
        spark, v, e, pivots=[0, n // 2], max_hops=BC_HOPS, num_partitions=8
    )
    return bc.orderBy("id")


def q_landmarks_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS feature matrix: hop distances from every ring vertex
    to 4 landmarks (0, n/4, n/2, 3n/4) in ONE kernel run (band-packed vector
    state); -1 = unreached within LANDMARK_HOPS, same bound in the oracle."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import landmark_distances

    v, e = ring_graph(spark, sf_dir)
    n = v.count()
    lms = [0, n // 4, n // 2, (3 * n) // 4]
    d, _ = landmark_distances(
        spark, v, e, lms, max_hops=LANDMARK_HOPS, num_partitions=8
    )
    return d.orderBy("id")


def q_harmonic_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-sampled harmonic centrality over the ring graph (same 4
    landmarks and hop bound as landmarks_ring); the fixed-order 1/d sum
    hash-gates exactly — no rounding."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import harmonic_centrality

    v, e = ring_graph(spark, sf_dir)
    n = v.count()
    lms = [0, n // 4, n // 2, (3 * n) // 4]
    h, _ = harmonic_centrality(
        spark, v, e, lms, max_hops=LANDMARK_HOPS, num_partitions=8
    )
    return h.orderBy("id")


def q_wl_colors_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex 1-WL colors after 3 refinement rounds on the ring graph
    — the isomorphism-filter companion of the matcher; md5 + sorted
    neighbor-color concatenation is engine-exact."""
    from subgraph_isomorphism_pregel_spark.operators.wl import wl_refine

    v, e = ring_graph(spark, sf_dir)
    return wl_refine(v, e, rounds=3).orderBy("id")


def q_closeness_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-sampled closeness centrality over the ring graph (same 4
    landmarks and hop bound as landmarks_ring); reached and dist_sum are
    exact int64, so the one double division hash-gates without rounding."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import (
        closeness_centrality,
    )

    v, e = ring_graph(spark, sf_dir)
    n = v.count()
    lms = [0, n // 4, n // 2, (3 * n) // 4]
    c, _ = closeness_centrality(
        spark, v, e, lms, max_hops=LANDMARK_HOPS, num_partitions=8
    )
    return c.orderBy("id")


def q_scc_dag_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (forward-backward coloring on the BSP
    kernel) over the deterministic directed dag-of-cycles fixture; scc = min
    vertex id in the component. Oracle: DuckDB transitive closure (mutual
    reachability) over the identical SQL-built edge set."""
    from subgraph_isomorphism_pregel_spark.operators.scc import scc
    from subgraph_isomorphism_pregel_spark.sources.graph import dag_cycles_graph

    v, e = dag_cycles_graph(spark, sf_dir)
    out, _ = scc(spark, v, e, num_partitions=4)
    return out.orderBy("id")


def q_bipartite_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component bipartiteness over the disjoint-cycles fixture via the
    double-cover reduction (two runs of the hash-min CC kernel, zero new
    kernel code). The fixture mixes even- and odd-length cycles at every sf,
    and the oracle computes (component, size, bipartite) in CLOSED FORM from
    the ring-length formula — it never builds a cover, so a reduction bug
    cannot cancel."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        bipartite_components,
    )
    from subgraph_isomorphism_pregel_spark.sources.graph import multi_ring_graph

    v, e = multi_ring_graph(spark, sf_dir)
    out, _ = bipartite_components(spark, v, e, num_partitions=4)
    return out.orderBy("component")


def q_butterflies_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (bipartite 4-cycle) count over the part—supplier bipartite
    edge set — the bipartite analog of the triangle gate."""
    from subgraph_isomorphism_pregel_spark.operators.triangles import butterflies

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    ).distinct()
    return butterflies(pairs, center="src")


BLOOM_BITS = 4096  # deliberately tight so deterministic false positives appear
BLOOM_K = 3


def q_bloom_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built over the English doc ids, probed with every doc:
    membership plus reproducible false positives at the tight sizing."""
    from subgraph_isomorphism_pregel_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    docs = _docs(spark, sf_dir)
    bits = bloom_build(
        docs.where(F.col("lang") == "en"), "doc_id", n_bits=BLOOM_BITS, k_hashes=BLOOM_K
    )
    out = bloom_probe(
        bits, docs.select("doc_id"), "doc_id", n_bits=BLOOM_BITS, k_hashes=BLOOM_K
    )
    return out.select("doc_id", "maybe_present").orderBy("doc_id")


def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the continuous aggregate (streaming time-bucket leaf
    rollup merged into an Iceberg-style snapshot table) — the streaming
    drain itself is verified exactly against this in pytest via a 5-file
    AvailableNow schedule (streaming/rollup_stream.py)."""
    from subgraph_isomorphism_pregel_spark.streaming.rollup_stream import rollup_leaf

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rollup_leaf(ev).orderBy("bucket_id", "event_type")


def q_time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute time-bucket ROLLUP over (bucket, event_type): per-bucket
    per-type, per-bucket subtotal, and grand-total rows."""
    from subgraph_isomorphism_pregel_spark.operators.timeagg import time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = time_rollup(ev, ts_col="ts", dims=["event_type"], value_col="value")
    return out.orderBy(
        F.asc_nulls_first("bucket_id"), F.asc_nulls_first("event_type")
    )


def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-order keys over (user_id, epoch-second) low 16 bits — the
    multi-dimension clustering key for min/max file skipping; pure
    shift/mask codegen with an identical DuckDB twin."""
    from subgraph_isomorphism_pregel_spark.sources.zorder import z2

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    micros = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    d = ev.select(
        "event_id",
        (F.col("user_id") % 65536).alias("zx"),
        (F.floor(micros / F.lit(1_000_000)) % 65536).alias("zy"),
    )
    return d.select(
        "event_id", "zx", "zy", z2("zx", "zy").alias("z")
    ).orderBy("event_id")


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full OLAP CUBE over (event_type, hour-of-day) with SQL grouping id:
    every subset of the dimensions in one pass (finest cells, both
    one-dimension marginals, grand total)."""
    from subgraph_isomorphism_pregel_spark.operators.timeagg import cube_agg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    micros = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    ev = ev.withColumn("hh", F.floor(micros / F.lit(3_600_000_000)) % 24)
    out = cube_agg(ev, dims=["event_type", "hh"], value_col="value")
    return out.orderBy(
        F.asc("gid"), F.asc_nulls_first("event_type"), F.asc_nulls_first("hh")
    )


def q_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events table: for every purchase, the user's
    latest click at-or-before it (last-touch attribution)."""
    from subgraph_isomorphism_pregel_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(left, right, keys=["user_id"], payload_cols=["event_id", "value"])
    return out.select(
        "event_id",
        "user_id",
        "matched_event_id",
        F.round("matched_value", 6).alias("matched_value_r"),
    ).orderBy("event_id")


def q_asof_events_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every click, the user's NEXT purchase
    at-or-after it within 2 hours (time-to-convert attribution) — the
    descending-scan twin of asof_events."""
    from subgraph_isomorphism_pregel_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        left, right, keys=["user_id"], payload_cols=["event_id", "value"],
        direction="forward", tolerance_seconds=7200,
    )
    return out.select(
        "event_id",
        "user_id",
        "matched_event_id",
        F.round("matched_value", 6).alias("matched_value_r"),
    ).orderBy("event_id")


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join on the events table: every click in the hour before each
    purchase, per user (attribution windows)."""
    from subgraph_isomorphism_pregel_spark.operators.rangejoin import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = range_join(
        left, right, keys=["user_id"], lower_seconds=-3600, upper_seconds=0
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("r_event_id").alias("click_id"),
        F.round("r_value", 6).alias("click_value_r"),
    ).orderBy("event_id", "click_id")


MIS_ROUNDS = 6
MIS_SALT = "m1"


def q_mis_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal independent set on the ring graph — exactly MIS_ROUNDS
    hash-derandomized rounds (the fixed-round form is exact regardless of
    whether the set is complete by then)."""
    from subgraph_isomorphism_pregel_spark.operators.mis import (
        maximal_independent_set,
    )

    v, e = ring_graph(spark, sf_dir)
    return maximal_independent_set(v, e, rounds=MIS_ROUNDS, salt=MIS_SALT).orderBy("id")


MATCH_ROUNDS = 6  # local-minima rounds; fixed so the unrolled SQL twin
MATCH_SALT = "mm1"  # matches the engine round-for-round (the mis pattern)

COLORING_ROUNDS = 8  # Jones-Plassmann rounds (fixed-round prefix form)
COLORING_SALT = "jp1"

LOUVAIN_ROUNDS = 6  # synchronous local-move rounds (fixed-round form)
LOUVAIN_BUCKETS = 2
LOUVAIN_SALT = "lv1"

CHUNK_MAX_TOKENS = 64
CHUNK_OVERLAP = 16

MIXTURE_TARGET = 200
MIXTURE_SALT = "tm"

SPAN_K = 5  # duplicate-span shingle width

DENSEST_ROUNDS = 8  # peel rounds (fixed-round prefix form, best-of-seen)

SHARD_N = 8
SHARD_SALT = "sh"


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-export shuffle: md5-permuted global rank,
    round-robin shard assignment (balanced sizes), seeded and
    engine-reproducible."""
    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        shuffle_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    out = shuffle_shards(docs, "doc_id", SHARD_N, salt=SHARD_SALT, mode="sort")
    return out.select("doc_id", "shard", "rank_in_shard").orderBy("doc_id")


DENSEST_CORE = 40  # planted clique size on the first ring ids


def q_densest_ring_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bahmani parallel peeling on the ring graph with a planted
    DENSEST_CORE-clique on ids 0..39 — exactly DENSEST_ROUNDS rounds,
    output the best-density prefix's vertex set. The uniform ring
    periphery peels away in round 1 and the clique survives as the best
    prefix, so the gate exercises the peel recurrence non-vacuously
    (best round > 0; integer-exact peel test; best round picked by the
    IEEE double m/n with ties to the earlier round, identically in the
    SQL twin)."""
    from subgraph_isomorphism_pregel_spark.operators.densest import (
        densest_subgraph,
    )

    _, e = ring_graph(spark, sf_dir)
    ids = spark.range(DENSEST_CORE).select(F.col("id").alias("a"))
    cl = (
        ids.crossJoin(spark.range(DENSEST_CORE).select(F.col("id").alias("b")))
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    best, _ = densest_subgraph(
        e.select("src", "dst").unionByName(cl), rounds=DENSEST_ROUNDS
    )
    return best.orderBy("id")


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span scrubbing of the documents table: any word
    5-gram occurring twice anywhere in the corpus is cut out of every
    occurrence (substring-level dedup, not whole-document drop)."""
    from subgraph_isomorphism_pregel_spark.operators.dedup import dedup_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_spans(docs, k=SPAN_K)


def q_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 language mixture sample of the documents table —
    rare languages upweighted toward sqrt-proportional shares, applied by
    the deterministic stratified hash sampler (integer-exact thresholds,
    so the DuckDB twin reproduces the accept set bit-for-bit)."""
    from subgraph_isomorphism_pregel_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out, _ = temperature_mixture(
        docs,
        domain_col="lang",
        key_col="doc_id",
        temperature=0.5,
        target=MIXTURE_TARGET,
        salt=MIXTURE_SALT,
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking of the documents table: 64-token chunks
    with 16-token overlap (stride 48), whitespace tokens."""
    from subgraph_isomorphism_pregel_spark.operators.textops import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(
        docs, max_tokens=CHUNK_MAX_TOKENS, overlap=CHUNK_OVERLAP
    )


def q_coloring_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jones–Plassmann greedy coloring on the ring graph — exactly
    COLORING_ROUNDS rounds with fixed md5 vertex priorities; the output is
    the deterministic prefix of the sequential greedy coloring in priority
    order (vertices not yet ready by then are simply absent, identically
    in the SQL twin)."""
    from subgraph_isomorphism_pregel_spark.operators.coloring import (
        greedy_coloring,
    )

    v, e = ring_graph(spark, sf_dir)
    col, _ = greedy_coloring(v, e, rounds=COLORING_ROUNDS, salt=COLORING_SALT)
    return col.orderBy("id")


def q_louvain_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain-style community detection on the ring graph — exactly
    LOUVAIN_ROUNDS synchronous modularity-gain local-move rounds with the
    fixed md5 bucket schedule; scores are integer-exact (2m·k_{v,c} −
    k_v·tot'(c)), so the SQL twin replays every move bit-for-bit."""
    from subgraph_isomorphism_pregel_spark.operators.louvain import (
        louvain_local_moves,
    )

    _, e = ring_graph(spark, sf_dir)
    comm = louvain_local_moves(
        e, LOUVAIN_ROUNDS, buckets=LOUVAIN_BUCKETS, salt=LOUVAIN_SALT
    )
    return comm.orderBy("id")


def q_mst_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka minimum spanning forest on the weighted ring fixture — run
    to completion (~log2 n contraction rounds). The fixture's planted
    light path is the unique MSF under the (w, u, v) total order, so the
    oracle states it in closed form while the engine must win it through
    real per-component minima and contractions."""
    from subgraph_isomorphism_pregel_spark.operators.mst import boruvka_msf
    from subgraph_isomorphism_pregel_spark.sources.graph import weighted_ring_graph

    e = weighted_ring_graph(spark, sf_dir)
    forest, _ = boruvka_msf(e)
    return forest.orderBy("u", "v")


def q_matching_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicographically-first maximal matching on the ring graph —
    exactly MATCH_ROUNDS parallel local-minima rounds with fixed md5 edge
    priorities (the fixed-round form is a deterministic prefix of the
    sequential greedy scan, so it hash-gates regardless of whether the
    matching is maximal by then)."""
    from subgraph_isomorphism_pregel_spark.operators.matching import (
        maximal_matching,
    )

    _, e = ring_graph(spark, sf_dir)
    m, _ = maximal_matching(e, rounds=MATCH_ROUNDS, salt=MATCH_SALT)
    return m.orderBy("u", "v")


KHOP_K = 2
KHOP_FANOUT = 3
KHOP_SALT = "n1"
KHOP_STARTS = 100  # origins: ring ids below this


def q_khop_sample_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style deterministic 2-hop neighbor sampling (fanout 3)
    from the first 100 ring vertices."""
    from subgraph_isomorphism_pregel_spark.operators.neighborhood import (
        khop_neighbors,
    )

    v, e = ring_graph(spark, sf_dir)
    return khop_neighbors(
        e,
        k=KHOP_K,
        starts=v.select("id").where(F.col("id") < KHOP_STARTS),
        fanout=KHOP_FANOUT,
        salt=KHOP_SALT,
    ).orderBy("origin", "dist", "node")


WALK_LEN = 4
WALKS_PER_VERTEX = 2
WALK_SALT = "w1"


N2V_LEN = 3
N2V_P, N2V_Q = 4.0, 0.25  # dyadic weights: 1/p=0.25, 1/q=4.0 — exact cumsums
N2V_SALT = "n2v"


def q_node2vec_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec-biased deterministic walks on the ring graph (p=4, q=0.25
    — homophily-leaning), inverse-CDF choice against one md5 uniform per
    (walk, step)."""
    from subgraph_isomorphism_pregel_spark.operators.walks import node2vec_walks

    v, e = ring_graph(spark, sf_dir)
    return node2vec_walks(
        e,
        walk_len=N2V_LEN,
        p=N2V_P,
        q=N2V_Q,
        walks_per_vertex=1,
        starts=v.select("id"),
        salt=N2V_SALT,
    ).orderBy("origin", "walk_no", "step")


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric max-abs int8 quantization of the embeddings table."""
    from subgraph_isomorphism_pregel_spark.operators.similarity import (
        quantize_embeddings,
    )

    return quantize_embeddings(_emb(spark, sf_dir), bits=8)


def q_walks_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks (hash-argmin next-hop) from every ring
    vertex — the graph-embedding corpus generator."""
    from subgraph_isomorphism_pregel_spark.operators.walks import random_walks

    v, e = ring_graph(spark, sf_dir)
    return random_walks(
        e,
        walk_len=WALK_LEN,
        walks_per_vertex=WALKS_PER_VERTEX,
        starts=v.select("id"),
        salt=WALK_SALT,
    ).orderBy("origin", "walk_no", "step")


RICH_CLUB_KS = [1, 2, 4, 8, 16, 32]


def q_rich_club_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) of the supply graph at six degree
    thresholds — hub-core density via two histogram suffix sums, one
    data scan regardless of |ks|."""
    from subgraph_isomorphism_pregel_spark.operators.stats import rich_club

    _, e = supply_graph(spark, sf_dir)
    return rich_club(e, ks=RICH_CLUB_KS)


AA_TOPK = 20


def q_adamic_adar_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links on the supply graph by Adamic-Adar (two parts
    sharing many low-degree suppliers are likely substitutes)."""
    from subgraph_isomorphism_pregel_spark.operators.linkpred import adamic_adar_topk

    _, e = supply_graph(spark, sf_dir)
    return adamic_adar_topk(e, k=AA_TOPK).orderBy("rank")


def q_jaccard_links_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links on the supply graph by neighborhood Jaccard
    coefficient cn / (deg(u) + deg(v) - cn) — the degree-normalized twin of
    adamic_adar_supply (one extra degree join on the post-agg pair stream)."""
    from subgraph_isomorphism_pregel_spark.operators.linkpred import jaccard_topk

    _, e = supply_graph(spark, sf_dir)
    return jaccard_topk(e, k=AA_TOPK).orderBy("rank")


def q_copurchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted part—part co-purchase graph: the one-mode projection of the
    order→part membership table (weight = # orders containing both parts,
    kept at weight >= 2)."""
    from subgraph_isomorphism_pregel_spark.operators.linkpred import (
        cooccurrence_projection,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return cooccurrence_projection(
        li, group_col="l_orderkey", item_col="l_partkey", min_weight=2
    )


KMEANS_K = 8
KMEANS_ITERS = 3


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point k-means over the embeddings table (k smallest vec_ids
    seed; 3 Lloyd rounds; output = assignment against the final centroids).
    Hash-gateable because every step is exact int64 on the 2^20 grid."""
    from subgraph_isomorphism_pregel_spark.operators.clustering import kmeans

    assigned, _, _ = kmeans(_emb(spark, sf_dir), k=KMEANS_K, iters=KMEANS_ITERS)
    return assigned.orderBy("vec_id")


HITS_STEPS = 4  # fixed HITS iterations for the SQL-oracle variant


def q_hits_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the DIRECTED part->supplier bipartite
    graph (parts are hubs, suppliers authorities) — the one supply-graph
    query that uses edge direction instead of the symmetrized fixture."""
    from subgraph_isomorphism_pregel_spark.operators.hits import hits
    from subgraph_isomorphism_pregel_spark.sources.graph import SUPPLIER_ID_OFFSET

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + F.lit(SUPPLIER_ID_OFFSET)).alias("dst"),
    ).distinct()
    scored, _ = hits(spark, pairs, steps=HITS_STEPS, num_partitions=16)
    return scored.select(
        "id", "role", F.round("score", 8).alias("score_r")
    ).orderBy("id", "role")


def q_components_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = supply_graph(spark, sf_dir)
    comp, _ = connected_components(spark, v, e, num_partitions=16)
    return comp.orderBy("id")


def q_labelprop_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = supply_graph(spark, sf_dir)
    lab, _ = label_propagation(spark, v, e, rounds=LP_ROUNDS, num_partitions=16)
    return lab.orderBy("id")


def q_modularity_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LP communities on the supply graph — chains
    two gated computations (kernel label propagation -> modularity score);
    exact-rational float form hash-gates the score precisely."""
    from subgraph_isomorphism_pregel_spark.operators.stats import modularity

    v, e = supply_graph(spark, sf_dir)
    lab, _ = label_propagation(spark, v, e, rounds=LP_ROUNDS, num_partitions=16)
    return modularity(lab, e, label_col="lp_label")


def q_sssp_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from the min-id vertex, bounded at 64 supersteps —
    the kernel's min-plus program; the oracle's recursive CTE implements the
    identical bound (no unroll-depth assumption)."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp

    v, e = supply_graph(spark, sf_dir)
    src = int(v.agg(F.min("id")).collect()[0][0])
    d, _ = sssp(spark, v, e, source=src, max_hops=64, num_partitions=16)
    return d.orderBy("id")


KCORE_K = 32  # on the sf0.01 supply graph: a 290-vertex core after one peel wave


def q_coreness_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex core numbers on the supply graph — convergence-detected
    H-index iteration on the BSP kernel (fixed point = peeling coreness);
    the oracle unrolls the same H-index sweeps in SQL (8 rounds, measured
    fixpoint at 4 on this fixture, idempotent past it)."""
    from subgraph_isomorphism_pregel_spark.operators.coreness import coreness

    v, e = supply_graph(spark, sf_dir)
    out, _ = coreness(spark, v, e, num_partitions=16)
    return out.orderBy("id")


def q_onion_coreness_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core numbers by the SECOND, structurally different implementation —
    onion-decomposition wave peeling with an aggregator-driven adaptive
    threshold — hash-gated against the SAME unrolled H-index SQL oracle as
    coreness_supply: a bug in either the peeling protocol or the H-index
    fixed point cannot cancel. Layers are pytest-covered (no SQL twin)."""
    from subgraph_isomorphism_pregel_spark.operators.onion import onion_layers

    v, e = supply_graph(spark, sf_dir)
    out, _ = onion_layers(spark, v, e, num_partitions=16)
    return out.select("id", "coreness").orderBy("id")


def q_kcore_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices of the 32-core — iterative peeling on the BSP kernel; the
    oracle unrolls the same peel as MATERIALIZED within-survivor degree
    recounts (6 rounds, idempotent past the fixed point)."""
    from subgraph_isomorphism_pregel_spark.operators.kcore import kcore

    v, e = supply_graph(spark, sf_dir)
    core, _ = kcore(spark, v, e, k=KCORE_K, num_partitions=16)
    return core.orderBy("id")


def q_degree_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, e = supply_graph(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree").agg(F.count("*").alias("n_vertices")).orderBy("degree")
    )


def q_triangles_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = ring_graph(spark, sf_dir)
    return triangles_per_vertex(spark, v, e).orderBy("id")


def q_rectangles_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-cycle (rectangle) count on the ring graph via wedge
    endpoint-pair aggregation."""
    from subgraph_isomorphism_pregel_spark.operators.triangles import (
        rectangle_stats,
    )

    _, e = ring_graph(spark, sf_dir)
    return rectangle_stats(spark, e)


KCLIQUE_PLANT = 16  # planted clique size: guarantees C(16,4)=1820 4-cliques


def q_kclique4_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-clique count (ordered extension over the degree-oriented
    DAG) on the ring graph with a planted KCLIQUE_PLANT-clique on ids
    0..15, so the two extension rounds run non-vacuously. The union is
    deduplicated (planted edges can coincide with ring/chord edges) —
    the operator's distinct-closure input contract."""
    from subgraph_isomorphism_pregel_spark.operators.triangles import kclique_count

    _, e = ring_graph(spark, sf_dir)
    ids = spark.range(KCLIQUE_PLANT).select(F.col("id").alias("a"))
    cl = (
        ids.crossJoin(spark.range(KCLIQUE_PLANT).select(F.col("id").alias("b")))
        .where(F.col("a") != F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    n = kclique_count(spark, e.select("src", "dst").unionByName(cl).distinct(), k=4)
    return spark.createDataFrame([(n,)], "cliques4 long")


def _ring_matcher(spark, sf_dir):
    v, e = ring_graph(spark, sf_dir)
    return SubgraphMatcher(spark, v, e)


def _count_query(spark, sf_dir, qv, qe, **kw) -> DataFrame:
    """Run a counting match and release the matcher's cached frames (the
    count is already collected, so nothing lazy depends on them)."""
    m = _ring_matcher(spark, sf_dir)
    try:
        n = m.count(qv, qe, **kw)
    finally:
        m.unpersist()
    return spark.createDataFrame([(n,)], "cnt long")


def q_match_path3_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _count_query(
        spark, sf_dir, {1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (2, 3), (3, 2)}, pseudo=False
    )


def q_match_triangle_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)}
    return _count_query(spark, sf_dir, {1: 0, 2: 1, 3: 2}, qe, pseudo=False)


def q_match_cycle4_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = {1: 0, 2: 1, 3: 2, 4: 3}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=False)


def q_match_star_pseudo_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star 1(l0)-{2(l1),3(l2)}: leaf label-unique -> exercises pseudo counting."""
    qv = {1: 0, 2: 1, 3: 2}
    qe = {(1, 2), (2, 1), (1, 3), (3, 1)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=True)


def q_match_path3_pruned_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-3 through the engine's own headline optimizations: prefix column
    pruning + factorized counting (Q5/M5) AND the candidate-cardinality
    matching order (Q1) — previously pytest-only paths, now driver-gated."""
    return _count_query(
        spark,
        sf_dir,
        {1: 0, 2: 1, 3: 2},
        {(1, 2), (2, 1), (2, 3), (3, 2)},
        pseudo=True,
        prune=True,
        order="candidate",
    )


def q_match_acbc_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship conflict shape a-c-b-c: the trailing label-1
    leaf is counted DEFERRED against the enumerated label-1 vertex
    (adjacency-subtraction factorization, SIBranch.h:161-248)."""
    qv = {1: 0, 2: 1, 3: 2, 4: 1}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=True, prune=True)


def q_match_twin_leaves_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two same-label leaves on different branches: deferred cross-branch
    counting |A||B| - |A∩B| instead of enumeration."""
    qv = {1: 0, 2: 2, 3: 0, 4: 1, 5: 1}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (3, 5), (5, 3)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=True, prune=True)


def q_match_triple_deferred_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three same-label leaves under three DIFFERENT parents on a path —
    the general Venn-atom deferred path (round 3): subset intersection
    counts + Mobius atom sizes + plan-time assignment polynomial; the
    leaves are never enumerated."""
    qv = {1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 3}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2),
          (1, 4), (4, 1), (2, 5), (5, 2), (3, 6), (6, 3)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=True, prune=True)


def q_match_quad_deferred_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four same-label leaves under the four vertices of a path — exactly
    4096 polynomial terms, the densest deferred shape the plan guard
    admits (plans/sketch_tree.DEFER_MAX_TERMS): counted through the
    Arrow-batched pandas-UDF polynomial tier instead of a Column tree, and
    the leaf label collides with the enumerated v1, so the witness-mask
    subtraction fires inside the same aggregate pass."""
    qv = {1: 0, 2: 1, 3: 2, 4: 3, 5: 0, 6: 0, 7: 0, 8: 0}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)}
    for leaf, parent in ((5, 1), (6, 2), (7, 3), (8, 4)):
        qe |= {(leaf, parent), (parent, leaf)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=True, prune=True)


def q_match_factorized_twin_paths_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch-FACTORIZED counting with internal same-label conflicts: two
    2-node branches off the root where BOTH levels collide cross-branch
    (internal 1-1 pair and leaf 2-2 pair). Each branch is enumerated
    independently and assembled by inclusion-exclusion over the two
    conflict pairs (4 signed join-aggregate terms) — the Spark form of
    the reference's marked-choice branch assembly for enumerated vertices
    (SIBranch.h:161-248); the cross product of branches never
    materializes."""
    qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}
    m = _ring_matcher(spark, sf_dir)
    try:
        n = m.count_tree_factorized(qv, qe)
        assert n is not None  # the shape must actually take the factorized path
    finally:
        m.unpersist()
    return spark.createDataFrame([(n,)], "cnt long")


def q_match_star_of_stars_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED (two-level) branch factorization, driver-gated: a
    star-of-stars — root, two same-label mids, four same-label grandchild
    leaves shared across mids — factorizes at the root AND again inside
    each branch at the mid (the Spark form of the reference's staged
    branch numbers, SIQuery.h:429-486). 5 cross-branch pairs at the top
    (32 signed assembly terms) + 1 nested pair per branch; the branch
    cross product never materializes at either level."""
    qv = {0: 0, 1: 1, 2: 1, 11: 2, 12: 2, 21: 2, 22: 2}
    qe = set()
    for a, b in ((0, 1), (0, 2), (1, 11), (1, 12), (2, 21), (2, 22)):
        qe |= {(a, b), (b, a)}
    m = _ring_matcher(spark, sf_dir)
    try:
        n = m.count_tree_factorized(qv, qe, nested=True)
        assert n is not None  # the shape must take the factorized path
    finally:
        m.unpersist()
    return spark.createDataFrame([(n,)], "cnt long")


def q_match_corpus_wedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star pipeline END TO END under the hash gate: synthesize
    the source-code corpus, derive the import dependency graph (regex
    import extraction + intra-repo resolve join, sources/corpus.py), then
    run a labeled subgraph match ON THE DERIVED GRAPH — a py-py-py wedge
    whose two leaves are counted DEFERRED against the enumerated same-label
    center (witness subtraction). The DuckDB twin rebuilds the abstract
    dependency graph directly from the generator's arithmetic import
    formula (file j imports (7j+1+s) and (13j+5+s) mod fpr within its
    repo; lang label = (31r+7j+s) mod 5), so an extraction or resolution
    bug in the Spark derivation changes the count and fails the gate."""
    from subgraph_isomorphism_pregel_spark.sources.corpus import corpus_graph

    v, e = corpus_graph(spark, n_repos=20, files_per_repo=50, seed=7)
    m = SubgraphMatcher(spark, v, e)
    try:
        n = m.count(
            {1: 0, 2: 0, 3: 0},
            {(1, 2), (2, 1), (2, 3), (3, 2)},
            pseudo=True,
            prune=True,
        )
    finally:
        m.unpersist()
    return spark.createDataFrame([(n,)], "cnt long")


def q_corpus_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star pipeline, components leg: synthesize the corpus, derive
    the import graph, run kernel hash-min CC, and return the COMPONENT-SIZE
    HISTOGRAM (size, n_components) — id-independent, so the oracle can
    rebuild the abstract (repo, file) graph from the generator's arithmetic
    formula and compare exactly even though Spark's vertex ids are
    xxhash64(repo/path)."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        connected_components,
    )
    from subgraph_isomorphism_pregel_spark.sources.corpus import corpus_graph

    v, e = corpus_graph(spark, n_repos=20, files_per_repo=50, seed=7)
    comp, _ = connected_components(spark, v, e, num_partitions=8)
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").alias("n_components"))
        .orderBy("sz")
    )


def q_corpus_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star pipeline, PageRank leg: synthesize the corpus, derive the
    import graph, run the BSP kernel's PageRank for PR_STEPS fixed steps,
    and return the SCORE HISTOGRAM (round(score, 8), n) — id-independent
    like the components leg, so the oracle rebuilds the abstract (repo,
    file) graph from the generator formula and unrolls the same recurrence
    in SQL. The symmetrized import graph has no dangling vertices (both
    import formulas map some j to itself only disjointly), so the plain
    leak-free recurrence is exact on both sides."""
    from subgraph_isomorphism_pregel_spark.sources.corpus import corpus_graph

    v, e = corpus_graph(spark, n_repos=20, files_per_repo=50, seed=7)
    scores, _ = pagerank(spark, v, e, num_partitions=8, fixed_steps=PR_STEPS)
    return (
        scores.groupBy(F.round("score", 8).alias("score_r"))
        .agg(F.count("*").alias("n"))
        .orderBy("score_r")
    )


def q_corpus_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star pipeline, snapshot-diff leg: synthesize the corpus at TWO
    revisions (rev 1 deterministically rewires the second import of ~10% of
    files — sources/corpus.py _file_row), derive the directed import graph
    at each, and diff them with the single-shuffle graph_diff operator.
    Output is mapped back from xxhash64 file ids to (repo, src_stem,
    dst_stem) strings, so the DuckDB twin can rebuild BOTH revisions'
    edge sets from the generator's arithmetic import formulas and EXCEPT
    them — an independent derivation of the same commit-to-commit delta."""
    from subgraph_isomorphism_pregel_spark.operators.stats import graph_diff
    from subgraph_isomorphism_pregel_spark.sources.corpus import (
        derive_edges,
        derive_files,
        synth_corpus,
    )

    c0 = synth_corpus(spark, n_repos=20, files_per_repo=50, seed=7)
    c1 = synth_corpus(spark, n_repos=20, files_per_repo=50, seed=7, rev=1)
    files = derive_files(c0)  # paths/ids are revision-invariant
    d = graph_diff(derive_edges(c0, files), derive_edges(c1, files))
    s = files.select(
        F.col("file_id").alias("src"), "repo", F.col("stem").alias("src_stem")
    )
    t = files.select(F.col("file_id").alias("dst"), F.col("stem").alias("dst_stem"))
    return (
        d.join(s, "src")
        .join(t, "dst")
        .select("repo", "src_stem", "dst_stem", "change")
        .orderBy("repo", "src_stem", "dst_stem", "change")
    )


def q_license_scan_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance leg of the corpus pipeline: decorate the synthesized
    corpus with deterministic license headers (j%7 picks MIT / Apache-2.0 /
    GPL-3.0 / none — operators/codescan.py with_license_headers), DETECT
    them back from the content text with the codegen header scan, and
    return the license histogram. The DuckDB twin rebuilds the expected
    histogram purely from the j%7 formula, so a detection bug (wrong
    phrase, wrong precedence, scan window too small) changes the counts
    and fails the gate."""
    from subgraph_isomorphism_pregel_spark.operators.codescan import (
        license_detect,
        with_license_headers,
    )
    from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus

    corpus = with_license_headers(synth_corpus(spark, n_repos=20, files_per_repo=50, seed=7))
    return (
        license_detect(corpus)
        .groupBy("license")
        .agg(F.count("*").alias("n_files"))
        .orderBy("license")
    )


def q_secret_scan_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential-leak leg: the decorated corpus plants one AWS-shaped key
    (AKIA + upper(md5(repo/path)[:16])) in every file with j%11==3; the
    regexp_extract_all scan must find exactly those files and nothing
    else. Returns the flagged-file list with per-pattern counts; the
    DuckDB twin reconstructs it from the j%11 formula (repo and path
    rebuilt from the generator's arithmetic: lang = LANGS[(31r+7j+s)%5])."""
    from subgraph_isomorphism_pregel_spark.operators.codescan import (
        secret_scan,
        with_license_headers,
    )
    from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus

    corpus = with_license_headers(synth_corpus(spark, n_repos=20, files_per_repo=50, seed=7))
    return (
        secret_scan(corpus)
        .where(F.col("n_secrets") > 0)
        .select("repo", "path", "n_aws_key", "n_secrets")
        .orderBy("repo", "path")
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance curation end-to-end: decorate the corpus, DETECT
    licenses, keep only permissive files (MIT / Apache-2.0), REDACT
    planted secrets, and re-scan the redacted text. Output per kept
    license: file count, how many files had a secret before redaction,
    and how many still do after (must be 0 — asserted by the oracle
    column, not just a test). Composes license_detect → filter →
    redact_secrets → secret_scan exactly the way a training-data pipeline
    would; every step is codegen in ONE scan-project stage plus the final
    histogram aggregate."""
    from subgraph_isomorphism_pregel_spark.operators.codescan import (
        license_detect,
        redact_secrets,
        secret_scan,
        with_license_headers,
    )
    from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus

    corpus = with_license_headers(synth_corpus(spark, n_repos=20, files_per_repo=50, seed=7))
    lic = license_detect(corpus)
    kept = corpus.join(lic, ["repo", "path"]).where(
        F.col("license").isin("mit", "apache-2.0")
    )
    before = secret_scan(kept).select(
        "repo", "path", F.col("n_secrets").alias("secrets_before")
    )
    after = secret_scan(redact_secrets(kept)).select(
        "repo", "path", F.col("n_secrets").alias("secrets_after")
    )
    return (
        kept.select("repo", "path", "license")
        .join(before, ["repo", "path"])
        .join(after, ["repo", "path"])
        .groupBy("license")
        .agg(
            F.count("*").alias("n_files"),
            F.sum((F.col("secrets_before") > 0).cast("long")).alias("n_had_secret"),
            F.sum((F.col("secrets_after") > 0).cast("long")).alias("n_still_secret"),
        )
        .orderBy("license")
    )


def q_repo_clones_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fork/mirror detection leg: repo-level structural clone pairs over
    the synthesized corpus. The generator makes a repo's structure (path
    set, language pattern, import targets) a pure function of r mod 5, so
    the 20 repos form 5 clone classes of 4 — the DuckDB twin enumerates
    exactly those C(4,2)*5 = 30 pairs from the arithmetic, while the Spark
    side must DERIVE them from the content (regex import extraction →
    per-file structural md5 → order-independent per-repo sum fingerprint →
    fingerprint equi-join)."""
    from subgraph_isomorphism_pregel_spark.operators.codescan import repo_clone_pairs
    from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, n_repos=20, files_per_repo=50, seed=7)
    return repo_clone_pairs(corpus).orderBy("repo_a", "repo_b")


def q_cc_incremental_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CC under the hash gate: cold-label the 17 disjoint
    rings, grow the graph with 4 bridge vertices (vertex n+k merges rings
    2k and 2k+1), warm-restart the flood from ONLY the delta frontier
    (connected_components_warm), and return the component-size histogram.
    The DuckDB twin computes plain recursive-CTE CC on the UNION edge set
    — equality proves the warm path reaches the exact cold fixed point
    through the add_vertices + state0 machinery."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        connected_components,
        connected_components_warm,
    )
    from subgraph_isomorphism_pregel_spark.operators.pagerank import build_parts
    from subgraph_isomorphism_pregel_spark.operators.pregel import add_vertices
    from subgraph_isomorphism_pregel_spark.sources.graph import multi_ring_graph

    P = 8
    v, e = multi_ring_graph(spark, sf_dir, rings=61)
    n = v.count()
    prior, _ = connected_components(spark, v, e, num_partitions=P)
    parts = build_parts(spark, v, e, P)
    nv = spark.createDataFrame([(n + k, 0) for k in range(4)], "id long, label int")
    ne = spark.createDataFrame(
        [(n + k, 2 * k) for k in range(4)]
        + [(2 * k, n + k) for k in range(4)]
        + [(n + k, 2 * k + 1) for k in range(4)]
        + [(2 * k + 1, n + k) for k in range(4)],
        "src long, dst long",
    )
    grown = add_vertices(spark, parts, nv, ne, P)
    touched = spark.createDataFrame(
        sorted({(n + k,) for k in range(4)} | {(j,) for j in range(8)}), "id long"
    )
    comp, _ = connected_components_warm(spark, grown, prior, touched, P)
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").alias("n_components"))
        .orderBy("sz")
    )


def q_sssp_incremental_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental bounded SSSP under the hash gate: cold distances from
    source 0 reach only ring 0; one bridge vertex n (edges to 0 and 1)
    makes ring 1 reachable; sssp_warm re-relaxes from the delta frontier
    only. The DuckDB twin runs the bounded recursive CTE from source 0 on
    the UNION edge set — equality proves warm re-relaxation lands on the
    cold bounded contract exactly (including the output hop-bound
    re-application)."""
    from subgraph_isomorphism_pregel_spark.operators.pagerank import build_parts
    from subgraph_isomorphism_pregel_spark.operators.pregel import add_vertices
    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp, sssp_warm
    from subgraph_isomorphism_pregel_spark.sources.graph import multi_ring_graph

    P = 8
    v, e = multi_ring_graph(spark, sf_dir, rings=61)
    n = v.count()
    prior, _ = sssp(spark, v, e, source=0, max_hops=64, num_partitions=P)
    parts = build_parts(spark, v, e, P)
    nv = spark.createDataFrame([(n, 0)], "id long, label int")
    ne = spark.createDataFrame(
        [(n, 0), (0, n), (n, 1), (1, n)], "src long, dst long"
    )
    grown = add_vertices(spark, parts, nv, ne, P)
    touched = spark.createDataFrame([(0,), (1,), (n,)], "id long")
    dists, _ = sssp_warm(
        spark, grown, prior, touched, source=0, max_hops=64, num_partitions=P
    )
    return dists.orderBy("id")


def q_match_cycle4_semijoin_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cycle-4 with the hub-safe backward-edge plan (left-semi joins against
    the edge table instead of per-vertex collected adjacency arrays)."""
    qv = {1: 0, 2: 1, 3: 2, 4: 3}
    qe = {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)}
    return _count_query(spark, sf_dir, qv, qe, pseudo=False, backward="semijoin")


def q_match_bsp_path3_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-3 through the BSP-kernel matcher (operators/match_bsp.py): the
    same sketch-tree plan run as a vertex program — extension at the parent's
    owner, feasibility at the new vertex's owner — instead of DataFrame
    joins. Counts must equal the join formulation (and this SQL oracle)."""
    from subgraph_isomorphism_pregel_spark.operators.match_bsp import match_count_bsp

    v, e = ring_graph(spark, sf_dir)
    n = match_count_bsp(
        spark, v, e, {1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (2, 3), (3, 2)},
        num_partitions=8,
    )
    return spark.createDataFrame([(n,)], "cnt long")


def q_token_count(spark, sf_dir):
    return token_count(_docs(spark, sf_dir))


def q_text_stats(spark, sf_dir):
    return text_stats(_docs(spark, sf_dir))


def q_langid(spark, sf_dir):
    return langid(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


def q_repetition_score(spark, sf_dir):
    return repetition_score(_docs(spark, sf_dir))


def q_redact_pii(spark, sf_dir):
    """PII scrub over documents SALTED with deterministic synthetic PII
    (email + IPv4 + 10-digit account per row, built identically in the SQL
    twin) so the gate is non-vacuous on the synthetic corpus."""
    from subgraph_isomorphism_pregel_spark.operators.textops import redact_pii

    docs = _docs(spark, sf_dir)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 acct 912345678"),
            (F.col("doc_id") % 10).cast("string"),
        ).alias("text"),
    )
    return redact_pii(salted).orderBy("doc_id")


def q_hll_docs(spark, sf_dir):
    """Deterministic HyperLogLog distinct-text estimate (p=6, 64 registers);
    the oracle twin reproduces the registers AND the IEEE arithmetic exactly."""
    from subgraph_isomorphism_pregel_spark.operators.sketches import hll_distinct

    return hll_distinct(_docs(spark, sf_dir), "text", p=6)


def q_cms_tokens(spark, sf_dir):
    """Count-min-sketch token heavy hitters (d=3, w=256, top 20): even the
    sketch's collision over-counts reproduce in the DuckDB twin."""
    from subgraph_isomorphism_pregel_spark.operators.sketches import cms_heavy_hitters

    return cms_heavy_hitters(_docs(spark, sf_dir))


def q_tfidf_topk(spark, sf_dir):
    return tfidf_topk(_docs(spark, sf_dir))


def q_collocations(spark, sf_dir):
    return collocations(_docs(spark, sf_dir), min_count=5, k=20)


BM25_TERMS = ["spark", "merge", "window", "slow"]
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 15


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-15 documents for a fixed 4-term query — postings
    filtered to the query terms before any shuffle, |Q|-row broadcast df,
    fixed-point per-term sums."""
    from subgraph_isomorphism_pregel_spark.operators.textops import bm25_topk

    return bm25_topk(
        _docs(spark, sf_dir), BM25_TERMS, k=BM25_TOPK, k1=BM25_K1, b=BM25_B
    )


def q_token_entropy(spark, sf_dir):
    from subgraph_isomorphism_pregel_spark.operators.textops import token_entropy

    return token_entropy(_docs(spark, sf_dir))


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights: hashed-unigram log-likelihood ratio of the
    English-document model vs the raw corpus model (target lang = 'en')."""
    from subgraph_isomorphism_pregel_spark.operators.textops import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), target_langs=("en",))


def q_dedup_exact(spark, sf_dir):
    return dedup_exact(_docs(spark, sf_dir))


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine near-dup pairs over documents SALTED with four
    deterministic residue tokens per row (built identically in the SQL
    twin) — the synthetic corpus has a ~31-term vocabulary, so unsalted
    term-space cosine would only ever see the exact-duplicate pairs; the
    salt produces a graded 0.4-0.6 cosine spectrum the threshold cuts
    non-vacuously."""
    from subgraph_isomorphism_pregel_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    docs = _docs(spark, sf_dir)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" q"),
            (F.col("doc_id") % 23).cast("string"),
            F.lit(" r"),
            (F.col("doc_id") % 19).cast("string"),
            F.lit(" s"),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(" u"),
            (F.col("doc_id") % 13).cast("string"),
        ).alias("text"),
    )
    return tfidf_cosine_pairs(salted, threshold=0.35, max_df=60)


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.2)


def q_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_docs(spark, sf_dir), num_hashes=12)


def q_minhash_lsh_pairs(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir), num_hashes=12, bands=4, threshold=0.2)


def q_simhash(spark, sf_dir):
    return simhash(_docs(spark, sf_dir))


def q_cosine_topk(spark, sf_dir):
    return cosine_topk(_emb(spark, sf_dir), k=5, n_queries=20)


def q_embedding_dups(spark, sf_dir):
    return embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.4)


def q_embedding_dups_lsh(spark, sf_dir):
    """The scale path for embedding near-dup: banded hyperplane LSH buckets
    + exact verify inside candidate buckets only (never all-pairs)."""
    return embedding_dup_pairs_lsh(_emb(spark, sf_dir), threshold=0.4)


def q_ann_lsh_topk(spark, sf_dir):
    """ANN top-k restricted to deterministic hyperplane-LSH buckets —
    oracle-checked exactly (quantized int64 dots + md5 Rademacher signs,
    JVM zip_with cosine, row_number rank). The Philox/numpy-GEMM variant
    (lsh_topk) keeps its pytest recall check."""
    return ann_topk_lsh(_emb(spark, sf_dir), k=3, n_planes=6)


def q_dedup_survivors(spark, sf_dir):
    """Survivor selection over MinHash-LSH near-dup pairs: connected
    components (the BSP kernel's hash-min program) over the pair graph;
    canonical = min doc_id of each dup component."""
    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, num_hashes=12, bands=4, threshold=0.2).select(
        "doc_a", "doc_b"
    )
    return dedup_survivors(docs, pairs, num_partitions=8)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN: fixed coarse quantizer (n_lists lowest vec_ids),
    exact int64 assignment distances, n_probe-list candidate scoring —
    the inverted-file counterpart to the hyperplane-LSH path, equally
    oracle-exact."""
    return ivf_topk(_emb(spark, sf_dir), k=3, n_lists=8, n_probe=2)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN: 8 subvector blocks, 8-entry codebooks from
    the smallest vec_ids, exact int64 encode + asymmetric-distance top-k —
    the compressed-domain scale path; codes + ADC distances are
    integer-exact so the oracle replays them bit-for-bit."""
    from subgraph_isomorphism_pregel_spark.operators.similarity import pq_topk

    return pq_topk(_emb(spark, sf_dir), k=3, m_sub=8, k_codes=8, n_queries=20)


def q_media_meta(spark, sf_dir):
    """Multimodal binary-column plumbing, driver-gated: text payloads ride
    as binary, metadata extracted by the Arrow-batched mapInPandas decoder
    (deterministic stub decode — real decode needs PIL/ffmpeg)."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        attach_binary,
        extract_media_meta,
    )

    return extract_media_meta(attach_binary(_docs(spark, sf_dir))).orderBy("media_id")


def q_media_meta_png(spark, sf_dir):
    """REAL PNG header decode: deterministic minimal PNGs synthesized from
    doc_id (valid IHDR chunk + CRC32s), then width/height parsed back from
    the BYTES with stdlib struct — the oracle recomputes the dims from the
    generator formula instead, so a parse bug cannot cancel out."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        extract_media_meta,
        synth_png,
    )

    return (
        extract_media_meta(synth_png(_docs(spark, sf_dir)))
        .select("media_id", "n_bytes", "width", "height", "format")
        .orderBy("media_id")
    )


def q_media_meta_jpeg(spark, sf_dir):
    """REAL JPEG frame-header decode: deterministic minimal JPEGs (SOI +
    JFIF APP0 + SOF0 + EOI) synthesized from doc_id, then width/height
    parsed back from the BYTES via a marker-segment walk — the oracle
    recomputes the dims from the generator formula instead, so a parse bug
    cannot cancel out."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        extract_media_meta,
        synth_jpeg,
    )

    return (
        extract_media_meta(synth_jpeg(_docs(spark, sf_dir)))
        .select("media_id", "n_bytes", "width", "height", "format")
        .orderBy("media_id")
    )


def q_media_meta_gif(spark, sf_dir):
    """REAL GIF header decode: deterministic minimal GIFs (GIF89a signature
    + logical screen descriptor + trailer) synthesized from doc_id, then
    width/height parsed back from the LSD BYTES with stdlib struct — the
    oracle recomputes the dims from the generator formula instead, so a
    parse bug cannot cancel out."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        extract_media_meta,
        synth_gif,
    )

    return (
        extract_media_meta(synth_gif(_docs(spark, sf_dir)))
        .select("media_id", "n_bytes", "width", "height", "format")
        .orderBy("media_id")
    )


def q_bmp_pixel_stats(spark, sf_dir):
    """REAL image PIXEL decode (not just headers): synth_bmp embeds a
    closed-form RGB gradient in a true 24-bit uncompressed BMP (bottom-up
    rows, 4-byte stride padding); decode_bmp_stats parses the headers with
    stdlib struct, reinterprets the pixel rows with numpy, and reduces to
    exact int64 channel sums PLUS position-weighted sums (weight = y*W + x,
    top-down) that are sensitive to row order and stride. The oracle never
    sees the bytes — it re-enumerates every pixel from the generator
    formula with generate_series cross joins and aggregates in SQL, so a
    flip/stride/padding bug cannot cancel against itself."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        decode_bmp_stats,
        synth_bmp,
    )

    return decode_bmp_stats(synth_bmp(_docs(spark, sf_dir))).orderBy("media_id")


def q_bmp_resize4(spark, sf_dir):
    """REAL image resize: nearest-neighbor 4x4 downsample of the decoded
    BMP pixels, emitted as a deterministic RGB CSV (the engine-portable
    array convention). The oracle recomputes the sampled coordinates
    (floor(i*W/4), floor(j*H/4)) and channel values from the generator
    formula and string-aggregates them in the same (j, i, rgb) order."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        resize_bmp_nearest,
        synth_bmp,
    )

    return resize_bmp_nearest(synth_bmp(_docs(spark, sf_dir)), 4, 4).orderBy(
        "media_id"
    )


def q_audio_meta_wav(spark, sf_dir):
    """REAL WAV header decode: deterministic minimal PCM RIFF/WAVE files
    synthesized from doc_id, then channels / sample_rate / bit depth /
    sample count parsed back from the chunk structure — the oracle
    recomputes every field from the generator formula instead."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        extract_audio_meta,
        synth_wav,
    )

    return extract_audio_meta(synth_wav(_docs(spark, sf_dir))).orderBy("media_id")


def q_audio_features_wav(spark, sf_dir):
    """REAL PCM SAMPLE decode (not just headers): synth_wav embeds an
    int16-LE waveform value[i] = (id*31 + i*17) % 2001 - 1000 in the data
    chunk; extract_audio_features reinterprets the chunk as a numpy <i2
    array and reduces it to exact integer aggregates (sum of squares, peak
    |amplitude|, strict zero crossings) + IEEE rms. The oracle never sees
    the bytes — it regenerates every sample from the closed form with
    generate_series and aggregates in SQL, so a decode bug (wrong offset,
    wrong endianness, wrong width) cannot cancel against itself."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        extract_audio_features,
        synth_wav,
    )

    return extract_audio_features(synth_wav(_docs(spark, sf_dir))).orderBy("media_id")


def q_frame_sample(spark, sf_dir):
    """Video-style frame sampling plumbing: chunk each binary payload into
    fixed 32-byte frames JVM-side (array-expression explode, no Python in
    the hot path) and keep every 2nd frame; content is verified by hex,
    not just shape. The synthetic corpus is pure ASCII (bytes == chars),
    so the oracle's character-slice equals the byte slice."""
    from subgraph_isomorphism_pregel_spark.operators.multimodal import (
        attach_binary,
        frame_sample,
    )

    fr = frame_sample(attach_binary(_docs(spark, sf_dir)), frame_bytes=32, stride=2)
    return fr.select(
        "media_id",
        "frame_no",
        F.length("frame").alias("n_bytes"),
        F.hex("frame").alias("frame_hex"),
    ).orderBy("media_id", "frame_no")


def q_stream_dedup(spark, sf_dir):
    """Ingestion dedup on (user_id, event_type, hour bucket): the batch
    twin of streaming dropDuplicatesWithinWatermark (bounded state under a
    watermark — the streaming path is exercised in pytest with a replayed
    source). Non-vacuous: the events table collapses under this key."""
    from subgraph_isomorphism_pregel_spark.streaming.dedup_stream import dedup_events

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dedup_events(ev).orderBy("user_id", "event_type", "bucket_ts")


def q_sessionize_events(spark, sf_dir):
    from subgraph_isomorphism_pregel_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_minutes=30)


def q_sessionize_native(spark, sf_dir):
    """Sessionization via Spark's built-in session_window (streaming-ready
    form; same split-on->gap convention as the lag-cumsum form)."""
    from subgraph_isomorphism_pregel_spark.operators.sessions import (
        sessionize_native,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_native(ev, gap_minutes=30)


def q_icetable_docs(spark, sf_dir):
    """Iceberg-style source, driver-gated: write documents as a lang-
    partitioned snapshot table (even doc_ids = snapshot 1, odd appended as
    snapshot 2), then read back through the manifest — time travel to
    snapshot 1 AND a planning-time-pruned read of lang='en' at the current
    snapshot. Aggregates must equal the same SQL over the original table:
    verifies the write/append/manifest round trip, snapshot isolation, and
    pruning correctness (the pruned read still sees BOTH halves)."""
    import shutil
    import tempfile

    from subgraph_isomorphism_pregel_spark.sources.icetable import (
        append_table,
        read_table,
        write_table,
    )

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="icetable_gate_")
    try:
        write_table(docs.where(F.col("doc_id") % 2 == 0), path, partition_by="lang")
        append_table(docs.where(F.col("doc_id") % 2 == 1), path)

        def agg(df, snap):
            return df.groupBy("lang").agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum("doc_id").alias("sum_id"),
            ).select(F.lit(snap).alias("snap"), "lang", "n_docs", "total_chars", "sum_id")

        out = agg(read_table(spark, path, snapshot_id=1), "snap1").unionByName(
            agg(read_table(spark, path, partition_filter="en"), "current_en")
        ).orderBy("snap", "lang")
        # materialize before the table files are removed (result is tiny)
        rows = out.collect()
        return spark.createDataFrame(
            rows, "snap string, lang string, n_docs long, total_chars long, sum_id long"
        ).orderBy("snap", "lang")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_match_embeddings_path3_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerate (not just count) path-3 matches — checks the embedding rows."""
    m = _ring_matcher(spark, sf_dir)
    return m.embeddings({1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (2, 3), (3, 2)})


def q_match_embeddings_factorized_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed (branch-factorized) materialization expanded back to flat
    rows — a path whose ENDPOINTS share a label, so the expansion's
    cross-branch inequality filter (u_1 <> u_3) is load-bearing."""
    m = _ring_matcher(spark, sf_dir)
    fe = m.embeddings_factorized({1: 0, 2: 1, 3: 0}, {(1, 2), (2, 1), (2, 3), (3, 2)})
    assert fe is not None  # the path splits at its middle vertex
    return fe.expand().select("u_1", "u_2", "u_3")


def q_windowed_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_counts(ev).orderBy("window_start", "event_type")


def q_attrib_join_events(spark, sf_dir):
    """Click->purchase attribution: the stream-stream interval join's batch
    twin (same expression; the streaming AvailableNow drain is asserted
    bit-equal to this in pytest). Inclusive 6-hour window per user; exact
    integer-microsecond delays."""
    from subgraph_isomorphism_pregel_spark.streaming.interval_join import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    return interval_join(clicks, purchases, tolerance="6 hours").orderBy(
        "left_id", "right_id"
    )


SEQ_PACK_CAP = 200  # context-window token budget (median doc is ~56 tokens)
SEQ_PACK_SHARDS = 8


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic next-fit sequence packing of the corpus into
    200-token context windows, sharded by md5 bucket — the GPU-batch
    preparation step of a pre-training pipeline."""
    from subgraph_isomorphism_pregel_spark.operators.packing import pack_documents

    return pack_documents(
        _docs(spark, sf_dir),
        capacity=SEQ_PACK_CAP,
        n_shards=SEQ_PACK_SHARDS,
        salt=SPLIT_SALT,
    ).orderBy("doc_id")


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard fill-ratio report over the gated packing run — the waste
    metric a packing job publishes."""
    from subgraph_isomorphism_pregel_spark.operators.packing import (
        pack_documents,
        packing_efficiency,
    )

    packed = pack_documents(
        _docs(spark, sf_dir),
        capacity=SEQ_PACK_CAP,
        n_shards=SEQ_PACK_SHARDS,
        salt=SPLIT_SALT,
    )
    return packing_efficiency(packed, SEQ_PACK_CAP)


def _qf_salted(docs: DataFrame) -> DataFrame:
    """The synthetic corpus is too clean to trip most quality rules (no
    punctuation, no long docs), so the gated query deterministically
    degrades text by doc_id class — same construction in the SQL twin
    (the redact_pii salting pattern) — making every flag non-vacuous."""
    m = F.col("doc_id") % 5
    salted = (
        F.when(m == 0, F.lit("one two"))
        .when(m == 1, F.concat(F.col("text"), F.repeat(F.lit(" ;;!?."), 40)))
        .when(m == 2, F.repeat(F.lit("alpha beta gamma "), 30))
        .when(m == 3, F.repeat(F.lit("w "), 6000))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", salted.alias("text"))


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite pre-training filter over the salted corpus:
    five boolean rules + the keep verdict, all pure codegen."""
    from subgraph_isomorphism_pregel_spark.operators.textops import quality_filter

    return quality_filter(_qf_salted(_docs(spark, sf_dir))).orderBy("doc_id")


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenization counts; the corpus text is salted
    with deterministic digits/marks (` v<doc_id>.0 #tag!`) so the digit
    and mark counters are non-vacuous on the punctuation-free fixture."""
    from subgraph_isomorphism_pregel_spark.operators.textops import token_count_bpe

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" v"),
            F.col("doc_id").cast("string"),
            F.lit(".0 #tag!"),
        ).alias("text"),
    )
    return token_count_bpe(docs).orderBy("doc_id")


BPE_MERGES = 8

PIPE_DUP_MOD = 3  # doc triples share the leader's text (exact dupes)
PIPE_JUNK_MOD = 7  # junk classes trip the quality rules


def q_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pre-training data pipeline over one deterministic
    corpus variant: share each doc triple's leader text (planting exact
    duplicates), degrade two doc_id classes (planting quality rejects),
    then run quality_filter -> keep, exact-dedup survivor selection
    (min doc_id per md5), and context-window chunking — three engine
    operators composed as one lazy plan; the SQL twin chains the same
    stage CTEs. Output: (doc_id, chunk_id, n_tokens) of the surviving
    corpus."""
    from subgraph_isomorphism_pregel_spark.operators.textops import (
        chunk_documents,
        quality_filter,
    )

    docs = _docs(spark, sf_dir)
    leader = docs.select(
        F.col("doc_id").alias("lead_id"), F.col("text").alias("lead_text")
    )
    shared = docs.select(
        "doc_id",
        (F.col("doc_id") - F.col("doc_id") % PIPE_DUP_MOD).alias("lead_id"),
    ).join(leader, "lead_id")
    m = F.col("doc_id") % PIPE_JUNK_MOD
    src = shared.select(
        "doc_id",
        F.when(m == 3, F.lit("one two"))
        .when(m == 5, F.concat(F.col("lead_text"), F.repeat(F.lit(" ;;!?."), 40)))
        .otherwise(F.col("lead_text"))
        .alias("text"),
    )
    kept = quality_filter(src).where("keep").select("doc_id")
    kdocs = src.join(kept, "doc_id", "left_semi")
    surv = kdocs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    sdocs = kdocs.join(surv.select("doc_id"), "doc_id", "left_semi")
    return (
        chunk_documents(sdocs, max_tokens=CHUNK_MAX_TOKENS, overlap=CHUNK_OVERLAP)
        .select("doc_id", "chunk_id", "n_tokens")
        .orderBy("doc_id", "chunk_id")
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary training on the documents table —
    BPE_MERGES merge rounds over the word-frequency table; the learned
    merge list (rank, left, right, freq) is deterministic (argmax by
    freq DESC, left, right) and the SQL twin replays every round
    through the same bracketed-string replace semantics."""
    from subgraph_isomorphism_pregel_spark.operators.bpe import bpe_train

    mdf, _ = bpe_train(_docs(spark, sf_dir), BPE_MERGES)
    return mdf.orderBy("rank")


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram log-probability of each doc under the corpus's own
    unigram distribution (fixed-point order-independent aggregation)."""
    from subgraph_isomorphism_pregel_spark.operators.textops import lm_score

    return lm_score(_docs(spark, sf_dir)).orderBy("doc_id")


HYPERBALL_R = 3  # ball radius
HYPERBALL_P = 4  # HLL precision (16 registers/vertex)


def q_hyperball_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood-size estimates |B(v, 3)| on the ring graph —
    per-vertex HLL registers iterated on the kernel; the oracle rebuilds
    every register from the exact 3-hop balls."""
    from subgraph_isomorphism_pregel_spark.operators.hyperball import hyperball

    v, e = ring_graph(spark, sf_dir)
    est, _ = hyperball(
        spark, v, e, radius=HYPERBALL_R, p=HYPERBALL_P, num_partitions=8
    )
    return est.orderBy("id")


EFFDIAM_ALPHA = 0.9


def q_effdiam_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF effective diameter of the ring graph at alpha=0.9 over the
    radius-3 neighborhood function (interpolated)."""
    from subgraph_isomorphism_pregel_spark.operators.hyperball import (
        effective_diameter,
    )

    v, e = ring_graph(spark, sf_dir)
    out, _ = effective_diameter(
        spark, v, e, radius=HYPERBALL_R, p=HYPERBALL_P,
        alpha=EFFDIAM_ALPHA, num_partitions=8,
    )
    return out


def q_neighborhood_fn_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF neighborhood function N(1..3) on the ring graph — the
    per-round ball-mass totals captured through the kernel stats fold in
    exact int64 micro-units."""
    from subgraph_isomorphism_pregel_spark.operators.hyperball import (
        neighborhood_function,
    )

    v, e = ring_graph(spark, sf_dir)
    nf, _ = neighborhood_function(
        spark, v, e, radius=HYPERBALL_R, p=HYPERBALL_P, num_partitions=8
    )
    return nf.orderBy("r")


GAPFILL_BUCKET_S = 900  # ~50% of 15-min buckets are gaps at sf0.01


def q_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-type event series with LOCF values — every bucket
    between each type's first and last observation, missing ones filled
    from the previous bucket."""
    from subgraph_isomorphism_pregel_spark.operators.timeagg import gapfill_locf

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return gapfill_locf(ev, bucket_seconds=GAPFILL_BUCKET_S)


def q_gapfill_interp_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-type event series with LINEAR interpolation between
    the nearest observed buckets — gapfill's other standard mode."""
    from subgraph_isomorphism_pregel_spark.operators.timeagg import (
        gapfill_interpolate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return gapfill_interpolate(ev, bucket_seconds=GAPFILL_BUCKET_S)


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: users completing each
    prefix in strict time order, with conversion rates vs step 1."""
    from subgraph_isomorphism_pregel_spark.operators.funnel import funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(ev, steps=FUNNEL_STEPS)


def q_markov_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types along each
    user's time-ordered sequence (row-normalized, ties on event_id)."""
    from subgraph_isomorphism_pregel_spark.operators.funnel import markov_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return markov_transitions(ev)


def q_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: distinct users active at each epoch-day offset
    from their cohort (first-event) day."""
    from subgraph_isomorphism_pregel_spark.operators.funnel import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev)


def q_anomalies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (>3 population sigmas) via exact
    integer moments — the telemetry outlier screen."""
    from subgraph_isomorphism_pregel_spark.operators.stats import zscore_anomalies

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return zscore_anomalies(ev, threshold=3.0, quant_scale=100)


DECONTAM_MOD = 37  # doc_id % MOD == 0 plays the benchmark/eval set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 37 == 0 play the eval
    set; every other doc reports its shared-3-gram hit count and verdict."""
    from subgraph_isomorphism_pregel_spark.operators.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    bm = docs.where(F.col("doc_id") % DECONTAM_MOD == 0)
    tr = docs.where(F.col("doc_id") % DECONTAM_MOD != 0)
    return decontaminate(tr, bm, k=3).orderBy("doc_id")


EIGEN_STEPS = 5


def q_eigencentrality_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality (normalized power iteration on the kernel)
    over the symmetric ring graph, EIGEN_STEPS iterations, rounded 8dp
    like the other power-iteration gates."""
    from subgraph_isomorphism_pregel_spark.operators.eigen import eigencentrality

    v, e = ring_graph(spark, sf_dir)
    scores, _ = eigencentrality(
        spark, v, e, steps=EIGEN_STEPS, num_partitions=16
    )
    return scores.select("id", F.round("score", 8).alias("score_r")).orderBy("id")


BUILD_ORDER_GROUP = 200  # dag_cycles fixture group size for the gated peel


def q_build_order_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-order layering of a CYCLIC dependency graph: SCC condensation
    (kernel forward-backward coloring) + longest-path levels on the
    condensation (kernel max-plus) — every vertex gets (comp, wave)."""
    from subgraph_isomorphism_pregel_spark.operators.toposort import build_order
    from subgraph_isomorphism_pregel_spark.sources.graph import dag_cycles_graph

    v, e = dag_cycles_graph(spark, sf_dir, group=BUILD_ORDER_GROUP)
    out, _ = build_order(spark, v, e, num_partitions=4, max_rounds=40)
    return out.orderBy("id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to 1e-6 convergence on the sf0.001 supply graph."""
    sf_dir = "/root/testdata/sf0.001"
    v, e = supply_graph(spark, sf_dir)
    scores, _ = pagerank(spark, v, e, num_partitions=8, tol=1e-6)
    return scores.orderBy(F.desc("score"), F.asc("id")).limit(20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_supply": q_pagerank_supply,
        "ppr_supply": q_ppr_supply,
        "hits_supply": q_hits_supply,
        "docs_split": q_docs_split,
        "docs_stratified": q_docs_stratified,
        "docs_hash_topk": q_docs_hash_topk,
        "seq_pack": q_seq_pack,
        "pack_efficiency": q_pack_efficiency,
        "quality_filter": q_quality_filter,
        "token_count_bpe": q_token_count_bpe,
        "bpe_merges": q_bpe_merges,
        "pipeline_docs": q_pipeline_docs,
        "lm_score": q_lm_score,
        "eigencentrality_ring": q_eigencentrality_ring,
        "decontaminate": q_decontaminate,
        "gapfill_events": q_gapfill_events,
        "gapfill_interp_events": q_gapfill_interp_events,
        "funnel_events": q_funnel_events,
        "markov_events": q_markov_events,
        "retention_events": q_retention_events,
        "anomalies_events": q_anomalies_events,
        "hyperball_ring": q_hyperball_ring,
        "neighborhood_fn_ring": q_neighborhood_fn_ring,
        "effdiam_ring": q_effdiam_ring,
        "build_order_dag": q_build_order_dag,
        "kmeans_embeddings": q_kmeans_embeddings,
        "adamic_adar_supply": q_adamic_adar_supply,
        "jaccard_links_supply": q_jaccard_links_supply,
        "copurchase_graph": q_copurchase_graph,
        "rich_club_supply": q_rich_club_supply,
        "walks_ring": q_walks_ring,
        "node2vec_ring": q_node2vec_ring,
        "quantize_embeddings": q_quantize_embeddings,
        "clustering_coeff_ring": q_clustering_coeff_ring,
        "khop_sample_ring": q_khop_sample_ring,
        "mis_ring": q_mis_ring,
        "mst_ring": q_mst_ring,
        "matching_ring": q_matching_ring,
        "coloring_ring": q_coloring_ring,
        "louvain_ring": q_louvain_ring,
        "chunk_docs": q_chunk_docs,
        "mixture_docs": q_mixture_docs,
        "dedup_spans": q_dedup_spans,
        "densest_ring_core": q_densest_ring_core,
        "shuffle_shards_docs": q_shuffle_shards,
        "asof_events": q_asof_events,
        "asof_events_forward": q_asof_events_forward,
        "range_join_events": q_range_join_events,
        "time_rollup_events": q_time_rollup_events,
        "cube_events": q_cube_events,
        "zorder_events": q_zorder_events,
        "stream_rollup": q_stream_rollup,
        "bloom_docs": q_bloom_docs,
        "wsssp_ring": q_wsssp_ring,
        "scc_dag_cycles": q_scc_dag_cycles,
        "bipartite_rings": q_bipartite_rings,
        "butterflies_supply": q_butterflies_supply,
        "landmarks_ring": q_landmarks_ring,
        "harmonic_ring": q_harmonic_ring,
        "closeness_ring": q_closeness_ring,
        "wl_colors_ring": q_wl_colors_ring,
        "betweenness_ring": q_betweenness_ring,
        "ktruss_ring": q_ktruss_ring,
        "doc_quantiles": q_doc_quantiles,
        "graph_stats_ring": q_graph_stats_ring,
        "wpagerank_ring": q_wpagerank_ring,
        "katz_ring": q_katz_ring,
        "negative_edges_ring": q_negative_edges_ring,
        "components_supply": q_components_supply,
        "labelprop_supply": q_labelprop_supply,
        "modularity_supply": q_modularity_supply,
        "sssp_supply": q_sssp_supply,
        "kcore_supply": q_kcore_supply,
        "coreness_supply": q_coreness_supply,
        "onion_coreness_supply": q_onion_coreness_supply,
        "degree_distribution_supply": q_degree_supply,
        "triangles_ring": q_triangles_ring,
        "rectangles_ring": q_rectangles_ring,
        "kclique4_ring": q_kclique4_ring,
        "match_path3_ring": q_match_path3_ring,
        "match_triangle_ring": q_match_triangle_ring,
        "match_cycle4_ring": q_match_cycle4_ring,
        "match_star_pseudo_ring": q_match_star_pseudo_ring,
        "match_path3_pruned_ring": q_match_path3_pruned_ring,
        "match_acbc_ring": q_match_acbc_ring,
        "match_twin_leaves_ring": q_match_twin_leaves_ring,
        "match_triple_deferred_ring": q_match_triple_deferred_ring,
        "match_quad_deferred_ring": q_match_quad_deferred_ring,
        "match_factorized_twin_paths_ring": q_match_factorized_twin_paths_ring,
        "match_star_of_stars_ring": q_match_star_of_stars_ring,
        "match_corpus_wedge": q_match_corpus_wedge,
        "corpus_components": q_corpus_components,
        "corpus_graph_diff": q_corpus_graph_diff,
        "corpus_pagerank": q_corpus_pagerank,
        "license_scan_corpus": q_license_scan_corpus,
        "secret_scan_corpus": q_secret_scan_corpus,
        "repo_clones_corpus": q_repo_clones_corpus,
        "corpus_curation": q_corpus_curation,
        "cc_incremental_rings": q_cc_incremental_rings,
        "sssp_incremental_rings": q_sssp_incremental_rings,
        "match_cycle4_semijoin_ring": q_match_cycle4_semijoin_ring,
        "match_bsp_path3_ring": q_match_bsp_path3_ring,
        "token_count": q_token_count,
        "text_stats": q_text_stats,
        "langid": q_langid,
        "fingerprint": q_fingerprint,
        "repetition_score": q_repetition_score,
        "hll_docs": q_hll_docs,
        "cms_tokens": q_cms_tokens,
        "redact_pii": q_redact_pii,
        "tfidf_topk": q_tfidf_topk,
        "bm25_topk": q_bm25_topk,
        "collocations": q_collocations,
        "token_entropy": q_token_entropy,
        "dsir_weights": q_dsir_weights,
        "dedup_exact": q_dedup_exact,
        "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
        "dedup_survivors": q_dedup_survivors,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "embedding_dups": q_embedding_dups,
        "embedding_dups_lsh": q_embedding_dups_lsh,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "pq_topk": q_pq_topk,
        "media_meta": q_media_meta,
        "media_meta_png": q_media_meta_png,
        "media_meta_jpeg": q_media_meta_jpeg,
        "media_meta_gif": q_media_meta_gif,
        "bmp_pixel_stats": q_bmp_pixel_stats,
        "bmp_resize4": q_bmp_resize4,
        "audio_meta_wav": q_audio_meta_wav,
        "audio_features_wav": q_audio_features_wav,
        "frame_sample": q_frame_sample,
        "stream_dedup": q_stream_dedup,
        "icetable_docs": q_icetable_docs,
        "windowed_events": q_windowed_events,
        "attrib_join_events": q_attrib_join_events,
        "sessionize_events": q_sessionize_events,
        "sessionize_native": q_sessionize_native,
        "match_embeddings_path3_ring": q_match_embeddings_path3_ring,
        "match_embeddings_factorized_ring": q_match_embeddings_factorized_ring,
    }


# ------------------------------------------------------------- oracle SQL

# shared CTE fragments
SUPPLY_EDGES = """
base AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst FROM lineitem),
edges AS MATERIALIZED (SELECT src, dst FROM base UNION SELECT dst AS src, src AS dst FROM base),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges)
"""

RING_GRAPH = """
nn AS (SELECT count(*) AS n FROM part),
ids AS (SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS i FROM part),
raw AS (
  SELECT i AS src, (i + 1) % (SELECT n FROM nn) AS dst FROM ids
  UNION ALL SELECT i, (i + 2) % (SELECT n FROM nn) FROM ids
  UNION ALL SELECT i, (i * 5 + 3) % (SELECT n FROM nn) FROM ids),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM raw UNION SELECT dst AS src, src AS dst FROM raw) t
  WHERE src <> dst),
rv AS MATERIALIZED (SELECT i AS id, CAST(i % 4 AS INT) AS label FROM ids)
"""

DOC_WORDS = """
w AS (SELECT doc_id, text,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS words
      FROM documents)
"""

SHINGLES = (
    DOC_WORDS
    + """,
gs AS (SELECT unnest(range(1, (SELECT max(greatest(len(words) - 2, 1)) FROM w) + 1)) AS i),
sh AS MATERIALIZED (SELECT DISTINCT doc_id,
              concat_ws(' ', words[i], words[i+1], words[i+2]) AS s
       FROM w, gs
       WHERE len(words) > 0 AND i <= greatest(len(words) - 2, 1))
"""
)

EMB_PAIRS = """
gs AS (SELECT unnest(range(1, (SELECT max(len(embedding)) FROM embeddings) + 1)) AS i),
p AS MATERIALIZED (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, gs WHERE i <= len(embedding)),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS norm FROM p GROUP BY vec_id)
"""


def _pagerank_sql() -> str:
    d, steps = 0.85, PR_STEPS
    ctes = [
        SUPPLY_EDGES.strip().rstrip(","),
        "deg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY src)",
        "nv AS (SELECT count(*) AS n FROM verts)",
        "r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nv) AS score FROM verts)",
    ]
    for t in range(1, steps + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT v.id,
         {1 - d} / (SELECT n FROM nv) + {d} * coalesce(s.contrib, 0) AS score
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, sum(r.score / dg.outdeg) AS contrib
    FROM r{t - 1} r JOIN edges e ON r.id = e.src JOIN deg dg ON dg.id = e.src
    GROUP BY e.dst) s ON v.id = s.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(score, 8) AS score_r FROM r{steps} ORDER BY id"
    )


def _corpus_pagerank_sql() -> str:
    """Corpus-PageRank oracle: rebuild the abstract (repo, file) import
    graph from the generator's arithmetic formula (the match_corpus_wedge /
    corpus_components CTEs), unroll the same fixed-step recurrence as
    _pagerank_sql over (r, j) keys, and compare the id-independent score
    histogram. No dangling term: the symmetrized graph has outdeg >= 1
    everywhere."""
    d, steps, n = 0.85, PR_STEPS, 20 * 50
    ctes = [
        "rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j))",
        """raw AS (SELECT r, j AS sj, (j*7 + 1 + 7) % 50 AS dj FROM rj
        UNION
        SELECT r, j, (j*13 + 5 + 7) % 50 FROM rj)""",
        "dir AS (SELECT r, sj, dj FROM raw WHERE sj <> dj)",
        """edges AS MATERIALIZED (
  SELECT r, sj, dj FROM dir UNION SELECT r, dj AS sj, sj AS dj FROM dir)""",
        "deg AS (SELECT r, sj, count(*) AS outdeg FROM edges GROUP BY r, sj)",
        f"r0 AS MATERIALIZED (SELECT r, j, 1.0 / {n} AS score FROM rj)",
    ]
    for t in range(1, steps + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT v.r, v.j,
         {1 - d} / {n} + {d} * coalesce(s.contrib, 0) AS score
  FROM rj v LEFT JOIN (
    SELECT e.r, e.dj AS j, sum(p.score / dg.outdeg) AS contrib
    FROM r{t - 1} p
    JOIN edges e ON p.r = e.r AND p.j = e.sj
    JOIN deg dg ON dg.r = e.r AND dg.sj = e.sj
    GROUP BY e.r, e.dj) s ON v.r = s.r AND v.j = s.j)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT round(score, 8) AS score_r, count(*) AS n
FROM r{steps} GROUP BY score_r ORDER BY score_r"""
    )


def _ppr_sql() -> str:
    """Personalized PageRank oracle: teleport uniform over the PPR_SEEDS
    smallest ids, dangling mass returned to the seeds — the same recurrence
    as ppr_program, iterated the same fixed PR_STEPS times."""
    d, steps, s = 0.85, PR_STEPS, PPR_SEEDS
    ctes = [
        SUPPLY_EDGES.strip().rstrip(","),
        "deg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY src)",
        f"seeds AS (SELECT id FROM verts ORDER BY id LIMIT {s})",
        f"""tele AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN v.id IN (SELECT id FROM seeds)
              THEN CAST({1.0 / s!r} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS t
  FROM verts v)""",
        "r0 AS MATERIALIZED (SELECT id, t AS score FROM tele)",
    ]
    for t in range(1, steps + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT v.id,
         ({1 - d} + {d} * dang.m) * v.t + {d} * coalesce(s.contrib, 0) AS score
  FROM tele v
  CROSS JOIN (SELECT coalesce(sum(r2.score), 0) AS m FROM r{t - 1} r2
              WHERE r2.id NOT IN (SELECT id FROM deg)) dang
  LEFT JOIN (
    SELECT e.dst AS id, sum(r.score / dg.outdeg) AS contrib
    FROM r{t - 1} r JOIN edges e ON r.id = e.src JOIN deg dg ON dg.id = e.src
    GROUP BY e.dst) s ON v.id = s.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(score, 8) AS score_r FROM r{steps} ORDER BY id"
    )


def _clustering_coeff_sql() -> str:
    """Triangle corners (the triangles_ring oracle) + degree + the
    C(deg,2) division — operators/triangles.py::clustering_coefficient."""
    return f"""
WITH {{RING}},
tri AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM edges a JOIN edges b ON a.dst = b.src JOIN edges c ON b.dst = c.src AND c.dst = a.src
  WHERE a.src < a.dst AND a.dst < b.dst),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
tcount AS (SELECT id, count(*) AS c FROM corners GROUP BY id),
deg AS (SELECT src AS id, count(*) AS deg FROM (SELECT DISTINCT src, dst FROM edges WHERE src <> dst) GROUP BY src)
SELECT v.id,
       coalesce(d.deg, 0) AS deg,
       coalesce(t.c, 0) AS tri,
       CASE WHEN coalesce(d.deg, 0) >= 2
            THEN round(coalesce(t.c, 0) / (d.deg * (d.deg - 1) / 2.0), 6)
            ELSE 0.0 END AS coeff_r
FROM rv v LEFT JOIN tcount t ON v.id = t.id LEFT JOIN deg d ON v.id = d.id
ORDER BY v.id""".replace("{RING}", RING_GRAPH.strip().rstrip(","))


def _wpagerank_sql() -> str:
    """Weighted PageRank oracle: transition mass score/wsum * w per edge
    (the exact operand order the kernel's scatter uses), unrolled PR_STEPS
    times on the ring graph; no dangling term (every ring vertex has
    out-weight)."""
    d, steps = 0.85, PR_STEPS
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "wdeg AS (SELECT src AS id, sum((src + dst) % 7 + 1) AS wsum FROM edges GROUP BY src)",
        "nv AS (SELECT count(*) AS n FROM rv)",
        "r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nv) AS score FROM rv)",
    ]
    for t in range(1, steps + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT v.id,
         {1 - d} / (SELECT n FROM nv) + {d} * coalesce(s.contrib, 0) AS score
  FROM rv v LEFT JOIN (
    SELECT e.dst AS id,
           sum(r.score / wd.wsum * ((e.src + e.dst) % 7 + 1)) AS contrib
    FROM r{t - 1} r JOIN edges e ON r.id = e.src JOIN wdeg wd ON wd.id = e.src
    GROUP BY e.dst) s ON v.id = s.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(score, 8) AS score_r FROM r{steps} ORDER BY id"
    )


def _katz_sql() -> str:
    """Katz oracle: integer path counts n_t unrolled KATZ_STEPS times over
    the ring edges (BIGINT sums — order-free exact), accumulator folded in
    the SAME fixed order as katz_program (alpha^t literals are the very
    Python doubles the kernel multiplies by), so the doubles match
    bit-for-bit."""
    steps = KATZ_STEPS
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "n0 AS MATERIALIZED (SELECT id, CAST(1 AS BIGINT) AS cnt FROM rv)",
        "a0 AS MATERIALIZED (SELECT id, CAST(0 AS DOUBLE) AS acc FROM rv)",
    ]
    for t in range(1, steps + 1):
        a_t = KATZ_ALPHA**t
        ctes.append(
            f"""n{t} AS MATERIALIZED (
  SELECT v.id, CAST(coalesce(s.cnt, 0) AS BIGINT) AS cnt
  FROM rv v LEFT JOIN (
    SELECT e.dst AS id, sum(n.cnt) AS cnt
    FROM n{t - 1} n JOIN edges e ON n.id = e.src
    GROUP BY e.dst) s ON v.id = s.id)"""
        )
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT a.id, a.acc + {a_t!r} * CAST(n.cnt AS DOUBLE) AS acc
  FROM a{t - 1} a JOIN n{t} n ON a.id = n.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, acc AS score FROM a{steps} ORDER BY id"
    )


def _graph_stats_sql() -> str:
    return f"""
WITH {RING_GRAPH.strip().rstrip(',')},
e2 AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
deg AS (SELECT src AS id, count(*) AS deg FROM e2 GROUP BY src),
verts2 AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
recip AS (SELECT count(*) AS c FROM e2 a
          WHERE EXISTS (SELECT 1 FROM e2 b WHERE b.src = a.dst AND b.dst = a.src)),
dd AS (SELECT dx.deg AS dx, coalesce(dy.deg, 0) AS dy
       FROM e2 JOIN deg dx ON e2.src = dx.id LEFT JOIN deg dy ON e2.dst = dy.id),
agg AS (SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
               sum(dx * dy) AS sxy, sum(dx * dx) AS sxx, sum(dy * dy) AS syy
        FROM dd)
SELECT (SELECT count(*) FROM verts2) AS n_vertices,
       m AS n_edges,
       round(CAST(m AS DOUBLE) / (SELECT count(*) FROM verts2), 6) AS avg_out_degree,
       (SELECT max(deg) FROM deg) AS max_out_degree,
       round((SELECT CAST(c AS DOUBLE) FROM recip) / m, 6) AS reciprocity,
       round(CASE WHEN (m * sxx - sx * sx) > 0 AND (m * syy - sy * sy) > 0
             THEN CAST(m * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(m * sxx - sx * sx AS DOUBLE) * CAST(m * syy - sy * sy AS DOUBLE))
             ELSE 0.0 END, 6) AS assortativity_r
FROM agg"""


def _doc_quantiles_sql() -> str:
    from decimal import Decimal

    # rank in INTEGER arithmetic over q's exact decimal ratio, mirroring
    # group_quantiles (double ceil(q*n) rounds up an ulp-high product)
    ratios = [(q, *Decimal(str(q)).as_integer_ratio()) for q in QUANTILE_QS]
    legs = "\n  UNION ALL\n".join(
        f"""  SELECT r.lang, CAST({q} AS DOUBLE) AS q, r.n_chars AS value
  FROM ranked r JOIN counts c ON r.lang = c.lang
  WHERE r.rn = ({num} * c.n + {den - 1}) // {den}"""
        for q, num, den in ratios
    )
    return f"""
WITH ranked AS (
  SELECT lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
  FROM documents),
counts AS (SELECT lang, max(rn) AS n FROM ranked GROUP BY lang)
SELECT lang, q, value FROM (
{legs})
ORDER BY lang, q"""


def _wsssp_sql() -> str:
    """Unrolled Bellman-Ford relaxations with weight (src+dst)%7+1; after R
    rounds both engines hold exactly the min cost over <=R-edge paths, and
    R exceeds the ring's measured convergence, so this IS the shortest-path
    vector (operators/sssp.py::wsssp_program docstring)."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist)",
    ]
    for t in range(1, WSSSP_UNROLL + 1):
        ctes.append(
            f"""d{t} AS MATERIALIZED (
  SELECT id, min(dist) AS dist FROM (
    SELECT id, dist FROM d{t - 1}
    UNION ALL
    SELECT e.dst AS id, d.dist + ((e.src + e.dst) % 7 + 1) AS dist
    FROM d{t - 1} d JOIN edges e ON e.src = d.id)
  GROUP BY id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, dist FROM d{WSSSP_UNROLL} ORDER BY id"
    )


def _bloom_sql() -> str:
    """Same md5-prefix bit positions via ('0x'||hex)::BIGINT — DuckDB's
    parse agrees with Spark's conv(hex,16,10) bit-for-bit."""
    p = (
        "(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
        f" % {BLOOM_BITS})"
    )
    return f"""
WITH hashes AS (SELECT unnest(range(0, {BLOOM_K})) AS i),
bits AS (SELECT DISTINCT {p} AS pos FROM documents, hashes WHERE lang = 'en'),
probe AS (SELECT doc_id, {p} AS pos FROM documents, hashes)
SELECT probe.doc_id, count(bits.pos) = {BLOOM_K} AS maybe_present
FROM probe LEFT JOIN bits ON probe.pos = bits.pos
GROUP BY probe.doc_id ORDER BY probe.doc_id"""


STREAM_ROLLUP_SQL = """
SELECT epoch_us(ts) // 900000000 AS bucket_id, event_type,
       count(*) AS n,
       sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


TIME_ROLLUP_SQL = """
SELECT epoch_us(ts) // 900000000 AS bucket_id, event_type,
       count(*) AS n, round(sum(value), 6) AS sum_r
FROM events
GROUP BY ROLLUP (bucket_id, event_type)
ORDER BY bucket_id ASC NULLS FIRST, event_type ASC NULLS FIRST"""


RANGE_JOIN_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
SELECT l.event_id, l.user_id, r.event_id AS click_id, round(r.value, 6) AS click_value_r
FROM l JOIN r ON l.user_id = r.user_id
AND r.ts >= l.ts - INTERVAL 3600 SECOND AND r.ts <= l.ts
ORDER BY l.event_id, click_id"""


ASOF_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
SELECT event_id, user_id, matched_event_id, round(matched_value, 6) AS matched_value_r FROM (
  SELECT l.event_id, l.user_id, r.event_id AS matched_event_id, r.value AS matched_value,
         row_number() OVER (PARTITION BY l.event_id ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts)
WHERE rn = 1 ORDER BY event_id"""


def _mis_sql() -> str:
    """Unrolled Luby rounds: winners by (md5 priority, id) row-compare
    against the min undecided neighbor — operators/mis.py verbatim."""

    def pr(col, r):
        return f"md5(CAST({col} AS VARCHAR) || ':' || '{r}' || ':' || '{MIS_SALT}')"

    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "u0 AS MATERIALIZED (SELECT DISTINCT id FROM rv)",
    ]
    for r in range(1, MIS_ROUNDS + 1):
        ctes.append(
            f"""w{r} AS MATERIALIZED (
  SELECT u.id FROM u{r - 1} u LEFT JOIN (
    SELECT dst AS id, p, i FROM (
      SELECT e.dst, {pr('e.src', r)} AS p, e.src AS i,
             row_number() OVER (PARTITION BY e.dst ORDER BY {pr('e.src', r)}, e.src) AS rn
      FROM edges e
      JOIN u{r - 1} a ON e.src = a.id JOIN u{r - 1} b ON e.dst = b.id) WHERE rn = 1) m
  ON u.id = m.id
  WHERE m.id IS NULL OR ({pr('u.id', r)}, u.id) < (m.p, m.i))"""
        )
        ctes.append(
            f"""x{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS id FROM edges e
  JOIN w{r} w ON e.src = w.id JOIN u{r - 1} uu ON e.dst = uu.id
  WHERE e.dst NOT IN (SELECT id FROM w{r}))"""
        )
        ctes.append(
            f"""u{r} AS MATERIALIZED (
  SELECT id FROM u{r - 1}
  WHERE id NOT IN (SELECT id FROM w{r}) AND id NOT IN (SELECT id FROM x{r}))"""
        )
    mis = " UNION ALL ".join(f"SELECT id FROM w{r}" for r in range(1, MIS_ROUNDS + 1))
    exc = " UNION ALL ".join(f"SELECT id FROM x{r}" for r in range(1, MIS_ROUNDS + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, status FROM (
  SELECT id, 'mis' AS status FROM ({mis})
  UNION ALL SELECT id, 'excluded' FROM ({exc})
  UNION ALL SELECT id, 'undecided' FROM u{MIS_ROUNDS})
ORDER BY id"""
    )


def _matching_sql() -> str:
    """Unrolled local-minima matching rounds — operators/matching.py
    verbatim: fixed md5("u:v:salt") edge priorities, an edge accepted in a
    round iff it is the (p, u, v)-minimum surviving edge at BOTH
    endpoints, saturated endpoints removed."""
    pr = f"md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR) || ':' || '{MATCH_SALT}')"
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        f"""s0 AS MATERIALIZED (
  SELECT src AS u, dst AS v, {pr} AS p FROM edges WHERE src < dst)""",
    ]
    for r in range(1, MATCH_ROUNDS + 1):
        ctes.append(
            f"""vm{r} AS MATERIALIZED (
  SELECT x, p, u, v FROM (
    SELECT x, p, u, v, row_number() OVER (PARTITION BY x ORDER BY p, u, v) AS rn
    FROM (SELECT u AS x, p, u, v FROM s{r - 1}
          UNION ALL SELECT v AS x, p, u, v FROM s{r - 1}))
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""a{r} AS MATERIALIZED (
  SELECT s.u, s.v FROM s{r - 1} s
  JOIN vm{r} mu ON mu.x = s.u AND (mu.p, mu.u, mu.v) = (s.p, s.u, s.v)
  JOIN vm{r} mv ON mv.x = s.v AND (mv.p, mv.u, mv.v) = (s.p, s.u, s.v))"""
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT * FROM s{r - 1}
  WHERE u NOT IN (SELECT u FROM a{r} UNION ALL SELECT v FROM a{r})
    AND v NOT IN (SELECT u FROM a{r} UNION ALL SELECT v FROM a{r}))"""
        )
    acc = " UNION ALL ".join(
        f"SELECT u, v, CAST({r} AS INT) AS matched_round FROM a{r}"
        for r in range(1, MATCH_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, matched_round
FROM ({acc}) ORDER BY u, v"""
    )


def _densest_sql() -> str:
    """Unrolled Bahmani peel rounds — operators/densest.py verbatim:
    integer peel test 2*deg*n > 5*m, best prefix by double m/n with
    earlier-round tie-break."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        f"""de0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM edges WHERE src < dst
  UNION
  SELECT a.i AS u, b.i AS v
  FROM ids a JOIN ids b ON a.i < b.i
  WHERE a.i < {DENSEST_CORE} AND b.i < {DENSEST_CORE})""",
        "dv0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM de0 UNION SELECT DISTINCT v FROM de0)",
    ]
    for r in range(1, DENSEST_ROUNDS + 1):
        ctes.append(
            f"""dv{r} AS MATERIALIZED (
  SELECT id FROM (
    SELECT x AS id, count(*) AS deg FROM (
      SELECT u AS x FROM de{r - 1} UNION ALL SELECT v FROM de{r - 1})
    GROUP BY x)
  WHERE 2 * deg * (SELECT count(*) FROM dv{r - 1})
        > 5 * (SELECT count(*) FROM de{r - 1}))"""
        )
        ctes.append(
            f"""de{r} AS MATERIALIZED (
  SELECT u, v FROM de{r - 1}
  WHERE u IN (SELECT id FROM dv{r}) AND v IN (SELECT id FROM dv{r}))"""
        )
    hist = " UNION ALL ".join(
        f"SELECT {r} AS r, (SELECT count(*) FROM de{r}) AS m, "
        f"(SELECT count(*) FROM dv{r}) AS n"
        for r in range(0, DENSEST_ROUNDS + 1)
    )
    allv = " UNION ALL ".join(
        f"SELECT {r} AS r, id FROM dv{r}" for r in range(0, DENSEST_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
hist AS (SELECT * FROM ({hist}) WHERE n > 0),
best AS (SELECT r FROM hist ORDER BY CAST(m AS DOUBLE) / n DESC, r ASC LIMIT 1)
SELECT CAST(id AS BIGINT) AS id FROM ({allv}) av JOIN best USING (r) ORDER BY id"""
    )


def _coloring_sql() -> str:
    """Unrolled Jones–Plassmann rounds — operators/coloring.py verbatim:
    fixed md5("id:salt") priorities, ready = outranks every uncolored
    neighbor, color = mex over already-colored neighbors (computed here by
    generate-candidates + anti-join instead of the engine's sorted fold —
    same value by definition of mex)."""

    def pr(col):
        return f"md5(CAST({col} AS VARCHAR) || ':' || '{COLORING_SALT}')"

    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "u0 AS MATERIALIZED (SELECT DISTINCT id FROM rv)",
        "c0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS INT) AS color WHERE false)",
    ]
    for r in range(1, COLORING_ROUNDS + 1):
        ctes.append(
            f"""rd{r} AS MATERIALIZED (
  SELECT u.id FROM u{r - 1} u LEFT JOIN (
    SELECT dst AS id, p, i FROM (
      SELECT e.dst, {pr('e.src')} AS p, e.src AS i,
             row_number() OVER (PARTITION BY e.dst ORDER BY {pr('e.src')}, e.src) AS rn
      FROM edges e
      JOIN u{r - 1} a ON e.src = a.id JOIN u{r - 1} b ON e.dst = b.id) WHERE rn = 1) m
  ON u.id = m.id
  WHERE m.id IS NULL OR ({pr('u.id')}, u.id) < (m.p, m.i))"""
        )
        ctes.append(
            f"""nc{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS id, c.color FROM edges e
  JOIN c{r - 1} c ON e.src = c.id
  JOIN rd{r} rd ON e.dst = rd.id)"""
        )
        ctes.append(
            f"""mx{r} AS MATERIALIZED (
  SELECT cand.id, min(cand.k) AS color FROM (
    SELECT id, unnest(range(0, cnt + 1)) AS k FROM (
      SELECT id, count(*) AS cnt FROM nc{r} GROUP BY id)) cand
  LEFT JOIN nc{r} n ON cand.id = n.id AND cand.k = n.color
  WHERE n.id IS NULL GROUP BY cand.id)"""
        )
        ctes.append(
            f"""n{r} AS MATERIALIZED (
  SELECT rd.id, CAST(coalesce(m.color, 0) AS INT) AS color
  FROM rd{r} rd LEFT JOIN mx{r} m ON rd.id = m.id)"""
        )
        ctes.append(
            f"c{r} AS MATERIALIZED (SELECT * FROM c{r - 1} UNION ALL SELECT * FROM n{r})"
        )
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT id FROM u{r - 1} WHERE id NOT IN (SELECT id FROM n{r}))"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(id AS BIGINT) AS id, color FROM c{COLORING_ROUNDS} ORDER BY id"""
    )


def _louvain_sql() -> str:
    """Unrolled synchronous Louvain local-move rounds —
    operators/louvain.py verbatim: fixed md5 bucket schedule, integer
    gain scores m2·k_{v,c} − k_v·(tot(c) − [v∈c]·k_v), argmax with
    smallest-community tie-break, strict improvement to move. The stay
    score folds the engine's listed/unlisted split into one expression
    (coalesce(k_{v,cur}, 0)) — algebraically identical."""

    def active(col, r):
        return (
            f"ascii(substr(md5(CAST({col} AS VARCHAR) || ':' || "
            f"'{LOUVAIN_SALT}'), 1, 1)) % {LOUVAIN_BUCKETS} = "
            f"{(r - 1) % LOUVAIN_BUCKETS}"
        )

    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "ldeg AS MATERIALIZED (SELECT src AS id, count(*) AS k FROM edges GROUP BY src)",
        "lm2 AS (SELECT sum(k) AS m2 FROM ldeg)",
        "lc0 AS MATERIALIZED (SELECT id, id AS comm FROM ldeg)",
    ]
    for r in range(1, LOUVAIN_ROUNDS + 1):
        ctes.append(
            f"lt{r} AS MATERIALIZED (SELECT comm, sum(k) AS tot "
            f"FROM lc{r - 1} JOIN ldeg USING (id) GROUP BY comm)"
        )
        ctes.append(
            f"""lk{r} AS MATERIALIZED (
  SELECT e.src, c.comm AS c, count(*) AS kvc
  FROM edges e JOIN lc{r - 1} c ON e.dst = c.id
  WHERE {active('e.src', r)}
  GROUP BY e.src, c.comm)"""
        )
        ctes.append(
            f"""lb{r} AS (
  SELECT src, c AS bc, score AS best FROM (
    SELECT k.src, k.c,
           (SELECT m2 FROM lm2) * k.kvc
             - d.k * (t.tot - CASE WHEN k.c = cur.comm THEN d.k ELSE 0 END)
             AS score,
           row_number() OVER (
             PARTITION BY k.src
             ORDER BY (SELECT m2 FROM lm2) * k.kvc
               - d.k * (t.tot - CASE WHEN k.c = cur.comm THEN d.k ELSE 0 END)
               DESC, k.c ASC) AS rn
    FROM lk{r} k
    JOIN lt{r} t ON k.c = t.comm
    JOIN lc{r - 1} cur ON k.src = cur.id
    JOIN ldeg d ON k.src = d.id) WHERE rn = 1)"""
        )
        ctes.append(
            f"""lst{r} AS (
  SELECT a.id AS src,
         (SELECT m2 FROM lm2) * coalesce(sc.kvc, 0) - d.k * (t.tot - d.k)
           AS stay
  FROM lc{r - 1} a
  JOIN ldeg d ON a.id = d.id
  JOIN lt{r} t ON a.comm = t.comm
  LEFT JOIN lk{r} sc ON sc.src = a.id AND sc.c = a.comm
  WHERE {active('a.id', r)})"""
        )
        ctes.append(
            f"""lc{r} AS MATERIALIZED (
  SELECT c.id, coalesce(m.nc, c.comm) AS comm FROM lc{r - 1} c
  LEFT JOIN (
    SELECT b.src AS id, b.bc AS nc FROM lb{r} b
    JOIN lst{r} s ON b.src = s.src WHERE b.best > s.stay) m
  ON c.id = m.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(id AS BIGINT) AS id, CAST(comm AS BIGINT) AS comm
FROM lc{LOUVAIN_ROUNDS} ORDER BY id"""
    )


def _pipeline_sql() -> str:
    """The composed pipeline twin: plant dupes + junk, quality-filter
    (the _quality_filter_sql rules verbatim), exact-dedup survivors
    (min doc_id per md5), chunk (the chunk_docs enumeration verbatim)."""
    stop_list = "'the','a','of','to','and','in','is','on','for','with'"
    stride = CHUNK_MAX_TOKENS - CHUNK_OVERLAP
    return f"""
WITH pp0 AS MATERIALIZED (
  SELECT d.doc_id,
         CASE CAST(d.doc_id % {PIPE_JUNK_MOD} AS INT)
           WHEN 3 THEN 'one two'
           WHEN 5 THEN l.text || repeat(' ;;!?.', 40)
           ELSE l.text END AS text
  FROM documents d
  JOIN documents l ON l.doc_id = d.doc_id - (d.doc_id % {PIPE_DUP_MOD})),
pw AS (SELECT doc_id, text,
              list_filter(string_split(trim(text), ' '), x -> x <> '') AS words
       FROM pp0),
ps AS (SELECT doc_id, len(words) AS n_tokens, length(text) AS n_chars,
              length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct,
              len(list_filter(words, x -> x IN ({stop_list}))) AS stops,
              CASE WHEN len(words) >= 3
                   THEN list_transform(range(1, len(words) - 1),
                          i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                   ELSE [] END AS ngs
       FROM pw),
pk AS (SELECT doc_id FROM ps
       WHERE NOT (n_tokens < 5 OR n_tokens > 5000
                  OR punct / greatest(n_chars, 1) > 0.12
                  OR stops / greatest(n_tokens, 1) < 0.02
                  OR (CASE WHEN len(ngs) > 0
                           THEN 1.0 - len(list_distinct(ngs)) / len(ngs)
                           ELSE 0.0 END) > 0.15)),
pd AS (SELECT min(p.doc_id) AS doc_id
       FROM pp0 p JOIN pk USING (doc_id) GROUP BY md5(p.text)),
psv AS (SELECT w.doc_id, w.words FROM pw w JOIN pd USING (doc_id)),
pst AS (SELECT doc_id, words,
               unnest(range(0, greatest(len(words) - {CHUNK_OVERLAP}, 1),
                            {stride})) AS s
        FROM psv)
SELECT doc_id,
       CAST(s // {stride} AS INT) AS chunk_id,
       CAST(len(words[s + 1 : s + {CHUNK_MAX_TOKENS}]) AS INT) AS n_tokens
FROM pst ORDER BY doc_id, chunk_id"""


def _bpe_sql() -> str:
    """Unrolled BPE training rounds — operators/bpe.py verbatim: the
    word-frequency table start state, per-round pair counts weighted by
    word frequency, (cnt DESC, l, r) argmax, and the bracketed-string
    replace whose left-to-right non-overlapping scan IS the greedy merge
    (identical semantics in DuckDB's replace and Spark's)."""
    ctes = [
        r"""bw0 AS MATERIALIZED (
  SELECT word,
         regexp_replace(translate(word, chr(1)||chr(2), ''), '(?s)(.)',
                        chr(1)||'\1'||chr(2), 'g') AS ws,
         count(*) AS n
  FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents)
  GROUP BY word)"""
    ]
    for r in range(1, BPE_MERGES + 1):
        ctes.append(
            f"""bb{r} AS MATERIALIZED (
  SELECT s[j] AS l, s[j + 1] AS r, sum(n) AS cnt FROM (
    SELECT string_split(regexp_replace(ws, '^'||chr(1)||'|'||chr(2)||'$',
                                       '', 'g'), chr(2)||chr(1)) AS s, n
    FROM bw{r - 1}) t, unnest(range(1, len(s))) AS u(j)
  GROUP BY 1, 2
  ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        ctes.append(
            f"""bw{r} AS MATERIALIZED (
  SELECT w.word,
         replace(w.ws, chr(1)||b.l||chr(2)||chr(1)||b.r||chr(2),
                 chr(1)||b.l||b.r||chr(2)) AS ws,
         w.n
  FROM bw{r - 1} w CROSS JOIN bb{r} b)"""
        )
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS rank, l AS \"left\", r AS \"right\", "
        f"CAST(cnt AS BIGINT) AS freq FROM bb{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows + "\nORDER BY rank"


def _khop_sql() -> str:
    """Unrolled sampled BFS: per hop, each (origin, frontier-node) expansion
    keeps its KHOP_FANOUT smallest-md5 neighbors, then dedups against the
    seen set — operators/neighborhood.py verbatim."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        f"h0 AS MATERIALIZED (SELECT id AS origin, id AS node FROM rv WHERE id < {KHOP_STARTS})",
        "s0 AS (SELECT origin, node FROM h0)",
    ]
    for t in range(1, KHOP_K + 1):
        ctes.append(
            f"""f{t} AS MATERIALIZED (
  SELECT c.origin, c.node FROM (
    SELECT DISTINCT origin, dst AS node FROM (
      SELECT f.origin, f.node AS cur, e.dst,
             row_number() OVER (
               PARTITION BY f.origin, f.node
               ORDER BY md5(CAST(f.origin AS VARCHAR) || ':' || '{t}' || ':'
                            || CAST(f.node AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)
                            || ':' || '{KHOP_SALT}'),
                        e.dst) AS rn
      FROM h{t - 1} f JOIN edges e ON e.src = f.node) WHERE rn <= {KHOP_FANOUT}) c
  WHERE NOT EXISTS (SELECT 1 FROM s{t - 1} p WHERE p.origin = c.origin AND p.node = c.node))"""
        )
        ctes.append(f"h{t} AS (SELECT origin, node FROM f{t})")
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT origin, node FROM s{t - 1} UNION ALL SELECT origin, node FROM f{t})"
        )
    steps = "\nUNION ALL\n".join(
        f"SELECT origin, node, CAST({t} AS INT) AS dist FROM {'h0' if t == 0 else f'f{t}'}"
        for t in range(KHOP_K + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM ({steps}) ORDER BY origin, dist, node"
    )


def _node2vec_sql() -> str:
    """Unrolled node2vec steps: per-(walk, step) inverse-CDF over the
    current node's out-neighbors in id order, weights by the p/q classes
    (predecessor / distance-1 / distance-2) — operators/walks.py
    node2vec_walks verbatim, dyadic weights so every cumsum is exact."""
    inv_p, inv_q = 1.0 / N2V_P, 1.0 / N2V_Q
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        """w0 AS MATERIALIZED (
  SELECT rv.id AS origin, CAST(0 AS INT) AS walk_no, rv.id AS node,
         CAST(NULL AS BIGINT) AS prev
  FROM rv)""",
    ]
    for t in range(1, N2V_LEN + 1):
        u = (
            f"CAST(CAST('0x' || substr(md5(CAST(f.origin AS VARCHAR) || ':' || "
            f"CAST(f.walk_no AS VARCHAR) || ':' || '{t}' || ':' || '{N2V_SALT}'), 1, 8) "
            f"AS UBIGINT) AS BIGINT) / {float(16 ** 8)!r}"
        )
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT origin, walk_no, min(d) AS node, any_value(node0) AS prev FROM (
    SELECT s.*, sum(wgt) OVER (
             PARTITION BY origin, walk_no ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           sum(wgt) OVER (PARTITION BY origin, walk_no) AS tot
    FROM (
      SELECT f.origin, f.walk_no, f.node AS node0, e.dst AS d,
             CASE WHEN f.prev IS NULL THEN 1.0
                  WHEN e.dst = f.prev THEN {inv_p!r}
                  WHEN b.src IS NOT NULL THEN 1.0
                  ELSE {inv_q!r} END AS wgt,
             {u} AS u
      FROM w{t - 1} f
      JOIN edges e ON e.src = f.node
      LEFT JOIN edges b ON b.src = f.prev AND b.dst = e.dst) s)
  WHERE cw >= u * tot
  GROUP BY origin, walk_no)"""
        )
    steps = "\nUNION ALL\n".join(
        f"SELECT origin, walk_no, CAST({t} AS INT) AS step, node FROM w{t}"
        for t in range(N2V_LEN + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM ({steps}) ORDER BY origin, walk_no, step"
    )


def _walks_sql() -> str:
    """Unrolled hash-argmin walk: step t keeps the candidate with the
    smallest md5('origin:walk:t:dst:salt'), ties to the smallest dst —
    operators/walks.py verbatim."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        f"""w0 AS MATERIALIZED (
  SELECT rv.id AS origin, CAST(ws.wn AS INT) AS walk_no, rv.id AS node
  FROM rv, (SELECT unnest(range(0, {WALKS_PER_VERTEX})) AS wn) ws)""",
    ]
    for t in range(1, WALK_LEN + 1):
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT origin, walk_no, dst AS node FROM (
    SELECT f.origin, f.walk_no, e.dst,
           row_number() OVER (
             PARTITION BY f.origin, f.walk_no
             ORDER BY md5(CAST(f.origin AS VARCHAR) || ':' || CAST(f.walk_no AS VARCHAR)
                          || ':' || '{t}' || ':' || CAST(e.dst AS VARCHAR) || ':' || '{WALK_SALT}'),
                      e.dst) AS rn
    FROM w{t - 1} f JOIN edges e ON e.src = f.node) WHERE rn = 1)"""
        )
    steps = "\nUNION ALL\n".join(
        f"SELECT origin, walk_no, CAST({t} AS INT) AS step, node FROM w{t}"
        for t in range(WALK_LEN + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM ({steps}) ORDER BY origin, walk_no, step"
    )


def _adamic_adar_sql() -> str:
    """Wedge self-join + degree weights; scores rounded to 6dp before the
    global rank, ties on (u, v) — operators/linkpred.py verbatim."""
    return f"""
WITH {SUPPLY_EDGES.strip().rstrip(',')},
deg AS (SELECT src AS z, count(*) AS deg FROM edges GROUP BY src),
wed AS (
  SELECT e1.dst AS u, e2.dst AS v, count(*) AS cn,
         round(sum(1.0 / ln(CAST(d.deg AS DOUBLE))), 6) AS aa_r
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN deg d ON d.z = e1.src
  GROUP BY e1.dst, e2.dst),
cand AS (
  SELECT w.* FROM wed w
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.u AND e.dst = w.v))
SELECT u, v, cn, aa_r,
       CAST(row_number() OVER (ORDER BY aa_r DESC, u, v) AS INT) AS rank
FROM cand ORDER BY aa_r DESC, u, v LIMIT {AA_TOPK}"""


def _jaccard_links_sql() -> str:
    """Same wedge cube as _adamic_adar_sql, but degree-normalized by the
    ENDPOINT degrees: jac = cn / (deg(u) + deg(v) - cn), one IEEE division
    of exact integers rounded to 6dp before the rank — linkpred.py
    jaccard_topk verbatim."""
    return f"""
WITH {SUPPLY_EDGES.strip().rstrip(',')},
deg AS (SELECT src AS z, count(*) AS deg FROM edges GROUP BY src),
wed AS (
  SELECT e1.dst AS u, e2.dst AS v, count(*) AS cn
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY e1.dst, e2.dst),
cand AS (
  SELECT w.u, w.v, w.cn,
         round(CAST(w.cn AS DOUBLE)
               / CAST(du.deg + dv.deg - w.cn AS DOUBLE), 6) AS jac_r
  FROM wed w
  JOIN deg du ON du.z = w.u
  JOIN deg dv ON dv.z = w.v
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.u AND e.dst = w.v))
SELECT u, v, cn, jac_r,
       CAST(row_number() OVER (ORDER BY jac_r DESC, u, v) AS INT) AS rank
FROM cand ORDER BY jac_r DESC, u, v LIMIT {AA_TOPK}"""


def _kmeans_sql() -> str:
    """Fixed-point Lloyd's, unrolled: quantize -> (assign, floor-mean) x T
    -> final assign. Integer arithmetic end-to-end, so this reproduces the
    Spark operator bit-for-bit (see operators/clustering.py)."""
    k, T = KMEANS_K, KMEANS_ITERS
    ctes = [
        EMB_PAIRS.strip().rstrip(","),
        "qq AS MATERIALIZED (SELECT vec_id, pos, CAST(floor(val * 1048576.0) AS BIGINT) AS qv FROM p)",
        f"""seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))""",
        "c0 AS MATERIALIZED (SELECT s.cid, q.pos, q.qv AS cv FROM seed s JOIN qq q ON q.vec_id = s.vec_id)",
    ]
    for t in range(1, T + 2):  # T Lloyd rounds + the final predict pass
        ctes.append(
            f"""d{t} AS (
  SELECT q.vec_id, c.cid, sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2
  FROM qq q JOIN c{t - 1} c ON c.pos = q.pos GROUP BY q.vec_id, c.cid)"""
        )
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d{t}) WHERE rn = 1)"""
        )
        if t <= T:
            ctes.append(
                f"""c{t} AS MATERIALIZED (
  SELECT a.cid, q.pos,
         CAST(floor(CAST(sum(q.qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
  FROM a{t} a JOIN qq q ON q.vec_id = a.vec_id GROUP BY a.cid, q.pos
  UNION ALL
  SELECT c.cid, c.pos, c.cv FROM c{t - 1} c
  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM a{t}))"""
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, cid AS cluster FROM a{T + 1} ORDER BY vec_id"
    )


def _docs_split_sql() -> str:
    from subgraph_isomorphism_pregel_spark.operators.sampling import frac_threshold

    t_train, t_val = frac_threshold(0.9), frac_threshold(0.95)
    return f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}'), 1, 8) < '{t_train}' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}'), 1, 8) < '{t_val}' THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id"""


def _docs_stratified_sql() -> str:
    from subgraph_isomorphism_pregel_spark.operators.sampling import frac_threshold

    whens = " ".join(
        f"WHEN '{v}' THEN '{frac_threshold(f)}'" for v, f in STRATA_FRACS.items()
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}'), 1, 8)
      < CASE lang {whens} ELSE '{frac_threshold(STRATA_DEFAULT)}' END
ORDER BY doc_id"""


def _docs_hash_topk_sql() -> str:
    return f"""
SELECT doc_id, source, CAST(rk AS INT) AS sample_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}'), 1, 8), doc_id
         ) AS rk
  FROM documents)
WHERE rk <= {TOPK_PER_SOURCE} ORDER BY source, rk"""


def _hits_sql() -> str:
    """HITS oracle: simultaneous normalized power iteration on the DIRECTED
    part->supplier edges, unrolled HITS_STEPS times, each role L2-normalized
    at the end — the recurrence in operators/hits.py verbatim."""
    steps = HITS_STEPS
    ctes = [
        "base AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst FROM lineitem)",
        "h0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST(1 AS DOUBLE) AS score FROM base)",
        "a0 AS MATERIALIZED (SELECT DISTINCT dst AS id, CAST(1 AS DOUBLE) AS score FROM base)",
    ]
    for t in range(1, steps + 1):
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT b.dst AS id,
         sum(h.score) / (SELECT sqrt(sum(score * score)) FROM h{t - 1}) AS score
  FROM base b JOIN h{t - 1} h ON h.id = b.src GROUP BY b.dst)"""
        )
        ctes.append(
            f"""h{t} AS MATERIALIZED (
  SELECT b.src AS id,
         sum(a.score) / (SELECT sqrt(sum(score * score)) FROM a{t - 1}) AS score
  FROM base b JOIN a{t - 1} a ON a.id = b.dst GROUP BY b.src)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, role, round(s, 8) AS score_r FROM (
  SELECT id, 'hub' AS role,
         score / (SELECT sqrt(sum(score * score)) FROM h{steps}) AS s FROM h{steps}
  UNION ALL
  SELECT id, 'auth' AS role,
         score / (SELECT sqrt(sum(score * score)) FROM a{steps}) AS s FROM a{steps})
ORDER BY id, role"""
    )


def _kcore_sql(k: int = KCORE_K, rounds: int = 6) -> str:
    """Unrolled k-core peeling: each round keeps the vertices with >= k
    neighbors among the previous round's survivors. `rounds` exceeds the
    measured peel depth on the gated fixture; extra rounds are idempotent
    at the fixed point."""
    ctes = [
        SUPPLY_EDGES.strip().rstrip(","),
        "a0 AS MATERIALIZED (SELECT id FROM verts)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT e.src AS id FROM edges e
  JOIN a{t - 1} u ON e.src = u.id JOIN a{t - 1} w ON e.dst = w.id
  GROUP BY e.src HAVING count(*) >= {k})"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id FROM a{rounds} ORDER BY id"


def _coreness_sql(rounds: int = 8) -> str:
    """Unrolled neighborhood H-index iteration: c_0 = degree, each round
    recomputes the H-index of every vertex's neighbor values; the fixed
    point is the core number (the engine's coreness program run in SQL).
    `rounds` exceeds the measured sweeps-to-fixpoint on the gated fixture
    (4 at sf0.01); extra rounds are idempotent."""
    ctes = [
        SUPPLY_EDGES.strip().rstrip(","),
        "c0 AS MATERIALIZED (SELECT src AS id, count(*) AS c FROM edges GROUP BY src)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""c{t} AS MATERIALIZED (
  SELECT id, coalesce(max(CASE WHEN val >= rn THEN rn END), 0) AS c FROM (
    SELECT e.src AS id, p.c AS val,
           row_number() OVER (PARTITION BY e.src ORDER BY p.c DESC) AS rn
    FROM edges e JOIN c{t - 1} p ON e.dst = p.id) s{t}
  GROUP BY id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, CAST(c AS BIGINT) AS coreness FROM c{rounds} ORDER BY id"
    )


def _cc_sql() -> str:
    """Fixed-point min-propagation (recursive CTE), a faithful twin of the
    engine's run-to-convergence hash-min — no unroll-depth assumption: the
    recursion reaches the true per-component minimum regardless of the
    propagation distance from the min-id vertex."""
    return f"""
WITH RECURSIVE {SUPPLY_EDGES.strip().rstrip(',')},
reach AS (
  SELECT id, id AS comp FROM verts
  UNION
  SELECT e.dst AS id, r.comp
  FROM reach r JOIN edges e ON r.id = e.src)
SELECT id, min(comp) AS component FROM reach GROUP BY id ORDER BY id"""


def _lp_ctes() -> list[str]:
    ctes = [
        SUPPLY_EDGES.strip().rstrip(","),
        "l0 AS MATERIALIZED (SELECT id, id AS lab FROM verts)",
    ]
    for t in range(1, LP_ROUNDS + 1):
        ctes.append(
            f"""l{t} AS MATERIALIZED (
  SELECT v.id, coalesce(p.lab, v.lab) AS lab
  FROM l{t - 1} v LEFT JOIN (
    SELECT id, lab FROM (
      SELECT e.dst AS id, l.lab, count(*) AS c,
             row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, l.lab ASC) AS rn
      FROM l{t - 1} l JOIN edges e ON l.id = e.src GROUP BY e.dst, l.lab) z
    WHERE rn = 1) p ON v.id = p.id)"""
        )
    return ctes


def _lp_sql() -> str:
    return (
        "WITH "
        + ",\n".join(_lp_ctes())
        + f"\nSELECT id, lab AS lp_label FROM l{LP_ROUNDS} ORDER BY id"
    )


def _modularity_sql() -> str:
    """Modularity of the LP communities, in the same exact-rational form as
    the operator: integer aggregates, two divisions, one subtraction."""
    ctes = _lp_ctes() + [
        f"comm AS (SELECT id, lab FROM l{LP_ROUNDS})",
        "deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src)",
        "mm AS (SELECT count(*) AS m2 FROM edges)",
        """ii AS (SELECT coalesce(sum(CASE WHEN a.lab = b.lab THEN 1 ELSE 0 END), 0) AS i2
      FROM edges e JOIN comm a ON e.src = a.id JOIN comm b ON e.dst = b.id)""",
        """degc AS (SELECT c.lab, sum(coalesce(d.d, 0)) AS dc
       FROM comm c LEFT JOIN deg d ON c.id = d.id GROUP BY c.lab)""",
        "bb AS (SELECT count(*) AS n_communities, coalesce(sum(dc * dc), 0) AS sum_dc2 FROM degc)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT bb.n_communities, CAST(ii.i2 AS BIGINT) AS intra_directed,
       ii.i2 / mm.m2 - bb.sum_dc2 / (mm.m2 * mm.m2) AS q_modularity
FROM mm, ii, bb"""
    )


def _emb_lsh_sql(threshold: float = 0.4, bands: int = 4, rows_per_band: int = 4) -> str:
    """DuckDB twin of embedding_dup_pairs_lsh: quantized integer hyperplane
    dots (order-independent, bit-exact across engines), banded bucket
    self-join, exact cosine verify on candidates only."""
    n_planes = bands * rows_per_band
    hexhi = "'8','9','a','b','c','d','e','f'"
    dot_exprs = ",\n         ".join(
        f"sum(CASE WHEN substr(md5('{pl}:' || CAST(pos AS VARCHAR)), 1, 1) IN ({hexhi})"
        f" THEN qv ELSE -qv END) AS dot{pl}"
        for pl in range(n_planes)
    )
    band_exprs = ",\n         ".join(
        " + ".join(
            f"(CASE WHEN dot{b * rows_per_band + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(rows_per_band)
        )
        + f" AS band{b}"
        for b in range(bands)
    )
    cand_union = "\n  UNION\n  ".join(
        f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM banded a "
        f"JOIN banded b ON a.band{b} = b.band{b} AND a.vec_id < b.vec_id"
        for b in range(bands)
    )
    return f"""
WITH {EMB_PAIRS.strip().rstrip(',')},
qq AS (SELECT vec_id, pos, CAST(floor(val * 1048576.0) AS BIGINT) AS qv FROM p),
dots AS MATERIALIZED (SELECT vec_id,
         {dot_exprs}
  FROM qq GROUP BY vec_id),
banded AS MATERIALIZED (SELECT vec_id,
         {band_exprs}
  FROM dots),
cand AS MATERIALIZED (
  {cand_union}),
scored AS (
  SELECT c.vec_a, c.vec_b,
         round(sum(a.val * b.val) / (an.norm * bn.norm), 6) AS cos
  FROM cand c
  JOIN p a ON a.vec_id = c.vec_a
  JOIN p b ON b.vec_id = c.vec_b AND a.pos = b.pos
  JOIN norms an ON an.vec_id = c.vec_a
  JOIN norms bn ON bn.vec_id = c.vec_b
  GROUP BY c.vec_a, c.vec_b, an.norm, bn.norm)
SELECT vec_a, vec_b, cos FROM scored WHERE cos >= {threshold}
ORDER BY vec_a, vec_b"""


def _ann_lsh_sql(k: int = 3, n_planes: int = 6) -> str:
    """DuckDB twin of ann_topk_lsh: single-bucket deterministic hyperplane
    LSH + exact in-bucket cosine + row_number top-k."""
    hexhi = "'8','9','a','b','c','d','e','f'"
    dot_exprs = ",\n         ".join(
        f"sum(CASE WHEN substr(md5('{pl}:' || CAST(pos AS VARCHAR)), 1, 1) IN ({hexhi})"
        f" THEN qv ELSE -qv END) AS dot{pl}"
        for pl in range(n_planes)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN dot{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(n_planes)
    )
    return f"""
WITH {EMB_PAIRS.strip().rstrip(',')},
qq AS (SELECT vec_id, pos, CAST(floor(val * 1048576.0) AS BIGINT) AS qv FROM p),
dots AS MATERIALIZED (SELECT vec_id,
         {dot_exprs}
  FROM qq GROUP BY vec_id),
bkt AS MATERIALIZED (SELECT vec_id, {bucket_expr} AS bucket FROM dots),
scored AS (
  SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
         round(sum(a.val * b.val) / (an.norm * bn.norm), 6) AS cos
  FROM bkt qa
  JOIN bkt nb ON qa.bucket = nb.bucket AND qa.vec_id <> nb.vec_id
  JOIN p a ON a.vec_id = qa.vec_id
  JOIN p b ON b.vec_id = nb.vec_id AND a.pos = b.pos
  JOIN norms an ON an.vec_id = qa.vec_id
  JOIN norms bn ON bn.vec_id = nb.vec_id
  GROUP BY qa.vec_id, nb.vec_id, an.norm, bn.norm),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""


def _ann_ivf_sql(k: int = 3, n_lists: int = 8, n_probe: int = 2) -> str:
    """DuckDB twin of ivf_topk: fixed first-n_lists centroids, exact int64
    quantized assignment distances, probe-list candidates, exact cosine +
    row_number top-k."""
    return f"""
WITH {EMB_PAIRS.strip().rstrip(',')},
qq AS MATERIALIZED (
  SELECT vec_id, pos, CAST(floor(val * 1048576.0) AS BIGINT) AS qv FROM p),
cent AS MATERIALIZED (
  SELECT vec_id AS list_id, pos, qv AS qc FROM qq
  WHERE vec_id IN (SELECT DISTINCT vec_id FROM qq ORDER BY vec_id LIMIT {n_lists})),
dist AS MATERIALIZED (
  SELECT q.vec_id, c.list_id, sum((q.qv - c.qc) * (q.qv - c.qc)) AS d
  FROM qq q JOIN cent c ON q.pos = c.pos GROUP BY q.vec_id, c.list_id),
rk AS MATERIALIZED (
  SELECT vec_id, list_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS r
  FROM dist),
assign AS MATERIALIZED (SELECT vec_id AS neighbor_id, list_id FROM rk WHERE r = 1),
probes AS (SELECT vec_id AS query_id, list_id FROM rk WHERE r <= {n_probe}),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM probes JOIN assign USING (list_id)
  WHERE query_id <> neighbor_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(sum(a.val * b.val) / (an.norm * bn.norm), 6) AS cos
  FROM cand c
  JOIN p a ON a.vec_id = c.query_id
  JOIN p b ON b.vec_id = c.neighbor_id AND a.pos = b.pos
  JOIN norms an ON an.vec_id = c.query_id
  JOIN norms bn ON bn.vec_id = c.neighbor_id
  GROUP BY c.query_id, c.neighbor_id, an.norm, bn.norm),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""


def _pq_sql(k: int = 3, m_sub: int = 8, k_codes: int = 8, n_queries: int = 20) -> str:
    """DuckDB twin of pq_topk: same 2^20 quantization, smallest-id
    codebooks, per-block argmin codes (ties to the smallest code), and
    asymmetric ADC sums — all integer-exact. The queries' block distances
    to every codebook entry double as the ADC lookup table, so one `encd`
    CTE feeds both the encoding and the scoring."""
    d_sub = f"(SELECT max(len(embedding)) FROM embeddings) // {m_sub}"
    return f"""
WITH {EMB_PAIRS.strip().rstrip(',')},
qq AS MATERIALIZED (
  SELECT vec_id, pos, CAST(floor(val * 1048576.0) AS BIGINT) AS qv FROM p),
cbq AS MATERIALIZED (
  SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS code, pos, qv
  FROM qq WHERE vec_id IN (
    SELECT DISTINCT vec_id FROM qq ORDER BY vec_id LIMIT {k_codes})),
encd AS MATERIALIZED (
  SELECT v.vec_id, v.pos // ({d_sub}) AS j, c.code,
         sum((v.qv - c.qv) * (v.qv - c.qv)) AS d
  FROM qq v JOIN cbq c ON v.pos = c.pos
  GROUP BY v.vec_id, v.pos // ({d_sub}), c.code),
codes AS MATERIALIZED (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS r
    FROM encd) t WHERE r = 1),
qdist AS MATERIALIZED (
  SELECT vec_id AS query_id, j, code, d FROM encd
  WHERE vec_id IN (SELECT DISTINCT vec_id FROM qq ORDER BY vec_id LIMIT {n_queries})),
adc AS (
  SELECT q.query_id, v.vec_id AS neighbor_id, sum(q.d) AS adc
  FROM codes v JOIN qdist q ON q.j = v.j AND q.code = v.code
  WHERE q.query_id <> v.vec_id
  GROUP BY q.query_id, v.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS rank
  FROM adc)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, CAST(adc AS BIGINT) AS adc
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""


_LANDMARK_SEEDS = ["0", "nn.n // 4", "nn.n // 2", "(3 * nn.n) // 4"]


def _landmark_ctes() -> tuple[list[str], str]:
    """(per-landmark bounded BFS CTEs, join clause) over the ring graph."""
    ctes = []
    for b, s in enumerate(_LANDMARK_SEEDS):
        ctes.append(
            f"""r{b} AS (
  SELECT (SELECT {s} FROM nn) AS id, 0 AS dist
  UNION
  SELECT e.dst AS id, r.dist + 1
  FROM r{b} r JOIN edges e ON r.id = e.src
  WHERE r.dist < {LANDMARK_HOPS})"""
        )
        ctes.append(f"m{b} AS (SELECT id, min(dist) AS d FROM r{b} GROUP BY id)")
    joins = " ".join(
        f"LEFT JOIN m{b} ON v.id = m{b}.id" for b in range(len(_LANDMARK_SEEDS))
    )
    return ctes, joins


def _landmarks_sql() -> str:
    """Four bounded recursive-CTE BFS runs over the SQL-built ring graph,
    joined into the (id, d0..d3) feature matrix; -1 = unreached within
    LANDMARK_HOPS (the operator's bounded-distance contract)."""
    ctes, joins = _landmark_ctes()
    outs = [
        f"CAST(coalesce(m{b}.d, -1) AS BIGINT) AS d{b}"
        for b in range(len(_LANDMARK_SEEDS))
    ]
    return (
        f"WITH RECURSIVE {RING_GRAPH.strip().rstrip(',')},\n"
        + ",\n".join(ctes)
        + f"\nSELECT CAST(v.id AS BIGINT) AS id, {', '.join(outs)}\n"
        + f"FROM rv v {joins} ORDER BY id"
    )


def _harmonic_sql() -> str:
    """Harmonic centrality from the same landmark BFS CTEs; the terms sum
    left-to-right in landmark order, mirroring the operator's fixed-order
    Column chain so the double is bit-identical (1.0/d on exact ints)."""
    ctes, joins = _landmark_ctes()
    terms = [
        f"(CASE WHEN coalesce(m{b}.d, -1) > 0 THEN 1.0 / coalesce(m{b}.d, -1) "
        "ELSE 0.0 END)"
        for b in range(len(_LANDMARK_SEEDS))
    ]
    return (
        f"WITH RECURSIVE {RING_GRAPH.strip().rstrip(',')},\n"
        + ",\n".join(ctes)
        + f"\nSELECT CAST(v.id AS BIGINT) AS id, {' + '.join(terms)} AS harmonic\n"
        + f"FROM rv v {joins} ORDER BY id"
    )


def _zorder_sql() -> str:
    """Morton interleave as chained CTE spread steps — the magic-number
    masks verbatim from sources/zorder.py."""
    steps = [
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ]

    def spread(col, out):
        lines = [f"{col} & 65535 AS {out}0"]
        for i, (sh, mask) in enumerate(steps, 1):
            lines.append(
                f"({out}{i-1} | ({out}{i-1} << {sh})) & {mask} AS {out}{i}"
            )
        return lines

    return f"""
WITH b AS (SELECT event_id,
                  user_id % 65536 AS zx,
                  (epoch_us(ts) // 1000000) % 65536 AS zy
           FROM events),
s AS (SELECT event_id, zx, zy,
             {', '.join(spread('zx', 'sx'))},
             {', '.join(spread('zy', 'sy'))}
      FROM b)
SELECT event_id, zx, zy, CAST(sx4 | (sy4 << 1) AS BIGINT) AS z
FROM s ORDER BY event_id"""


def _wl_sql(rounds: int = 3) -> str:
    """Unrolled 1-WL refinement: md5(prev || '|' || sorted neighbor
    colors), string_agg ORDER BY = Spark's sort_array + concat_ws, so
    every round's colors are bit-identical."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "c0 AS MATERIALIZED (SELECT id, md5(CAST(label AS VARCHAR)) AS color FROM rv)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""n{t} AS (SELECT e.dst AS id, string_agg(c.color, ',' ORDER BY c.color) AS nbs
  FROM edges e JOIN c{t - 1} c ON e.src = c.id GROUP BY e.dst)"""
        )
        ctes.append(
            f"""c{t} AS MATERIALIZED (
  SELECT c.id, md5(c.color || '|' || coalesce(n.nbs, '')) AS color
  FROM c{t - 1} c LEFT JOIN n{t} n ON c.id = n.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(id AS BIGINT) AS id, color FROM c{rounds} ORDER BY id"
    )


def _closeness_sql() -> str:
    """Landmark-sampled closeness from the same landmark BFS CTEs:
    reached / dist_sum with both aggregates exact ints, so the division is
    the only float op — bit-identical to the operator."""
    ctes, joins = _landmark_ctes()
    hits = " + ".join(
        f"(CASE WHEN coalesce(m{b}.d, -1) > 0 THEN 1 ELSE 0 END)"
        for b in range(len(_LANDMARK_SEEDS))
    )
    dsum = " + ".join(
        f"(CASE WHEN coalesce(m{b}.d, -1) > 0 THEN m{b}.d ELSE 0 END)"
        for b in range(len(_LANDMARK_SEEDS))
    )
    return (
        f"WITH RECURSIVE {RING_GRAPH.strip().rstrip(',')},\n"
        + ",\n".join(ctes)
        + f",\nagg AS (SELECT v.id, {hits} AS reached, {dsum} AS dist_sum\n"
        + f"         FROM rv v {joins})\n"
        + "SELECT CAST(id AS BIGINT) AS id, CAST(reached AS BIGINT) AS reached,\n"
        + "       CAST(dist_sum AS BIGINT) AS dist_sum,\n"
        + "       CASE WHEN dist_sum > 0\n"
        + "            THEN CAST(reached AS BIGINT) / CAST(dist_sum AS BIGINT)\n"
        + "            ELSE 0.0 END AS closeness\n"
        + "FROM agg ORDER BY id"
    )


def _ktruss_sql() -> str:
    """Unrolled k-truss peel: per wave, support(u,v) = common neighbors of
    u and v in the CURRENT symmetric edge set (orientation-free, so no
    degree-ordering to replicate), keep edges with support >= k-2."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "t0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges WHERE src < dst)",
    ]
    for r in range(KTRUSS_ROUNDS):
        ctes.append(
            f"""s{r} AS MATERIALIZED (SELECT u AS src, v AS dst FROM t{r}
  UNION ALL SELECT v, u FROM t{r})"""
        )
        ctes.append(
            f"""t{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM t{r} e
  LEFT JOIN (
    SELECT e2.u, e2.v, count(*) AS supp
    FROM t{r} e2
    JOIN s{r} n1 ON n1.src = e2.u
    JOIN s{r} n2 ON n2.src = e2.v AND n2.dst = n1.dst
    GROUP BY e2.u, e2.v) s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.supp, 0) >= {KTRUSS_K - 2})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v FROM t{KTRUSS_ROUNDS} ORDER BY u, v"
    )


def _betweenness_sql() -> str:
    """Unrolled Brandes over the SQL-built ring graph for the two fixed
    pivots: bounded BFS levels (recursive CTE), per-level σ (one unrolled
    join-aggregate per level — exact: every shortest-path predecessor sits
    one level up), then δ accumulated level-by-level DESCENDING.  The same
    bounded-level contract as the kernel program; 6dp rounding absorbs the
    engines' different float summation orders."""
    H = BC_HOPS
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "pv AS (SELECT 0 AS s UNION ALL SELECT (SELECT count(*) FROM part) // 2)",
        f"""reach AS (
  SELECT s, s AS v, 0 AS d FROM pv
  UNION
  SELECT r.s, e.dst AS v, r.d + 1 FROM reach r JOIN edges e ON r.v = e.src
  WHERE r.d < {H})""",
        "dmin AS MATERIALIZED (SELECT s, v, min(d) AS d FROM reach GROUP BY s, v)",
        "sig0 AS (SELECT s, s AS v, CAST(1 AS DOUBLE) AS sig FROM pv)",
    ]
    for t in range(1, H + 1):
        ctes.append(
            f"""sig{t} AS MATERIALIZED (
  SELECT p.s, e.dst AS v, sum(p.sig) AS sig
  FROM sig{t - 1} p JOIN edges e ON p.v = e.src
  JOIN dmin dv ON dv.s = p.s AND dv.v = e.dst AND dv.d = {t}
  GROUP BY p.s, e.dst)"""
        )
    ctes.append(
        f"del{H} AS (SELECT s, v, CAST(0 AS DOUBLE) AS delta FROM dmin WHERE d = {H})"
    )
    for t in range(H - 1, 0, -1):
        ctes.append(
            f"""del{t} AS MATERIALIZED (
  SELECT lv.s, lv.v, coalesce(x.c, 0) AS delta
  FROM (SELECT s, v FROM dmin WHERE d = {t}) lv
  LEFT JOIN (
    SELECT w.s, e.src AS v, sum(sv.sig / sw.sig * (1 + w.delta)) AS c
    FROM del{t + 1} w
    JOIN edges e ON e.dst = w.v
    JOIN dmin dv ON dv.s = w.s AND dv.v = e.src AND dv.d = {t}
    JOIN sig{t} sv ON sv.s = w.s AND sv.v = e.src
    JOIN sig{t + 1} sw ON sw.s = w.s AND sw.v = w.v
    GROUP BY w.s, e.src) x ON x.s = lv.s AND x.v = lv.v)"""
        )
    union = " UNION ALL ".join(f"SELECT s, v, delta FROM del{t}" for t in range(1, H + 1))
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
alldel AS ({union}),
bc AS (SELECT v AS id, sum(delta) AS bc FROM alldel GROUP BY v)
SELECT CAST(rv.id AS BIGINT) AS id, round(coalesce(bc.bc, 0), 6) AS bc
FROM rv LEFT JOIN bc ON rv.id = bc.id
ORDER BY id"""
    )


def _hll_sql_twin() -> str:
    """The HLL oracle is GENERATED by the same helper that documents the
    operator (identical double literals, identical operation order) — the
    one case where sharing the text is the point: the gate checks that the
    Spark PLAN reproduces this arithmetic, not that two strings agree."""
    from subgraph_isomorphism_pregel_spark.operators.sketches import hll_sql

    return hll_sql("documents", "text", p=6)


def _seq_pack_sql() -> str:
    """Next-fit packing twin: the same (md5 shard, bucket order, running
    capacity) contract as operators/packing.py, replayed per shard with a
    recursive CTE walking rows in packing order."""
    return f"""
WITH RECURSIVE
{DOC_WORDS.strip().rstrip(',')},
base AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS n, bucket,
         CAST(CAST('0x' || bucket AS UBIGINT) % {SEQ_PACK_SHARDS} AS INT) AS shard
  FROM (SELECT doc_id, words,
               substr(md5(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}'), 1, 8) AS bucket
        FROM w)),
t AS MATERIALIZED (
  SELECT shard, doc_id, n,
         row_number() OVER (PARTITION BY shard ORDER BY bucket, doc_id) AS rn
  FROM base),
rec AS (
  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin, CAST(0 AS INT) AS pos,
         n AS cur
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n,
         CASE WHEN r.cur + t.n > {SEQ_PACK_CAP} THEN r.bin + 1 ELSE r.bin END,
         CASE WHEN r.cur + t.n > {SEQ_PACK_CAP} THEN 0 ELSE r.pos + 1 END,
         CASE WHEN r.cur + t.n > {SEQ_PACK_CAP} THEN t.n ELSE r.cur + t.n END
  FROM rec r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1)
SELECT doc_id, shard, bin, pos, n AS n_tokens
FROM rec ORDER BY doc_id"""


QF_SALT_SQL = """
s0 AS (SELECT doc_id,
  CASE CAST(doc_id % 5 AS INT)
    WHEN 0 THEN 'one two'
    WHEN 1 THEN text || repeat(' ;;!?.', 40)
    WHEN 2 THEN repeat('alpha beta gamma ', 30)
    WHEN 3 THEN repeat('w ', 6000)
    ELSE text END AS text
  FROM documents)
"""


def _quality_filter_sql() -> str:
    stop_list = "'the','a','of','to','and','in','is','on','for','with'"
    return f"""
WITH {QF_SALT_SQL.strip()},
w AS (SELECT doc_id, text,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS words
      FROM s0),
s AS (SELECT doc_id, len(words) AS n_tokens, length(text) AS n_chars,
             length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct,
             len(list_filter(words, x -> x IN ({stop_list}))) AS stops,
             CASE WHEN len(words) >= 3
                  THEN list_transform(range(1, len(words) - 1),
                         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                  ELSE [] END AS ngs
      FROM w),
f AS (SELECT doc_id, n_tokens,
             n_tokens < 5 AS too_short,
             n_tokens > 5000 AS too_long,
             punct / greatest(n_chars, 1) > 0.12 AS high_punct,
             stops / greatest(n_tokens, 1) < 0.02 AS low_stop,
             (CASE WHEN len(ngs) > 0
                   THEN 1.0 - len(list_distinct(ngs)) / len(ngs)
                   ELSE 0.0 END) > 0.15 AS repetitive
      FROM s)
SELECT doc_id, n_tokens, too_short, too_long, high_punct, low_stop, repetitive,
       NOT (too_short OR too_long OR high_punct OR low_stop OR repetitive) AS keep
FROM f ORDER BY doc_id"""


def _lm_score_sql() -> str:
    return f"""
WITH {DOC_WORDS.strip().rstrip(',')},
t AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
vocab AS (SELECT term, sum(tf) AS c FROM tf GROUP BY term),
nn AS (SELECT sum(c) AS n FROM vocab),
q AS (SELECT doc_id, tf,
             CAST(floor(tf * ln(c / CAST(nn.n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS q
      FROM tf JOIN vocab USING (term) CROSS JOIN nn)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(sum(q) / 1e6 / sum(tf), 6) AS lm_score
FROM q GROUP BY doc_id ORDER BY doc_id"""


def _eigen_sql() -> str:
    """Unrolled normalized power iteration — the eigen_program recurrence
    verbatim: r_t = A^T r_{t-1} / ||r_{t-1}||_2, final vector re-normalized."""
    ctes = [
        RING_GRAPH.strip().rstrip(","),
        "r0 AS MATERIALIZED (SELECT id, CAST(1 AS DOUBLE) AS x FROM rv)",
    ]
    for t in range(1, EIGEN_STEPS + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT e.dst AS id,
         sum(r.x) / (SELECT sqrt(sum(x * x)) FROM r{t - 1}) AS x
  FROM edges e JOIN r{t - 1} r ON r.id = e.src GROUP BY e.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.id,
       round(coalesce(r.x, 0) / (SELECT sqrt(sum(x * x)) FROM r{EIGEN_STEPS}), 8)
         AS score_r
FROM rv v LEFT JOIN r{EIGEN_STEPS} r ON v.id = r.id ORDER BY v.id"""
    )


def _build_order_sql() -> str:
    """dag_cycles fixture at group=200, SCC via transitive closure (the
    scc_dag_cycles oracle with B=200), then longest-path levels on the
    condensation with a second recursive CTE."""
    B = BUILD_ORDER_GROUP
    return f"""
WITH RECURSIVE
nn AS (SELECT count(*) AS n FROM part),
ids AS (SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS i FROM part),
raw AS (
  SELECT i AS src, (i // {B}) * {B} + ((i % {B}) + 1) % {B} AS dst FROM ids
   WHERE NOT (i // {B} = 1 AND (i % {B} = {B - 6} OR i % {B} = {B - 1}))
  UNION ALL
  SELECT i, (i // {B}) * {B} FROM ids WHERE i // {B} = 1 AND i % {B} = {B - 6}
  UNION ALL
  SELECT i, (i // {B}) * {B} + ((i % {B}) * 7 + 3) % {B} FROM ids WHERE i // {B} <> 1
  UNION ALL
  SELECT i, (i // {B}) * {B} + ((i % {B}) * 7 + 3) % {B - 5} FROM ids
   WHERE i // {B} = 1 AND i % {B} < {B - 5}
  UNION ALL
  SELECT i, i - {B} FROM ids WHERE i >= {B}),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM raw
  WHERE dst >= 0 AND dst < (SELECT n FROM nn) AND src <> dst),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
mins AS (
  SELECT r1.src AS id, min(r1.dst) AS mu
  FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src
  GROUP BY r1.src),
comp AS MATERIALIZED (
  SELECT v.i AS id, least(v.i, coalesce(m.mu, v.i)) AS scc
  FROM ids v LEFT JOIN mins m ON v.i = m.id),
cedges AS MATERIALIZED (
  SELECT DISTINCT cs.scc AS src, cd.scc AS dst
  FROM edges e JOIN comp cs ON e.src = cs.id JOIN comp cd ON e.dst = cd.id
  WHERE cs.scc <> cd.scc),
lv AS (
  SELECT scc AS id, 0 AS lvl FROM (SELECT DISTINCT scc FROM comp)
  UNION
  SELECT e.dst, l.lvl + 1 FROM lv l JOIN cedges e ON l.id = e.src
  WHERE l.lvl < 64),
lvl AS (SELECT id, max(lvl) AS level FROM lv GROUP BY id)
SELECT CAST(c.id AS BIGINT) AS id, CAST(c.scc AS BIGINT) AS comp,
       CAST(l.level AS BIGINT) AS level
FROM comp c JOIN lvl l ON c.scc = l.id ORDER BY id"""


def _hyperball_sql() -> str:
    """Exact-register HyperBall twin: recursive 3-hop balls, md5 registers
    per member (the hll_distinct convention), per-vertex estimate with the
    identical literals as operators/hyperball.py."""
    from subgraph_isomorphism_pregel_spark.operators.sketches import hll_params

    m, W, R, num = hll_params(HYPERBALL_P)
    mask = (1 << W) - 1
    return f"""
WITH RECURSIVE
{RING_GRAPH.strip().rstrip(',')},
reach AS (
  SELECT id AS v, id AS u, 0 AS d FROM rv
  UNION
  SELECT r.v, e.dst, r.d + 1 FROM reach r JOIN edges e ON r.u = e.src
  WHERE r.d < {HYPERBALL_R}),
ball AS (SELECT DISTINCT v, u FROM reach),
h AS (SELECT u,
             CAST(CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 8) AS UBIGINT)
               AS BIGINT) AS h32
      FROM (SELECT DISTINCT u FROM ball)),
rk AS (SELECT u, h32 // {mask + 1} AS b,
              {W} - (CASE WHEN h32 % {mask + 1} = 0 THEN 0
                          ELSE length(bin(h32 % {mask + 1})) END) + 1 AS r
       FROM h),
regs AS (SELECT ball.v, rk.b, max(rk.r) AS M
         FROM ball JOIN rk ON ball.u = rk.u GROUP BY ball.v, rk.b),
agg AS (SELECT v, count(*) AS nb,
               sum(2.0 ** ({R} - M)) AS s_present
        FROM regs GROUP BY v)
SELECT v AS id,
       round(CASE WHEN {num!r} / (s_present + ({m} - nb) * {float(2 ** R)!r})
                       <= {2.5 * m!r} AND ({m} - nb) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - nb))
                  ELSE {num!r} / (s_present + ({m} - nb) * {float(2 ** R)!r}) END,
             6) AS est_ball_r
FROM agg ORDER BY v"""


def _neighborhood_fn_sql() -> str:
    """HyperANF twin: minimal-distance balls for every radius 1..R, exact
    registers per member, per-vertex estimates quantized at 1e-6 and
    int64-summed — the kernel's est_micro fold verbatim."""
    from subgraph_isomorphism_pregel_spark.operators.sketches import hll_params

    m, W, R, num = hll_params(HYPERBALL_P)
    mask = (1 << W) - 1
    radii = ", ".join(str(r) for r in range(1, HYPERBALL_R + 1))
    return f"""
WITH RECURSIVE
{RING_GRAPH.strip().rstrip(',')},
reach AS (
  SELECT id AS v, id AS u, 0 AS d FROM rv
  UNION
  SELECT r.v, e.dst, r.d + 1 FROM reach r JOIN edges e ON r.u = e.src
  WHERE r.d < {HYPERBALL_R}),
md AS MATERIALIZED (SELECT v, u, min(d) AS md FROM reach GROUP BY v, u),
h AS (SELECT u,
             CAST(CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 8) AS UBIGINT)
               AS BIGINT) AS h32
      FROM (SELECT DISTINCT u FROM md)),
rk AS MATERIALIZED (
  SELECT u, h32 // {mask + 1} AS b,
         {W} - (CASE WHEN h32 % {mask + 1} = 0 THEN 0
                     ELSE length(bin(h32 % {mask + 1})) END) + 1 AS rr
  FROM h),
radii AS (SELECT unnest([{radii}]) AS ra),
regs AS (SELECT radii.ra, md.v, rk.b, max(rk.rr) AS M
         FROM radii JOIN md ON md.md <= radii.ra JOIN rk ON md.u = rk.u
         GROUP BY radii.ra, md.v, rk.b),
agg AS (SELECT ra, v, count(*) AS nb, sum(2.0 ** ({R} - M)) AS s_present
        FROM regs GROUP BY ra, v),
est AS (SELECT ra, v,
               CASE WHEN {num!r} / (s_present + ({m} - nb) * {float(2 ** R)!r})
                         <= {2.5 * m!r} AND ({m} - nb) > 0
                    THEN {float(m)!r} * ln({float(m)!r} / ({m} - nb))
                    ELSE {num!r} / (s_present + ({m} - nb) * {float(2 ** R)!r}) END
                 AS e
        FROM agg)
SELECT CAST(ra AS INT) AS r,
       CAST(sum(CAST(floor(e * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS n_est_micro
FROM est GROUP BY ra ORDER BY r"""


def _effdiam_sql() -> str:
    """Effective-diameter twin: the nf CTE chain + the interpolation
    arithmetic of operators/hyperball.py::effective_diameter verbatim
    (radius pinned at 3)."""
    assert HYPERBALL_R == 3
    a = EFFDIAM_ALPHA
    s = _neighborhood_fn_sql()
    head, tail = s.rsplit("SELECT CAST(ra AS INT) AS r,", 1)
    nf_cte = (
        head.rstrip()
        + ",\nnf AS (SELECT CAST(ra AS INT) AS r,"
        + tail.replace("ORDER BY r", ")")
    )
    return f"""{nf_cte}
SELECT round(CASE
    WHEN CAST(n1 AS DOUBLE) >= {a!r} * CAST(n3 AS DOUBLE) THEN 1.0
    WHEN CAST(n2 AS DOUBLE) >= {a!r} * CAST(n3 AS DOUBLE)
      THEN 1.0 + ({a!r} * CAST(n3 AS DOUBLE) - CAST(n1 AS DOUBLE))
                 / (CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE))
    ELSE 2.0 + ({a!r} * CAST(n3 AS DOUBLE) - CAST(n2 AS DOUBLE))
               / (CAST(n3 AS DOUBLE) - CAST(n2 AS DOUBLE))
  END, 6) AS eff_diameter
FROM (SELECT max(CASE WHEN r = 1 THEN n_est_micro END) AS n1,
             max(CASE WHEN r = 2 THEN n_est_micro END) AS n2,
             max(CASE WHEN r = 3 THEN n_est_micro END) AS n3
      FROM nf)"""


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank_supply": _pagerank_sql(),
        "corpus_pagerank": _corpus_pagerank_sql(),
        "ppr_supply": _ppr_sql(),
        "hits_supply": _hits_sql(),
        "docs_split": _docs_split_sql(),
        "docs_stratified": _docs_stratified_sql(),
        "docs_hash_topk": _docs_hash_topk_sql(),
        "seq_pack": _seq_pack_sql(),
        "pack_efficiency": _seq_pack_sql().replace(
            """SELECT doc_id, shard, bin, pos, n AS n_tokens
FROM rec ORDER BY doc_id""",
            f"""SELECT shard, max(bin) + 1 AS n_bins,
       CAST(sum(n) AS BIGINT) AS tokens,
       round(CAST(sum(n) AS BIGINT) / ((max(bin) + 1) * {SEQ_PACK_CAP}), 6)
         AS fill_ratio
FROM rec GROUP BY shard ORDER BY shard""",
        ),
        "quality_filter": _quality_filter_sql(),
        "bpe_merges": _bpe_sql(),
        "pipeline_docs": _pipeline_sql(),
        "token_count_bpe": r"""
WITH s0 AS (SELECT doc_id,
            text || ' v' || CAST(doc_id AS VARCHAR) || '.0 #tag!' AS text
            FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
       len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_marks
FROM s0 ORDER BY doc_id""",
        "lm_score": _lm_score_sql(),
        "eigencentrality_ring": _eigen_sql(),
        "hyperball_ring": _hyperball_sql(),
        "neighborhood_fn_ring": _neighborhood_fn_sql(),
        "effdiam_ring": _effdiam_sql(),
        "funnel_events": f"""
WITH s1 AS (SELECT user_id AS u, min(ts) AS t0 FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id AS u, min(e.ts) AS t0 FROM events e
       JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t0
       WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id),
s3 AS (SELECT e.user_id AS u, min(e.ts) AS t0 FROM events e
       JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t0
       WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id),
c AS (SELECT CAST(1 AS INT) AS step_no, '{FUNNEL_STEPS[0]}' AS step, count(*) AS users FROM s1
      UNION ALL SELECT CAST(2 AS INT), '{FUNNEL_STEPS[1]}', count(*) FROM s2
      UNION ALL SELECT CAST(3 AS INT), '{FUNNEL_STEPS[2]}', count(*) FROM s3)
SELECT step_no, step, users,
       round(CAST(users AS DOUBLE) / first_value(users) OVER (ORDER BY step_no), 6) AS conv_r
FROM c ORDER BY step_no""",
        "markov_events": """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events),
cnt AS (SELECT prev_type, next_type, count(*) AS n FROM seq
        WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
tot AS (SELECT prev_type, sum(n) AS tot FROM cnt GROUP BY prev_type)
SELECT c.prev_type, c.next_type, c.n,
       round(CAST(c.n AS DOUBLE) / t.tot, 6) AS prob_r
FROM cnt c JOIN tot t USING (prev_type)
ORDER BY prev_type, next_type""",
        "anomalies_events": """
WITH b AS (SELECT event_id AS id, event_type AS grp, value,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS q
           FROM events),
m AS (SELECT grp, count(*) AS n, CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS ss
      FROM b GROUP BY grp),
z AS (SELECT b.id, b.grp, b.value,
             round(CASE WHEN sqrt(CAST(m.n AS DOUBLE) * CAST(m.ss AS DOUBLE)
                                  - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)) > 0
                        THEN (CAST(m.n AS DOUBLE) * CAST(b.q AS DOUBLE) - CAST(m.s AS DOUBLE))
                             / sqrt(CAST(m.n AS DOUBLE) * CAST(m.ss AS DOUBLE)
                                    - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE))
                        ELSE 0.0 END, 6) AS z_r
      FROM b JOIN m USING (grp))
SELECT id AS event_id, grp AS event_type, value, z_r
FROM z WHERE abs(z_r) > 3.0 ORDER BY id""",
        "retention_events": """
WITH act AS (SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS day FROM events),
coh AS (SELECT u, min(day) AS cohort_day FROM act GROUP BY u)
SELECT c.cohort_day, a.day - c.cohort_day AS offset_day, count(DISTINCT a.u) AS users
FROM act a JOIN coh c USING (u)
GROUP BY c.cohort_day, offset_day ORDER BY cohort_day, offset_day""",
        "gapfill_events": f"""
WITH b AS (SELECT event_type,
                  CAST(floor(epoch_us(ts) / ({GAPFILL_BUCKET_S} * 1000000.0)) AS BIGINT)
                    AS bucket_id,
                  value
           FROM events),
a AS (SELECT event_type, bucket_id, count(*) AS n, round(sum(value), 6) AS val_obs
      FROM b GROUP BY event_type, bucket_id),
r AS (SELECT event_type, unnest(range(min(bucket_id), max(bucket_id) + 1)) AS bucket_id
      FROM a GROUP BY event_type)
SELECT r.event_type, r.bucket_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n,
       last_value(a.val_obs IGNORE NULLS) OVER (
         PARTITION BY r.event_type ORDER BY r.bucket_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val,
       a.n IS NULL AS filled
FROM r LEFT JOIN a ON r.event_type = a.event_type AND r.bucket_id = a.bucket_id
ORDER BY r.event_type, r.bucket_id""",
        # linear interpolation: operand order mirrors the operator's lerp
        # verbatim so the doubles are bit-identical
        "gapfill_interp_events": f"""
WITH b AS (SELECT event_type,
                  CAST(floor(epoch_us(ts) / ({GAPFILL_BUCKET_S} * 1000000.0)) AS BIGINT)
                    AS bucket_id,
                  value
           FROM events),
a AS (SELECT event_type, bucket_id, count(*) AS n, round(sum(value), 6) AS val_obs
      FROM b GROUP BY event_type, bucket_id),
r AS (SELECT event_type, unnest(range(min(bucket_id), max(bucket_id) + 1)) AS bucket_id
      FROM a GROUP BY event_type),
w AS (SELECT r.event_type, r.bucket_id, a.n, a.val_obs,
       last_value(a.val_obs IGNORE NULLS) OVER (
         PARTITION BY r.event_type ORDER BY r.bucket_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       last_value(CASE WHEN a.n IS NOT NULL THEN r.bucket_id END IGNORE NULLS) OVER (
         PARTITION BY r.event_type ORDER BY r.bucket_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
       first_value(a.val_obs IGNORE NULLS) OVER (
         PARTITION BY r.event_type ORDER BY r.bucket_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       first_value(CASE WHEN a.n IS NOT NULL THEN r.bucket_id END IGNORE NULLS) OVER (
         PARTITION BY r.event_type ORDER BY r.bucket_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM r LEFT JOIN a ON r.event_type = a.event_type AND r.bucket_id = a.bucket_id)
SELECT event_type, bucket_id,
       CAST(coalesce(n, 0) AS BIGINT) AS n,
       CASE WHEN n IS NOT NULL THEN val_obs
            ELSE round(pv + (nv - pv) * ((bucket_id - pb) / (nb - pb)), 6)
       END AS val,
       n IS NULL AS filled
FROM w ORDER BY event_type, bucket_id""",
        "decontaminate": f"""
WITH {SHINGLES.strip().rstrip(',')},
bm AS (SELECT DISTINCT s FROM sh WHERE doc_id % {DECONTAM_MOD} = 0),
tr AS (SELECT doc_id, s FROM sh WHERE doc_id % {DECONTAM_MOD} <> 0),
h AS (SELECT doc_id, count(*) AS n FROM tr JOIN bm USING (s) GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
WHERE d.doc_id % {DECONTAM_MOD} <> 0 ORDER BY d.doc_id""",
        "build_order_dag": _build_order_sql(),
        "kmeans_embeddings": _kmeans_sql(),
        "rich_club_supply": f"""
WITH {SUPPLY_EDGES.strip().rstrip(',')},
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst),
deg AS (SELECT id, count(*) AS deg
        FROM (SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
        GROUP BY id),
ed AS (SELECT least(du.deg, dv.deg) AS mindeg
       FROM und JOIN deg du ON du.id = und.u JOIN deg dv ON dv.id = und.v),
ks AS (SELECT CAST(unnest({RICH_CLUB_KS}) AS BIGINT) AS k),
nk AS (SELECT ks.k, count(d.id) AS n_k FROM ks LEFT JOIN deg d ON d.deg > ks.k GROUP BY ks.k),
ek AS (SELECT ks.k, count(e.mindeg) AS e_k FROM ks LEFT JOIN ed e ON e.mindeg > ks.k GROUP BY ks.k)
SELECT nk.k, nk.n_k, ek.e_k,
       round(CASE WHEN nk.n_k >= 2
                  THEN 2.0 * ek.e_k / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE)
                  ELSE 0.0 END, 6) AS phi_r
FROM nk JOIN ek USING (k) ORDER BY k""",
        "adamic_adar_supply": _adamic_adar_sql(),
        "jaccard_links_supply": _jaccard_links_sql(),
        "copurchase_graph": """
WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
sz AS (SELECT g FROM m GROUP BY g HAVING count(*) <= 1024),
k AS (SELECT m.g, m.i FROM m JOIN sz USING (g)),
p AS (SELECT a.i AS item_a, b.i AS item_b
      FROM k a JOIN k b ON a.g = b.g AND a.i < b.i)
SELECT item_a, item_b, count(*) AS weight
FROM p GROUP BY item_a, item_b HAVING count(*) >= 2
ORDER BY item_a, item_b""",
        "walks_ring": _walks_sql(),
        "node2vec_ring": _node2vec_sql(),
        "quantize_embeddings": """
WITH s AS (SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
           FROM embeddings)
SELECT vec_id, sc AS scale,
       array_to_string(list_transform(embedding,
         x -> CAST(CAST(floor(CAST(x AS DOUBLE)
                / (CASE WHEN sc = 0.0 THEN 1.0 ELSE sc END) * 127.0 + 0.5)
              AS INT) AS VARCHAR)), ',') AS codes_csv
FROM s ORDER BY vec_id""",
        "clustering_coeff_ring": _clustering_coeff_sql(),
        "khop_sample_ring": _khop_sql(),
        "mis_ring": _mis_sql(),
        # MSF oracle in closed form: the weighted ring's only light edges
        # are the path i—(i+1), so the unique forest under (w, u, v) is
        # the path with its formula weights (sources/graph.py docstring)
        "mst_ring": """
WITH nn AS (SELECT count(*) AS n FROM part),
ids AS (SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS i FROM part)
SELECT CAST(i AS BIGINT) AS u, CAST(i + 1 AS BIGINT) AS v,
       CAST(1 + (i % 7) AS DOUBLE) AS w
FROM ids WHERE i < (SELECT n FROM nn) - 1 ORDER BY u, v""",
        "matching_ring": _matching_sql(),
        "coloring_ring": _coloring_sql(),
        "louvain_ring": _louvain_sql(),
        # chunk enumeration: DuckDB's exclusive range stop (n - overlap)
        # generates the same start set as Spark's inclusive sequence
        # endpoint (n - overlap - 1); list slice is 1-based inclusive and
        # truncates at the end like Spark's slice
        "chunk_docs": f"""
WITH {DOC_WORDS.strip()},
st AS (SELECT doc_id, words,
              unnest(range(0, greatest(len(words) - {CHUNK_OVERLAP}, 1),
                           {CHUNK_MAX_TOKENS - CHUNK_OVERLAP})) AS s
       FROM w)
SELECT doc_id,
       CAST(s // {CHUNK_MAX_TOKENS - CHUNK_OVERLAP} AS INT) AS chunk_id,
       CAST(s AS INT) AS start_token,
       CAST(len(words[s + 1 : s + {CHUNK_MAX_TOKENS}]) AS INT) AS n_tokens,
       array_to_string(words[s + 1 : s + {CHUNK_MAX_TOKENS}], ' ') AS chunk_text
FROM st ORDER BY doc_id, chunk_id""",
        # integer-exact mixture thresholds: floor(sqrt(n)*1e6) weights
        # (correctly-rounded sqrt -> engine-identical), exact integer sum,
        # one HUGEINT division per domain, hex-string bucket compare —
        # operators/sampling.py temperature_mixture verbatim
        "mixture_docs": f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
w AS (SELECT lang, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT) AS sw
      FROM c),
t AS (SELECT sum(sw) AS tot FROM w),
thr AS (SELECT lang,
               CASE WHEN (CAST(4294967296 AS HUGEINT) * {MIXTURE_TARGET} * sw)
                         // (t.tot * n) >= 4294967296
                    THEN 'gggggggg'
                    ELSE lpad(lower(to_hex(CAST(
                      (CAST(4294967296 AS HUGEINT) * {MIXTURE_TARGET} * sw)
                      // (t.tot * n) AS BIGINT))), 8, '0') END AS th
        FROM w, t)
SELECT d.doc_id, d.lang FROM documents d
JOIN thr ON d.lang = thr.lang
WHERE substring(md5(CAST(d.doc_id AS VARCHAR) || '{MIXTURE_SALT}'), 1, 8) < thr.th
ORDER BY d.doc_id""",
        # duplicate-span scrub: same position enumeration as chunk_docs,
        # covered indices via unnest(range), survivors via a list
        # comprehension over 0-based indices
        "dedup_spans": f"""
WITH {DOC_WORDS.strip()},
pos AS (SELECT doc_id, words, unnest(range(0, len(words) - {SPAN_K} + 1)) AS p
        FROM w WHERE len(words) >= {SPAN_K}),
occ AS MATERIALIZED (
  SELECT doc_id, p, array_to_string(words[p + 1 : p + {SPAN_K}], ' ') AS s
  FROM pos),
dup AS (SELECT s FROM occ GROUP BY s HAVING count(*) >= 2),
covs AS (SELECT doc_id, list(DISTINCT i) AS cov FROM (
           SELECT doc_id, unnest(range(p, p + {SPAN_K})) AS i
           FROM occ JOIN dup USING (s)) GROUP BY doc_id)
SELECT w.doc_id,
       coalesce(array_to_string(
         [w.words[i + 1] FOR i IN range(0, len(w.words))
          IF cv.cov IS NULL OR NOT list_contains(cv.cov, i)], ' '), '') AS clean_text,
       CAST(coalesce(len(cv.cov), 0) AS INT) AS n_removed
FROM w LEFT JOIN covs cv USING (doc_id)
ORDER BY w.doc_id""",
        "densest_ring_core": _densest_sql(),
        "shuffle_shards_docs": f"""
WITH b AS (SELECT doc_id,
                  substring(md5(CAST(doc_id AS VARCHAR) || '{SHARD_SALT}'), 1, 8) AS bk
           FROM documents),
r AS (SELECT doc_id, row_number() OVER (ORDER BY bk, doc_id) - 1 AS rk FROM b)
SELECT doc_id, CAST(rk % {SHARD_N} AS INT) AS shard,
       CAST(rk // {SHARD_N} AS BIGINT) AS rank_in_shard
FROM r ORDER BY doc_id""",
        "asof_events": ASOF_SQL,
        # forward: earliest purchase at-or-after each click, within 2h;
        # equal-ts ties to the greatest payload like the backward twin
        "asof_events_forward": """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT event_id, user_id, matched_event_id, round(matched_value, 6) AS matched_value_r FROM (
  SELECT l.event_id, l.user_id, r.event_id AS matched_event_id, r.value AS matched_value,
         row_number() OVER (PARTITION BY l.event_id ORDER BY r.ts ASC, r.event_id DESC) AS rn
  FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
       AND epoch_us(r.ts) - epoch_us(l.ts) <= CAST(7200000000 AS BIGINT))
WHERE rn = 1 ORDER BY event_id""",
        "range_join_events": RANGE_JOIN_SQL,
        "time_rollup_events": TIME_ROLLUP_SQL,
        # CUBE grouping-id convention: first dim = most significant bit,
        # identical in Spark's grouping_id() and SQL GROUPING()
        "cube_events": """
WITH e AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hh, value
           FROM events)
SELECT event_type, hh,
       CAST(GROUPING(event_type) * 2 + GROUPING(hh) AS BIGINT) AS gid,
       count(*) AS n,
       round(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) / 1e6, 6) AS sum_r
FROM e GROUP BY CUBE (event_type, hh)
ORDER BY gid ASC, event_type ASC NULLS FIRST, hh ASC NULLS FIRST""",
        "stream_rollup": STREAM_ROLLUP_SQL,
        "bloom_docs": _bloom_sql(),
        "wsssp_ring": _wsssp_sql(),
        # SCC oracle: mutual transitive reachability over the identical
        # SQL-built directed fixture; scc(v) = min id mutually reachable
        # closed-form bipartiteness: ring r of the disjoint-cycles fixture
        # has (n-1-r)//17 + 1 members and is bipartite iff that is even;
        # hash-min CC labels it r (the ring minimum) — the oracle never
        # builds a double cover, so a reduction bug cannot cancel
        "bipartite_rings": """
WITH nn AS (SELECT count(*) AS n FROM part),
r AS (SELECT unnest(range(0, 17)) AS r)
SELECT CAST(r AS BIGINT) AS component,
       CAST(((SELECT n FROM nn) - 1 - r) // 17 + 1 AS BIGINT) AS n_vertices,
       (((SELECT n FROM nn) - 1 - r) // 17 + 1) % 2 = 0 AS is_bipartite
FROM r ORDER BY component""",
        # with v (v itself included via the LEFT JOIN + least)
        "scc_dag_cycles": """
WITH RECURSIVE
nn AS (SELECT count(*) AS n FROM part),
ids AS (SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS i FROM part),
raw AS (
  SELECT i AS src, (i // 50) * 50 + ((i % 50) + 1) % 50 AS dst FROM ids
   WHERE NOT (i // 50 = 1 AND (i % 50 = 44 OR i % 50 = 49))
  UNION ALL
  SELECT i, (i // 50) * 50 FROM ids WHERE i // 50 = 1 AND i % 50 = 44
  UNION ALL
  SELECT i, (i // 50) * 50 + ((i % 50) * 7 + 3) % 50 FROM ids WHERE i // 50 <> 1
  UNION ALL
  SELECT i, (i // 50) * 50 + ((i % 50) * 7 + 3) % 45 FROM ids
   WHERE i // 50 = 1 AND i % 50 < 45
  UNION ALL
  SELECT i, i - 50 FROM ids WHERE i >= 50),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM raw
  WHERE dst >= 0 AND dst < (SELECT n FROM nn) AND src <> dst),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
mins AS (
  SELECT r1.src AS id, min(r1.dst) AS mu
  FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src
  GROUP BY r1.src)
SELECT CAST(v.i AS BIGINT) AS id,
       CAST(least(v.i, coalesce(m.mu, v.i)) AS BIGINT) AS scc
FROM ids v LEFT JOIN mins m ON v.i = m.id
ORDER BY id
""",
        "landmarks_ring": _landmarks_sql(),
        "harmonic_ring": _harmonic_sql(),
        "closeness_ring": _closeness_sql(),
        "wl_colors_ring": _wl_sql(),
        "zorder_events": _zorder_sql(),
        "betweenness_ring": _betweenness_sql(),
        "ktruss_ring": _ktruss_sql(),
        # butterflies = Σ over supplier pairs of C(common parts, 2); the
        # wedge direction (parts as centers) mirrors the Spark plan, but the
        # total is side-invariant so the gate checks the COUNT, not the plan
        "butterflies_supply": """
WITH base AS (SELECT DISTINCT l_partkey AS c, l_suppkey AS x FROM lineitem),
codeg AS (SELECT a.x AS x, b.x AS y, count(*) AS cd
          FROM base a JOIN base b ON a.c = b.c AND a.x < b.x
          GROUP BY a.x, b.x)
SELECT CAST(coalesce(sum(cd * (cd - 1) // 2), 0) AS BIGINT) AS butterflies
FROM codeg""",
        "doc_quantiles": _doc_quantiles_sql(),
        "graph_stats_ring": _graph_stats_sql(),
        "wpagerank_ring": _wpagerank_sql(),
        "katz_ring": _katz_sql(),
        "negative_edges_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')},
e2 AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
v2 AS (SELECT DISTINCT id FROM
        (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
nneg AS (SELECT count(*) AS n FROM v2),
vr AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS r FROM v2),
srcs AS (SELECT DISTINCT src FROM e2),
cand0 AS (SELECT src, CAST(j AS INT) AS j,
            CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || ':'
                  || CAST(j AS VARCHAR) || ':v1'), 1, 8)) AS UBIGINT)
              % (SELECT n FROM nneg) AS r
          FROM srcs CROSS JOIN (SELECT unnest(range(14)) AS j)),
cand1 AS (SELECT c.src, c.j, vr.id AS neg_dst
          FROM cand0 c JOIN vr ON vr.r = c.r
          WHERE c.src <> vr.id),
cand2 AS (SELECT src, j, neg_dst FROM cand1
          QUALIFY row_number() OVER (PARTITION BY src, neg_dst ORDER BY j) = 1),
cand3 AS (SELECT c.* FROM cand2 c
          WHERE NOT EXISTS (SELECT 1 FROM e2
                            WHERE e2.src = c.src AND e2.dst = c.neg_dst)),
ranked AS (SELECT src, neg_dst, j,
             row_number() OVER (PARTITION BY src ORDER BY j) AS rk
           FROM cand3)
SELECT src, neg_dst, j FROM ranked WHERE rk <= 2 ORDER BY src, j""",
        "components_supply": _cc_sql(),
        "labelprop_supply": _lp_sql(),
        "modularity_supply": _modularity_sql(),
        "sssp_supply": f"""
WITH RECURSIVE {SUPPLY_EDGES.strip().rstrip(',')},
reach AS (
  SELECT (SELECT min(id) FROM verts) AS id, 0 AS dist
  UNION
  SELECT e.dst AS id, r.dist + 1
  FROM reach r JOIN edges e ON r.id = e.src
  WHERE r.dist < 64)
SELECT id, min(dist) AS dist FROM reach GROUP BY id ORDER BY id""",
        "kcore_supply": _kcore_sql(),
        "coreness_supply": _coreness_sql(),
        "onion_coreness_supply": _coreness_sql(),
        "degree_distribution_supply": f"""
WITH {SUPPLY_EDGES.strip().rstrip(',')}
SELECT degree, count(*) AS n_vertices FROM (
  SELECT src, count(*) AS degree FROM edges GROUP BY src) d
GROUP BY degree ORDER BY degree""",
        "triangles_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')},
tri AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM edges a JOIN edges b ON a.dst = b.src JOIN edges c ON b.dst = c.src AND c.dst = a.src
  WHERE a.src < a.dst AND a.dst < b.dst),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT v.id, coalesce(t.c, 0) AS tri FROM rv v LEFT JOIN (
  SELECT id, count(*) AS c FROM corners GROUP BY id) t ON v.id = t.id
ORDER BY v.id""",
        # 4-cycles: every rectangle u-x-w-y-u is C(common,2) at BOTH
        # opposite-corner pairs, so sum C(n,2) over ordered pairs / 2
        "rectangles_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')},
cn AS (
  SELECT a.dst AS u, b.dst AS w, count(*) AS n
  FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_wedges,
       CAST(coalesce(max(n), 0) AS BIGINT) AS max_copaths,
       CAST(coalesce(sum(n * (n - 1) // 2) // 2, 0) AS BIGINT) AS c4_count
FROM cn""",
        # 4-cliques counted once via ascending vertex ids over the deduped
        # union of the ring graph and the planted 16-clique; all six edges
        # checked explicitly — independent of the engine's DAG orientation
        "kclique4_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')},
plant AS (
  SELECT a.range AS src, b.range AS dst
  FROM range({KCLIQUE_PLANT}) a, range({KCLIQUE_PLANT}) b
  WHERE a.range <> b.range),
ae AS MATERIALIZED (
  SELECT src, dst FROM edges UNION SELECT src, dst FROM plant)
SELECT CAST(count(*) AS BIGINT) AS cliques4
FROM ae e1
JOIN ae e2 ON e1.src = e2.src AND e1.dst < e2.dst
JOIN ae e3 ON e1.src = e3.src AND e2.dst < e3.dst
JOIN ae e12 ON e12.src = e1.dst AND e12.dst = e2.dst
JOIN ae e13 ON e13.src = e1.dst AND e13.dst = e3.dst
JOIN ae e23 ON e23.src = e2.dst AND e23.dst = e3.dst
WHERE e1.src < e1.dst""",
        "match_path3_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v1.id <> v3.id""",
        "match_triangle_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v3.id = e3.src AND e3.dst = v1.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2""",
        "match_cycle4_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v3.id = e3.src JOIN rv v4 ON e3.dst = v4.id
JOIN edges e4 ON v4.id = e4.src AND e4.dst = v1.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v4.label = 3
  AND v1.id <> v3.id AND v2.id <> v4.id""",
        "match_star_pseudo_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v1.id = e2.src JOIN rv v3 ON e2.dst = v3.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2""",
        "match_path3_pruned_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v1.id <> v3.id""",
        "match_bsp_path3_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v1.id <> v3.id""",
        "match_acbc_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v3.id = e3.src JOIN rv v4 ON e3.dst = v4.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v4.label = 1
  AND v2.id <> v4.id""",
        "match_twin_leaves_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v1.id = e3.src JOIN rv v4 ON e3.dst = v4.id
JOIN edges e4 ON v3.id = e4.src JOIN rv v5 ON e4.dst = v5.id
WHERE v1.label = 0 AND v2.label = 2 AND v3.label = 0
  AND v4.label = 1 AND v5.label = 1
  AND v1.id <> v3.id AND v4.id <> v5.id""",
        "match_triple_deferred_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v1.id = e3.src JOIN rv v4 ON e3.dst = v4.id
JOIN edges e4 ON v2.id = e4.src JOIN rv v5 ON e4.dst = v5.id
JOIN edges e5 ON v3.id = e5.src JOIN rv v6 ON e5.dst = v6.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2
  AND v4.label = 3 AND v5.label = 3 AND v6.label = 3
  AND v4.id <> v5.id AND v4.id <> v6.id AND v5.id <> v6.id""",
        "match_factorized_twin_paths_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v1.id = e3.src JOIN rv v4 ON e3.dst = v4.id
JOIN edges e4 ON v4.id = e4.src JOIN rv v5 ON e4.dst = v5.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2
  AND v4.label = 1 AND v5.label = 2
  AND v2.id <> v4.id AND v3.id <> v5.id""",
        "match_quad_deferred_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v3.id = e3.src JOIN rv v4 ON e3.dst = v4.id
JOIN edges f1 ON v1.id = f1.src JOIN rv w1 ON f1.dst = w1.id
JOIN edges f2 ON v2.id = f2.src JOIN rv w2 ON f2.dst = w2.id
JOIN edges f3 ON v3.id = f3.src JOIN rv w3 ON f3.dst = w3.id
JOIN edges f4 ON v4.id = f4.src JOIN rv w4 ON f4.dst = w4.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v4.label = 3
  AND w1.label = 0 AND w2.label = 0 AND w3.label = 0 AND w4.label = 0
  AND w1.id <> w2.id AND w1.id <> w3.id AND w1.id <> w4.id
  AND w2.id <> w3.id AND w2.id <> w4.id AND w3.id <> w4.id
  AND w1.id <> v1.id AND w2.id <> v1.id AND w3.id <> v1.id AND w4.id <> v1.id""",
        "match_star_of_stars_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv m1 ON e1.dst = m1.id
JOIN edges e2 ON v1.id = e2.src JOIN rv m2 ON e2.dst = m2.id
JOIN edges f1 ON m1.id = f1.src JOIN rv s11 ON f1.dst = s11.id
JOIN edges f2 ON m1.id = f2.src JOIN rv s12 ON f2.dst = s12.id
JOIN edges f3 ON m2.id = f3.src JOIN rv s21 ON f3.dst = s21.id
JOIN edges f4 ON m2.id = f4.src JOIN rv s22 ON f4.dst = s22.id
WHERE v1.label = 0 AND m1.label = 1 AND m2.label = 1
  AND s11.label = 2 AND s12.label = 2 AND s21.label = 2 AND s22.label = 2
  AND m1.id <> m2.id
  AND s11.id <> s12.id AND s11.id <> s21.id AND s11.id <> s22.id
  AND s12.id <> s21.id AND s12.id <> s22.id AND s21.id <> s22.id""",
        # the corpus-derived dependency graph, rebuilt ARITHMETICALLY from
        # the generator's import formula (sources/corpus.py _file_row):
        # an independent derivation, not a translation of the Spark plan
        "match_corpus_wedge": """
WITH rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j)),
lab AS (SELECT r, j, CAST((r*31 + j*7 + 7) % 5 AS INT) AS label FROM rj),
raw AS (SELECT r, j AS sj, (j*7 + 1 + 7) % 50 AS dj FROM rj
        UNION
        SELECT r, j, (j*13 + 5 + 7) % 50 FROM rj),
dir AS (SELECT r, sj, dj FROM raw WHERE sj <> dj),
edges AS MATERIALIZED (
  SELECT r, sj, dj FROM dir UNION SELECT r, dj AS sj, sj AS dj FROM dir)
SELECT count(*) AS cnt
FROM lab v1
JOIN edges e1 ON v1.r = e1.r AND v1.j = e1.sj
JOIN lab v2 ON v2.r = e1.r AND v2.j = e1.dj
JOIN edges e2 ON v2.r = e2.r AND v2.j = e2.sj
JOIN lab v3 ON v3.r = e2.r AND v3.j = e2.dj
WHERE v1.label = 0 AND v2.label = 0 AND v3.label = 0 AND v1.j <> v3.j""",
        # corpus CC histogram: recursive min-propagation over the abstract
        # (repo, file) graph rebuilt from the generator formula — the r key
        # keeps repos independent; histogram compare is id-independent
        "corpus_components": """
WITH RECURSIVE
rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j)),
raw AS (SELECT r, j AS sj, (j*7 + 1 + 7) % 50 AS dj FROM rj
        UNION
        SELECT r, j, (j*13 + 5 + 7) % 50 FROM rj),
dir AS (SELECT r, sj, dj FROM raw WHERE sj <> dj),
edges AS MATERIALIZED (
  SELECT r, sj, dj FROM dir UNION SELECT r, dj AS sj, sj AS dj FROM dir),
reach AS (
  SELECT r, j, j AS comp FROM rj
  UNION
  SELECT e.r, e.dj AS j, rc.comp
  FROM reach rc JOIN edges e ON rc.r = e.r AND rc.j = e.sj),
comp AS (SELECT r, j, min(comp) AS comp FROM reach GROUP BY r, j),
sizes AS (SELECT r, comp, count(*) AS sz FROM comp GROUP BY r, comp)
SELECT sz, count(*) AS n_components FROM sizes GROUP BY sz ORDER BY sz""",
        # snapshot diff: both revisions' DIRECTED edge sets rebuilt from the
        # generator's arithmetic import formulas (rev 1 rewires the second
        # import of files with (3j+s)%10=0 from (13j+5+s) to (17j+3+s) mod
        # fpr — sources/corpus.py _file_row), then set-EXCEPTed both ways
        "corpus_graph_diff": """
WITH rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j)),
raw0 AS (SELECT r, j AS sj, (j*7 + 1 + 7) % 50 AS dj FROM rj
         UNION
         SELECT r, j, (j*13 + 5 + 7) % 50 FROM rj),
e0 AS (SELECT r, sj, dj FROM raw0 WHERE sj <> dj),
raw1 AS (SELECT r, j AS sj, (j*7 + 1 + 7) % 50 AS dj FROM rj
         UNION
         SELECT r, j, CASE WHEN (j*3 + 7) % 10 = 0
                           THEN (j*17 + 3 + 7) % 50
                           ELSE (j*13 + 5 + 7) % 50 END FROM rj),
e1 AS (SELECT r, sj, dj FROM raw1 WHERE sj <> dj),
delta AS (
  SELECT r, sj, dj, 'added' AS change
  FROM (SELECT r, sj, dj FROM e1 EXCEPT SELECT r, sj, dj FROM e0)
  UNION ALL
  SELECT r, sj, dj, 'removed'
  FROM (SELECT r, sj, dj FROM e0 EXCEPT SELECT r, sj, dj FROM e1))
SELECT concat('org', CAST(r % 97 AS VARCHAR), '/repo', CAST(r AS VARCHAR)) AS repo,
       concat('mod_', CAST(sj AS VARCHAR)) AS src_stem,
       concat('mod_', CAST(dj AS VARCHAR)) AS dst_stem,
       change
FROM delta ORDER BY repo, src_stem, dst_stem, change""",
        # license histogram rebuilt from the decorator's j%7 rule alone —
        # the Spark side must DETECT the headers from the content text
        "license_scan_corpus": """
WITH rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j)),
lic AS (SELECT CASE j % 7 WHEN 0 THEN 'mit' WHEN 1 THEN 'apache-2.0'
                          WHEN 2 THEN 'gpl-3.0' ELSE 'none' END AS license
        FROM rj)
SELECT license, count(*) AS n_files FROM lic GROUP BY license ORDER BY license""",
        # flagged-file list rebuilt from the decorator's j%11 rule; repo and
        # path come from the generator's arithmetic (lang = LANGS[(31r+7j+s)%5])
        "secret_scan_corpus": """
WITH rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j)),
f AS (SELECT r, j,
             ['py','js','java','cpp','go'][((r*31 + j*7 + 7) % 5) + 1] AS ext
      FROM rj WHERE j % 11 = 3)
SELECT concat('org', CAST(r % 97 AS VARCHAR), '/repo', CAST(r AS VARCHAR)) AS repo,
       concat('src/mod_', CAST(j AS VARCHAR), '.', ext) AS path,
       CAST(1 AS INTEGER) AS n_aws_key,
       CAST(1 AS INTEGER) AS n_secrets
FROM f ORDER BY repo, path""",
        # clone classes are exactly r mod 5 in the generator (lang pattern
        # (31r+7j+s)%5 and the j-only import formulas); the Spark side must
        # DERIVE the pairs from content via structural fingerprints
        "repo_clones_corpus": """
WITH r AS (SELECT r FROM range(0,20) t(r)),
names AS (SELECT r,
  concat('org', CAST(r % 97 AS VARCHAR), '/repo', CAST(r AS VARCHAR)) AS name
  FROM r),
pairs AS (
  SELECT least(a.name, b.name) AS repo_a, greatest(a.name, b.name) AS repo_b
  FROM names a JOIN names b ON a.r < b.r AND a.r % 5 = b.r % 5)
SELECT repo_a, repo_b FROM pairs ORDER BY repo_a, repo_b""",
        # curation summary rebuilt from the decoration formulas: kept
        # licenses are j%7 in {0,1}, a planted key is j%11=3, and
        # n_still_secret must be 0 — the redaction contract sits in the
        # oracle itself, not just a pytest assertion
        "corpus_curation": """
WITH rj AS (SELECT t1.r, t2.j FROM range(0,20) t1(r), range(0,50) t2(j)),
kept AS (SELECT CASE j % 7 WHEN 0 THEN 'mit' ELSE 'apache-2.0' END AS license,
                CASE WHEN j % 11 = 3 THEN 1 ELSE 0 END AS had
         FROM rj WHERE j % 7 IN (0, 1))
SELECT license, count(*) AS n_files, CAST(sum(had) AS BIGINT) AS n_had_secret,
       CAST(0 AS BIGINT) AS n_still_secret
FROM kept GROUP BY license ORDER BY license""",
        # incremental CC: plain recursive-CTE CC on the UNION of the
        # 17-ring fixture and the 4 bridge vertices — the Spark side must
        # reach this through cold-prior + add_vertices + warm flood
        "cc_incremental_rings": """
WITH RECURSIVE
nn AS (SELECT count(*) AS n FROM part),
ids AS (SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS i FROM part),
succ AS (SELECT i AS src,
                CASE WHEN i + 61 < (SELECT n FROM nn) THEN i + 61
                     ELSE i % 61 END AS dst
         FROM ids),
delta AS (SELECT (SELECT n FROM nn) + k AS src, 2*k AS dst FROM range(0,4) t(k)
          UNION ALL
          SELECT (SELECT n FROM nn) + k, 2*k + 1 FROM range(0,4) t(k)),
raw AS (SELECT src, dst FROM succ UNION ALL SELECT src, dst FROM delta),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM raw UNION SELECT dst AS src, src AS dst FROM raw) t
  WHERE src <> dst),
verts AS (SELECT i AS id FROM ids
          UNION ALL SELECT (SELECT n FROM nn) + k FROM range(0,4) t(k)),
reach AS (
  SELECT id, id AS comp FROM verts
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON r.id = e.src),
comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
sizes AS (SELECT comp, count(*) AS sz FROM comp GROUP BY comp)
SELECT sz, count(*) AS n_components FROM sizes GROUP BY sz ORDER BY sz""",
        # incremental SSSP: bounded recursive-CTE BFS from source 0 on the
        # union edge set (ring fixture + one bridge vertex)
        "sssp_incremental_rings": """
WITH RECURSIVE
nn AS (SELECT count(*) AS n FROM part),
ids AS (SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS i FROM part),
succ AS (SELECT i AS src,
                CASE WHEN i + 61 < (SELECT n FROM nn) THEN i + 61
                     ELSE i % 61 END AS dst
         FROM ids),
delta AS (SELECT (SELECT n FROM nn) AS src, 0 AS dst
          UNION ALL SELECT (SELECT n FROM nn), 1),
raw AS (SELECT src, dst FROM succ UNION ALL SELECT src, dst FROM delta),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM raw UNION SELECT dst AS src, src AS dst FROM raw) t
  WHERE src <> dst),
reach AS (
  SELECT CAST(0 AS BIGINT) AS id, 0 AS dist
  UNION
  SELECT e.dst AS id, r.dist + 1
  FROM reach r JOIN edges e ON r.id = e.src
  WHERE r.dist < 64)
SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM reach GROUP BY id ORDER BY id""",
        "match_cycle4_semijoin_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT count(*) AS cnt
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
JOIN edges e3 ON v3.id = e3.src JOIN rv v4 ON e3.dst = v4.id
JOIN edges e4 ON v4.id = e4.src AND e4.dst = v1.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v4.label = 3
  AND v1.id <> v3.id AND v2.id <> v4.id""",
        "token_count": f"""
WITH {DOC_WORDS.strip().rstrip(',')}
SELECT doc_id, len(words) AS n_tokens FROM w ORDER BY doc_id""",
        "text_stats": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
s AS (SELECT doc_id,
             len(words) AS n_tokens,
             length(text) AS n_chars_calc,
             length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct_count,
             len(list_filter(words, x -> x IN ('the','a','of','to','and','in','is','on','for','with'))) AS stop_count
      FROM w)
SELECT doc_id, n_tokens, n_chars_calc, punct_count, stop_count,
       round((0.2 * (stop_count / greatest(n_tokens, 1))
              + 0.8 * least(n_tokens, 100) / 100.0)
             * (1.0 - punct_count / greatest(n_chars_calc, 1)), 6) AS quality
FROM s ORDER BY doc_id""",
        "langid": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
s AS (SELECT doc_id,
  len(list_filter(words, x -> x IN ('the','is','and','of','a'))) AS s_en,
  len(list_filter(words, x -> x IN ('der','die','und','ist','das'))) AS s_de,
  len(list_filter(words, x -> x IN ('el','la','de','que','los'))) AS s_es,
  len(list_filter(words, x -> x IN ('le','la','et','les','des'))) AS s_fr,
  len(list_filter(words, x -> x IN ('de','le','shi','zai','he'))) AS s_zh
  FROM w),
b AS (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best FROM s)
SELECT doc_id,
       CASE WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de'
            WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
            ELSE 'zh' END AS pred_lang,
       CAST(best AS BIGINT) AS score
FROM b ORDER BY doc_id""",
        "fingerprint": """
SELECT doc_id,
       list_aggregate(
         list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                        i -> md5(substr(text, i, 8))),
         'min') AS fp
FROM documents ORDER BY doc_id""",
        "repetition_score": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
g AS (SELECT doc_id,
        CASE WHEN len(words) >= 3
             THEN list_transform(range(1, len(words) - 1),
                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
             ELSE [] END AS ngs
      FROM w)
SELECT doc_id, len(ngs) AS n_ngrams, len(list_distinct(ngs)) AS n_distinct,
       round(CASE WHEN len(ngs) > 0
                  THEN 1.0 - len(list_distinct(ngs)) / len(ngs)
                  ELSE 0.0 END, 6) AS rep_ratio
FROM g ORDER BY doc_id""",
        "tfidf_topk": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
t AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, term, tf, df,
        round(tf * ln(CAST(n.n AS DOUBLE) / df), 6) AS score
      FROM tf JOIN dfx USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY score DESC, term ASC) AS rnk FROM s)
SELECT doc_id, term, tf, df, score, rnk FROM r WHERE rnk <= 3
ORDER BY doc_id, rnk""",
        "bm25_topk": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
dl AS (SELECT doc_id, CAST(len(words) AS INT) AS dl FROM w),
g AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             CAST(count(*) AS DOUBLE) AS n FROM dl),
t AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t
       WHERE term IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
       GROUP BY doc_id, term),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
c AS (SELECT tf.doc_id,
        CAST(floor(
          ln((g.n - dfx.df + 0.5) / (dfx.df + 0.5) + 1.0)
          * (tf.tf * {BM25_K1 + 1.0!r})
          / (tf.tf + {BM25_K1!r} * (1.0 - {BM25_B!r} + {BM25_B!r} * dl.dl / g.avgdl))
          * 1000000000.0 + 0.5) AS BIGINT) AS q
      FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN g),
s AS (SELECT doc_id, count(*) AS n_hit, round(sum(q) / 1000000000.0, 6) AS score_r
      FROM c GROUP BY doc_id)
SELECT doc_id, n_hit, score_r,
       CAST(row_number() OVER (ORDER BY score_r DESC, doc_id ASC) AS INT) AS rank
FROM s ORDER BY score_r DESC, doc_id ASC LIMIT {BM25_TOPK}""",
        "token_entropy": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
t AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY doc_id, term),
nd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
              count(*) AS n_distinct FROM tf GROUP BY doc_id),
q AS (SELECT tf.doc_id,
        CAST(floor((c / n) * ln(c / n) * 1e9 + 0.5) AS BIGINT) AS q
      FROM tf JOIN nd USING (doc_id)),
s AS (SELECT doc_id, CAST(sum(q) AS BIGINT) AS qs FROM q GROUP BY doc_id)
SELECT s.doc_id, nd.n AS n_tokens, nd.n_distinct,
       round(-(qs / 1e9), 6) AS entropy_r
FROM s JOIN nd USING (doc_id) ORDER BY doc_id""",
        "tfidf_cosine_pairs": """
WITH salted AS (
  SELECT doc_id,
         text || ' q' || CAST(doc_id % 23 AS VARCHAR)
              || ' r' || CAST(doc_id % 19 AS VARCHAR)
              || ' s' || CAST(doc_id % 17 AS VARCHAR)
              || ' u' || CAST(doc_id % 13 AS VARCHAR) AS text
  FROM documents),
w AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS words
      FROM salted),
t AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
wt AS (SELECT doc_id, term, tf * ln(CAST((SELECT n FROM nn) AS DOUBLE) / df) AS w
       FROM tf JOIN dfx USING (term) WHERE df <= 60),
nq AS (SELECT doc_id, sum(CAST(floor(w*w*1e9 + 0.5) AS BIGINT)) AS q
       FROM wt GROUP BY doc_id),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                sum(CAST(floor(a.w*b.w*1e9 + 0.5) AS BIGINT)) AS dq
         FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
c AS (SELECT doc_a, doc_b,
             round((dq/1e9) / (sqrt(na.q/1e9) * sqrt(nb.q/1e9)), 6) AS cos_r
      FROM dots JOIN nq na ON dots.doc_a = na.doc_id
                 JOIN nq nb ON dots.doc_b = nb.doc_id)
SELECT doc_a, doc_b, cos_r FROM c WHERE cos_r >= 0.35 ORDER BY doc_a, doc_b""",
        "dsir_weights": """
WITH w AS (SELECT doc_id, lang,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS words
      FROM documents),
t AS (SELECT doc_id, lang IN ('en') AS is_t, unnest(words) AS tok FROM w),
b AS (SELECT doc_id, is_t,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bucket FROM t),
c AS (SELECT bucket,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             count(*) AS cr
      FROM b GROUP BY bucket),
tot AS (SELECT CAST(sum(ct) + 4096 AS DOUBLE) AS tt,
               CAST(sum(cr) + 4096 AS DOUBLE) AS rt FROM c),
l AS (SELECT bucket,
             CAST(floor(ln(((CAST(ct AS DOUBLE) + 1.0) * rt)
                           / ((CAST(cr AS DOUBLE) + 1.0) * tt)) * 1e9 + 0.5)
                  AS BIGINT) AS q
      FROM c, tot),
d AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(q) AS BIGINT) AS qs
      FROM b JOIN l USING (bucket) GROUP BY doc_id)
SELECT doc_id, n_tokens, round(qs / 1e9 / n_tokens, 6) AS llr_avg
FROM d ORDER BY doc_id""",
        "collocations": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
tok AS (SELECT unnest(words) AS wd FROM w),
tots AS (SELECT (SELECT count(*) FROM tok) AS nt,
                (SELECT CAST(coalesce(sum(greatest(len(words) - 1, 0)), 0) AS BIGINT)
                 FROM w) AS np),
uni AS (SELECT wd, count(*) AS w_n FROM tok GROUP BY wd),
bg AS (SELECT unnest(list_transform(range(1, len(words)), i -> words[i])) AS w1,
              unnest(list_transform(range(1, len(words)), i -> words[i+1])) AS w2
       FROM w WHERE len(words) >= 2),
pair AS (SELECT w1, w2, count(*) AS pair_n FROM bg GROUP BY w1, w2
         HAVING count(*) >= 5),
s AS (SELECT w1, w2, pair_n, u1.w_n AS w1_n, u2.w_n AS w2_n,
        round(ln((pair_n / np) / ((u1.w_n / nt) * (u2.w_n / nt))), 6) AS pmi
      FROM pair JOIN uni u1 ON pair.w1 = u1.wd
                JOIN uni u2 ON pair.w2 = u2.wd
      CROSS JOIN tots),
r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rnk
      FROM s)
SELECT w1, w2, pair_n, w1_n, w2_n, pmi, rnk FROM r WHERE rnk <= 20
ORDER BY rnk""",
        "redact_pii": r"""
WITH s AS (SELECT doc_id,
  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com from 10.0.'
       || CAST(doc_id % 200 AS VARCHAR) || '.7 acct 912345678'
       || CAST(doc_id % 10 AS VARCHAR) AS t0
  FROM documents),
a AS (SELECT doc_id, t0,
  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM s),
b AS (SELECT doc_id, n_email,
  len(regexp_extract_all(t1, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS n_ip,
  regexp_replace(t1, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t2
  FROM a),
c AS (SELECT doc_id, n_email, n_ip,
  len(regexp_extract_all(t2, '\b\d{9,}\b')) AS n_num,
  regexp_replace(t2, '\b\d{9,}\b', '<NUM>', 'g') AS t3
  FROM b)
SELECT doc_id, t3 AS clean_text, CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ip AS BIGINT) AS n_ip, CAST(n_num AS BIGINT) AS n_num
FROM c ORDER BY doc_id""",
        "hll_docs": _hll_sql_twin(),
        "cms_tokens": """
WITH w AS (SELECT list_filter(string_split(trim(text), ' '), x -> x <> '') AS words
           FROM documents),
tok AS (SELECT unnest(words) AS t FROM w),
buck AS (SELECT t, r,
         CAST(CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || t), 1, 8) AS UBIGINT) AS BIGINT) % 256 AS b
         FROM tok, (SELECT unnest(range(0, 3)) AS r)),
counters AS (SELECT r, b, count(*) AS cnt FROM buck GROUP BY r, b),
probe AS (SELECT DISTINCT t, r, b FROM buck),
est AS (SELECT p.t, min(c.cnt) AS est FROM probe p JOIN counters c USING (r, b) GROUP BY p.t)
SELECT t AS token, est FROM est ORDER BY est DESC, t LIMIT 20""",
        "dedup_exact": """
WITH g AS (SELECT md5(text) AS h, min(doc_id) AS canonical_id, count(*) AS group_size
           FROM documents GROUP BY md5(text))
SELECT d.doc_id, g.canonical_id, g.group_size
FROM documents d JOIN g ON md5(d.text) = g.h ORDER BY d.doc_id""",
        "ngram_jaccard": f"""
WITH {SHINGLES.strip().rstrip(',')},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       round(common / (ca.n + cb.n - common), 6) AS jaccard
FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
WHERE round(common / (ca.n + cb.n - common), 6) >= 0.2
ORDER BY doc_a, doc_b""",
        "minhash_signatures": f"""
WITH {SHINGLES.strip().rstrip(',')}
SELECT doc_id,
       {', '.join(f"min(md5('{k}:' || s)) AS h{k}" for k in range(12))}
FROM sh GROUP BY doc_id ORDER BY doc_id""",
        "minhash_lsh_pairs": f"""
WITH {SHINGLES.strip().rstrip(',')},
sig AS (SELECT doc_id,
        {', '.join(f"min(md5('{k}:' || s)) AS h{k}" for k in range(12))}
        FROM sh GROUP BY doc_id),
banded AS (SELECT doc_id,
        {', '.join(f"md5(concat_ws('|', h{b * 3}, h{b * 3 + 1}, h{b * 3 + 2})) AS band{b}" for b in range(4))}
        FROM sig),
cand AS (
  {' UNION '.join(f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM banded a JOIN banded b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id" for b in range(4))}),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT c.doc_a, c.doc_b, count(*) AS common
           FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
           GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, round(common / (ca.n + cb.n - common), 6) AS jaccard
FROM common JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
WHERE round(common / (ca.n + cb.n - common), 6) >= 0.2
ORDER BY doc_a, doc_b""",
        "dedup_survivors": f"""
WITH RECURSIVE {SHINGLES.strip().rstrip(',')},
sig AS (SELECT doc_id,
        {', '.join(f"min(md5('{k}:' || s)) AS h{k}" for k in range(12))}
        FROM sh GROUP BY doc_id),
banded AS (SELECT doc_id,
        {', '.join(f"md5(concat_ws('|', h{b * 3}, h{b * 3 + 1}, h{b * 3 + 2})) AS band{b}" for b in range(4))}
        FROM sig),
cand AS (
  {' UNION '.join(f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM banded a JOIN banded b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id" for b in range(4))}),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT c.doc_a, c.doc_b, count(*) AS common
           FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
           GROUP BY c.doc_a, c.doc_b),
dpairs AS MATERIALIZED (
  SELECT doc_a, doc_b
  FROM common JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
  WHERE round(common / (ca.n + cb.n - common), 6) >= 0.2),
sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM dpairs
  UNION SELECT doc_b, doc_a FROM dpairs),
lab AS (
  SELECT doc_id, doc_id AS canonical FROM documents
  UNION
  SELECT s.b AS doc_id, l.canonical FROM lab l JOIN sym s ON l.doc_id = s.a
)
SELECT doc_id, CAST(min(canonical) AS BIGINT) AS canonical,
       (doc_id = min(canonical)) AS is_survivor
FROM lab GROUP BY doc_id ORDER BY doc_id""",
        "simhash": f"""
WITH {DOC_WORDS.strip().rstrip(',')},
tok AS (SELECT doc_id, md5(unnest(words)) AS h FROM w),
votes AS (SELECT doc_id, g.j,
                 sum(CASE WHEN substr(h, g.j, 1) IN ('8','9','a','b','c','d','e','f')
                          THEN 1 ELSE -1 END) AS sv
          FROM tok, LATERAL generate_series(1, 32) AS g(j)
          GROUP BY doc_id, g.j)
SELECT doc_id,
       CAST(sum(CASE WHEN sv > 0 THEN power(2, j - 1) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id""",
        "cosine_topk": f"""
WITH {EMB_PAIRS.strip().rstrip(',')},
dots AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         round(sum(q.val * d.val) / (qn.norm * dn.norm), 6) AS cos
  FROM p q JOIN p d ON q.pos = d.pos AND q.vec_id <> d.vec_id
  JOIN norms qn ON qn.vec_id = q.vec_id JOIN norms dn ON dn.vec_id = d.vec_id
  WHERE q.vec_id < 20
  GROUP BY q.vec_id, d.vec_id, qn.norm, dn.norm),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM dots)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
        "embedding_dups": f"""
WITH {EMB_PAIRS.strip().rstrip(',')}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(sum(a.val * b.val) / (an.norm * bn.norm), 6) AS cos
FROM p a JOIN p b ON a.pos = b.pos AND a.vec_id < b.vec_id
JOIN norms an ON an.vec_id = a.vec_id JOIN norms bn ON bn.vec_id = b.vec_id
GROUP BY a.vec_id, b.vec_id, an.norm, bn.norm
HAVING round(sum(a.val * b.val) / (an.norm * bn.norm), 6) >= 0.4
ORDER BY vec_a, vec_b""",
        "embedding_dups_lsh": _emb_lsh_sql(threshold=0.4),
        "ann_lsh_topk": _ann_lsh_sql(k=3, n_planes=6),
        "ann_ivf_topk": _ann_ivf_sql(k=3, n_lists=8, n_probe=2),
        "pq_topk": _pq_sql(k=3, m_sub=8, k_codes=8, n_queries=20),
        # stub decode: width/height are bytes 1-2 of sha256(payload); utf-8
        # encoded text can never start with the PNG/JPEG magic bytes, so
        # format is constant 'raw' on this table
        "media_meta": """
WITH m AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS sha
  FROM documents),
hx AS (SELECT media_id, n_bytes, sha,
              strpos('0123456789abcdef', substr(sha, 1, 1)) - 1 AS h1,
              strpos('0123456789abcdef', substr(sha, 2, 1)) - 1 AS h2,
              strpos('0123456789abcdef', substr(sha, 3, 1)) - 1 AS h3,
              strpos('0123456789abcdef', substr(sha, 4, 1)) - 1 AS h4
       FROM m)
SELECT media_id, n_bytes, sha AS sha256,
       CAST(1 + 16 * h1 + h2 AS INT) AS width,
       CAST(1 + 16 * h3 + h4 AS INT) AS height,
       'raw' AS format
FROM hx ORDER BY media_id""",
        # real IHDR parse vs the independent generator formula (45-byte
        # minimal PNG: 8 sig + 25 IHDR chunk + 12 IEND chunk)
        "media_meta_png": """
SELECT doc_id AS media_id,
       CAST(45 AS BIGINT) AS n_bytes,
       CAST(1 + doc_id % 512 AS INT) AS width,
       CAST(1 + (doc_id * 7) % 512 AS INT) AS height,
       'png' AS format
FROM documents ORDER BY media_id""",
        # real SOF0 parse vs the independent generator formula (35-byte
        # minimal JPEG: SOI 2 + APP0 18 + SOF0 13 + EOI 2)
        "media_meta_jpeg": """
SELECT doc_id AS media_id,
       CAST(35 AS BIGINT) AS n_bytes,
       CAST(1 + (doc_id * 3) % 1024 AS INT) AS width,
       CAST(1 + (doc_id * 5) % 1024 AS INT) AS height,
       'jpg' AS format
FROM documents ORDER BY media_id""",
        # real logical-screen-descriptor parse vs the independent generator
        # formula (14-byte minimal GIF: signature 6 + LSD 7 + trailer 1)
        "media_meta_gif": """
SELECT doc_id AS media_id,
       CAST(14 AS BIGINT) AS n_bytes,
       CAST(1 + (doc_id * 11) % 4096 AS INT) AS width,
       CAST(1 + (doc_id * 13) % 4096 AS INT) AS height,
       'gif' AS format
FROM documents ORDER BY media_id""",
        # real BMP PIXEL decode vs the independent generator formula: the
        # oracle re-enumerates every pixel (no bytes involved) and checks
        # exact channel sums + position-weighted sums (row-order-sensitive)
        "bmp_pixel_stats": """
WITH d AS (
  SELECT doc_id AS media_id,
         CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(4 + (doc_id * 3) % 7 AS BIGINT) AS h
  FROM documents),
px AS (
  SELECT media_id, w, h, gx.x AS x, gy.y AS y,
         (media_id + 3 * gx.x + 7 * gy.y) % 256 AS r,
         (2 * media_id + 5 * gx.x + 11 * gy.y) % 256 AS g,
         (media_id + gx.x * gy.y) % 256 AS b
  FROM d, LATERAL unnest(range(0, w)) AS gx(x),
          LATERAL unnest(range(0, h)) AS gy(y))
SELECT media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM((y * w + x) * r) AS BIGINT) AS wsum_r,
       CAST(SUM((y * w + x) * g) AS BIGINT) AS wsum_g,
       CAST(SUM((y * w + x) * b) AS BIGINT) AS wsum_b
FROM px GROUP BY media_id ORDER BY media_id""",
        # real nearest-neighbor resize vs recomputed sample coordinates
        "bmp_resize4": """
WITH d AS (
  SELECT doc_id AS media_id,
         CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(4 + (doc_id * 3) % 7 AS BIGINT) AS h
  FROM documents),
s AS (
  SELECT media_id,
         gj.j AS j, gi.i AS i,
         (gi.i * w) // 4 AS sx, (gj.j * h) // 4 AS sy
  FROM d, LATERAL unnest(range(0, 4)) AS gj(j),
          LATERAL unnest(range(0, 4)) AS gi(i)),
v AS (
  SELECT media_id, j, i,
         (media_id + 3 * sx + 7 * sy) % 256 AS r,
         (2 * media_id + 5 * sx + 11 * sy) % 256 AS g,
         (media_id + sx * sy) % 256 AS b
  FROM s)
SELECT media_id,
       string_agg(CAST(r AS VARCHAR) || ',' || CAST(g AS VARCHAR) || ','
                    || CAST(b AS VARCHAR), ',' ORDER BY j, i) AS thumb_csv
FROM v GROUP BY media_id ORDER BY media_id""",
        # real RIFF/fmt/data chunk walk vs the generator formula (44-byte
        # header + 2-byte samples x channels); duration is the same IEEE
        # double expression n_samples * 1000.0 / rate on both sides
        "audio_meta_wav": """
WITH w AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 2 AS INT) AS channels,
         CAST(8000 * (1 + doc_id % 4) AS INT) AS sample_rate,
         CAST(16 + doc_id % 241 AS BIGINT) AS n_samples
  FROM documents)
SELECT media_id,
       CAST(44 + n_samples * channels * 2 AS BIGINT) AS n_bytes,
       channels, sample_rate, CAST(16 AS INT) AS bits_per_sample, n_samples,
       CAST(n_samples AS DOUBLE) * 1000.0 / sample_rate AS duration_ms
FROM w ORDER BY media_id""",
        # the oracle REGENERATES the waveform from the generator's closed
        # form (never touching the WAV bytes) and aggregates it in SQL:
        # sample i of doc d is (d*31 + i*17) % 2001 - 1000 over the flat
        # interleaved stream of (frames x channels) values
        "audio_features_wav": """
WITH p AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 2 AS INT) AS channels,
         CAST(8000 * (1 + doc_id % 4) AS INT) AS sample_rate,
         CAST((16 + doc_id % 241) * (1 + doc_id % 2) AS BIGINT) AS n_values
  FROM documents),
s AS (
  SELECT media_id, i, (media_id * 31 + i * 17) % 2001 - 1000 AS v
  FROM p, LATERAL unnest(range(0, n_values)) AS g(i)),
z AS (
  SELECT media_id, v, LAG(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
  FROM s),
agg AS (
  SELECT media_id,
         CAST(SUM(v * v) AS BIGINT) AS sum_sq,
         CAST(MAX(ABS(v)) AS INT) AS peak_abs,
         CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_crossings
  FROM z GROUP BY media_id)
SELECT p.media_id, p.channels, p.sample_rate, p.n_values,
       agg.sum_sq, agg.peak_abs, agg.zero_crossings,
       sqrt(CAST(agg.sum_sq AS DOUBLE) / p.n_values) AS rms
FROM p JOIN agg USING (media_id)
ORDER BY media_id""",
        # byte-sliced frames vs a character-sliced oracle — equal because
        # the synthetic corpus is pure ASCII (asserted: octet_length ==
        # length on every row); hex is uppercase on both engines
        "frame_sample": """
WITH f AS (
  SELECT doc_id AS media_id,
         unnest(range(0, CAST(greatest(ceil(octet_length(encode(text))/32.0), 1) AS BIGINT))) AS i,
         text
  FROM documents)
SELECT media_id, CAST(i AS INT) AS frame_no,
       CAST(octet_length(encode(substring(text, CAST(i*32+1 AS BIGINT), 32))) AS INT) AS n_bytes,
       hex(encode(substring(text, CAST(i*32+1 AS BIGINT), 32))) AS frame_hex
FROM f WHERE i % 2 = 0
ORDER BY media_id, frame_no""",
        "stream_dedup": """
SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS bucket_ts
FROM events ORDER BY user_id, event_type, bucket_ts""",
        "icetable_docs": """
SELECT 'snap1' AS snap, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(doc_id) AS BIGINT) AS sum_id
FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
UNION ALL
SELECT 'current_en' AS snap, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(doc_id) AS BIGINT) AS sum_id
FROM documents WHERE lang = 'en' GROUP BY lang
ORDER BY snap, lang""",
        "attrib_join_events": """
SELECT l.event_id AS left_id, r.event_id AS right_id, l.user_id AS user_id,
       epoch_us(r.ts) - epoch_us(l.ts) AS delay_us
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'purchase'
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
ORDER BY left_id, right_id""",
        "windowed_events": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n,
       sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "sessionize_events": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
s AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
                       THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS session_no
  FROM o)
SELECT user_id, session_no, count(*) AS n_events,
       min(ts) AS first_ts, max(ts) AS last_ts,
       sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS total_value
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""",
        "sessionize_native": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(CASE WHEN prev_ts IS NULL
                            OR epoch(ts) - epoch(prev_ts) > 1800
                       THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS session_no
  FROM o)
SELECT user_id, session_no, count(*) AS n_events,
       min(ts) AS first_ts, max(ts) AS last_ts,
       sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS total_value
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""",
        "match_embeddings_path3_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT v1.id AS u_1, v2.id AS u_2, v3.id AS u_3
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 2 AND v1.id <> v3.id
ORDER BY u_1, u_2, u_3""",
        "match_embeddings_factorized_ring": f"""
WITH {RING_GRAPH.strip().rstrip(',')}
SELECT v1.id AS u_1, v2.id AS u_2, v3.id AS u_3
FROM rv v1
JOIN edges e1 ON v1.id = e1.src JOIN rv v2 ON e1.dst = v2.id
JOIN edges e2 ON v2.id = e2.src JOIN rv v3 ON e2.dst = v3.id
WHERE v1.label = 0 AND v2.label = 1 AND v3.label = 0 AND v1.id <> v3.id
ORDER BY u_1, u_2, u_3""",
    }
