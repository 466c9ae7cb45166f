"""Graph construction: reference text format, the golden toy graph, and
deterministic graphs derived from the TPC-H-ish test tables.

The reference reads graphs as whitespace-separated lines
``vID label nbr1ID nbr1Label ...`` with labels taken as the first character's
code point (reference: /root/reference/src/pregel_app_subgraph.h:689-714,
README.md:16-20). We reproduce that format for golden-parity fixtures, but the
engine's native representation is a pair of DataFrames::

    vertices(id: long, label: int)
    edges(src: long, dst: long)        # undirected graphs store both directions

Two *deterministic* derived graphs over the driver-provided TPC-H-ish parquet
tables give the correctness gate SQL-expressible inputs (the same construction
is written in ANSI SQL in ``__spark_entry__.oracle_sql``):

- ``supply_graph``: bipartite part—supplier graph from distinct
  ``(l_partkey, l_suppkey)`` pairs of ``lineitem`` (real FK data, skewed
  degrees — exercises PageRank / connected components / label propagation).
- ``ring_graph``: an arithmetic labeled graph over ``part``'s key space
  (ring + two chord families) — unipartite, contains triangles, labels
  ``id % 4`` — exercises triangle counting and the subgraph matcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPLIER_ID_OFFSET = 1_000_000  # disjoint id spaces for the bipartite graph


def parse_reference_text(spark: SparkSession, text: str) -> tuple[DataFrame, DataFrame]:
    """Parse the reference's vertex-adjacency text format into (vertices, edges).

    Labels are single tokens mapped to the code point of their first character,
    matching the reference parser (/root/reference/src/pregel_app_subgraph.h:701).
    Lines starting with '#' are skipped (:695). The file already lists both
    edge directions; we keep them as-is.
    """
    v_rows, e_rows = [], []
    for line in text.strip().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        tok = line.split()
        vid, lbl = int(tok[0]), ord(tok[1][0])
        v_rows.append((vid, lbl))
        for i in range(2, len(tok), 2):
            e_rows.append((vid, int(tok[i])))
    vertices = spark.createDataFrame(v_rows, "id long, label int")
    edges = spark.createDataFrame(e_rows, "src long, dst long")
    return vertices, edges


# The reference's toy data graph and 4-cycle query, verbatim
# (/root/reference/graphs/toy.txt, /root/reference/graphs/query.txt).
# Golden assertion: the query has exactly 4 isomorphic mappings into the toy
# graph (/root/reference/README.md:83).
TOY_GRAPH_TEXT = """\
1 a	2 c 4 c 5 b
2 c	1 a 3 b 5 b
3 b	2 c 4 c 5 b 13 d
4 c	1 a 3 b 5 b 9 b
5 b	1 a 2 c 3 b 4 c
6 d	7 a 9 b 10 d
7 a	6 d 8 d 10 d 11 a
8 d	7 a 9 b 10 d
9 b	4 c 6 d 8 d 10 d
10 d	6 d 7 a 8 d 9 b
11 a	7 a 12 b 14 b 15 c
12 b	11 a 13 d 15 c
13 d	3 b 12 b 14 b 15 c
14 b	11 a 13 d 15 c
15 c	11 a 12 b 13 d 14 b
"""

TOY_QUERY_TEXT = """\
1 a	2 c 4 c
2 c	1 a 3 b
3 b	2 c 4 c
4 c	1 a 3 b
"""


def parse_query_text(text: str) -> tuple[dict[int, int], set[tuple[int, int]]]:
    """Reference query format -> (query_v: id->label, query_e: directed pairs,
    symmetrized like the reference's addNode (SIQuery.h:293-303))."""
    qv: dict[int, int] = {}
    qe: set[tuple[int, int]] = set()
    for line in text.strip().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        tok = line.split()
        vid, lbl = int(tok[0]), ord(tok[1][0])
        qv[vid] = lbl
        for i in range(2, len(tok), 2):
            w = int(tok[i])
            qe.add((vid, w))
            qe.add((w, vid))
    return qv, qe


def toy_graph(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """The reference's 15-vertex toy data graph (labels a/b/c/d)."""
    v, e = parse_reference_text(spark, TOY_GRAPH_TEXT)
    # toy.txt omits the reverse direction of edges 7-11 and 3-13 in some rows;
    # symmetrize defensively (union both directions, distinct).
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    return v, e


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected closure: both directions, no self loops, distinct."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        edges.unionByName(rev)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def supply_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Bipartite part—supplier graph from lineitem FK pairs (undirected).

    Vertices: p in part keys (label 0) ∪ (SUPPLIER_ID_OFFSET + s) for supplier
    keys (label 1). Edges: distinct supply relationships, both directions.
    Real-data degree skew: a popular part/supplier becomes a hub.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + F.lit(SUPPLIER_ID_OFFSET)).alias("dst"),
    ).distinct()
    edges = symmetrize(pairs)
    vertices = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.when(F.col("id") >= SUPPLIER_ID_OFFSET, 1).otherwise(0))
    )
    return vertices, edges


def dag_cycles_graph(
    spark: SparkSession, sf_dir: str, group: int = 50
) -> tuple[DataFrame, DataFrame]:
    """Deterministic DIRECTED graph over part's key space (SCC fixture).

    ids 0..n-1 as in ring_graph; with B = `group` and g = i div B, edge
    families (every edge guarded to stay inside [0, n)):

      succ : i -> g*B + ((i mod B) + 1) mod B   per-group directed cycle —
             EXCEPT group 1, where the edges out of locals B-6 and B-1 are
             omitted and local B-6 instead closes early to the group start:
             group 1 becomes a (B-5)-cycle plus a 5-vertex TAIL CHAIN of
             singleton SCCs (the multi-round coloring case: a singleton
             chain decides one vertex per color round)
      chord: i -> g*B + ((i mod B)*7 + 3) mod B in-group jump (keeps the
             flood diameter small) — for group 1 the chord is taken mod
             B-5 and only for locals < B-5, so it stays INSIDE the
             shortened cycle and never re-closes the tail chain
      down : i -> i - B for i >= B              DAG edges toward SMALLER ids

    Every complete group except group 1 is one B-vertex SCC; `down` edges
    chain the condensation WITHOUT merging groups.  Because the DAG points
    toward smaller ids, each group's minimum is its own color root, so the
    forward-backward coloring decides all cyclic groups (and the chain
    head) in its first round; the remaining chain vertices decide one per
    round.  The identical construction is expressible in ANSI SQL, which
    makes the SCC operator oracle-checkable against a DuckDB
    transitive-closure query.
    """
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = part.count()
    B = group
    min_key = part.agg(F.min("p_partkey")).collect()[0][0]
    ids = part.select((F.col("p_partkey") - F.lit(min_key)).alias("i"))
    g = F.col("i") - (F.col("i") % B)  # g*B
    local = F.col("i") % B
    in_g1 = g == B
    succ = ids.select(
        F.col("i").alias("src"), (g + (local + 1) % B).alias("dst")
    ).where(
        ~(
            (F.col("src") - F.col("src") % B == B)
            & ((F.col("src") % B).isin(B - 6, B - 1))
        )
    )
    close = ids.where(in_g1 & (local == B - 6)).select(
        F.col("i").alias("src"), g.alias("dst")
    )
    chord = ids.where(~in_g1).select(
        F.col("i").alias("src"), (g + (local * 7 + 3) % B).alias("dst")
    )
    chord1 = ids.where(in_g1 & (local < B - 5)).select(
        F.col("i").alias("src"), (g + (local * 7 + 3) % (B - 5)).alias("dst")
    )
    down = ids.where(F.col("i") >= B).select(
        F.col("i").alias("src"), (F.col("i") - B).alias("dst")
    )
    edges = (
        succ.unionByName(close)
        .unionByName(chord)
        .unionByName(chord1)
        .unionByName(down)
        .where((F.col("dst") >= 0) & (F.col("dst") < n) & (F.col("src") != F.col("dst")))
        .distinct()
    )
    vertices = ids.select(F.col("i").alias("id"), (F.col("i") % 4).cast("int").alias("label"))
    return vertices, edges


def ring_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic labeled unipartite graph over part's key space.

    ids 0..n-1 (p_partkey - min(p_partkey): robust to 0- or 1-based key
    spaces — anchoring at the minimum is what makes every edge target an
    existing vertex; build_parts validates exactly that). Edge families
    (all mod n, undirected):
      ring:    i — (i+1)
      chord A: i — (i+2)        (guarantees triangles i, i+1, i+2)
      chord B: i — (5i+3)
    Labels: id % 4. The identical construction is expressible in ANSI SQL,
    which makes match/triangle queries oracle-checkable in DuckDB.
    """
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = part.count()
    min_key = part.agg(F.min("p_partkey")).collect()[0][0]
    ids = part.select((F.col("p_partkey") - F.lit(min_key)).alias("i"))
    e1 = ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % n).alias("dst"))
    e2 = ids.select(F.col("i").alias("src"), ((F.col("i") + 2) % n).alias("dst"))
    e3 = ids.select(F.col("i").alias("src"), ((F.col("i") * 5 + 3) % n).alias("dst"))
    edges = symmetrize(e1.unionByName(e2).unionByName(e3))
    vertices = ids.select(F.col("i").alias("id"), (F.col("i") % 4).cast("int").alias("label"))
    return vertices, edges


def multi_ring_graph(
    spark: SparkSession, sf_dir: str, rings: int = 17
) -> tuple[DataFrame, DataFrame]:
    """Deterministic DISJOINT-CYCLES fixture over part's key space — the
    bipartiteness test graph: vertex i belongs to ring r = i % rings, and
    ring r is the cycle r, r+rings, r+2*rings, ... (edge i — i+rings, the
    last member wrapping back to r). Ring r has

        len(r) = (n - 1 - r) // rings + 1

    members, so for any n not a multiple of `rings` the fixture contains
    BOTH even- and odd-length cycles (odd `rings` keeps that true across
    the sf ladder): even cycles are bipartite, odd ones are not — the
    per-component answer is closed-form in (n, r), which makes the
    bipartite_components operator oracle-checkable without the oracle ever
    touching a double cover. Requires n >= 2*rings so every ring is a real
    cycle (length >= 2). Min id in ring r is r, so hash-min CC labels
    component r as r."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = part.count()
    if n < 2 * rings:
        raise ValueError(f"need at least {2 * rings} vertices, got {n}")
    min_key = part.agg(F.min("p_partkey")).collect()[0][0]
    ids = part.select((F.col("p_partkey") - F.lit(min_key)).alias("i"))
    succ = ids.select(
        F.col("i").alias("src"),
        F.when(F.col("i") + rings < n, F.col("i") + rings)
        .otherwise(F.col("i") % rings)
        .alias("dst"),
    )
    edges = symmetrize(succ)
    vertices = ids.select(
        F.col("i").alias("id"), (F.col("i") % 4).cast("int").alias("label")
    )
    return vertices, edges


def weighted_ring_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED undirected graph over part's key space.

    ids 0..n-1 as in ring_graph; edges one canonical (u < v) row each:
      path  : i — i+1              w = 1 + (i mod 7)        i in [0, n-2]
      close : 0 — n-1              w = 100 + (n mod 13)     (ring closer)
      chordA: i — i+2              w = 101 + ((i*3) mod 97) i in [0, n-3]
      chordB: i — (i*5+3) mod n    w = 200 + (i mod 53)     (canonicalized)

    Every non-path weight (>= 100) exceeds every path weight (<= 8), and
    the path edges are the ONLY light edges, so under the (w, u, v) total
    order the unique minimum spanning forest is exactly the path — known
    in closed form, which makes Borůvka oracle-checkable in DuckDB while
    the algorithm still has to win it through real per-component minima
    and contractions (weights vary with period 7 along the path, so every
    pick is a real comparison; whole-chain root flattening collapses the
    path in 2 rounds at fixture scale — the multi-round behavior is
    exercised by the random-graph fuzz tests). Parallel duplicates (a chordB
    landing on a path/chordA pair) keep their minimum weight — same rule
    as boruvka_msf's canonicalization, so the construction stays
    SQL-twinnable. Returns (src, dst, w) canonical single-direction rows.
    """
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = part.count()
    min_key = part.agg(F.min("p_partkey")).collect()[0][0]
    ids = part.select((F.col("p_partkey") - F.lit(min_key)).alias("i"))
    i = F.col("i")
    path = ids.where(i < n - 1).select(
        i.alias("src"), (i + 1).alias("dst"), (1 + i % 7).cast("double").alias("w")
    )
    close = ids.where(i == 0).select(
        i.alias("src"), F.lit(n - 1).alias("dst"), F.lit(float(100 + n % 13)).alias("w")
    )
    chord_a = ids.where(i < n - 2).select(
        i.alias("src"), (i + 2).alias("dst"), (101 + (i * 3) % 97).cast("double").alias("w")
    )
    b_dst = (i * 5 + 3) % n
    chord_b = ids.where(b_dst != i).select(
        F.least(i, b_dst).alias("src"),
        F.greatest(i, b_dst).alias("dst"),
        (200 + i % 53).cast("double").alias("w"),
    )
    return (
        path.unionByName(close)
        .unionByName(chord_a)
        .unionByName(chord_b)
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
