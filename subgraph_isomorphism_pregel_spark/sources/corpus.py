"""The engine's input contract: an Iceberg-style source-code corpus table

    corpus(repo: string, path: string, commit: string, lang: string,
           content: string)

and its derivation into the link graph (files -> import/include edges).

The corpus is synthesized deterministically and distributed (spark.range ->
mapInPandas; no driver-side data, no RNG state — every cell is a pure function
of the row index), so the same (n_repos, files_per_repo, seed) always yields
byte-identical content. The per-row invariant recorded at generation time is
``content_sha = sha256(content)``; ``verify_sha`` recomputes it JVM-side with
``F.sha2`` and must match exactly.

Derivation (all DataFrame ops, pushdown-friendly):
  files:    one row per (repo, path) with a dense vertex id and a lang label
  edges:    language-aware import extraction (regexp_extract_all) resolved
            against files *within the same repo* (equi-join), symmetrized.

This replaces the reference's line-oriented text loader
(/root/reference/src/pregel_app_subgraph.h:689-714) with a real table input,
per the north-star input hint.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "js", "java", "cpp", "go"]
LANG_CODE = {l: i for i, l in enumerate(LANGS)}
EXT = {"py": "py", "js": "js", "java": "java", "cpp": "cpp", "go": "go"}

# import-statement templates and the matching extraction regex per language
IMPORT_TMPL = {
    "py": "import {stem}",
    "js": "import x{k} from './{stem}'",
    "java": "import pkg.{stem};",
    "cpp": '#include "{stem}.h"',
    "go": 'import "pkg/{stem}"',
}
IMPORT_RE = {
    "py": r"^import (mod_\d+)$",
    "js": r"from '\./(mod_\d+)'",
    "java": r"^import pkg\.(mod_\d+);$",
    "cpp": r'^#include "(mod_\d+)\.h"$',
    "go": r'^import "pkg/(mod_\d+)"$',
}


def _file_row(r: int, j: int, files_per_repo: int, seed: int, rev: int = 0) -> dict:
    """Deterministic cell values for file j of repo r.

    rev models a LATER COMMIT of the same tree: at rev >= 1 every file with
    ``(j*3 + seed) % 10 == 0`` (a deterministic ~10% of files) rewires its
    SECOND import from target ``(13j+5+s) % fpr`` to ``(17j+3+s) % fpr``;
    all other files are byte-identical to rev 0 and keep their rev-0 commit
    id (per-file blob versioning: only changed files get a new commit)."""
    lang = LANGS[(r * 31 + j * 7 + seed) % len(LANGS)]
    stem = f"mod_{j}"
    path = f"src/{stem}.{EXT[lang]}"
    repo = f"org{r % 97}/repo{r}"
    # two deterministic intra-repo imports (skip self)
    changed = rev >= 1 and (j * 3 + seed) % 10 == 0
    second = (17, 3) if changed else (13, 5)
    tgt = []
    for mult, add in ((7, 1), second):
        t = (j * mult + add + seed) % files_per_repo
        if t != j and t not in tgt:
            tgt.append(t)
    imports = [IMPORT_TMPL[lang].format(stem=f"mod_{t}", k=t) for t in tgt]
    filler_seed = hashlib.sha256(f"{repo}:{path}:{seed}".encode()).hexdigest()
    filler = "\n".join(
        f"// line {i} {filler_seed[(i * 3) % 40:(i * 3) % 40 + 12]}" for i in range(6)
    )
    content = "\n".join([f"// {repo}/{path}", *imports, filler])
    commit_key = f"{repo}:{path}:rev{rev}" if changed else f"{repo}:{path}"
    return {
        "repo": repo,
        "path": path,
        "commit": hashlib.sha256(commit_key.encode()).hexdigest()[:40],
        "lang": lang,
        "content": content,
        "content_sha": hashlib.sha256(content.encode()).hexdigest(),
    }


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, content_sha string"
)


def synth_corpus(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 100,
    seed: int = 42,
    num_partitions: int | None = None,
    rev: int = 0,
) -> DataFrame:
    """Distributed deterministic corpus: n_repos * files_per_repo rows.
    rev >= 1 yields a deterministic LATER SNAPSHOT of the same tree (see
    _file_row) for commit-to-commit diff operators."""
    n = n_repos * files_per_repo
    fpr, sd, rv = files_per_repo, seed, rev

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            idx = pdf["id"].values
            rows = [_file_row(int(i) // fpr, int(i) % fpr, fpr, sd, rv) for i in idx]
            yield pd.DataFrame(rows)

    rng = spark.range(0, n, numPartitions=num_partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, CORPUS_SCHEMA)


def verify_sha(corpus: DataFrame) -> int:
    """Rows violating the per-row invariant sha256(content) == content_sha
    (computed JVM-side; must be 0)."""
    return corpus.where(F.sha2(F.col("content"), 256) != F.col("content_sha")).count()


def derive_files(corpus: DataFrame) -> DataFrame:
    """corpus -> files(file_id, repo, path, stem, lang, label, content_sha).

    file_id must be deterministic and distributed-safe: a dense rank would
    need a global sort, so we use a 64-bit hash of the (repo, path) key —
    collision probability ~ n^2 / 2^64 (negligible below ~10^8 files; at
    10^12-file scale switch to the 128-bit hash pair)."""
    return corpus.select(
        F.xxhash64(F.col("repo"), F.lit("/"), F.col("path")).alias("file_id"),
        "repo",
        "path",
        F.regexp_extract(F.col("path"), r"([^/]+)\.[a-z]+$", 1).alias("stem"),
        "lang",
        F.element_at(
            F.create_map(*[F.lit(x) for kv in LANG_CODE.items() for x in kv]),
            F.col("lang"),
        ).cast("int").alias("label"),
        "content_sha",
    )


def derive_edges(corpus: DataFrame, files: DataFrame) -> DataFrame:
    """Language-aware import extraction -> resolved intra-repo edge table.

    One regexp pass over content lines, explode, equi-join on (repo, stem).
    Returns directed dependency edges (src imports dst), deduplicated."""
    lines = corpus.select(
        "repo",
        "path",
        "lang",
        F.explode(F.split(F.col("content"), "\n")).alias("line"),
    )
    pat = F.when(F.col("lang") == "py", F.regexp_extract("line", IMPORT_RE["py"], 1))
    for lang in ("js", "java", "cpp", "go"):
        pat = pat.when(F.col("lang") == lang, F.regexp_extract("line", IMPORT_RE[lang], 1))
    hits = lines.select("repo", "path", pat.alias("tgt_stem")).where(F.col("tgt_stem") != "")
    src = files.select("repo", "path", F.col("file_id").alias("src"))
    dst = files.select(
        F.col("repo").alias("d_repo"), F.col("stem").alias("d_stem"), F.col("file_id").alias("dst")
    )
    return (
        hits.join(src, ["repo", "path"])
        .join(dst, (F.col("repo") == F.col("d_repo")) & (F.col("tgt_stem") == F.col("d_stem")))
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def corpus_graph(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 100,
    seed: int = 42,
    undirected: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end: synthesize corpus, derive (vertices(id,label), edges)."""
    from .graph import symmetrize

    corpus = synth_corpus(spark, n_repos, files_per_repo, seed)
    files = derive_files(corpus)
    vertices = files.select(F.col("file_id").alias("id"), "label")
    edges = derive_edges(corpus, files)
    if undirected:
        edges = symmetrize(edges)
    return vertices, edges
