"""Code-hygiene scans over the source-code corpus table: license detection,
secret scanning, and repo-level structural clone (fork/mirror) detection.

A training-data pipeline over a 10^12-file code corpus must answer two
compliance questions before anything else reads the data: what license
governs each file, and does any file leak credentials. The reference engine
has no analog (it ingests anonymous vertex lines —
/root/reference/src/pregel_app_subgraph.h:689-714); these operators extend
the corpus contract (sources/corpus.py) the way the LLM-pipeline operators
extend `documents`.

100 TB design: both scans are single-pass, shuffle-free column expressions
(`contains` / `regexp_extract_all` — whole-stage codegen, no Python), so
they run at parquet-scan speed with column pruning down to (repo, path,
content) and compose with any downstream filter via predicate pushdown.
License detection reads only the first `head_chars` characters — license
headers live at the top of a file, and bounding the scanned prefix keeps
per-row work O(1) even on pathologically large blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (license id, distinctive lowercase phrase) — FIRST match wins, so order is
# precedence: the MIT grant sentence and the BSD redistribution clause are
# unique to their texts, while "GNU General Public License" also appears in
# LGPL/AGPL references — listed last of the phrase checks for that reason.
LICENSE_PATTERNS: list[tuple[str, str]] = [
    ("mit", "permission is hereby granted, free of charge"),
    ("apache-2.0", "licensed under the apache license, version 2.0"),
    ("bsd-3-clause", "redistribution and use in source and binary forms"),
    ("gpl-3.0", "gnu general public license"),
]

# secret-shaped token patterns (same regex dialect in Spark's Java regex and
# DuckDB's RE2 for these constructs, so the oracle can mirror them exactly)
SECRET_PATTERNS: dict[str, str] = {
    "aws_key": r"AKIA[0-9A-Z]{16}",
    "private_key": r"-----BEGIN [A-Z ]*PRIVATE KEY-----",
    "hex_token": r"\b[0-9a-f]{40,}\b",
}

# deterministic corpus decoration (see with_license_headers): header choice
# and secret planting are pure functions of the file index j extracted from
# the path, so a DuckDB oracle rebuilds the expected scan output from the
# generator formula alone — the Spark side must actually DETECT the strings.
_MIT_HEADER = (
    "// MIT License\n"
    "// Permission is hereby granted, free of charge, to any person\n"
    "// obtaining a copy of this software and associated documentation.\n"
)
_APACHE_HEADER = (
    '// Licensed under the Apache License, Version 2.0 (the "License");\n'
    "// you may not use this file except in compliance with the License.\n"
)
_GPL_HEADER = (
    "// This file is part of a program released under the terms of the\n"
    "// GNU General Public License as published by the Free Software\n"
    "// Foundation, either version 3 of the License, or any later version.\n"
)


def license_detect(
    corpus: DataFrame, text_col: str = "content", head_chars: int = 4000
) -> DataFrame:
    """(repo, path, license) — classify each file's license from its header.

    Scans the lowercased first `head_chars` characters for the distinctive
    phrase of each known license (LICENSE_PATTERNS order = precedence);
    files matching none are labeled 'none'. One codegen expression per row,
    no shuffle, no UDF."""
    head = F.lower(F.substring(F.col(text_col), 1, head_chars))
    chain = None
    for lic, phrase in LICENSE_PATTERNS:
        cond = head.contains(phrase)
        chain = F.when(cond, lic) if chain is None else chain.when(cond, lic)
    return corpus.select(
        "repo", "path", chain.otherwise("none").alias("license")
    )


def secret_scan(corpus: DataFrame, text_col: str = "content") -> DataFrame:
    """(repo, path, n_<pattern>..., n_secrets) — per-file counts of
    secret-shaped tokens (AWS access-key ids, private-key block headers,
    40+-char hex strings). `regexp_extract_all` + `size` per pattern: one
    scan of the content column, whole-stage codegen, zero shuffle. Filter
    `n_secrets > 0` downstream for the flagged-file list (the filter pushes
    into the same scan stage)."""
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in SECRET_PATTERNS.items()
    ]
    out = corpus.select("repo", "path", *cols)
    total = None
    for name in SECRET_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_secrets", total)


def redact_secrets(
    corpus: DataFrame, text_col: str = "content", marker: str = "[REDACTED]"
) -> DataFrame:
    """Replace every secret-shaped token (SECRET_PATTERNS) in `text_col`
    with `marker` — the write-side companion of secret_scan for corpora
    that must keep the file but not the credential. A chain of
    `regexp_replace` calls in one projection: single pass, codegen, no
    shuffle; `secret_scan(redact_secrets(c))` is all-zeros by
    construction (the marker matches no pattern)."""
    expr = F.col(text_col)
    for pat in SECRET_PATTERNS.values():
        expr = F.regexp_replace(expr, pat, marker)
    return corpus.withColumn(text_col, expr)


def repo_fingerprints(corpus: DataFrame) -> DataFrame:
    """(repo, n_files, fp1, fp2) — an order-independent 128-bit-class
    STRUCTURAL fingerprint per repository: each file contributes
    md5(path | lang | sorted import stems) — content-free, so forks that
    only rename the org or touch comments still collide — and the two
    60-bit halves of the digest are SUMMED per repo as decimal(38,0)
    (exact to ~10^25 hash mass — no int64 overflow even at 10^12 files
    per repo). Sums are commutative,
    so the aggregate is one map-side-combinable groupBy with no
    collect_list: a 10^7-file repo costs the same one shuffle row as a
    10-file one. Collision probability for distinct structures is
    ~n^2/2^120 across n repos — negligible below astronomical corpus
    sizes (and a collision only ever adds a candidate pair; verify
    exactly downstream if needed)."""
    from ..sources.corpus import IMPORT_RE

    stems = None
    for lang, pat in IMPORT_RE.items():
        ex = F.regexp_extract_all(F.col("content"), F.lit("(?m)" + pat), 1)
        stems = (
            F.when(F.col("lang") == lang, ex)
            if stems is None
            else stems.when(F.col("lang") == lang, ex)
        )
    key = F.md5(
        F.concat_ws(
            "|",
            F.col("path"),
            F.col("lang"),
            F.concat_ws(",", F.array_sort(stems.otherwise(F.array()))),
        )
    )
    h1 = F.conv(F.substring(key, 1, 15), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(key, 17, 15), 16, 10).cast("decimal(38,0)")
    return corpus.select("repo", h1.alias("h1"), h2.alias("h2")).groupBy("repo").agg(
        F.count("*").alias("n_files"),
        F.sum("h1").alias("fp1"),
        F.sum("h2").alias("fp2"),
    )


def repo_clone_pairs(corpus: DataFrame) -> DataFrame:
    """(repo_a, repo_b) — repository pairs with IDENTICAL structural
    fingerprints (fork / mirror / template-clone detection at repo
    granularity: same file paths, same languages, same import graph —
    content differences ignored by construction). One fingerprint
    aggregate + one equi-join on the fingerprint triple; the join's key
    cardinality is the number of distinct structures, so only genuine
    clone classes co-locate (a massive clone class is the one skew case —
    its pair list is quadratic in the class size by definition)."""
    fps = repo_fingerprints(corpus)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp1") == F.col("b.fp1"))
            & (F.col("a.fp2") == F.col("b.fp2"))
            & (F.col("a.n_files") == F.col("b.n_files"))
            & (F.col("a.repo") < F.col("b.repo")),
        )
        .select(F.col("a.repo").alias("repo_a"), F.col("b.repo").alias("repo_b"))
    )


def with_license_headers(corpus: DataFrame) -> DataFrame:
    """Deterministically decorate a synthesized corpus (sources/corpus.py)
    with license headers and planted secrets — pure column expressions, so
    the same rule is reproducible in the DuckDB oracle from the generator
    formula:

      j = int(path =~ 'mod_(\\d+)')
      j % 7 == 0 -> MIT header     j % 7 == 1 -> Apache-2.0 header
      j % 7 == 2 -> GPL-3.0 header (others: no header)
      j % 11 == 3 -> one planted AWS-shaped key:
                     AKIA + upper(md5(repo || '/' || path)[:16])

    content_sha is recomputed JVM-side so the per-row invariant
    (verify_sha == 0) holds on the decorated frame too."""
    j = F.regexp_extract(F.col("path"), r"mod_(\d+)", 1).cast("int")
    header = (
        F.when(j % 7 == 0, F.lit(_MIT_HEADER))
        .when(j % 7 == 1, F.lit(_APACHE_HEADER))
        .when(j % 7 == 2, F.lit(_GPL_HEADER))
        .otherwise(F.lit(""))
    )
    secret = F.when(
        j % 11 == 3,
        F.concat(
            F.lit('\naws_key = "AKIA'),
            F.upper(F.substring(F.md5(F.concat(F.col("repo"), F.lit("/"), F.col("path"))), 1, 16)),
            F.lit('"'),
        ),
    ).otherwise(F.lit(""))
    content = F.concat(header, F.col("content"), secret)
    return corpus.withColumn("content", content).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
