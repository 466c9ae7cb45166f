"""Shared column-expression helpers (JVM-side, codegen-friendly).

Tokenization and hashing used by the text/dedup operators are deliberately
restricted to functions with exact ANSI-SQL/DuckDB equivalents (split on
space, md5 hex, trim), so every operator's result is oracle-checkable
bit-for-bit."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

# marker tokens per language for the n-gram/stopword language-ID heuristic;
# the priority order breaks score ties deterministically
LANG_MARKERS = {
    "en": ("the", "is", "and", "of", "a"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "le", "shi", "zai", "he"),
}
LANG_PRIORITY = ("en", "de", "es", "fr", "zh")


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens, empty strings dropped. SQL equivalent:
    list_filter(string_split(trim(text), ' '), x -> x <> '')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), " "), lambda x: x != "")


def count_in(arr: Column, words: tuple[str, ...]) -> Column:
    """# of array elements in the word set (codegen filter + size)."""
    return F.size(F.filter(arr, lambda x: x.isin(*words)))


def fixed_point_sum(col: str | Column, scale: int = 6) -> Column:
    """Order-independent SUM of a double column at `scale` decimal places:
    each value quantized with round-half-up — floor(value * 10^scale + 0.5)
    — summed as int64, divided back to double.

    A plain double SUM is order-dependent (IEEE addition is non-associative),
    so Spark and an external oracle can disagree in the last ULP and flip a
    round() at a decimal boundary — observed on sessionize in round 1. The
    product value*10^scale is one IEEE multiply (identical everywhere), the
    +0.5/floor quantization is exact and unbiased (plain floor truncates
    toward -inf, a systematic negative bias of up to n_rows*10^-scale), and
    the integer sum is associative, so every engine and every partitioning
    produces the same bits. SQL twin:
    sum(CAST(floor(value * 1e<scale> + 0.5) AS BIGINT)) / 1e<scale>."""
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.sum(F.floor(c * F.lit(m) + F.lit(0.5)).cast("long")) / F.lit(m)
