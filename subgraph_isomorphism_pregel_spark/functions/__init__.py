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
