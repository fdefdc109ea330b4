"""Text normalization / tokenization Column expressions.

The engine-native replacement for the reference's Python-side string
handling (content.strip() / split() / [:5000] — news_summarization_batch
.py:61-66): everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal language-agnostic stopword set used by quality scoring and
#: token filtering (the testdata "word soup" vocabulary includes these).
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alphanumerics → collapse whitespace → trim.

    DuckDB mirror (note the 'g' flag — DuckDB replaces first-match only
    by default, Spark replaces all):
    ``trim(regexp_replace(regexp_replace(lower(x), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))``
    """
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a non-empty text column.

    DuckDB mirror: ``regexp_split_to_array(x, '\\s+')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def word_ngrams(col: Column | str, k: int = 2) -> Column:
    """All k-word n-grams IN ORDER, duplicates kept (repetition analysis
    needs the multiset — ``word_shingles`` below dedups for set-similarity).

    DuckDB mirror (1-based inclusive slices):
    ``list_transform(range(1, len(t) - {k-2}), i -> array_to_string(t[i:i+{k-1}], ' '))``.
    """
    toks = tokens(col)
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(k)])
    return F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash/Jaccard input unit).

    Built as ``arrays_zip`` of k shifted views + one concat_ws transform —
    ~3.5× faster than the per-index slice/array_join formulation (each
    element is one struct access + one string concat instead of an array
    copy + join allocation; measured at sf0.1: 0.8s vs 2.8s for 5k docs).
    Output is identical. DuckDB mirror:
    ``list_distinct(list_transform(range(1, len(toks) - {k-2}), i -> array_to_string(toks[i:i+{k-1}], ' ')))``.
    """
    toks = tokens(col)
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(k)])
    shingled = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]))
    return F.array_distinct(
        F.when(n >= k, shingled).otherwise(F.array().cast("array<string>"))
    )
