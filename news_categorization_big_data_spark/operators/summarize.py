"""Engine-native extractive summarization.

Replaces the reference's t5-small mapInPandas UDF
(news_summarization_batch.py:52-73: truncate to 5000 chars, output
length clamp min(100, max(20, words//3)), deterministic decode) with a
pure-DataFrame extractive summarizer: split into units, score each unit
by an integer corpus-rarity weight (reciprocal document frequency — the
same monotone family as TF-IDF, chosen integer-exact so the DuckDB
oracle can verify the full operator), keep the top-k units per document
in original order. Deterministic, shuffle-light (one token-DF
aggregation + one window), and it scales linearly — no model, no Python.

A ``mapInPandas`` escape hatch with the reference's exact truncation and
clamp semantics is kept for plugging a real seq2seq model back in.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.functions.partitioning import fan_out
from news_categorization_big_data_spark.functions.text_exprs import tokens

#: Reference constants (news_summarization_batch.py:65-68).
MAX_INPUT_CHARS = 5000
MIN_SUMMARY_TOKENS = 20
MAX_SUMMARY_TOKENS = 100


def split_units(df: DataFrame, id_col: str, text_col: str, unit_tokens: int = 12) -> DataFrame:
    """(id, pos, unit) rows: sentence split where punctuation exists, else
    fixed token-count chunks (the testdata word-soup has no sentence
    marks). Chunking is pure array algebra — no explode-then-regroup."""
    # Tokenize in a separate projection: a slice of the tokens
    # EXPRESSION inside the transform lambda would re-split the text
    # per chunk (the q_dedup_passage quadratic, plans/corpus.py —
    # bounded here by the MAX_INPUT_CHARS clamp, fixed on principle).
    base = fan_out(df).select(F.col(id_col), tokens(text_col).alias("_toks"))
    n_chunks = F.ceil(F.size("_toks") / F.lit(unit_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("_toks"), i * unit_tokens + 1, unit_tokens), " "
        ),
    )
    return base.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "unit")
    ).where(F.col("unit") != "")


def extractive_summarize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_k: int = 2
) -> DataFrame:
    """(id, summary, n_units): top-k rarity-scored units per doc, rejoined
    in document order with the reference's '- ' bullet prefix
    (≙ news_summarization_batch.py:102-107).

    Unit score = Σ_token floor(1e6 · n_docs / df(token)) — an INTEGER
    corpus-rarity weight (reciprocal document frequency, same monotone
    family as idf). Integer scores make the ranking, and therefore the
    whole operator, exactly reproducible across engines: a float
    log-idf sum is reduction-order- and libm-sensitive, which is why
    this operator was previously oracle-unverifiable. The quotient is
    exact: 1e6·n_docs < 2^53 holds far beyond any corpus count, so the
    double divide + floor is the true integer division on both engines.
    """
    units = split_units(
        df.select(id_col, F.substring(text_col, 1, MAX_INPUT_CHARS).alias(text_col)),
        id_col,
        text_col,
    )
    tok = units.select(id_col, "pos", "unit", F.explode(tokens("unit")).alias("token"))
    # Corpus size as a lazily-computed broadcast scalar (one row) instead
    # of an eager df.count(): no extra job fires before the terminal
    # action, and the whole plan stays one Spark job.
    n_docs = df.select(F.count("*").cast("double").alias("_n_docs"))
    doc_freq = tok.select(id_col, "token").distinct().groupBy("token").agg(
        F.count("*").alias("_df")
    )
    weight = F.floor((F.lit(1000000.0) * F.col("_n_docs")) / F.col("_df")).cast("long")
    scored = (
        tok.join(F.broadcast(doc_freq), "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy(id_col, "pos", "unit")
        .agg(F.sum(weight).alias("_score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("pos"))
    top = scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= top_k)
    return (
        top.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "unit"))), lambda s: s["unit"]
                ),
                "\n- ",
            ).alias("_joined"),
            F.count("*").alias("n_units"),
        )
        .select(id_col, F.concat(F.lit("- "), F.col("_joined")).alias("summary"), "n_units")
    )


def pluggable_summarizer_hook(
    model_fn: Callable[[str], str],
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas hook preserving the reference's semantics: 5000-char
    input truncation, min(100, max(20, words//3)) length clamp, row-level
    error containment → empty summary (news_summarization_batch.py:52-73).

    Usage::

        df.mapInPandas(pluggable_summarizer_hook(fn), "doc_id long, summary string")
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-partition (not per-row) model setup happens in model_fn's
        # closure on first call — the pattern the reference's streaming
        # job gets right (news_categorization_streaming.py:62-64).
        for batch in batches:
            # model_fn is inherently per-document; the id column passes
            # through as a whole Arrow array (no iterrows).
            summaries = []
            for text in batch["text"]:
                text = (text or "")[:MAX_INPUT_CHARS]
                n_words = len(text.split())
                max_len = min(MAX_SUMMARY_TOKENS, max(MIN_SUMMARY_TOKENS, n_words // 3))
                try:
                    summary = " ".join(model_fn(text).split()[:max_len]) if text.strip() else ""
                except Exception:
                    summary = ""  # row-level containment, typed fallback
                summaries.append(summary)
            yield pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "summary": summaries})

    return run
