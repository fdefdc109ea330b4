"""Corpus-hygiene operators a pretraining pipeline runs between dedup
and batching: eval-set decontamination and within-document repetition
measurement.

Scale shapes (100 TB corpus, holdout ≤ 1e-3 of it):

- **decontamination**: the holdout's distinct shingle-hash set is
  dimension-sized relative to the corpus, so the overlap test is a
  BROADCAST semi-join — the train side is never shuffled on n-grams;
  the only shuffle carries the (doc_id, hit) rows that actually
  overlap, a vanishing fraction of the corpus.
- **repetition**: a pure per-row column expression (n-gram multiset vs
  its distinct size) — map-only, zero shuffle, whole-stage codegen.

The reference has no notion of dataset hygiene (SURVEY.md §2.12 frames
the Tier-C mandate); these are the engine-side versions of the
train/test-overlap and boilerplate filters described in the GPT-3 and
Gopher dataset reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from news_categorization_big_data_spark.functions.hashing import hash60
from news_categorization_big_data_spark.functions.text_exprs import (
    STOPWORDS,
    tokens,
    word_shingles,
)

#: Gopher/C4-style quality thresholds (shared by q_quality_filter and
#: the end-to-end q_pipeline_curate; the oracle SQL mirrors each one).
QUALITY_MIN_TOKENS = 20
QUALITY_MIN_DISTINCT_RATIO = 0.33
QUALITY_MIN_STOPWORD_RATIO = 0.02
QUALITY_MIN_CHARS_PER_TOKEN = 3.0
QUALITY_MAX_CHARS_PER_TOKEN = 10.0


def quality_reasons(text_col: str = "text", n_chars_col: str = "n_chars") -> Column:
    """Array of quality-violation reason codes for a document row
    (empty array = keep). Pure column expression — map-only.

    The whole check is computed inside ONE ``transform`` lambda whose
    argument is the tokenized text: Column expression trees duplicate on
    every reference (the five checks reference the token array ~8×
    between them), and because the higher-order ``filter`` calls keep
    the predicate out of whole-stage codegen, codegen's subexpression
    elimination never merges the copies — so the regex split was
    re-evaluated ~8× per row. A lambda VARIABLE is bound once and
    referenced by name, so the split runs exactly once. Identical
    output (pinned row-for-row in the r15 A/B and by the oracle);
    measured: the curate quality-filter pass 3.7 s → 1.1 s at sf1
    (guide §1.2 step 2: per-task work)."""

    def _reasons(ts: Column) -> Column:
        n = F.size(ts)
        dr = F.size(F.array_distinct(ts)).cast("double") / n
        sr = F.size(F.filter(ts, lambda t: t.isin(*STOPWORDS))).cast("double") / n
        cpt = F.col(n_chars_col).cast("double") / n
        checks = [
            (n < QUALITY_MIN_TOKENS, "too_short"),
            (dr < QUALITY_MIN_DISTINCT_RATIO, "repetitive"),
            (sr < QUALITY_MIN_STOPWORD_RATIO, "no_stopwords"),
            (cpt < QUALITY_MIN_CHARS_PER_TOKEN, "fragmented"),
            (cpt > QUALITY_MAX_CHARS_PER_TOKEN, "overlong_tokens"),
        ]
        return F.filter(
            F.array(*[F.when(cond, F.lit(code)) for cond, code in checks]),
            lambda x: x.isNotNull(),
        )

    return F.transform(F.array(tokens(text_col)), _reasons)[0]


def ngram_contamination(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Train documents sharing ≥1 k-word shingle with the holdout set.

    Returns (id, n_overlap): the number of DISTINCT train-doc shingles
    that also occur anywhere in the holdout — the signal a
    decontamination pass thresholds on before dropping or redacting
    train docs (exact-substring contamination à la GPT-3 appendix C).

    The holdout's shingles are hashed (60-bit md5 — engine-portable,
    collision-negligible) and deduped to a compact key set that Spark
    broadcasts; train shingles stream past it map-side.
    """
    ev = (
        holdout.select(F.explode(word_shingles(text_col, k)).alias("_s"))
        .select(hash60("_s").alias("_h"))
        .distinct()
    )
    tr = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, k)).alias("_s")
    ).select(id_col, hash60("_s").alias("_h"))
    return (
        tr.join(F.broadcast(ev), "_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )


#: (name, pattern, replacement) applied IN ORDER on progressively
#: scrubbed text — order matters: emails first (their local parts can
#: contain digit runs), then IPv4 (dotted quads would otherwise match
#: the looser phone pattern), then phones. Patterns deliberately use
#: only syntax with identical semantics in Java regex (Spark) and RE2
#: (DuckDB): character classes, bounded repeats, \b, \d.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}", "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone-like numbers; count each (map-only).

    (id, text_clean, n_email, n_ip, n_phone). Each pattern's count is
    taken on the text AFTER the previous patterns were scrubbed, so an
    address never double-counts as a phone number — and both engines
    apply the identical sequence, keeping the counts oracle-exact.
    Pure ``regexp_count``/``regexp_replace`` column expressions: zero
    shuffle, whole-stage codegen, the per-row shape of a C4/Gopher-style
    PII pass (swap in NER-backed detection via mapInPandas when regex
    isn't enough — same plumbing as operators/multimodal.py).
    """
    out = docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    done: list[str] = []
    for name, pat, repl in PII_PATTERNS:
        out = out.select(
            id_col,
            *[F.col(c) for c in done],
            F.regexp_count("_t", F.lit(pat)).cast("long").alias(f"n_{name}"),
            F.regexp_replace("_t", pat, repl).alias("_t"),
        )
        done.append(f"n_{name}")
    return out.select(
        id_col, F.col("_t").alias("text_clean"), *[F.col(c) for c in done]
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
) -> DataFrame:
    """Per-document repetition ratio over k-word n-grams (map-only).

    (id, n_grams, n_distinct, dup_ratio): dup_ratio = 1 − distinct/total
    over the ORDERED n-gram multiset — near 0 for natural prose, near 1
    for looping boilerplate ("click here click here …"). Documents with
    fewer than k words have no n-grams and are excluded (no ratio to
    report). Downstream filters threshold on dup_ratio the way Gopher's
    repetition rules do.
    """
    from news_categorization_big_data_spark.functions.text_exprs import word_ngrams

    grams = word_ngrams(text_col, k)
    n = F.size(grams)
    nd = F.size(F.array_distinct(grams))
    return (
        docs.select(
            F.col(id_col),
            n.cast("long").alias("n_grams"),
            nd.cast("long").alias("n_distinct"),
        )
        .where(F.col("n_grams") > 0)
        .select(
            id_col,
            "n_grams",
            "n_distinct",
            F.round(
                (F.col("n_grams") - F.col("n_distinct"))
                / F.col("n_grams").cast("double"),
                4,
            ).alias("dup_ratio"),
        )
    )
