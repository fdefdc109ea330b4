"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale architecture (100 TB of documents):

- **exact**: hash the text to a 16-byte key, groupBy the hash — the
  shuffle carries keys, never documents.
- **n-gram Jaccard (exact near-dup)**: explode distinct k-word shingles,
  self-join on shingle, count intersections. The join key distribution
  is the shingle document-frequency distribution — cap it (drop shingles
  appearing in > max_df docs, which carry no discriminative signal) so
  no reducer sees a quadratic bucket.
- **MinHash + LSH (approximate near-dup, the scale path)**: fixed-size
  signature per doc (k min-hashes), banded into b bands; candidate pairs
  are equi-joins on (band_index, band_hash) — linear shuffle, no
  pairwise work outside buckets. Jaccard is then verified exactly on the
  candidates only.
- **SimHash**: per-doc 16-bit sketch whose Hamming distance approximates
  cosine over the token multiset; near-dup candidates share the sketch.

All hashes are md5-derived (functions/hashing.py) so every stage is
reproducible in the DuckDB oracle; swap hash60 → xxhash64 for ~3-5x
faster hashing when cross-engine reproducibility isn't required.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.hashing import hash60, hash_bits16
from news_categorization_big_data_spark.functions.partitioning import fan_out
from news_categorization_big_data_spark.functions.text_exprs import word_shingles

#: MinHash signature length and banding (b bands of r rows: b*r = k).
#: A pair with true Jaccard j becomes a candidate with
#: P = 1 - (1 - j^r)^b, an S-curve whose threshold sits near
#: (1/b)^(1/r). Defaults (k=8, b=2 → r=4): threshold ≈ 0.84 — matched
#: to the registered q_dedup_near contract (planted dups at j≈0.98:
#: P ≈ 0.995; random pairs j≈0.05: P ≈ 1e-5). For 100-TB corpora at a
#: softer threshold, scale BOTH knobs — e.g. k=128, b=32 (r=4,
#: threshold ≈ 0.42) or k=128, b=16 (r=8, threshold ≈ 0.71) — every
#: operator below takes (k, bands) as parameters; the constants here
#: are only the oracle-checked default. Recall is asserted at a second
#: setting in tests/test_scale_ops.py.
MINHASH_K = 8
MINHASH_BANDS = 2


def shingle_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) rows — distinct k-word shingles per document.

    fan_out first: shingling + hashing is the CPU-heavy stage, and a
    single-file input would otherwise run it on one core.
    """
    return fan_out(docs).select(id_col, F.explode(word_shingles(text_col, k)).alias("shingle"))


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard near-duplicate pairs: (doc_a, doc_b, jaccard).

    ``max_df`` skips candidate generation for shingles present in more
    than that many documents (skew cap — at corpus scale stopword-ish
    shingles would otherwise create quadratic buckets). Per-doc shingle
    sizes stay exact, but for a pair that shares a capped shingle the
    intersection is undercounted, so jaccard is *underestimated* for
    such pairs (never overestimated): the cap trades a little recall on
    pairs whose only overlap is non-discriminative shingles for a
    bounded per-bucket reducer. Mirror the identical cap in any oracle.
    """
    sh = shingle_table(docs, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_sz"))
    # Invert to shingle buckets and emit doc pairs inside each bucket —
    # one groupBy + two generates instead of a self-join, so the shingle
    # subtree is evaluated once, not three times, and there is no join
    # key skew to manage beyond the bucket-size (max_df) cap itself.
    buckets = sh.groupBy("shingle").agg(F.collect_list(id_col).alias("_ids"))
    if max_df is not None:
        buckets = buckets.where(F.size("_ids") <= max_df)
    inter = (
        buckets.where(F.size("_ids") > 1)
        .select(F.explode("_ids").alias("doc_a"), F.col("_ids"))
        .select("doc_a", F.explode("_ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (F.col("sa._sz") + F.col("sb._sz") - F.col("_inter"))
    # inter (candidate pairs) is orders of magnitude smaller than sizes
    # (one row per doc) — leave join strategy to AQE, which broadcasts
    # the runtime-small side; an explicit hint here would be wrong at
    # corpus scale in one direction or the other.
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col(f"sb.{id_col}"))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = MINHASH_K) -> DataFrame:
    """Per-document MinHash signature: (id, mh0..mh{k-1}).

    One explode + one groupBy: the shuffle carries (id, shingle) once and
    computes all k min-hashes as parallel aggregates of the same rows.
    Docs with no shingles get no row (they can't be near-duplicates).
    """
    sh = shingle_table(docs, text_col, id_col)
    aggs = [F.min(hash60("shingle", seed=str(j))).alias(f"mh{j}") for j in range(k)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id", k: int = MINHASH_K, bands: int = MINHASH_BANDS) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ALL minhashes of ≥1 band.

    The signature table is exploded to one (band_idx, band_key, id) row
    per band, grouped into buckets, and pairs are generated inside each
    bucket — a single shuffle on the compact band key, the signature
    subtree evaluated once, and no pairwise work outside hash buckets.
    That shape is what makes MinHash dedup linear-ish at corpus scale.
    """
    rows = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "-", *[f"mh{j}" for j in range(b * rows, (b + 1) * rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(id_col, F.explode(band_structs).alias("b")).select(
        id_col, "b.band_idx", "b.band_key"
    )
    buckets = banded.groupBy("band_idx", "band_key").agg(F.collect_list(id_col).alias("_ids"))
    return (
        buckets.where(F.size("_ids") > 1)
        .select(F.explode("_ids").alias("doc_a"), F.col("_ids"))
        .select("doc_a", F.explode("_ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-document SimHash sketch: (id, simhash).

    Each distinct token votes +1/-1 on each of `bits` lanes according to
    its md5-derived bit pattern; the sketch sets lanes with positive
    totals. One explode + one groupBy with `bits` conditional-sum
    aggregates — same shuffle shape as minhash_signatures.
    """
    toks = fan_out(docs).select(
        id_col, F.explode(F.array_distinct(F.split(text_col, r"\s+"))).alias("token")
    ).where(F.col("token") != "")
    h = hash_bits16("token")
    lane_sums = [
        F.sum(F.when(h.bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1)).alias(f"_s{b}")
        for b in range(bits)
    ]
    lanes = toks.groupBy(id_col).agg(*lane_sums)
    sketch = reduce(
        lambda acc, b: acc + F.when(F.col(f"_s{b}") > 0, F.lit(1 << b)).otherwise(0),
        range(bits),
        F.lit(0),
    )
    return lanes.select(id_col, sketch.cast("long").alias("simhash"))
