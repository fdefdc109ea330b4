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
from news_categorization_big_data_spark.functions.text_exprs import word_shingles

#: MinHash signature length and banding (b bands of r rows: b*r = k).
MINHASH_K = 8
MINHASH_BANDS = 2  # 2 bands of 4 → candidates need 4 consecutive equal minhashes


def shingle_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) rows — distinct k-word shingles per document."""
    return docs.select(id_col, F.explode(word_shingles(text_col, k)).alias("shingle"))


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs: (doc_a, doc_b, jaccard).

    ``max_df`` drops shingles present in more than that many documents
    before the self-join (skew cap — at corpus scale stopword-ish
    shingles would otherwise create quadratic reducer buckets).
    """
    sh = shingle_table(docs, text_col, id_col, k)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = sh.join(df_counts.where(F.col("_df") <= max_df).select("shingle"), "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (F.col("sa._sz") + F.col("sb._sz") - F.col("_inter"))
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

    Each band is an equi-join key — a union of `bands` hash-joins, every
    one a plain shuffle join on a compact string key. No pairwise work
    happens outside hash buckets, which is what makes MinHash dedup
    linear-ish at corpus scale.
    """
    rows = k // bands
    per_band = []
    for b in range(bands):
        cols = [f"mh{j}" for j in range(b * rows, (b + 1) * rows)]
        key = F.concat_ws("-", *cols).alias("_band_key")
        sides = signatures.select(F.col(id_col), key)
        left, right = sides.alias("l"), sides.alias("r")
        per_band.append(
            left.join(right, "_band_key")
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b"))
        )
    return reduce(DataFrame.unionByName, per_band).distinct()


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-document SimHash sketch: (id, simhash).

    Each distinct token votes +1/-1 on each of `bits` lanes according to
    its md5-derived bit pattern; the sketch sets lanes with positive
    totals. One explode + one groupBy with `bits` conditional-sum
    aggregates — same shuffle shape as minhash_signatures.
    """
    toks = docs.select(
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
