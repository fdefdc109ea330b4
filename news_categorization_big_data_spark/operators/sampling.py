"""Deterministic sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE subsets: a train/val/test
split that never moves a document between splits when the corpus grows,
a sample that two runs (or two engines) agree on row-for-row. Spark's
``df.sample``/``sampleBy`` draw from a partition-seeded RNG — the result
changes with partitioning, so it is neither stable at rescale nor
oracle-checkable.

Everything here derives membership from an md5 hash of the ROW's id
(functions/hashing.py), not from an RNG:

- stable under repartitioning, scale-up, and engine choice;
- a document keeps its split for life (no train/test leakage when the
  corpus is re-ingested or appended — the property that matters when the
  downstream artifact is a trained model);
- map-only: every operator is a per-row predicate/projection, no
  shuffle, embarrassingly parallel at 100 TB.

Fractions are expressed as INTEGER bucket counts (per-mille for splits,
basis points for samples) so both engines compare integers — no float
threshold whose last ulp could disagree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.hashing import hash60

#: Bucket counts: splits are assigned per-mille, samples in basis points.
SPLIT_BUCKETS = 1000
SAMPLE_BUCKETS = 10_000


def hash_bucket(col: Column | str, seed: str, buckets: int) -> Column:
    """Uniform bucket in [0, buckets) from md5(seed:value) — hash60 is a
    60-bit unsigned int, so ``%`` agrees across engines (no negative
    operands). DuckDB mirror:
    ``('0x' || substr(md5(seed || ':' || expr), 1, 15))::BIGINT % buckets``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return hash60(c.cast("string"), seed=seed) % F.lit(buckets)


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_permille: int = 800,
    val_permille: int = 100,
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column: 'train' / 'val' / 'test' by id-hash bucket.

    Per-mille thresholds (800/100 → 80/10/10). Membership depends only on
    (seed, id), so appending documents never reassigns existing ones.
    """
    b = hash_bucket(id_col, seed, SPLIT_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < train_permille, F.lit("train"))
        .when(b < train_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction_bp: int, seed: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose id-hash
    bucket falls under ``fraction_bp`` basis points (10000 = keep all)."""
    return df.where(hash_bucket(id_col, seed, SAMPLE_BUCKETS) < fraction_bp)


def mixture_fractions(
    df: DataFrame,
    domain_col: str,
    weights_permille: dict[str, int],
) -> DataFrame:
    """Per-domain sampling fractions hitting a target mixture.

    Given target shares w_d (per-mille) and observed counts c_d, the
    largest corpus honoring the mixture without upsampling is
    ``T = min_d(c_d / w_d) · 1000`` — the scarcest domain relative to its
    target binds, keeps 100%, and every other domain downsamples to
    ``frac_d = T · w_d / (1000 · c_d)``. This is the static data-mixing
    step of a pretraining pipeline (fixed-weight DoReMi-style mixtures).

    Returns (domain, n_docs, frac_bp): observed count and the keep
    fraction in basis points. Domains absent from ``weights_permille``
    get frac_bp = 0 (excluded from the mix). The result is
    dimension-sized (one row per domain) — always broadcastable.
    """
    pairs: list[Column] = []
    for value, w in sorted(weights_permille.items()):
        pairs.extend([F.lit(value), F.lit(w)])
    w_col = F.coalesce(F.create_map(*pairs)[F.col(domain_col)], F.lit(0))
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("n_docs"))
        .withColumn("_w", w_col)
    )
    # T_scaled = min over weighted domains of c_d/w_d (double; identical
    # across engines — same divisions, same min).
    t_scaled = (
        counts.where(F.col("_w") > 0)
        .agg(F.min(F.col("n_docs").cast("double") / F.col("_w")).alias("_t"))
    )
    # The BINDING domain (c_d/w_d == t, bit-exact: t IS the min of these
    # same division results, so equality is reliable and engine-identical)
    # keeps exactly SAMPLE_BUCKETS — computing it via the rounded product
    # floor(10000·t·w/c) can land on 9999 for ~7% of (count, weight)
    # pairs and silently drop a hash bucket of the scarcest source,
    # contradicting the no-upsampling contract. Mirror the same CASE in
    # any oracle.
    frac_bp = F.when(
        F.col("n_docs").cast("double") / F.col("_w") == F.col("_t"),
        F.lit(SAMPLE_BUCKETS),
    ).otherwise(
        F.least(
            F.lit(SAMPLE_BUCKETS),
            F.floor(
                F.lit(SAMPLE_BUCKETS) * F.col("_t") * F.col("_w") / F.col("n_docs")
            ).cast("long"),
        )
    )
    return (
        counts.crossJoin(F.broadcast(t_scaled))
        .select(
            domain_col,
            "n_docs",
            F.when(F.col("_w") > 0, frac_bp).otherwise(F.lit(0)).alias("frac_bp"),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights_permille: dict[str, int],
    seed: str = "mix",
) -> DataFrame:
    """Sample the corpus to the target mixture: join the (broadcast)
    per-domain fractions and keep rows by the id-hash predicate. Same
    determinism/stability properties as ``hash_sample``; the only
    shuffle is the dimension-sized count aggregate."""
    fracs = mixture_fractions(df, domain_col, weights_permille)
    return (
        df.join(F.broadcast(fracs.select(domain_col, "frac_bp")), domain_col)
        .where(hash_bucket(id_col, seed, SAMPLE_BUCKETS) < F.col("frac_bp"))
        .drop("frac_bp")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions_bp: dict[str, int],
    default_bp: int = 0,
    seed: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` analog).

    ``fractions_bp`` maps stratum value → basis points to keep; strata
    not listed keep ``default_bp``. The stratum lookup is an inline map
    literal (broadcast-free, codegen'd) and membership is the same
    id-hash predicate as ``hash_sample`` — still zero shuffle.
    Use case: rebalancing a skewed corpus (downsample the dominant
    language, keep the long tail) without an RNG.
    """
    pairs: list[Column] = []
    for value, bp in sorted(fractions_bp.items()):
        pairs.extend([F.lit(value), F.lit(bp)])
    threshold = F.coalesce(
        F.create_map(*pairs)[F.col(stratum_col)], F.lit(default_bp)
    )
    return df.where(hash_bucket(id_col, seed, SAMPLE_BUCKETS) < threshold)
