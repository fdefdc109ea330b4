"""Length-bucketed training-batch construction.

Transformer training pads every sequence in a batch to the batch max, so
batching docs of wildly different lengths burns FLOPs on pad tokens. The
standard fix is length bucketing: group docs into power-of-two length
buckets, build batches within a bucket, and account the residual padding
waste.

Scale design: the naive construction (row_number over each bucket →
``floor(rn / batch)``) needs a GLOBAL SORT PER BUCKET — with ~6 buckets
that is 6 reducers regardless of cluster size, a scale-killer. Instead,
batch membership is an md5-hash of the doc id modulo the bucket's batch
count (operators/sampling.py philosophy): batch sizes become
Poisson(batch_docs) rather than exactly batch_docs — a non-issue for
training — and the plan is two skinny shuffles (a 6-row bucket-count
aggregate broadcast back, then the per-batch stats aggregate), no sort,
no single-reducer stage, deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.hashing import hash60

#: Power-of-two token-length bucket ceilings; the last is the catch-all.
LENGTH_BUCKETS = [16, 32, 64, 128, 256, 512]

#: Target documents per training batch.
BATCH_DOCS = 32


def length_bucket(tok_count: Column) -> Column:
    """Smallest configured power-of-two ceiling ≥ tok_count — an integer
    CASE chain, not ``ceil(log2(x))``: libm log2 at exact powers of two
    is the kind of last-ulp hazard that breaks cross-engine hashes."""
    expr = F.when(tok_count <= LENGTH_BUCKETS[0], F.lit(LENGTH_BUCKETS[0]))
    for ceiling in LENGTH_BUCKETS[1:-1]:
        expr = expr.when(tok_count <= ceiling, F.lit(ceiling))
    return expr.otherwise(F.lit(LENGTH_BUCKETS[-1]))


#: Sequence-packing defaults: context length in tokens, and the shard
#: count for the SMALL testdata. Parallelism = n_shards, so at corpus
#: scale n_shards grows with the data (~1e6 shards for 100 TB): packing
#: quality is shard-local, the only cost of finer sharding is ~seq_len/2
#: boundary-waste tokens per shard — negligible next to shard size.
PACK_SEQ_LEN = 512
PACK_SHARDS = 64


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = PACK_SEQ_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Greedy contiguous sequence packing, shard-parallel.

    Pretraining concatenates documents into fixed-length sequences
    (seq_len tokens) instead of padding each doc — "sequence packing".
    The layout must be DETERMINISTIC (reproducible data order across
    runs/engines) yet parallel: docs are hash-bucketed into shards, laid
    out inside each shard in md5-hash order (a deterministic shuffle —
    training wants documents decorrelated, and the hash order delivers
    that for free), and concatenated; a doc starting at cumulative token
    offset ``s`` lands in sequence ``s // seq_len`` at offset
    ``s % seq_len`` (docs crossing a boundary continue into the next
    sequence, standard packed-dataset semantics).

    (id, shard, tok_count, seq_idx, seq_offset) — all integers, fully
    oracle-exact. One shuffle (the per-shard window sort); each reducer
    sorts corpus/n_shards docs, so n_shards — not a constant — sets the
    parallelism, chosen ∝ corpus size.
    """
    tc = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    docs = df.select(
        F.col(id_col),
        tc.cast("long").alias("tok_count"),
        (hash60(F.col(id_col).cast("string"), seed="packshard") % n_shards).alias("shard"),
        hash60(F.col(id_col).cast("string"), seed="packorder").alias("_ok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_ok", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("tok_count").over(w), F.lit(0))
    return docs.select(
        id_col,
        "shard",
        "tok_count",
        F.floor(start / seq_len).cast("long").alias("seq_idx"),
        (start % seq_len).alias("seq_offset"),
    )


def assign_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_docs: int = BATCH_DOCS,
) -> DataFrame:
    """Per-batch stats: (bucket, batch_id, n_docs, sum_tokens,
    max_tokens, padding_waste).

    ``padding_waste = n_docs·max_tokens − sum_tokens``: the pad tokens a
    trainer would burn if every doc in the batch is padded to the batch
    max — the quantity length bucketing exists to minimize.
    """
    tc = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    # The internal grouping key is `_len_bucket`, not the public
    # `bucket` output name: the pinned broadcast of n_batches is
    # justified because a LENGTH bucket's cardinality is bounded by the
    # token-count bit width, and the audit exempts that by key NAME
    # (tools/broadcast_audit.BOUNDED_KEY_COLS). A distinctive
    # engine-derived name keeps a future corpus-scaling column that
    # happens to be called "bucket" from inheriting the exemption
    # (r14 ADVICE); the output schema still says `bucket`.
    docs = df.select(F.col(id_col), tc.alias("tok_count")).withColumn(
        "_len_bucket", length_bucket(F.col("tok_count"))
    )
    n_batches = (
        docs.groupBy("_len_bucket")
        .agg(F.ceil(F.count("*") / batch_docs).cast("long").alias("_nb"))
    )
    assigned = docs.join(F.broadcast(n_batches), "_len_bucket").withColumn(
        "batch_id", hash60(F.col(id_col).cast("string"), seed="batch") % F.col("_nb")
    )
    return (
        assigned.groupBy("_len_bucket", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok_count").alias("sum_tokens"),
            F.max("tok_count").alias("max_tokens"),
        )
        .withColumn(
            "padding_waste",
            F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"),
        )
        .withColumnRenamed("_len_bucket", "bucket")
    )
