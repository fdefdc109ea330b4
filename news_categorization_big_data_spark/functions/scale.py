"""Explicit scale techniques: bucketed co-located joins and key salting.

The engine's default posture is to let AQE handle join strategy and skew
(session.py turns on ``skewJoin`` + partition coalescing). These
utilities are for the two cases where *declared* physical layout beats
runtime re-planning at 100 TB:

- **Bucketing** (``write_bucketed`` / ``read_bucketed``): when two fact
  tables are repeatedly joined on the same key (orders ⋈ lineitem every
  hour), pre-bucket BOTH at rest on that key with the same bucket
  count. Spark's scan then reports a compatible ``HashPartitioning``
  and the sort-merge join runs with ZERO exchanges — the shuffle is
  paid once at write time, amortized over every subsequent join.
  (tests assert the exchange-free plan.)

- **Salting** (``salted_join`` / ``salted_sum``): when one join/group
  key dwarfs the others (a null-ish user_id, one viral document) beyond
  what AQE's skew-split handles — e.g. a single key that exceeds an
  executor's memory in a build-side hash map. Salting rewrites the
  computation: the skewed side gets a uniform salt in [0, n), computed
  as a hash of a caller-named row id so every (re-)execution of the map
  stage agrees on each row's bucket (recompute-stability); the other
  side is replicated n× (explode over the salt range); aggregations run
  partial-per-salt then final. Results are IDENTICAL to the unsalted
  plan (asserted in tests) — only the key distribution changes.
"""

from __future__ import annotations

import functools
import operator
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Default gate for ``broadcast_if_small``: comfortably inside the JVM
#: driver/executor budget yet far under Spark's 8 GB broadcast hard
#: limit. EXPANSION-RATIO ASSUMPTION (documented per round-13 review):
#: on-disk parquet is compressed/encoded, so the in-memory broadcast
#: relation is LARGER than the file bytes the gate measures. The
#: 256 MB gate vs the 8 GB hard limit leaves a 32× margin; typical
#: snappy+dictionary parquet decodes at 3-10×, but dictionary/RLE-heavy
#: columns (low-cardinality strings, sorted keys) can exceed 32×. The
#: gate is therefore a heuristic for the HINT only — past it the frame
#: falls through to AQE's measured-size decision, and even under it the
#: 8 GB wall is what actually fails the job. Callers broadcasting
#: encode-heavy frames should pass a lower ``max_bytes``. Overridable
#: at runtime via SPARK_GRAFT_BROADCAST_GATE_BYTES (tests use 0 to
#: prove the refusing path on real plans).
BROADCAST_GATE_BYTES = 256 << 20


def _gate_bytes() -> int:
    env = os.environ.get("SPARK_GRAFT_BROADCAST_GATE_BYTES")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    return BROADCAST_GATE_BYTES


def broadcast_if_small(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Size-GATED broadcast hint: ``F.broadcast(df)`` only when the
    frame's measured on-disk footprint is under ``max_bytes``.

    An explicit ``F.broadcast`` hint is honored UNCONDITIONALLY — the
    planner never second-guesses it against measured sizes, so a hint
    pinned on a frame that scales with the corpus (customer / supplier /
    part grow linearly with SF) turns into a driver OOM or the 8 GB
    broadcast hard-limit failure the moment the data outgrows the dev
    fixture. Round 12 measured exactly that class on the skew fixture
    (q_dedup_containment). This helper keeps the intent auditable while
    making the decision a measurement:

    - the gate sums ``os.path.getsize`` over ``df.inputFiles()`` — a
      conservative UPPER bound on the broadcast payload (column pruning
      and pushed filters only shrink it);
    - frames whose inputs can't be stat'd locally (remote FS, non-file
      sources, empty lineage) are returned UN-hinted — Catalyst
      statistics + AQE then pick broadcast iff the measured size allows,
      which is the engine's default posture everywhere else;
    - for an AGGREGATE frame (e.g. q_tpch_q18's qualifying-orderkey
      set) the file sum measures the aggregate's INPUT, not its output
      — still the safe direction: the output is never larger than the
      scan, so the gate only ever refuses broadcasts it could have
      taken, falling through to AQE's exact runtime measurement.
    """
    if max_bytes is None:
        max_bytes = _gate_bytes()
    try:
        files = df.inputFiles()
        if not files:
            return df
        size = 0
        for uri in files:
            parsed = urlparse(uri)
            if parsed.scheme not in ("", "file"):
                return df
            size += os.path.getsize(unquote(parsed.path))
    except Exception:
        return df
    return F.broadcast(df) if size <= max_bytes else df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table.

    Both sides of a recurring join must use the SAME bucket count and
    key for the exchange-free plan.
    """
    (
        df.write.bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (scan reports its HashPartitioning)."""
    return spark.table(table)


#: Join types where replicating the right side per salt preserves the
#: unsalted semantics: each LEFT row carries exactly one salt, and the
#: right side exists at EVERY salt, so inner/left/semi/anti all see the
#: same match set per left row. right/full outer would emit one row per
#: replica for unmatched right keys — salt_buckets× duplicates.
_SALT_SAFE_JOINS = frozenset({"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"})


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Persist ``df`` hive-partitioned by low-cardinality columns
    (category / date — the SURVEY §1.5 mapping of the reference's Mongo
    store). A reader's filter on a partition column becomes directory
    pruning: the scan never opens non-matching partitions, and a join
    against a filtered dimension prunes at runtime via dynamic partition
    pruning. Both behaviors are asserted in tests/test_scale_layout.py.

    Partition columns must be low-cardinality (≲ thousands of values):
    each value is a directory, and small-file explosion from
    high-cardinality partitioning is the classic data-lake failure mode
    — for high-cardinality keys use bucketing (write_bucketed) instead.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def _row_salt(salt_on: Column | str | list, salt_buckets: int) -> Column:
    """Uniform salt in [0, salt_buckets) as a PURE function of the row.

    The salt must be row-DETERMINISTIC, not just uniform: under a
    fetch-failure-driven map-task rerun, Spark re-executes the map side
    while surviving reducers keep the blocks they already fetched — a
    salt derived from ``monotonically_increasing_id()`` (or rand /
    spark_partition_id) can assign re-executed rows to DIFFERENT salt
    buckets than their already-fetched copies, double-counting some rows
    and losing others (the SPARK-23207 failure class). Hashing real row
    columns makes every execution agree, so recompute is invisible.
    tests/test_global_plan_sweep.py sweeps all registered plans for the
    nondeterministic-id expressions to keep this invariant repo-wide.

    ``salt_on`` must be NON-NULL per row: xxhash64 skips NULL inputs
    (an all-NULL id hashes to the seed constant), which would pile
    every null-id row — the canonical hot slice — onto ONE salt
    bucket, silently defeating the salting. Guarded with a per-row
    raise (one null check, whole-stage codegen) instead of a silent
    re-concentration.
    """
    cols = salt_on if isinstance(salt_on, list) else [salt_on]
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    any_null = functools.reduce(operator.or_, [c.isNull() for c in cols])
    salt = F.pmod(F.xxhash64(*cols), F.lit(salt_buckets)).cast("int")
    return F.when(
        any_null,
        F.raise_error(
            F.lit(
                "salted join/sum salt_on column is NULL for some rows — "
                "a NULL row id would concentrate all such rows on one "
                "salt bucket; pass a non-null id (or coalesce first)"
            )
        ).cast("int"),
    ).otherwise(salt)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_on: Column | str | list,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``salt_buckets`` reducers and ``other`` is replicated per salt.

    ``salt_on`` names the skewed side's row-id column(s); the salt is a
    hash of those columns — uniform across a hot key AND recompute-
    stable (see ``_row_salt`` for why stability is load-bearing).
    ``other`` grows salt_buckets× — use for dimension-sized right sides
    (for fact-fact skew, prefer AQE skew-split or isolate the hot keys
    and union).

    Only left-preserving join types are accepted: an unmatched RIGHT key
    would otherwise surface once per salt replica (right/full outer are
    rejected rather than silently duplicated).
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_JOINS}:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r}: "
            "replicated right rows would duplicate unmatched right keys "
            "salt_buckets times under right/full outer semantics"
        )
    left = skewed.withColumn("_salt", _row_salt(salt_on, salt_buckets))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    alias: str,
    salt_on: Column | str | list,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof sum: partial aggregate per (keys, salt), then final per
    keys — two small shuffles instead of one shuffle with a giant
    reducer. Exact for any algebraic aggregate; sum shown here.
    ``salt_on`` = row-id column(s) hashed into the salt (recompute-
    stable by construction — see ``_row_salt``).
    """
    value = F.col(value) if isinstance(value, str) else value
    partial = (
        df.withColumn("_salt", _row_salt(salt_on, salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns.

    Bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1 — the
    resulting key linearizes the 2-D space so that sorting by it keeps
    points close in BOTH dimensions close in the file order. That is
    the property multi-dimensional range pruning needs: after
    ``zorder_write``, every parquet row group's (min, max) stats cover
    a bounded box in both columns, so range predicates on EITHER
    column prune files — where a single-column sort gives perfect
    pruning on that column and NONE on the other (its min/max per file
    spans the whole domain). The per-file box AREA equals the stripe
    layout's (an aligned curve segment of 4^k cells is a square) — the
    win is pruning on every z-ordered dimension, not a smaller
    footprint. This is the layout step behind
    Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed with plain column
    arithmetic (shifts and masks, whole-stage codegen — no UDF).

    Inputs must fit ``bits`` bits (caller rescales/quantizes first —
    same contract as Delta, which z-orders on range-partition ids).
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(ca, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(cb, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the (col_a, col_b)
    Z-curve: split into ``files`` ALIGNED curve segments (the top
    log2(files) bits of the Morton key — each segment is then an exact
    power-of-two box in (a, b), which is what makes the per-file
    min/max stats tight; a sampled range split would cut mid-segment
    and one ragged file's box can span most of both domains), sort
    within each, drop the key. Readers need no special support —
    parquet row-group min/max stats on the ORIGINAL columns do the
    pruning; the curve only decides which rows share a file."""
    seg_bits = max(1, (files - 1).bit_length())
    keyed = df.withColumn("_z", zorder_key(col_a, col_b, bits)).withColumn(
        "_zseg", F.shiftright(F.col("_z"), 2 * bits - seg_bits)
    )
    (
        keyed.repartition(files, "_zseg")
        .sortWithinPartitions("_zseg", "_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("_zseg")
        .parquet(path)
    )
