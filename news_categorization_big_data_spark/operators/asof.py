"""As-of (point-in-time) join — a composition of native Spark operators.

Spark has no built-in as-of join (SURVEY.md §2.3). The scalable pattern:
union both sides tagged with a side marker, sort each `by`-partition once
by (time, side), and carry the right side's values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding running
frame. Cost: ONE shuffle on the `by` key + one per-partition sort —
versus a range cross-join's quadratic blowup. At 100 TB both sides
shuffle-co-partition on `by`, and skewed keys are handled by AQE.

Tie semantics: a right row at exactly the left row's timestamp matches
(`left.ts >= right.ts`), so rights sort before lefts at equal time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str) -> DataFrame:
    """Left as-of join: latest right row with ``right[on] <= left[on]``
    per ``by`` group; right value columns are null when no match exists.

    ``left`` and ``right`` must share exactly the ``on`` and ``by``
    columns; every other right column is carried forward as a value.
    """
    value_cols = [c for c in right.columns if c not in (on, by)]
    overlap = [c for c in left.columns if c in value_cols]
    if overlap:
        raise ValueError(f"left/right column collision on {overlap}; alias the right side")

    tagged_left = left.withColumn("_side", F.lit(1))
    tagged_right = right.withColumn("_side", F.lit(0))
    combined = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ALL right value columns as ONE struct through a single
    # last(ignorenulls) window: the matched right row's values stay
    # atomic — a NULL in one of its value columns is preserved rather
    # than being stitched with a stale value from an older right row
    # (per-column last() would do exactly that, diverging from
    # DuckDB/pandas ASOF semantics). Right rows always contribute a
    # non-null struct; left rows contribute null → skipped by the window.
    carried = F.last(
        F.when(F.col("_side") == 0, F.struct(*value_cols)), ignorenulls=True
    ).over(w)
    return (
        combined.withColumn("_carried", carried)
        .where(F.col("_side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_carried.{c}").alias(c) for c in value_cols],
        )
    )
