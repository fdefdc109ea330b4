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
Among MULTIPLE right rows tied on (by, on) the winner is arbitrary
unless ``tie_break`` names a right column — and "arbitrary" is not a
theoretical concern: the sf1 replica fixture makes duplicate
timestamps ubiquitous (10 rows share every ts) and both this plan's
un-tie-broken ``last()`` and DuckDB's native ASOF JOIN then pick
engine-dependent rows (found as a round-14 sf1-sweep hash mismatch on
q_asof_join/q_asof_forward). Callers with possibly-duplicate right
timestamps MUST pass ``tie_break``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join per ``by`` group; right value columns are null
    when no match exists.

    ``direction="backward"`` (default): latest right row with
    ``right[on] <= left[on]``. ``direction="forward"``: EARLIEST right
    row with ``right[on] >= left[on]`` — same single-shuffle plan with
    the per-partition sort reversed (rights still order before lefts at
    equal time, so the boundary tie matches in both directions).

    ``tolerance_seconds`` bounds the match's staleness, pandas
    merge_asof-style: the nearest candidate is found first, then the
    whole carried row is NULLed if it lies further than the tolerance —
    equivalent to "no match within tolerance" because the candidate IS
    the nearest one. Requires ``on`` to be a timestamp column.

    ``tie_break`` (a right value column, typically a unique id) makes
    the match DETERMINISTIC when several right rows share the same
    (by, on): backward picks the tied row with the GREATEST tie value
    (the "latest by id" reading of "latest at-or-before"), forward the
    SMALLEST. Without it, ties resolve to whatever row the sort
    happened to place last — a silent cross-engine divergence on any
    data with duplicate right timestamps.

    ``left`` and ``right`` must share exactly the ``on`` and ``by``
    columns; every other right column is carried forward as a value.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = [c for c in right.columns if c not in (on, by)]
    overlap = [c for c in left.columns if c in value_cols]
    if overlap:
        raise ValueError(f"left/right column collision on {overlap}; alias the right side")

    tagged_left = left.withColumn("_side", F.lit(1))
    tagged_right = right.withColumn("_side", F.lit(0))
    combined = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    order = [F.col(on).asc() if direction == "backward" else F.col(on).desc(), F.col("_side").asc()]
    if tie_break is not None:
        if tie_break not in value_cols:
            raise ValueError(f"tie_break {tie_break!r} must be a right value column")
        # rights tied on (by, on) sort by the tie column; last() then
        # picks the greatest tie (backward) / smallest (forward). Left
        # rows carry NULL here — they only order among themselves,
        # where relative order cannot change any row's own frame.
        # NULL tie values sort LAST in both directions (r14 ADVICE):
        # Spark's bare asc() is nulls-FIRST while DuckDB's default for
        # ASC is nulls-LAST, so a tied right row with a NULL tie value
        # would win in one engine and lose in the other — the exact
        # divergence class tie_break exists to kill, reintroduced for
        # null tie columns. Pinned rule: a NULL tie value outranks any
        # real one (sorts last → picked by last()), matching DuckDB's
        # nulls-last default under both ASC and DESC so the oracles
        # need no non-default NULLS clause.
        order.append(
            F.col(tie_break).asc_nulls_last()
            if direction == "backward"
            else F.col(tie_break).desc_nulls_last()
        )
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ALL right value columns as ONE struct through a single
    # last(ignorenulls) window: the matched right row's values stay
    # atomic — a NULL in one of its value columns is preserved rather
    # than being stitched with a stale value from an older right row
    # (per-column last() would do exactly that, diverging from
    # DuckDB/pandas ASOF semantics). Right rows always contribute a
    # non-null struct; left rows contribute null → skipped by the window.
    # The right's own `on` value rides along as `_match_on` for the
    # tolerance check.
    # A NULL `on` time never matches in either direction (there is no
    # "before/after an unknown time"): null-ts RIGHT rows are excluded
    # from the carry, and null-ts LEFT rows are nulled below with the
    # null-key guard. No fixture nulls events.ts today — this pins the
    # semantics before one does.
    carried = F.last(
        F.when(
            (F.col("_side") == 0) & F.col(on).isNotNull(),
            F.struct(*value_cols, F.col(on).alias("_match_on")),
        ),
        ignorenulls=True,
    ).over(w)
    # A NULL `by` key never matches: the window partitions BY null, so
    # without the guard every anonymous left row would match the
    # nearest anonymous right row — asserting two unknown entities are
    # the same one. DuckDB ASOF (equality on the by key) and pandas
    # merge_asof both leave null-key lefts unmatched; the /tmp/skew4
    # null-key fixture caught the divergence. Null-key LEFT rows are
    # kept (left-join contract) with null right values.
    carried = F.when(F.col(by).isNotNull() & F.col(on).isNotNull(), carried)
    out = combined.withColumn("_carried", carried).where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap_us = F.unix_micros(F.col(on)) - F.unix_micros(F.col("_carried._match_on"))
        if direction == "forward":
            gap_us = -gap_us
        out = out.withColumn(
            "_carried",
            F.when(gap_us <= tolerance_seconds * 1_000_000, F.col("_carried")),
        )
    return out.select(
        *[c for c in left.columns],
        *[F.col(f"_carried.{c}").alias(c) for c in value_cols],
    )
