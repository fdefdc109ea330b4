"""Query-scoped cache pins: bounded-by-design persist lifetime.

Several plan builders persist a small multi-consumer intermediate
(MEMORY_AND_DISK, each an interleaved-A/B-measured win — SCALE.md).
``DataFrame.persist`` has no scope: under the external driver's single
long-lived session the cached blocks of every evaluated query would
otherwise accumulate until session end — memory evicts LRU, but
disk-stored blocks linger and pressure local disk at large scale
factors (ADVICE round 8).

``pin(df)`` persists AND records the frame; ``release_pins()`` drops
every recorded pin. The plan registry (plans/registry.py) calls
``release_pins()`` at the START of every registered builder, so the
driver's build → collect → build sequence holds at most ONE query's
pins at a time: query N's pins survive its own collect (the driver
collects after the builder returns) and are released the moment query
N+1 starts building. Release is correctness-neutral by construction —
an unpersisted frame recomputes through its (kept) lineage, so the
worst case for out-of-order callers (e.g. a test building two plans
before collecting the first) is a recompute, never a wrong answer.

``localCheckpoint(eager=False)`` sites need no tracking: their blocks
are owned by the checkpoint RDD and reclaimed by Spark's
ContextCleaner once the builder-scoped DataFrame reference is
garbage-collected.

CONCURRENCY CONTRACT (ADVICE round 9): ``_PINNED`` is deliberately
module-global, unsynchronized state, matching the external driver's
strictly SEQUENTIAL build → collect → build loop. An evaluator that
invoked builders concurrently from threads sharing the session could
release a running query's pins mid-collect and race the list mutation.
Even then the failure mode is bounded: unpersist only downgrades a
cache read to a lineage recompute — NEVER a wrong answer (pinned by
tests/test_cachepin.py::test_interleaved_builders_recompute_not_wrong)
— and list-append/pop races could at worst leak a pin until session
end. A concurrent evaluator should either serialize builds or give
each its own session. The LAST query's pins have no "next build" to
release them: long-lived callers (driver_sim, bench) call
``release_pins()`` at teardown.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` at ``level`` and record it for query-scoped release."""
    out = df.persist(level)
    _PINNED.append(out)
    return out


def release_pins() -> int:
    """Unpersist every recorded pin (non-blocking); returns count released."""
    n = len(_PINNED)
    while _PINNED:
        _PINNED.pop().unpersist(blocking=False)
    return n
