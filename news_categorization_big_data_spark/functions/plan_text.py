"""Executed-plan-string helpers shared by the scan audits
(tools/scan_sweep.py) and the plan-shape tests.

Spark renders an ``InMemoryRelation``'s cached child plan NESTED inside
every ``InMemoryTableScan`` that reads it, so a naive
``plan.count("FileScan parquet")`` over-counts persisted plans: the one
real scan (run once, at first materialization) is re-printed per cache
reader. ``uncached_file_scans`` counts only scans that are NOT under an
InMemoryRelation — the scans that actually hit storage every run.
"""

from __future__ import annotations


def uncached_file_scans(plan: str, scan_marker: str = "FileScan parquet") -> int:
    """Count ``scan_marker`` nodes outside any InMemoryRelation subtree.

    Tree position comes from the render's indentation: a cached
    subtree is printed strictly deeper than its ``InMemoryRelation``
    line, so a scan line is cached iff some still-open relation line
    above it has smaller indentation.
    """

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-"))

    open_caches: list[int] = []  # indents of enclosing InMemoryRelations
    n = 0
    for line in plan.splitlines():
        if not line.strip():
            continue
        ind = indent(line)
        while open_caches and ind <= open_caches[-1]:
            open_caches.pop()
        if scan_marker in line and not open_caches:
            n += 1
        if "InMemoryRelation" in line:
            open_caches.append(ind)
    return n
