"""EMPTY-INPUT fixture: /tmp/skew6 — every table present, zero rows.

At 100 TB an empty frame is not an edge case, it is a Tuesday: a
date-pruned partition with no files, a filter that matches nothing, a
tenant with no data yet. Every operator must return its correct empty
(or degenerate-aggregate) answer on BOTH engines rather than crash,
divide by zero, or index into an empty array. This fixture writes a
0-row parquet with the EXACT production schema for all ten tables, so
the standard subset-sim sweep probes the whole registry's empty-input
behavior with the same oracle harness as every other axis.

Usage:  python tools/make_skew6.py [/tmp/skew6]
Sweep:  SPARK_GRAFT_SIM_SF=/tmp/skew6 python tools/subset_sim.py
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew6"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tab.slice(0, 0), f"{dst}/{t}.parquet")
        print(f"{t}: 0 rows, schema {tab.num_columns} cols")


if __name__ == "__main__":
    main()
