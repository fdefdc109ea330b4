"""NULL-KEY fixture for the TPC-H / join / scan families: /tmp/skew5.

Round 12's /tmp/skew4 program (30% null user_id on events) surfaced 16
cross-engine null-semantics divergences in the ~100 nullable-column
consumers it reached — but the TPC-H tier was out of scope because the
driver's testdata ships null-free relational keys. This fixture closes
that gap: it copies sf0.01 and injects deterministic NULLs into every
join key, date, measure, and group-key column of the seven TPC-H
tables (events/documents/embeddings pass through untouched — skew4
already owns them), so the same subset-sim oracle run probes:

- join keys (FKs AND PKs): a null key matches nothing in BOTH engines
  (inner/semi/anti/outer), but anti-join NOT IN semantics, null-aware
  anti joins and COUNT(DISTINCT) over null keys have diverged before;
- ORDER BY ... LIMIT over nullable columns: Spark default asc is
  NULLS FIRST, DuckDB's is NULLS LAST — any top-k whose boundary can
  touch a null diverges unless the plan pins explicit null ordering;
- conditional aggregates (max(when...)), min_by/max_by-style argmax,
  window frames over nullable sort keys, and decimal casts of NULL.

Null rates are hash-free but deterministic (seeded numpy generator,
one seed per (table, column)), so re-running the tool reproduces the
fixture bit-for-bit.

Usage:  python tools/make_skew5.py [/tmp/skew5]
Sweep:  SPARK_GRAFT_SIM_SF=/tmp/skew5 python tools/subset_sim.py \
            q_tpch_q1 ... q_join_* q_scan_* (see SCALE.md round-13
            null-key disposition for the sweep list and results)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
PASSTHROUGH = ("events", "documents", "embeddings")

#: (table, column) -> null fraction. Keys get moderate rates (a null FK
#: row must be COMMON enough to land inside every top-k boundary);
#: measures/dates get lighter rates. nation/region stay null-free: they
#: are SF-constant dims the engine pins broadcast hints on, and a null
#: nationkey row is exercised from the FK side (c/s_nationkey).
RATES: dict[str, dict[str, float]] = {
    "lineitem": {
        "l_orderkey": 0.05,
        "l_partkey": 0.05,
        "l_suppkey": 0.05,
        "l_quantity": 0.04,
        "l_extendedprice": 0.04,
        "l_discount": 0.04,
        "l_tax": 0.04,
        "l_returnflag": 0.06,
        "l_linestatus": 0.06,
        "l_shipdate": 0.05,
    },
    "orders": {
        "o_orderkey": 0.02,
        "o_custkey": 0.10,
        "o_orderstatus": 0.06,
        "o_totalprice": 0.05,
        "o_orderdate": 0.05,
        "o_orderpriority": 0.06,
    },
    "customer": {
        "c_custkey": 0.02,
        "c_name": 0.05,
        "c_nationkey": 0.10,
        "c_acctbal": 0.08,
        "c_mktsegment": 0.10,
    },
    "supplier": {
        "s_suppkey": 0.02,
        "s_name": 0.05,
        "s_nationkey": 0.10,
        "s_acctbal": 0.10,
    },
    "part": {
        "p_partkey": 0.02,
        "p_name": 0.05,
        "p_brand": 0.06,
        "p_type": 0.06,
        "p_size": 0.06,
        "p_retailprice": 0.06,
    },
}


def _null_out(table: pa.Table, rates: dict[str, float], table_name: str) -> pa.Table:
    n = table.num_rows
    cols = []
    for field in table.schema:
        col = table.column(field.name)
        rate = rates.get(field.name, 0.0)
        if rate <= 0:
            cols.append(col)
            continue
        # hash() is salted per-process for str — derive the seed from
        # the names' bytes instead so the fixture is reproducible.
        seed = int.from_bytes(
            (table_name + "." + field.name).encode(), "little"
        ) % (2**32)
        rng = np.random.default_rng(seed)
        keep = pa.array(~(rng.random(n) < rate))
        arr = col.combine_chunks()
        cols.append(pc.if_else(keep, arr, pa.scalar(None, type=field.type)))
    return pa.table(dict(zip(table.schema.names, cols)), schema=table.schema)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew5"
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH + ("nation", "region"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: passthrough")
    for t, rates in RATES.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        out = _null_out(tab, rates, t)
        pq.write_table(out, f"{dst}/{t}.parquet")
        injected = {
            c: int(out.column(c).null_count) for c in rates if out.column(c).null_count
        }
        print(f"{t}: {tab.num_rows} rows, nulls {injected}")


if __name__ == "__main__":
    main()
