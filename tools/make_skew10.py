"""TIMESTAMP-EDGE fixture: /tmp/skew10 — NULL event times, pre-1970
negative epochs, far futures, and exact bin-boundary values.

Every standard fixture's `events.ts` is a clean, dense, NON-NULL 2024
range (TESTDATA.md), and skew4's null axis nulled user_id/value/props
but never an event-time column — so the entire time family (windows
ordered by ts, session/tumbling/sliding analogs, as-of joins, gap
fill, decay, OHLC, seasonality, the TPC-H date predicates) has never
been swept against DuckDB on the timestamp edge cases production data
actually carries:

- NULL ts: the null-ORDERING divergence class (Spark ASC default is
  NULLS FIRST, DuckDB's is NULLS LAST) for every window ordered by an
  event time; plus Spark's `F.window()` silently FILTERS null event
  times (the TimeWindowing rule injects `isnotnull(ts)`) while a
  `date_trunc` oracle keeps a NULL group — both latent on null-free
  fixtures. Policy on a hit: asc_nulls_last/desc_nulls_last on the
  Spark side (DuckDB's default, same convention as the r15 as-of
  fix), or an explicit `ts IS NOT NULL` in BOTH engines where the
  operator's semantic is event-time assignment.
- pre-1970: negative epoch micros exercise floor-vs-truncate division
  in every `floor(unix_timestamp/N)` binning expression (Java
  floorDiv vs C fmod — truncation toward zero would shift every
  pre-1970 bin by one).
- epoch 0 and epoch -1 µs: the sign boundary itself.
- 2250 future: ~295-year total span — proves the "dimension-sized
  spine" claims (gap fill, date dim) stay bounded when min/max blow
  up, and stays under pandas' ns-datetime64 2262 ceiling so harness
  conversions can't overflow. (Nothing below 1901: Spark's parquet
  reader raises rebase exceptions for ancient hybrid-calendar
  timestamps; that's an ingest-config topic, not a plan topic.)
- exact hour boundaries and boundary-1µs: half-open bin membership
  ([lo, hi) in both engines) at the exact edge.
- a hot duplicate-ts anchor: many rows sharing one timestamp — tie
  groups inside RANGE frames and as-of equality.

All mutation is a pure function of event_id / o_orderkey /
(l_orderkey, l_linenumber) (the repo's determinism rule); int64-µs
arithmetic end-to-end, no datetime library rounding. Everything else
passes through from sf0.01 untouched.

Usage:  python tools/make_skew10.py [/tmp/skew10]
Sweep:  SPARK_GRAFT_SIM_SF=/tmp/skew10 python tools/subset_sim.py
"""

from __future__ import annotations

import os
import shutil
import sys
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
PASSTHROUGH = (
    "region nation customer supplier part documents embeddings"
).split()

US = 1_000_000
HOUR_US = 3600 * US


def _epoch_us(*ymd_hms: int) -> int:
    return int(datetime(*ymd_hms, tzinfo=timezone.utc).timestamp()) * US


PRE1970_US = _epoch_us(1955, 6, 15, 7, 30, 0)  # negative epoch
FUTURE_US = _epoch_us(2250, 1, 1, 0, 0, 0)  # < pandas ns ceiling (2262)
ANCHOR_US = _epoch_us(2024, 3, 1, 12, 0, 0)  # hot duplicate ts
O_PRE1970_US = _epoch_us(1969, 12, 31, 0, 0, 0)
O_FUTURE_US = _epoch_us(2250, 6, 1, 0, 0, 0)
L_PRE1970_US = _epoch_us(1968, 7, 20, 0, 0, 0)
L_FUTURE_US = _epoch_us(2249, 12, 31, 0, 0, 0)


def mutate_events_ts(event_id: np.ndarray, ts_us: np.ndarray):
    """Return (new_ts_us int64 array, null_mask) — pure fn of event_id."""
    cls = event_id % 37
    out = ts_us.copy()
    null = cls == 0
    # pre-1970 with a µs fraction spread across the day
    sel = cls == 1
    out[sel] = PRE1970_US + (event_id[sel] * 1031) % (86400 * US)
    out[cls == 2] = 0  # epoch exactly zero
    out[cls == 3] = -1  # 1969-12-31 23:59:59.999999
    sel = cls == 4
    out[sel] = FUTURE_US + (event_id[sel] % 365) * 86400 * US + event_id[sel]
    sel = cls == 5  # exact hour boundary (floor of the original)
    out[sel] = (ts_us[sel] // HOUR_US) * HOUR_US
    sel = cls == 6  # 1 µs BEFORE the hour boundary
    out[sel] = (ts_us[sel] // HOUR_US) * HOUR_US - 1
    out[cls == 7] = ANCHOR_US  # hot tie group (~2.7% of rows)
    return out, null


def mutate_date(keys: np.ndarray, d_us: np.ndarray, mod: int, pre: int, fut: int):
    cls = keys % mod
    out = d_us.copy()
    null = cls == 0
    out[cls == 1] = pre
    out[cls == 2] = fut
    out[cls == 3] = 0
    return out, null


def _write(dst: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, f"{dst}/{name}.parquet")
    print(f"  {name}: {tbl.num_rows} rows")


def _ts_array(us: np.ndarray, null: np.ndarray) -> pa.Array:
    return pa.array(
        [None if n else int(v) for v, n in zip(us, null)],
        type=pa.timestamp("us"),
    )


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew10"
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"passthrough: {' '.join(PASSTHROUGH)}")

    ev = pq.read_table(f"{SRC}/events.parquet")
    eid = ev.column("event_id").to_numpy()
    ts_us = ev.column("ts").cast(pa.int64()).to_numpy()
    new_us, null = mutate_events_ts(eid, ts_us)
    ev = ev.set_column(
        ev.schema.get_field_index("ts"), "ts", _ts_array(new_us, null)
    )
    _write(dst, "events", ev)
    print(
        f"  events classes: null={int(null.sum())} "
        f"pre1970={int(((eid % 37) == 1).sum() + ((eid % 37) == 3).sum())} "
        f"epoch0={int(((eid % 37) == 2).sum())} "
        f"future={int(((eid % 37) == 4).sum())} "
        f"boundary={int(((eid % 37) == 5).sum() + ((eid % 37) == 6).sum())} "
        f"anchor_ties={int(((eid % 37) == 7).sum())}"
    )

    od = pq.read_table(f"{SRC}/orders.parquet")
    ok = od.column("o_orderkey").to_numpy()
    d_us = od.column("o_orderdate").cast(pa.int64()).to_numpy()
    new_us, null = mutate_date(ok, d_us, 41, O_PRE1970_US, O_FUTURE_US)
    od = od.set_column(
        od.schema.get_field_index("o_orderdate"),
        "o_orderdate",
        _ts_array(new_us, null),
    )
    _write(dst, "orders", od)

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    lk = li.column("l_orderkey").to_numpy() * 8 + li.column(
        "l_linenumber"
    ).to_numpy().astype(np.int64)
    d_us = li.column("l_shipdate").cast(pa.int64()).to_numpy()
    new_us, null = mutate_date(lk, d_us, 43, L_PRE1970_US, L_FUTURE_US)
    li = li.set_column(
        li.schema.get_field_index("l_shipdate"),
        "l_shipdate",
        _ts_array(new_us, null),
    )
    _write(dst, "lineitem", li)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
