"""VALUE-DOMAIN fixture: /tmp/skew8 — every events.value a UNIQUE
continuous double (round-13 VERDICT item 4).

The ordered-statistics family (q_mad_outliers, q_weighted_median,
q_rank_normalize, q_gini_spend, q_equidepth_histogram, q_skyline's
frontier, the value-histogram tier) rides distinct-VALUE tables:
exact order statistics computed in the value domain, correct AND
cheap when the domain is bounded (2-decimal prices, day grains —
the standard fixtures have |distinct| ≪ |rows|). When every double
is unique the value-counts table is FACT-scale: still exact, but the
"small" side of every plan built on it is now as big as the fact.
This fixture makes that regime testable:

- events.value: a seeded permutation spread uniformly over the
  original [0, 500) range plus a sub-ppm jitter — all rows distinct
  (integer-lattice gap 0.05 ≫ 1e-6 jitter), continuous, positive,
  same magnitude as the standard fixture so filters/bands still
  select plausible fractions.

Everything else passes through from sf0.01 untouched. The sweep
checks two things: (1) cross-engine CORRECTNESS when ties vanish
(tie-break-dependent ranks, quantile interpolation between unique
points, histogram bin edges), and (2) that no plan silently assumed
|distinct values| is small enough to collect/broadcast.

Usage:  python tools/make_skew8.py [/tmp/skew8]
Sweep:  SPARK_GRAFT_SIM_SF=/tmp/skew8 python tools/subset_sim.py
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
PASSTHROUGH = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def _seed(name: str) -> int:
    return int.from_bytes(name.encode(), "little") % (2**32)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew8"
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"passthrough: {' '.join(PASSTHROUGH)}")

    ev = pq.read_table(f"{SRC}/events.parquet")
    n = ev.num_rows
    rng = np.random.default_rng(_seed("events.value.unique"))
    # Distinct integer lattice scaled into [0, 500), plus jitter far
    # below the lattice gap: unique by construction, continuous in
    # distribution, same range as the standard fixture.
    lattice = rng.permutation(n).astype(np.float64) * (500.0 / n)
    vals = lattice + rng.random(n) * 1e-6
    assert len(np.unique(vals)) == n, "fixture must be all-distinct"
    cols = {f.name: ev.column(f.name) for f in ev.schema}
    cols["value"] = pa.array(vals, type=pa.float64())
    pq.write_table(pa.table(cols, schema=ev.schema), f"{dst}/events.parquet")
    print(f"events: {n} rows, {len(np.unique(vals))} distinct values (all unique)")


if __name__ == "__main__":
    main()
