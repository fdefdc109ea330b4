"""NON-FINITE fixture: /tmp/skew7 — NaN/±Inf where production grows them.

A 100-TB metrics/embedding corpus WILL contain non-finite doubles: a
sensor division by zero upstream, an overflowed feature, a bad encode
emitting NaN vector components. Ledger-style amounts (o_totalprice,
l_extendedprice) are excluded on purpose — money is finite by schema
contract and the exact-decimal (dsum) paths are entitled to assume it;
the axis targets the columns where non-finite values are a data
reality, not a schema violation:

- events.value: 3% NaN, 1.5% +Inf, 1.5% -Inf (seeded, deterministic) —
  probes aggregation (sum/avg propagate NaN identically?), ordering
  (Spark sorts NaN GREATER than +Inf; DuckDB agrees? — the sweep
  decides), window frames, quantiles/histograms, z-scores.
- embeddings.embedding: 2% of vectors get ONE NaN component — probes
  the dot/cosine pipelines (NaN poisons the score), top-k ordering
  over NaN scores, normalization, quantization.

Everything else passes through from sf0.01 untouched.

Usage:  python tools/make_skew7.py [/tmp/skew7]
Sweep:  SPARK_GRAFT_SIM_SF=/tmp/skew7 python tools/subset_sim.py
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
    "region nation customer supplier part orders lineitem documents"
).split()


def _seed(name: str) -> int:
    return int.from_bytes(name.encode(), "little") % (2**32)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew7"
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"passthrough: {' '.join(PASSTHROUGH)}")

    ev = pq.read_table(f"{SRC}/events.parquet")
    vals = ev.column("value").combine_chunks().to_numpy(zero_copy_only=False).copy()
    rng = np.random.default_rng(_seed("events.value"))
    r = rng.random(len(vals))
    vals[r < 0.03] = np.nan
    vals[(r >= 0.03) & (r < 0.045)] = np.inf
    vals[(r >= 0.045) & (r < 0.06)] = -np.inf
    cols = {f.name: ev.column(f.name) for f in ev.schema}
    cols["value"] = pa.array(vals, type=pa.float64())
    pq.write_table(pa.table(cols, schema=ev.schema), f"{dst}/events.parquet")
    n_nan = int(np.isnan(vals).sum())
    n_inf = int(np.isinf(vals).sum())
    print(f"events: {len(vals)} rows, {n_nan} NaN, {n_inf} ±Inf in value")

    em = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = em.column("embedding").combine_chunks()
    pylist = emb.to_pylist()
    rng = np.random.default_rng(_seed("embeddings.embedding"))
    poisoned = 0
    for i in range(len(pylist)):
        if pylist[i] and rng.random() < 0.02:
            j = int(rng.integers(0, len(pylist[i])))
            pylist[i] = list(pylist[i])
            pylist[i][j] = float("nan")
            poisoned += 1
    cols = {f.name: em.column(f.name) for f in em.schema}
    cols["embedding"] = pa.array(pylist, type=emb.type)
    pq.write_table(pa.table(cols, schema=em.schema), f"{dst}/embeddings.parquet")
    print(f"embeddings: {len(pylist)} vectors, {poisoned} poisoned with one NaN")


if __name__ == "__main__":
    main()
