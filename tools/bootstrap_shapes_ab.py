"""Interleaved A/B/C re-proof of the round-7 bootstrap-shape negative
results (round-9 VERDICT item 3: re-prove every load-bearing SCALE.md
conclusion that predates the interleaved protocol).

The round-7 numbers were measured in separate sessions across the round
(cross-window), and two of their margins sit inside the 10-25% ambient
noise band. This tool re-measures all three shapes INTERLEAVED in one
session — A,B,C,A,B,C... with clearCache + release_pins between runs —
and asserts the three shapes produce IDENTICAL rows first.

Shapes (all end in the identical rank-window + CI aggregate):
  A registered  — per-(row,b) explode, md5 per (row,b//8) digest string,
                  one 4-char lane sliced by b%%8 (plans/quality.py).
  B lanes       — NO row inflation: 40 na + 40 sa conditional-sum lanes
                  in one aggregate, then a 40-struct explode of the
                  1-row-per-type result (the round-7 "optimization"
                  that fell out of whole-stage codegen).
  C two-level   — explode d=b//8 (5 digests/row), md5 once per (row,d),
                  posexplode the 8 four-char lanes (8x fewer md5 calls,
                  stacked Generates).

Usage: python tools/bootstrap_shapes_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.functions.cachepin import release_pins
from news_categorization_big_data_spark.functions.exact import dec_to_double
from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.plans.quality import (
    BOOT_B,
    BOOT_K_HI,
    BOOT_K_LO,
    BOOT_T,
)
from news_categorization_big_data_spark.session import get_spark
from news_categorization_big_data_spark.sources.tables import load_table


def _w_of(u16):
    return sum((u16 >= F.lit(t)).cast("int") for t in BOOT_T)


def _finish(res: DataFrame) -> DataFrame:
    """Shared tail: rank window + CI aggregate (identical to the
    registered plan's)."""
    res = res.where(F.col("na") > 0)
    wn = Window.partitionBy("event_type").orderBy(
        (F.col("sa") / F.col("na")).asc(), F.col("b").asc()
    )
    m = res.select(
        "event_type",
        (F.col("sa") / F.col("na")).alias("mean_b"),
        F.row_number().over(wn).alias("rn"),
    )
    return m.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_resamples"),
        F.max(F.when(F.col("rn") == BOOT_K_LO, F.col("mean_b"))).alias("boot_lo"),
        F.max(F.when(F.col("rn") == BOOT_K_HI, F.col("mean_b"))).alias("boot_hi"),
    )


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )


def shape_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REGISTRY["q_bootstrap_ci"].builder(spark, sf_dir)


def shape_b_lanes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _base(spark, sf_dir)
    aggs = []
    for b in range(BOOT_B):
        u16 = F.conv(
            F.expr(
                f"substring(md5(concat('boot', '{b // 8}', ':', "
                f"cast(event_id as string))), {1 + 4 * (b % 8)}, 4)"
            ),
            16,
            10,
        ).cast("long")
        w = _w_of(u16)
        aggs.append(F.sum(w).cast("long").alias(f"na_{b}"))
        aggs.append(dec_to_double(F.sum(w * F.col("v")), 2).alias(f"sa_{b}"))
    wide = ev.groupBy("event_type").agg(*aggs)
    stacked = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.col(f"na_{b}").alias("na"),
                F.col(f"sa_{b}").alias("sa"),
            )
            for b in range(BOOT_B)
        ]
    )
    res = wide.select("event_type", F.explode(stacked).alias("r")).select(
        "event_type", "r.b", "r.na", "r.sa"
    )
    return _finish(res)


def shape_c_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _base(spark, sf_dir).withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B // 8 - 1)))
    )
    digest = F.expr(
        "md5(concat('boot', cast(d as string), ':', cast(event_id as string)))"
    )
    lanes = F.array(
        *[
            F.conv(F.substring(digest, 1 + 4 * j, 4), 16, 10).cast("long")
            for j in range(8)
        ]
    )
    lv = ev.select(
        "event_type", "v", "d", F.posexplode(lanes).alias("j", "u16")
    ).select(
        "event_type",
        "v",
        (F.col("d") * 8 + F.col("j")).alias("b"),
        "u16",
    )
    res = (
        lv.select("event_type", "b", _w_of(F.col("u16")).alias("w"), "v")
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").cast("long").alias("na"),
            dec_to_double(F.sum(F.col("w") * F.col("v")), 2).alias("sa"),
        )
    )
    return _finish(res)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("bootstrap-shapes-ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {"A_registered": shape_a, "B_lanes": shape_b_lanes, "C_two_level": shape_c_two_level}

    # Output equality first: any timing of non-identical plans is void.
    outs = {}
    for name, fn in shapes.items():
        spark.catalog.clearCache()
        release_pins()
        outs[name] = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert outs["A_registered"] == outs["B_lanes"] == outs["C_two_level"], (
        "shapes disagree — A/B void"
    )
    print(f"outputs identical across shapes ({len(outs['A_registered'])} rows)")

    times: dict[str, list[float]] = {n: [] for n in shapes}
    for _ in range(reps):
        for name, fn in shapes.items():
            spark.catalog.clearCache()
            release_pins()
            t = time.perf_counter()
            # noop sink, NOT count(): Dataset.count() column-prunes the
            # final CI max-aggregates (and can prune the rank window) —
            # the exact pitfall bench.py's round-10 harness fix closed.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t, 3))
    for name, ts in times.items():
        print(f"{name}: runs={ts} best={min(ts):.3f}")


if __name__ == "__main__":
    main()
