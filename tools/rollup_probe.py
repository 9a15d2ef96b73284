"""Rollup maintenance scale probe: incremental refresh vs full rebuild.

Synthesizes N events (default 5M) spanning ~30 days x 8 event types,
persists the minute/hour/day ladder, applies a 1% churn batch (inserts +
deletes + updates), then times (min-of-2 warm):

  * full rebuild:  rollup_cascade over the post-churn table, all levels
                   written to parquet
  * incremental:   refresh_rollup from the change rows, all levels written

Usage: python tools/rollup_probe.py [n_events] [churn_frac]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalakefoundation_spark.ext import rollup as RU
from datalakefoundation_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    churn_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="rollup_probe_")
    try:
        day0 = 1_700_000_000_000_000
        raw = (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                (F.lit(day0) + (F.col("id") * 517_123) % (30 * RU.DAY_US)).alias("ts_us"),
                F.concat(F.lit("type_"), (F.col("id") % 8).cast("string")).alias("event_type"),
                ((F.col("id") % 1000) / 7.0).alias("value"),
            )
        )
        raw.write.mode("overwrite").parquet(f"{tmp}/raw")
        raw = spark.read.parquet(f"{tmp}/raw")
        for w, lv in RU.rollup_cascade(raw).items():
            lv.write.mode("overwrite").parquet(f"{tmp}/lv_{w}")
        stored = {w: spark.read.parquet(f"{tmp}/lv_{w}") for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)}

        k = int(n * churn_frac)
        # churn: delete ids [0,k), update values for [k,2k), insert k new rows
        after = (
            raw.where(F.col("event_id") >= k)
            .withColumn(
                "value",
                F.when(F.col("event_id") < 2 * k, F.col("value") * 2 + 1).otherwise(F.col("value")),
            )
            .unionByName(
                spark.range(n, n + k).select(
                    F.col("id").alias("event_id"),
                    (F.lit(day0) + (F.col("id") * 517_123) % (30 * RU.DAY_US)).alias("ts_us"),
                    F.concat(F.lit("type_"), (F.col("id") % 8).cast("string")).alias("event_type"),
                    ((F.col("id") % 1000) / 7.0).alias("value"),
                )
            )
        )
        after.write.mode("overwrite").parquet(f"{tmp}/after")
        after = spark.read.parquet(f"{tmp}/after")
        # change rows: both images of every churned id (the feed a CDC
        # source would emit); here synthesized directly
        changed = (
            raw.where(F.col("event_id") < 2 * k)
            .unionByName(after.where((F.col("event_id") < 2 * k) | (F.col("event_id") >= n)))
        )
        changed.write.mode("overwrite").parquet(f"{tmp}/changed")
        changed = spark.read.parquet(f"{tmp}/changed")
        print(f"n={n} churn_rows={changed.count()}")

        def timed(label, fn):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            print(f"{label:>18s}: {best:6.2f} s")
            return best

        def full_rebuild():
            for w, lv in RU.rollup_cascade(after).items():
                lv.write.mode("overwrite").parquet(f"{tmp}/full_{w}")

        def incremental():
            for w, lv in RU.refresh_rollup(after, stored, changed).items():
                lv.write.mode("overwrite").parquet(f"{tmp}/incr_{w}")

        t_full = timed("full rebuild", full_rebuild)
        t_incr = timed("incremental", incremental)
        # equivalence check at probe scale
        for w in stored:
            a = spark.read.parquet(f"{tmp}/full_{w}")
            b = spark.read.parquet(f"{tmp}/incr_{w}")
            diff = a.exceptAll(b).count() + b.exceptAll(a).count()
            assert diff == 0, f"level {w}: {diff} differing rows"
        print(f"equivalent: yes   speedup: {t_full / t_incr:.2f}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
