"""Scale probe for the round-5 time-series companions: gapfill,
time_weighted_avg, retention_cohorts, anomaly_scores, and the histogram
percentile path, timed at N synthetic events (default 20M), min-of-2
warm. These are scan/window-shaped operators — the probe pins their
wall-clock so a plan regression (an accidental extra shuffle or an
interpreted hot loop) shows up as a number, not a vibe.

Usage: python tools/timeseries_probe.py [n_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalakefoundation_spark.ext import rollup as RU
from datalakefoundation_spark.session import get_spark

DAY0 = 1_700_000_000_000_000
SPAN_DAYS = 30


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark()
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (
                F.lit(DAY0)
                + (F.col("id").cast("double") / n * float(SPAN_DAYS * RU.DAY_US)).cast("long")
                + (F.col("id") * 517_123) % RU.HOUR_US
            ).alias("ts_us"),
            F.concat(F.lit("type_"), (F.col("id") % 8).cast("string")).alias("event_type"),
            ((F.col("id") % 1000) / 7.0).alias("value"),
            (F.col("id") % 100_000).alias("user_id"),
        )
        .persist()
    )
    ev.count()
    hour = RU.rollup_cascade(ev, resolutions_us=(RU.HOUR_US,))[RU.HOUR_US].persist()
    hour.count()

    def timed(label, fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:>24s}: {best:6.2f} s")

    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    timed("gapfill locf (hour)", lambda: noop(RU.gapfill(hour, RU.HOUR_US, strategy="locf")))
    timed("time_weighted_avg", lambda: noop(RU.time_weighted_avg(ev, resolution_us=RU.HOUR_US)))
    timed("retention_cohorts", lambda: noop(RU.retention_cohorts(ev)))
    timed("anomaly_scores (hour)", lambda: noop(RU.anomaly_scores(hour)))
    timed(
        "histogram p50/p90/p99",
        lambda: noop(
            RU.percentiles_from_histogram(
                RU.coarsen_histogram(
                    RU.value_histogram(ev, 0.0, 150.0, 64), RU.DAY_US
                ),
                0.0, 150.0, 64,
            )
        ),
    )
    print(f"n_events={n:,}")


if __name__ == "__main__":
    main()
