"""Rollup maintenance scale probe: incremental refresh vs full rebuild.

Synthesizes N events spanning ~30 days x 8 event types, written in time
order (as any real events table is), persists the minute/hour/day ladder,
applies a churn batch, then times (min-of-2 warm):

  * full rebuild:  rollup_cascade over the post-churn table, all levels
                   written to parquet
  * incremental:   refresh_rollup from the change rows, all levels written

Churn modes:
  late       (default) — churn confined to the final day (late-arriving
             data / recent corrections, the continuous-aggregate case).
             refresh_rollup's collected bucket bounds become a static
             ts BETWEEN over ~1/30 of the table, so parquet row-group
             min/max stats skip the other 29 days.
  scattered  — churn uniform over all 30 days (worst case: bounds cover
             everything, nearly every (minute, key) group affected;
             refresh degrades to ~rebuild cost, never worse than ~2x).

Usage: python tools/rollup_probe.py [n_events] [churn_frac] [late|scattered]
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

DAY0 = 1_700_000_000_000_000
SPAN_DAYS = 30


def _events(spark, ids, n_total):
    """Time-ordered synthetic events: ts grows ~linearly with id (plus a
    deterministic sub-hour jitter), so the parquet row groups carry tight
    ts_us min/max stats — the shape of any real append-only events table."""
    return ids.select(
        F.col("id").alias("event_id"),
        (
            F.lit(DAY0)
            + (
                F.col("id").cast("double") / F.lit(n_total) * F.lit(float(SPAN_DAYS * RU.DAY_US))
            ).cast("long")
            + (F.col("id") * 517_123) % RU.HOUR_US
        ).alias("ts_us"),
        F.concat(F.lit("type_"), (F.col("id") % 8).cast("string")).alias("event_type"),
        ((F.col("id") % 1000) / 7.0).alias("value"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    churn_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    mode = sys.argv[3] if len(sys.argv) > 3 else "late"
    assert mode in ("late", "scattered"), mode
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="rollup_probe_")
    try:
        raw_df = _events(spark, spark.range(n), n)
        # one time-ordered file chain: sortWithinPartitions after coalesce
        # keeps row-group ts stats tight (range(n) is already id-ordered,
        # this just guards against partition interleaving)
        raw_df.sortWithinPartitions("event_id").write.mode("overwrite").parquet(f"{tmp}/raw")
        raw = spark.read.parquet(f"{tmp}/raw")
        for w, lv in RU.rollup_cascade(raw).items():
            lv.write.mode("overwrite").parquet(f"{tmp}/lv_{w}")
        stored = {w: spark.read.parquet(f"{tmp}/lv_{w}") for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)}

        k = int(n * churn_frac)
        if mode == "late":
            # late-data shape: churn is the CONTIGUOUS tail (the most
            # recent 2k events — corrections/late arrivals land in the
            # last hours), so the affected time window ∝ churn, not n
            lo = n - 2 * k
        else:
            lo = 0
        # delete ~k ids, update ~k ids, all >= lo; insert k new rows whose
        # ts falls at the tail (new ids n..n+k map onto the tail slope)
        m = max((n - lo) // k, 2)
        churn_ids = F.col("event_id") >= lo
        sel = (F.col("event_id") - lo) % m
        is_del = churn_ids & (sel == 0)
        is_upd = churn_ids & (sel == 1)
        after_df = (
            raw.where(~is_del)
            .withColumn("value", F.when(is_upd, F.col("value") * 2 + 1).otherwise(F.col("value")))
        )
        inserts = _events(spark, spark.range(n, n + k), n + k)
        after_df = after_df.unionByName(inserts)
        after_df.write.mode("overwrite").parquet(f"{tmp}/after")
        after = spark.read.parquet(f"{tmp}/after")
        # change rows: both images of every churned id (the feed a CDC
        # source would emit); here synthesized directly
        changed = (
            raw.where(is_del | is_upd)
            .unionByName(after.where(is_upd | (F.col("event_id") >= n)))
        )
        changed.write.mode("overwrite").parquet(f"{tmp}/changed")
        changed = spark.read.parquet(f"{tmp}/changed")
        print(f"n={n} mode={mode} churn_rows={changed.count()}")

        def timed(label, fn):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            print(f"{label:>18s}: {best:6.2f} s")
            return best

        def _mat(prefix):
            # the maintenance-job shape: persist each level, aggregate the
            # next from the persisted parquet (not a re-executed plan)
            def hook(w, df):
                df.write.mode("overwrite").parquet(f"{tmp}/{prefix}_{w}")
                return spark.read.parquet(f"{tmp}/{prefix}_{w}")

            return hook

        def full_rebuild():
            RU.rollup_cascade(after, materialize=_mat("full"))

        def incremental():
            RU.refresh_rollup(after, stored, changed, materialize=_mat("incr"))

        t_full = timed("full rebuild", full_rebuild)
        t_incr = timed("incremental", incremental)

        # lake-backed leg: ladder persisted as LakeTables, refresh is a
        # MoR patch per level (writes ∝ churn; no carry-over rewrite).
        # Re-running the same feed is idempotent (recompute reads `after`),
        # so min-of-2 is sound.
        from datalakefoundation_spark.tables.lake_table import LakeTable

        tables = {
            w: LakeTable(spark, f"{tmp}/lake_{w}")
            for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
        }
        RU.build_rollup_lake(raw, tables)

        lake_metrics = {}

        def incremental_lake():
            lake_metrics.update(RU.refresh_rollup_lake(after, tables, changed))

        t_lake = timed("incremental-lake", incremental_lake)
        # write volume: the 100 TB story. Rebuild and plain incremental
        # rewrite every level row per refresh; the lake path writes only
        # the patch (or reports the adaptive per-level rebuild).
        level_rows = sum(
            spark.read.parquet(f"{tmp}/full_{w}").count() for w in stored
        )
        lake_rows = sum(m["patched"] + m["deleted"] for m in lake_metrics.values())
        rebuilt = [w for w, m in lake_metrics.items() if m["rebuilt"]]
        print(
            f"rows written/refresh: rebuild+incremental {level_rows}, "
            f"lake {lake_rows} (levels adaptively rebuilt: {rebuilt or 'none'})"
        )
        # equivalence check at probe scale
        for w in stored:
            a = spark.read.parquet(f"{tmp}/full_{w}")
            b = spark.read.parquet(f"{tmp}/incr_{w}")
            diff = a.exceptAll(b).count() + b.exceptAll(a).count()
            assert diff == 0, f"level {w}: {diff} differing rows"
            c = tables[w].read().select(*a.columns)
            diff = a.exceptAll(c).count() + c.exceptAll(a).count()
            assert diff == 0, f"lake level {w}: {diff} differing rows"
        print(
            f"equivalent: yes   speedup: {t_full / t_incr:.2f}x"
            f"   lake: {t_full / t_lake:.2f}x"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
