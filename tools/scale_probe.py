"""Scale probe: push a 600k-row slice through the full Processing path
(full / merge / historic) and print wall times — the per-round trend metric
recorded in BASELINE.md. Not part of bench.py (the driver bench measures
the sf0.1 query surface); this measures the write-side strategies at 60x
the 10k-row load benchmarks.

Usage: python tools/scale_probe.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.helpers import T0, T1, make_metadata, write_slice  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000

    from datalakefoundation_spark.processing import Processing
    from datalakefoundation_spark.session import get_spark

    spark = get_spark("scale-probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen so the probe measures the strategies, not
    # startup: every strategy's plan shape must run once (whole-stage
    # codegen JIT is per plan shape — a full-load-only warm-up leaves the
    # first merge/historic run paying multi-second compile cost)
    with tempfile.TemporaryDirectory() as warm_root:
        for strategy in ("full", "merge", "historic"):
            md = make_metadata(f"{warm_root}/{strategy}")
            rows = [
                {"ID": i, "SeqNr": i, "name": f"n{i}", "data": f"d{i}"} for i in range(1000)
            ]
            write_slice(spark, md, "s1.parquet", rows)
            write_slice(spark, md, "s2.parquet", [
                {**r, "data": r["data"] + "x"} for r in rows
            ])
            first = "full" if strategy == "full" else strategy
            Processing(spark, md, 1, "s1.parquet", {"processing.time": T0}).process(first)
            Processing(spark, md, 1, "s2.parquet", {"processing.time": T1}).process(strategy)

    results = {}
    for strategy in ("full", "merge", "historic"):
        with tempfile.TemporaryDirectory() as root:
            md = make_metadata(root)
            entity = md.get_entity(1)
            bronze = entity.get_output().bronzepath.value
            base = spark.range(n).selectExpr(
                "CAST(id AS INT) AS ID",
                "id AS SeqNr",
                "concat('name', id) AS name",
                "concat('data', id) AS data",
            )
            base.write.mode("overwrite").parquet(f"{bronze}/s1.parquet")
            # follow-up slices: same keys, changed payload (worst case: all
            # rows differ -> merge updates / SCD2 versions every key). Two
            # timed runs, min recorded — whole-stage codegen JIT is per
            # physical plan shape, and AQE picks a DIFFERENT shape at probe
            # scale (SMJ) than at warm-up scale (broadcast), so the first
            # probe-scale run pays multi-second one-time compile cost that
            # a long-running cluster never sees (same min-of-2 methodology
            # as bench.py).
            base.withColumn("data", base["data"].substr(1, 3)).write.mode(
                "overwrite"
            ).parquet(f"{bronze}/s2.parquet")
            base.withColumn("data", base["data"].substr(1, 2)).write.mode(
                "overwrite"
            ).parquet(f"{bronze}/s3.parquet")

            # first run through the SAME strategy (historic's first-run
            # divert-to-full adds the SCD2 temporal columns)
            first = "full" if strategy == "full" else strategy
            Processing(spark, md, 1, "s1.parquet", {"processing.time": T0}).process(first)
            best = float("inf")
            for s in ("s2.parquet", "s3.parquet"):
                t = time.time()
                Processing(spark, md, 1, s, {"processing.time": T1}).process(strategy)
                best = min(best, time.time() - t)
            results[strategy] = round(best, 2)
            print(f"{strategy}: {results[strategy]} s", flush=True)

    # ------------------------------------------------------ delete inference
    # Active-watermark-window merges (delete_missing=True): the cadence is
    # full load -> small merge -> windowed delete-merge, so the initial
    # segment's stats fall strictly below the window and segment-stats
    # pruning can engage (bucketed layout). The plain-layout run is the
    # contrast: an unpartitioned single-dir table must rewrite wholesale.
    k = max(n // 100, 1)  # 1% incremental slices
    for tag, opts in (
        ("merge_delete_bucketed", {}),
        ("merge_delete_plain", {"bucketing.buckets": 0}),
    ):
        with tempfile.TemporaryDirectory() as root:
            md = make_metadata(root, delete_missing=True)
            entity = md.get_entity(1)
            bronze = entity.get_output().bronzepath.value

            def slice_of(lo, hi, name):
                spark.range(lo, hi).selectExpr(
                    "CAST(id AS INT) AS ID",
                    "id AS SeqNr",
                    "concat('name', id) AS name",
                    "concat('data', id) AS data",
                ).write.mode("overwrite").parquet(f"{bronze}/{name}")

            slice_of(0, n, "s1.parquet")
            slice_of(n, n + k, "s2.parquet")
            slice_of(n + k, n + 2 * k, "s3.parquet")
            slice_of(n + 2 * k, n + 3 * k, "s4.parquet")
            common = {"delete_missing": False, **opts}
            Processing(spark, md, 1, "s1.parquet", {"processing.time": T0, **common}).process()
            Processing(spark, md, 1, "s2.parquet", {"processing.time": T0, **common}).process()
            # s3/s4: delete inference ON — window [prev max, slice max]; the
            # s1 segment (stats max < window lo) is prunable in the bucketed
            # run. Min of 2 (same codegen-JIT rationale as above).
            best = float("inf")
            for s in ("s3.parquet", "s4.parquet"):
                t = time.time()
                Processing(
                    spark, md, 1, s,
                    {"processing.time": T1, "delete_missing": True, **opts},
                ).process()
                best = min(best, time.time() - t)
            results[tag] = round(best, 2)
            print(f"{tag}: {results[tag]} s", flush=True)

    # ------------------------------------------------------ cow vs mor
    # 1%-slice update merges: copy-on-write rewrites every touched bucket;
    # merge-on-read appends a patch of exactly the changed rows + a
    # deletion-vector ref (lake_table.merge_patch). Same data, same model
    # (test_model_based parametrizes both) — this measures the write-cost
    # gap that motivates mor for trickle ingestion into huge tables.
    for tag, opts in (
        ("merge_1pct_cow", {}),
        ("merge_1pct_mor", {"write_mode": "mor"}),
    ):
        with tempfile.TemporaryDirectory() as root:
            md = make_metadata(root)
            entity = md.get_entity(1)
            bronze = entity.get_output().bronzepath.value
            spark.range(n).selectExpr(
                "CAST(id AS INT) AS ID",
                "id AS SeqNr",
                "concat('name', id) AS name",
                "concat('data', id) AS data",
            ).write.mode("overwrite").parquet(f"{bronze}/s1.parquet")
            for i, lo in ((2, 0), (3, k)):
                spark.range(lo, lo + k).selectExpr(
                    "CAST(id AS INT) AS ID",
                    "id AS SeqNr",
                    "concat('name', id) AS name",
                    "concat('CHANGED', id) AS data",
                ).write.mode("overwrite").parquet(f"{bronze}/s{i}.parquet")
            Processing(
                spark, md, 1, "s1.parquet", {"processing.time": T0, **opts}
            ).process()
            best = float("inf")
            for s in ("s2.parquet", "s3.parquet"):
                t = time.time()
                Processing(
                    spark, md, 1, s, {"processing.time": T1, **opts}
                ).process()
                best = min(best, time.time() - t)
            results[tag] = round(best, 2)
            print(f"{tag}: {results[tag]} s", flush=True)

    print({"probe": "600k_slice", "n_rows": n, "seconds": results})


if __name__ == "__main__":
    main()
