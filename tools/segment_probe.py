"""Probe the read path's live-segment-count axis (VERDICT r4 #4).

Builds a plain unpartitioned LakeTable, appends N tiny segments, and
measures (a) read() DataFrame construction time (driver plan BUILD),
(b) first count() (analysis + execution). Records numbers for
BASELINE.md; the regression test (tests/test_lake_table.py) pins the
plan-build bound at a modest N.

Usage: python tools/segment_probe.py [counts...]   (default 100 300 1000)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main(counts):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datalakefoundation_spark.tables.lake_table import LakeTable

    import shutil, tempfile

    root = tempfile.mkdtemp(prefix="segprobe_")
    t = LakeTable(spark, f"{root}/t")
    one = spark.range(10).selectExpr("id", "id * 2 AS v")
    results = {}
    total = 0
    for target in sorted(counts):
        while total < target:
            t.append(one)
            total += 1
        s0 = time.time()
        df = t.read()
        build = time.time() - s0
        s1 = time.time()
        n = df.count()
        act = time.time() - s1
        assert n == 10 * total, (n, total)
        results[total] = (round(build, 3), round(act, 3))
        print(f"segments={total:5d} plan_build={build:7.3f}s first_count={act:7.3f}s")
    shutil.rmtree(root, ignore_errors=True)
    return results


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [100, 300, 1000]
    main(counts)
