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

    # warm the JVM/codegen so the probe measures the strategies, not startup
    with tempfile.TemporaryDirectory() as warm_root:
        md = make_metadata(warm_root)
        write_slice(spark, md, "s1.parquet", [
            {"ID": i, "SeqNr": i, "name": f"n{i}", "data": f"d{i}"} for i in range(100)
        ])
        Processing(spark, md, 1, "s1.parquet", {"processing.time": T0}).process("full")

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
            # second slice: same keys, changed payload (worst case: all rows
            # differ -> merge updates / SCD2 versions every key)
            base.withColumn("data", base["data"].substr(1, 3)).write.mode(
                "overwrite"
            ).parquet(f"{bronze}/s2.parquet")

            # first run through the SAME strategy (historic's first-run
            # divert-to-full adds the SCD2 temporal columns)
            first = "full" if strategy == "full" else strategy
            Processing(spark, md, 1, "s1.parquet", {"processing.time": T0}).process(first)
            t = time.time()
            Processing(spark, md, 1, "s2.parquet", {"processing.time": T1}).process(strategy)
            results[strategy] = round(time.time() - t, 2)
            print(f"{strategy}: {results[strategy]} s", flush=True)

    print({"probe": "600k_slice", "n_rows": n, "seconds": results})


if __name__ == "__main__":
    main()
