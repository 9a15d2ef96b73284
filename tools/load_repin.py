"""Re-pin the load_{full,merge,historic}_10k bench keys (VERDICT r7 #4).

r7's only out-of-spread bench mover was load_historic_10k (1.068 → 1.416 s,
spread 0.198, code untouched). This tool reruns exactly bench.py's load
benchmark shape but with SIX timed incremental slices per strategy instead
of three (min + all samples recorded), to separate a real regression from
this host's measured 2x+ run-to-run variance. Run it on a QUIET host
(the idle gate below refuses to time against a busy one).

Usage: python tools/load_repin.py   (records JSON to stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIMED_SLICES = 6


def main() -> None:
    cores = os.cpu_count() or 1
    deadline = time.time() + 120
    while os.getloadavg()[0] > cores * 0.25 and time.time() < deadline:
        time.sleep(5)
    load0 = round(os.getloadavg()[0], 2)
    if load0 > cores * 0.25:
        # refuse, don't degrade: busy-host numbers are exactly the noise
        # this tool exists to exclude
        raise SystemExit(
            f"host still busy after 120s (load {load0}, gate {cores * 0.25}); "
            "re-run when quiet"
        )

    from datalakefoundation_spark.processing import Processing
    from tests.helpers import make_metadata

    spark = get_spark("load-repin")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dlf_repin_")
    out: dict = {"host_load": load0, "timed_slices": TIMED_SLICES}
    try:
        orders = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .select(
                F.col("o_orderkey").alias("ID"),
                F.col("o_orderkey").alias("SeqNr"),
                F.col("o_orderstatus").alias("name"),
                F.col("o_orderpriority").alias("data"),
            )
            .limit(10000)
        )
        for strategy in ("full", "merge", "historic"):
            md = make_metadata(f"{root}/{strategy}", processtype=strategy)
            bronze = md.get_entity(1).get_output().bronzepath.value
            orders.write.mode("overwrite").parquet(f"{bronze}/s1.parquet")
            for i in range(2, 2 + TIMED_SLICES):
                sl = orders.withColumn(
                    "data",
                    F.when(
                        F.col("ID") % 3 == 0,
                        F.concat(F.col("data"), F.lit(f"_v{i}")),
                    ).otherwise(F.col("data")),
                )
                sl.write.mode("overwrite").parquet(f"{bronze}/s{i}.parquet")
            Processing(
                spark, md, 1, "s1.parquet",
                {"processing.time": "2026-01-01 00:00:00"},
            ).process()
            samples = []
            for i in range(2, 2 + TIMED_SLICES):
                start = time.time()
                Processing(
                    spark, md, 1, f"s{i}.parquet",
                    {"processing.time": f"2026-{i:02d}-01 00:00:00"},
                ).process()
                samples.append(round(time.time() - start, 3))
            out[f"load_{strategy}_10k"] = min(samples)
            out[f"load_{strategy}_10k_samples"] = samples
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["host_load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
