"""Measure the hash-the-vocabulary crossover for the r11 auto knobs.

Replicates the sf0.1 documents corpus Nx (fresh doc_ids, identical Zipf
token shape) and times ``hashed_feature_entries`` / ``simhash`` /
``minhash_signature`` with ``hash_distinct`` forced off vs on (noop sink,
min-of-3 after an untimed warm pass). The auto default
(``$SPARK_GRAFT_HASH_DISTINCT_MIN_BYTES``, 2 MiB) is sized so the vocab
plan engages only above the measured crossover; this probe records the
evidence for that floor at the replication factors around it.

Usage: python tools/vocab_hash_probe.py [factors ...]   (default: 1 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.ext import dedup as D  # noqa: E402
from datalakefoundation_spark.ext import similarity as SIM  # noqa: E402
from datalakefoundation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(df, runs: int = 3) -> float:
    _force(df)
    samples = []
    for _ in range(runs):
        t0 = time.time()
        _force(df)
        samples.append(time.time() - t0)
    return round(min(samples), 3)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    spark = get_spark("vocab-hash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out: dict[str, dict] = {}
    for fx in factors:
        rep = (
            docs.crossJoin(spark.range(fx).withColumnRenamed("id", "__r"))
            .select(
                (F.col("doc_id") + F.col("__r") * 10_000_000).alias("doc_id"),
                "text",
            )
            if fx > 1
            else docs
        )
        ops = {
            "hashed_features": lambda d: SIM.hashed_feature_entries(d),
            "simhash": lambda d: D.simhash(d),
            "minhash": lambda d: D.minhash_signature(d),
        }
        only = os.environ.get("VOCAB_PROBE_OPS")
        if only:
            ops = {k: v for k, v in ops.items() if k in only.split(",")}
        rec: dict[str, float] = {"rows": rep.count()}
        for name, fn in ops.items():
            os.environ["SPARK_GRAFT_HASH_DISTINCT_MIN_BYTES"] = str(1 << 60)
            rec[f"{name}_direct"] = _timed(fn(rep))
            os.environ["SPARK_GRAFT_HASH_DISTINCT_MIN_BYTES"] = "0"
            rec[f"{name}_vocab"] = _timed(fn(rep))
            del os.environ["SPARK_GRAFT_HASH_DISTINCT_MIN_BYTES"]
        out[f"x{fx}"] = rec
        print(json.dumps({f"x{fx}": rec}), flush=True)
    print(json.dumps({"probe": "vocab_hash_crossover", "sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
