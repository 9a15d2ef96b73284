"""Measure the per-pair vs exploded crossover for ngram_jaccard_pairs.

Replicates the sf0.1 documents corpus Nx (fresh doc_ids, neighbor-window
candidates like the declared q_ngram_jaccard) and times the per-pair
array_intersect form against the exploded inverted-index form (noop sink,
min-of-3 after an untimed warm pass). Evidence for
``JACCARD_EXPLODED_FLOOR`` / ``$SPARK_GRAFT_JACCARD_EXPLODED_MIN_BYTES``.

Usage: python tools/jaccard_probe.py [factors ...]   (default: 1 8 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.ext import dedup as D  # noqa: E402
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
    spark = get_spark("jaccard-probe")
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
        cand = rep.select(
            F.col("doc_id").alias("doc_a"),
            F.explode(
                F.sequence(F.col("doc_id") + 1, F.col("doc_id") + 5)
            ).alias("doc_b"),
        )
        rec = {
            "rows": rep.count(),
            "direct": _timed(D.ngram_jaccard_pairs(rep, cand, exploded=False)),
            "exploded": _timed(D.ngram_jaccard_pairs(rep, cand, exploded=True)),
        }
        out[f"x{fx}"] = rec
        print(json.dumps({f"x{fx}": rec}), flush=True)
    print(json.dumps({"probe": "jaccard_crossover", "sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
