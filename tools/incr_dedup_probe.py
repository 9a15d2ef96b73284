"""Incremental-vs-full near-dup maintenance probe.

Scales the sf0.1 documents table to N replicas (each replica's text gets a
distinct marker token so replicas are near- but not exact duplicates of
each other), persists the MinHash signature index once, then measures the
cost of absorbing one 500-doc ingest batch two ways:

  full : re-run minhash_dedup_candidates over (corpus + batch)
  incr : minhash_signature(batch) + one band join vs the stored index
         (ext/dedup.py incremental_lsh_candidates)

The full path re-pays signature compute + bucketing for every corpus doc
per ingest; the incremental path pays O(batch) + an index-side scan of
(id, band) pairs. The gap grows linearly with corpus size — this probe
records the crossover evidence for BASELINE.md.

Usage: python tools/incr_dedup_probe.py [n_replicas]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.ext.dedup import (  # noqa: E402
    incremental_lsh_candidates,
    minhash_dedup_candidates,
    minhash_signature,
)
from datalakefoundation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    corpus = None
    for i in range(replicas):
        rep = base.select(
            (F.col("doc_id") + i * n_base).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" marker{i}")).alias("text"),
        )
        corpus = rep if corpus is None else corpus.unionByName(rep)
    batch = base.limit(500).select(
        (F.col("doc_id") + replicas * n_base).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" markerbatch")).alias("text"),
    )

    with tempfile.TemporaryDirectory() as tmp:
        corpus_path = f"{tmp}/corpus.parquet"
        index_path = f"{tmp}/index.parquet"
        batch_path = f"{tmp}/batch.parquet"
        corpus.write.parquet(corpus_path)
        batch.write.parquet(batch_path)
        corpus_df = spark.read.parquet(corpus_path)
        batch_df = spark.read.parquet(batch_path)
        # one-time index build (amortized across every later ingest)
        t0 = time.time()
        minhash_signature(corpus_df).write.parquet(index_path)
        t_build = time.time() - t0
        index_df = spark.read.parquet(index_path)

        results: dict[str, float] = {}
        for name, fn in [
            (
                "full_rerun",
                lambda: _force(
                    minhash_dedup_candidates(corpus_df.unionByName(batch_df))
                ),
            ),
            (
                "incremental",
                lambda: _force(
                    incremental_lsh_candidates(
                        index_df, minhash_signature(batch_df)
                    )
                ),
            ),
        ]:
            fn()  # warm (codegen JIT, page cache)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            results[name] = round(best, 3)

        print(
            {
                "corpus_docs": n_base * replicas,
                "batch_docs": 500,
                "index_build_once_s": round(t_build, 3),
                **results,
                "speedup": round(results["full_rerun"] / results["incremental"], 1),
            }
        )


if __name__ == "__main__":
    main()
