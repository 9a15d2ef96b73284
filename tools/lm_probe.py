"""Bigram-LM scale probe: training + scoring throughput vs corpus size.

Replicates the sf0.1 documents table (5 000 docs) R times via one range
cross join (same corpus construction as tools/dedup_cert.py, WITHOUT the
token salting — the LM needs a shared vocabulary across replicas, which
is exactly the Zipfian shape a real reference corpus has), trains the
vocabulary-capped bigram LM, then scores the whole corpus against it.

Usage: python tools/lm_probe.py [replica counts...]   (default 10 40)
  10 replicas = 50k docs, 40 = 200k, 200 = 1M.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalakefoundation_spark.ext import lm as LM
from datalakefoundation_spark.session import get_spark


def build_corpus(spark, replicas: int):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n = base.count()
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            F.col("text"),
        )
    ), n * replicas


def main() -> None:
    replica_counts = [int(a) for a in sys.argv[1:]] or [10, 40]
    spark = get_spark()
    for r in replica_counts:
        docs, n_docs = build_corpus(spark, r)
        docs = docs.persist()
        docs.count()
        t0 = time.time()
        uni, bi = LM.train_bigram_lm(docs, vocab_size=50_000, min_bigram_count=2)
        uni = uni.persist()
        bi = bi.persist()
        n_uni, n_bi = uni.count(), bi.count()
        t_train = time.time() - t0
        t0 = time.time()
        scored = LM.score_documents(docs, uni, bi)
        n_scored = scored.count()
        t_score = time.time() - t0
        print(
            f"docs={n_docs:>9,}  train={t_train:6.2f}s  "
            f"score={t_score:6.2f}s ({n_scored / t_score:,.0f} docs/s)  "
            f"|uni|={n_uni:,} |bi|={n_bi:,} scored={n_scored:,}"
        )
        for df in (docs, uni, bi):
            df.unpersist()


if __name__ == "__main__":
    main()
