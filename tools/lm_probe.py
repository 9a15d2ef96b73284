"""Bigram-LM scale probe: training + scoring throughput vs corpus size.

Replicates the sf0.1 documents table (5 000 docs) R times via one range
cross join (same corpus construction as tools/dedup_cert.py, WITHOUT the
token salting — the LM needs a shared vocabulary across replicas, which
is exactly the Zipfian shape a real reference corpus has), trains the
vocabulary-capped bigram LM, then scores the whole corpus against it.

Usage: python tools/lm_probe.py [replica counts...] [--salt] [--order3]
  (default 10 40; 10 replicas = 50k docs, 40 = 200k, 200 = 1M)

``--order3`` probes the trigram trainer/scorer instead (VERDICT r5
directive #8): one extra corpus-scale count shuffle (|tri| rows) on the
train side and one extra per-order join on the score side — the probe
confirms both stay near-linear in docs.

``--salt`` suffixes every token with its replica id (the dedup_cert
vocab-explosion trick): distinct tokens grow ~base_vocab x R, the cap is
lowered to 1000, and the probe asserts the <unk> path actually carries
count mass — the vocabulary-capping stress the plain mode (tiny shared
synthetic vocab) cannot exercise.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalakefoundation_spark.ext import lm as LM
from datalakefoundation_spark.session import get_spark


def build_corpus(spark, replicas: int, salt: bool):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n = base.count()
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    text = F.col("text")
    if salt:
        text = F.expr(
            "regexp_replace(text, '([^ ]+)', concat('$1#', cast(rep as string)))"
        )
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            text.alias("text"),
        )
    ), n * replicas


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--salt", "--order3")]
    salt = "--salt" in sys.argv[1:]
    order3 = "--order3" in sys.argv[1:]
    replica_counts = [int(a) for a in args] or [10, 40]
    vocab_size = 1000 if salt else 50_000
    spark = get_spark()
    for r in replica_counts:
        docs, n_docs = build_corpus(spark, r, salt)
        docs = docs.persist()
        docs.count()
        tri = None
        t0 = time.time()
        if order3:
            uni, bi, tri = LM.train_trigram_lm(
                docs, vocab_size=vocab_size,
                min_bigram_count=2, min_trigram_count=2,
            )
            tri = tri.persist()
        else:
            uni, bi = LM.train_bigram_lm(
                docs, vocab_size=vocab_size, min_bigram_count=2
            )
        uni = uni.persist()
        bi = bi.persist()
        n_uni, n_bi = uni.count(), bi.count()
        n_tri = tri.count() if tri is not None else 0
        t_train = time.time() - t0
        t0 = time.time()
        if order3:
            scored = LM.score_documents_trigram(docs, uni, bi, tri)
        else:
            scored = LM.score_documents(docs, uni, bi)
        n_scored = scored.count()
        t_score = time.time() - t0
        unk_note = ""
        if salt:
            unk_c = (
                uni.where(F.col("w") == LM.UNK).agg(F.sum("c")).first()[0] or 0
            )
            total_c = uni.agg(F.sum("c")).first()[0]
            assert unk_c > 0, "salted corpus must exercise the <unk> path"
            unk_note = f"  unk_mass={unk_c / total_c:.1%}"
        tri_note = f" |tri|={n_tri:,}" if order3 else ""
        print(
            f"docs={n_docs:>9,}  train={t_train:6.2f}s  "
            f"score={t_score:6.2f}s ({n_scored / t_score:,.0f} docs/s)  "
            f"|uni|={n_uni:,} |bi|={n_bi:,}{tri_note} scored={n_scored:,}{unk_note}"
        )
        for df in (docs, uni, bi, *( [tri] if tri is not None else [] )):
            df.unpersist()


if __name__ == "__main__":
    main()
