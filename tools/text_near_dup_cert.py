"""Realistic-corpus recall certification for ``text_near_dup_scaled``
(VERDICT r5 directive #3).

The r5 fixture asserted recall >= 0.5 on a worst-case tiny-vocab corpus;
this probe measures the bands-vs-recall contract on a REALISTIC corpus:

  * Zipfian token distribution (exponent 1.2 over a 50k-token vocabulary,
    120 tokens/doc) — the regime where hashed-feature vectors share heavy
    head tokens, the hard case for sign-LSH on non-centered data.
    Features are BIGRAM shingles (``ngram=2``): unigram features on this
    corpus are head-dominated to the point where unrelated docs sit at
    cosine ~0.85+ and "near-dup at 0.85" is inherently quadratic — the
    first probe run measured recall@0.95 of only 0.74 at bands=4 with
    19-minute legs; bigrams flatten the distribution so cosine carries
    the similarity signal (same reason MinHash shingles, not words);
  * planted near-dup clusters: each base doc gets three variants at token
    substitution rates 2% / 6% / 14%, landing the planted pairs across
    graded hashed-cosine levels; the TRUE cosine of every planted pair is
    measured exactly (``sparse_cosine_pairs(candidates=planted)``) and
    pairs are bucketed at 0.85/0.90/0.95;
  * for bands in {4, 8} on the full corpus and 16 on a 20k-doc subset
    (planes_per_band=8), run the full scale path
    ``text_near_dup_scaled(threshold=0.85)`` (mean-centered projections,
    the default) and report per-bucket recall (found planted pairs /
    planted pairs in bucket) + wall time;
  * one UNCENTERED contrast leg at bands=8, on a 20k-doc SUBSET with a
    1024 bucket cap: on all-nonnegative Zipf-head-dominated vectors,
    origin-through sign-LSH collapses the corpus into a handful of
    buckets — uncapped it goes quadratic (the first probe run never
    finished one 60k-doc leg), and even capped at 4096 the candidate
    set is so junk-heavy the exact re-score join exceeded the disk
    (candidates x ~120 token entries each). The subset leg bounds the
    damage and records the recall collapse the cap causes.

Precision is exact by construction (every emitted pair carries its true
cosine and the threshold filter is exact), so recall over planted pairs is
the only open question — non-planted pairs the operator also finds are
true positives by the same exactness and do not affect the metric.

Asserted contract (recorded in BASELINE.md): at the tuned default
bands=8, recall >= 0.9 for planted pairs with cosine >= 0.95.

Deterministic: all randomness from numpy default_rng(20260815).

Usage: python tools/text_near_dup_cert.py [n_base_docs]   (default 15000)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.ext.similarity import (  # noqa: E402
    hashed_feature_entries,
    sparse_cosine_pairs,
    text_near_dup_scaled,
)
from datalakefoundation_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
NGRAM = 2
DOC_LEN = 120
ZIPF_EXP = 1.2
RATES = (0.02, 0.06, 0.14)
THRESHOLD = 0.85
BUCKETS = ((0.85, 0.90), (0.90, 0.95), (0.95, 1.0001))
SEED = 20260815


def build_corpus(n_base: int):
    """(docs rows, planted id pairs). Cluster i occupies ids 4i..4i+3:
    base + one variant per substitution rate; planted pairs are all 6
    within-cluster combinations."""
    rng = np.random.default_rng(SEED)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = ranks ** -ZIPF_EXP
    p /= p.sum()
    base = rng.choice(VOCAB, size=(n_base, DOC_LEN), p=p)
    rows = []
    pairs = []
    for i in range(n_base):
        cluster = [base[i]]
        for rate in RATES:
            v = cluster[0].copy()
            n_sub = max(1, int(round(rate * DOC_LEN)))
            pos = rng.choice(DOC_LEN, size=n_sub, replace=False)
            v[pos] = rng.choice(VOCAB, size=n_sub, p=p)
            cluster.append(v)
        ids = [4 * i + j for j in range(4)]
        for j, toks in enumerate(cluster):
            rows.append((ids[j], " ".join(f"w{t}" for t in toks)))
        for a in range(4):
            for b in range(a + 1, 4):
                pairs.append((ids[a], ids[b]))
    return rows, pairs


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
    spark = get_spark("text-near-dup-cert")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    rows, pairs = build_corpus(n_base)
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    planted = spark.createDataFrame(pairs, "id_a long, id_b long")
    docs.persist().count()
    planted.persist().count()
    gen_s = round(time.time() - t0, 1)

    # exact hashed-cosine of every planted pair — same entries pipeline the
    # operator scores with, so "truth" and "found" use one definition
    entries = hashed_feature_entries(docs, ngram=NGRAM).persist()
    truth = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sparse_cosine_pairs(
            entries, threshold=0.0, candidates=planted
        ).collect()
    }
    by_bucket: dict[tuple, set] = {b: set() for b in BUCKETS}
    for pair, cos in truth.items():
        for lo, hi in BUCKETS:
            if lo <= cos < hi:
                by_bucket[(lo, hi)].add(pair)
    rec: dict = {
        "n_docs": 4 * n_base,
        "gen_s": gen_s,
        "planted_pairs": len(truth),
        "bucket_sizes": {f"{lo:.2f}": len(v) for (lo, hi), v in by_bucket.items()},
    }

    # full-corpus sweep at bands 4/8; bands=16 and the uncentered
    # contrast run on a 20k-doc subset — background band collisions grow
    # superlinearly with bands (more bands = more buckets a random pair
    # can meet in), and at 60k docs the bands=16 expansion spilled past
    # this host's disk headroom. Recall is a per-pair property, so the
    # subset reading is the same contract measured on fewer pairs.
    sub_n = min(20_000, 4 * n_base)
    sub = docs.where(F.col("doc_id") < sub_n)

    def leg(name, frame, bands, center, cap, id_bound):
        t0 = time.time()
        found = {
            (r["id_a"], r["id_b"])
            for r in text_near_dup_scaled(
                frame, threshold=THRESHOLD, bands=bands, ngram=NGRAM,
                center=center, max_bucket_width=cap,
            ).collect()
        }
        rec[f"{name}_s"] = round(time.time() - t0, 1)
        for (lo, hi), members in by_bucket.items():
            scoped = (
                members if id_bound is None
                else {p for p in members if p[0] < id_bound and p[1] < id_bound}
            )
            if scoped:
                rec[f"{name}_recall_{lo:.2f}"] = round(
                    len(scoped & found) / len(scoped), 4
                )
        print(json.dumps({"leg": name, **rec}), flush=True)

    leg("bands4", docs, 4, True, None, None)
    leg("bands8", docs, 8, True, None, None)
    leg("bands16_sub", sub, 16, True, None, sub_n)
    leg("uncentered_sub", sub, 8, False, 1024, sub_n)
    print(json.dumps(rec), flush=True)

    assert rec.get("bands8_recall_0.95", 0.0) >= 0.9, (
        "default bands=8 must keep recall >= 0.9 at cosine >= 0.95: "
        f"{rec.get('bands8_recall_0.95')}"
    )
    print("TEXT NEAR-DUP CERT OK")


if __name__ == "__main__":
    main()
