"""Bigram-LM quality scoring (ext/lm.py): training counts and stupid-
backoff scores verified against a pure-Python reference (ln is not
bit-portable across engines — see lm.py — so scores compare at 1e-9,
counts exactly); plus the CCNet-shaped sanity property that reference-
like text scores lower perplexity than token-scrambled gibberish."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.ext import lm as LM

SF = "/root/testdata/sf0.001"


def _py_train(texts, vocab_size):
    uni_raw = Counter(t for txt in texts for t in txt.split(" "))
    vocab = {
        w
        for w, _ in sorted(uni_raw.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    }
    m = lambda w: w if w in vocab else LM.UNK
    uni = Counter(m(t) for txt in texts for t in txt.split(" "))
    bi = Counter()
    for txt in texts:
        ts = txt.split(" ")
        for a, b in zip(ts, ts[1:]):
            bi[(m(a), m(b))] += 1
    return uni, bi


def _py_score(texts_by_id, uni, bi, alpha=0.4):
    total, v = sum(uni.values()), len(uni)
    vocab = set(uni) - {LM.UNK}
    m = lambda w: w if w in vocab else LM.UNK
    out = {}
    for doc_id, txt in texts_by_id.items():
        ts = [m(t) for t in txt.split(" ")]
        ps = []
        for a, b in zip(ts, ts[1:]):
            if (a, b) in bi:
                ps.append(bi[(a, b)] / uni[a])
            else:
                ps.append(alpha * (uni.get(b, 0) + 1.0) / (total + v + 1))
        if ps:
            out[doc_id] = -sum(math.log(p) for p in ps) / len(ps)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


def test_train_counts_match_python(spark, docs):
    texts = [r["text"] for r in docs.collect()]
    py_uni, py_bi = _py_train(texts, vocab_size=100)
    uni, bi = LM.train_bigram_lm(docs, vocab_size=100)
    got_uni = {r["w"]: r["c"] for r in uni.collect()}
    got_bi = {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()}
    assert got_uni == dict(py_uni)
    assert got_bi == dict(py_bi)


def test_scores_match_python_reference(spark, docs):
    rows = docs.collect()
    texts = [r["text"] for r in rows]
    by_id = {r["doc_id"]: r["text"] for r in rows}
    py_uni, py_bi = _py_train(texts, vocab_size=100)
    expected = _py_score(by_id, py_uni, py_bi)
    uni, bi = LM.train_bigram_lm(docs, vocab_size=100)
    got = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in LM.score_documents(docs, uni, bi).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-9), k


def test_gibberish_scores_worse_and_filter_keeps_clean(spark):
    """Structured corpus (strong bigram patterns): token-scrambled copies
    must score far worse than in-distribution text, and the perplexity
    gate must keep the clean docs. (The sf fixture's synthetic text has
    near-random bigram structure, so this property needs a corpus where
    word ORDER carries signal.)"""
    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    alt = "a small black cat sits under the old oak tree every single day"
    clean_rows = [(i, base if i % 2 == 0 else alt) for i in range(40)]
    clean_df = spark.createDataFrame(clean_rows, "doc_id long, text string")
    uni, bi = LM.train_bigram_lm(clean_df, vocab_size=500)
    scrambled = clean_df.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
    )
    both = clean_df.unionByName(scrambled)
    scores = LM.score_documents(both, uni, bi).cache()
    clean = scores.where(F.col("doc_id") < 1_000_000).agg(F.avg("ppl")).first()[0]
    trash = scores.where(F.col("doc_id") >= 1_000_000).agg(F.avg("ppl")).first()[0]
    assert trash > clean * 5, (clean, trash)
    thr = (clean + trash) / 2
    kept = LM.perplexity_filter(both, uni, bi, max_ppl=thr)
    assert kept.where(F.col("doc_id") < 1_000_000).count() == 40
    assert kept.where(F.col("doc_id") >= 1_000_000).count() == 0


def _py_train_tri(texts, vocab_size):
    uni, bi = _py_train(texts, vocab_size)
    vocab = set(uni) - {LM.UNK}
    m = lambda w: w if w in vocab else LM.UNK
    tri = Counter()
    for txt in texts:
        ts = [m(t) for t in txt.split(" ")]
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            tri[(a, b, c)] += 1
    return uni, bi, tri


def _py_score_tri(texts_by_id, uni, bi, tri, alpha=0.4):
    total, v = sum(uni.values()), len(uni)
    vocab = set(uni) - {LM.UNK}
    m = lambda w: w if w in vocab else LM.UNK
    out = {}
    for doc_id, txt in texts_by_id.items():
        ts = [m(t) for t in txt.split(" ")]
        ps = []
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            if (a, b, c) in tri and (a, b) in bi:
                ps.append(tri[(a, b, c)] / bi[(a, b)])
            elif (b, c) in bi:
                ps.append(alpha * bi[(b, c)] / uni[b])
            else:
                ps.append(alpha * alpha * (uni.get(c, 0) + 1.0) / (total + v + 1))
        if ps:
            out[doc_id] = -sum(math.log(p) for p in ps) / len(ps)
    return out


def test_trigram_train_and_scores_match_python(spark, docs):
    rows = docs.collect()
    texts = [r["text"] for r in rows]
    by_id = {r["doc_id"]: r["text"] for r in rows}
    py_uni, py_bi, py_tri = _py_train_tri(texts, vocab_size=100)
    expected = _py_score_tri(by_id, py_uni, py_bi, py_tri)
    uni, bi, tri = LM.train_trigram_lm(docs, vocab_size=100)
    got_tri = {(r["w1"], r["w2"], r["w3"]): r["c123"] for r in tri.collect()}
    assert got_tri == dict(py_tri)
    got = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in LM.score_documents_trigram(docs, uni, bi, tri).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-9), k


def test_lm_scoring_on_stream(spark, docs, tmp_path):
    """The CCNet gate on a document stream: each micro-batch is scored as
    a batch via foreachBatch (the per-doc aggregation needs no cross-batch
    state — a document is contained in its batch, so a direct streaming
    agg's watermark machinery would be pure overhead) — union of batch
    scores == one-shot batch scores."""
    uni, bi = LM.train_bigram_lm(docs, vocab_size=100)
    uni, bi = uni.cache(), bi.cache()
    src = tmp_path / "docs"
    docs.repartition(4).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src))
    )
    out = str(tmp_path / "scores")

    def _score_batch(batch_df, _batch_id):
        LM.score_documents(batch_df, uni, bi).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(_score_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["avg_neg_logp"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in LM.score_documents(docs, uni, bi).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
