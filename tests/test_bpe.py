"""BPE tokenizer (X38): training determinism + equivalence to the textbook
algorithm, encode correctness, and corpus-level properties.
"""

from __future__ import annotations

import random

import pytest

from datalakefoundation_spark.ext import bpe as B


def _naive_train(wc: list[tuple[str, int]], num_merges: int):
    """Textbook Sennrich BPE (full pair recount each step) — the reference
    for the incremental-index trainer."""
    words = {i: (list(w) + [B.END_MARK], n) for i, (w, n) in enumerate(wc)}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        for wid, (syms, n) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wid] = (out, n)
    return merges


def _corpus(spark, seed=5, docs=60):
    rng = random.Random(seed)
    stems = ["walk", "talk", "jump", "read", "play", "lift", "code"]
    sufs = ["", "s", "ed", "ing", "er"]
    rows = [
        (
            i,
            " ".join(
                rng.choice(stems) + rng.choice(sufs) for _ in range(rng.randint(5, 30))
            ),
        )
        for i in range(docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_trainer_matches_textbook_algorithm(spark):
    df = _corpus(spark)
    wc = B.word_counts(df)
    fast = B.train_bpe(df, num_merges=60)
    assert fast == _naive_train(wc, 60)


def test_training_deterministic_across_partitionings(spark):
    df = _corpus(spark, seed=9)
    a = B.train_bpe(df.repartition(1), num_merges=40)
    b = B.train_bpe(df.repartition(13), num_merges=40)
    assert a == b and len(a) == 40


def test_encode_word_follows_merge_ranks():
    merges = [("l", "o"), ("lo", "w"), ("e", "r" + B.END_MARK), ("r", B.END_MARK)]
    ranks = {p: i for i, p in enumerate(merges)}
    # 'lower': l o w e r </w> --r0--> lo w e r </w> --r1--> low e r </w>
    # --r3--> low e r</w> --r2--> low er</w>; rank 2's pair only EXISTS
    # after rank 3 fires — the rule is lowest rank among PRESENT pairs,
    # re-scanned each round
    assert B.encode_word("lower", ranks) == ["low", "er" + B.END_MARK]
    assert B.encode_word("low", ranks) == ["low", B.END_MARK]
    # unseen word falls back to characters + sentinel
    assert B.encode_word("xyz", ranks) == ["x", "y", "z", B.END_MARK]


def test_encode_roundtrip_and_compression(spark):
    df = _corpus(spark, seed=3)
    merges = B.train_bpe(df, num_merges=200)
    enc = B.bpe_encode(df, merges, emit_tokens=True)
    rows = {r["doc_id"]: r for r in enc.collect()}
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    n_chars = n_tokens = 0
    for did, r in rows.items():
        toks = r["bpe_tokens"]
        assert r["n_bpe_tokens"] == len(toks)
        # lossless: concatenating tokens and splitting on </w> restores words
        restored = "".join(toks).replace(B.END_MARK, " ").strip()
        assert restored == texts[did].strip()
        n_chars += len(texts[did].replace(" ", "")) + texts[did].count(" ") + 1
        n_tokens += len(toks)
    # 200 merges on a 7-stem corpus must compress far below char-level
    assert n_tokens < 0.45 * n_chars


def test_more_merges_never_lengthen_encoding(spark):
    df = _corpus(spark, seed=11)
    merges = B.train_bpe(df, num_merges=150)
    short = B.bpe_encode(df, merges[:30]).agg({"n_bpe_tokens": "sum"}).head()[0]
    full = B.bpe_encode(df, merges).agg({"n_bpe_tokens": "sum"}).head()[0]
    assert full <= short


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "hi")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in B.bpe_encode(df, []).collect()}
    assert rows == {1: 0, 2: 0, 3: 0, 4: 3}  # h i </w>
