"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched encode.

The scale architecture mirrors production tokenizer trainers (HuggingFace
tokenizers, SentencePiece): BPE merges are learned from the WORD-FREQUENCY
table, not the raw corpus — so the distributed stage is one
explode+groupBy word-count aggregation (map-side combined; handles 100 TB
of text in a single shuffle whose output is |vocab| rows), and the merge
loop runs driver-side over the bounded top-``max_words`` table. Training
cost is therefore independent of corpus size beyond the one count pass.

Encoding broadcasts the learned merge ranks and applies them in an
Arrow-batched ``mapInPandas`` stage with per-word memoization (Zipf's law
makes the word cache hit rate extreme) — a deliberate pandas stage:
iterative in-word merging is not expressible in Spark SQL built-ins, and
per-batch Python with a cache beats any per-row formulation by orders of
magnitude.

Determinism: ties in pair counts break lexicographically, so the learned
merge list is a pure function of the word-count table — independent of
partitioning, engine, and platform.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_MARK = "</w>"  # end-of-word sentinel symbol (classic BPE formulation)


# ---------------------------------------------------------------- training


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> list[tuple[str, int]]:
    """The distributed stage: corpus -> bounded word-frequency table.

    One explode + two-stage count agg (map-side partial combine carries at
    most |distinct words| rows per task), then a bounded top-k by count
    (TakeOrderedAndProject — no global sort). Ties break by word so the
    result — and everything trained from it — is total-ordered."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_words)
    )
    return [(r["w"], r["n"]) for r in counts.collect()]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus word counts.

    Driver-side loop over the (bounded) word table — the classic
    Sennrich et al. 2015 algorithm with an incremental pair-count index:
    each merge only touches the words containing the merged pair, so the
    loop is O(num_merges * affected words), not O(num_merges * vocab).
    """
    wc = word_counts(df, text_col, max_words)
    # word -> (symbol tuple, count); seed symbols are characters + </w>
    words: dict[int, tuple[list[str], int]] = {
        i: (list(w) + [END_MARK], n) for i, (w, n) in enumerate(wc)
    }
    # pair -> total count, and pair -> set of word ids containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, n) in words.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
            pair_words.setdefault((a, b), set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: highest count, then lexicographically first
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged_sym = best[0] + best[1]
        for wid in list(pair_words.get(best, ())):
            syms, n = words[wid]
            # remove this word's contribution to its current pairs
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= n
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        pair_words.pop((a, b), None)
            # apply the merge within the word (left-to-right)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wid] = (out, n)
            # re-add the rewritten word's pairs
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
                pair_words.setdefault((a, b), set()).add(wid)
    return merges


# ---------------------------------------------------------------- encoding


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    LOWEST-RANKED (earliest-learned) adjacent pair — the standard BPE
    inference rule (matches HuggingFace/GPT-2 style encoders)."""
    syms = list(word) + [END_MARK]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_tokens: bool = False,
) -> DataFrame:
    """Tokenize the corpus with a learned merge list.

    Returns (id_col, n_bpe_tokens [, bpe_tokens]) — token-count mode by
    default (the usual 100 TB need: length statistics for packing/pricing),
    ``emit_tokens=True`` adds the token array.

    Plan: ONE Arrow-batched mapInPandas stage; the merge ranks ride the
    closure (broadcast with the task), and a per-executor word cache
    exploits Zipf — each distinct word is encoded once per batch stream,
    not once per occurrence."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    fields = [
        T.StructField("__id", T.LongType()),
        T.StructField("n_bpe_tokens", T.IntegerType()),
    ]
    if emit_tokens:
        fields.append(T.StructField("bpe_tokens", T.ArrayType(T.StringType())))
    schema = T.StructType(fields)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = cache[w] = encode_word(w, ranks)
                out.extend(toks)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            data = {"__id": pdf[id_col], "n_bpe_tokens": toks.map(len)}
            if emit_tokens:
                data["bpe_tokens"] = toks
            yield pd.DataFrame(data)

    out = df.select(id_col, text_col).mapInPandas(_encode, schema)
    return out.withColumnRenamed("__id", id_col)
