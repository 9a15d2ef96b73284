"""CCNet-style n-gram language-model quality scoring.

A reference corpus (the "Wikipedia side" of CCNet, Wenzek et al. 2020)
trains a bigram LM — token counts over a capped vocabulary, everything
exact integer aggregation — and candidate documents are scored by average
negative log-probability under stupid backoff. High-perplexity documents
(gibberish, boilerplate soup, wrong-language text) filter out. CCNet uses
a KenLM 5-gram; this is the same pipeline shape re-expressed Spark-first:
training is two groupBy count shuffles (map-side combined) plus one
broadcast vocab join, scoring is per-document bigram explosion joined
against the (bounded) LM tables. No Python in either path.

Tokenization is the repo-wide ``split(text, ' ')`` contract
(``ext.text.tokens`` / ``window_ngrams``) so the LM composes with
token_count / vocab_topk / collocations and their DuckDB oracles.

Determinism: counts are exact integers (oracle-paired —
``q_bigram_lm``); the score applies ``ln`` which is NOT bit-identical
across engines (measured 4/347 one-ulp differences Spark vs DuckDB), so
scoring is verified against a pure-Python reference within 1e-9 instead
of the hash oracle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens, window_ngrams

UNK = "<unk>"


def train_bigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    min_bigram_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Train the LM: returns ``(uni, bi)`` where ``uni`` is
    ``(w, c)`` over the capped vocabulary (tokens outside the top
    ``vocab_size`` by (count desc, token asc) map to ``<unk>``) and
    ``bi`` is ``(w1, w2, c12)`` over mapped-token adjacent pairs with
    ``c12 >= min_bigram_count``.

    Scale: one unigram count shuffle, a driverless top-K vocab (bounded
    DataFrame, broadcast to the mapping joins), one bigram count shuffle.
    The vocab cap is what bounds the bigram table (≤ corpus bigram
    diversity over V+1 symbols) — raise ``min_bigram_count`` to keep it
    broadcast-sized for the scoring join on huge reference corpora."""
    toks = ref.select(F.explode(tokens(text_col)).alias("w"))
    raw_uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = raw_uni.orderBy(F.col("c").desc(), F.col("w").asc()).limit(
        vocab_size
    ).select("w")
    # mapped unigram counts derive from raw_uni (distinct-token-sized),
    # NOT by re-exploding the corpus — the second corpus-scale shuffle
    # that would add is pure waste: sum the out-of-vocab rows into <unk>
    uni = (
        raw_uni.join(
            F.broadcast(vocab.withColumn("__kw", F.lit(True))), "w", "left"
        )
        .select(
            F.when(F.col("__kw").isNotNull(), F.col("w"))
            .otherwise(F.lit(UNK))
            .alias("w"),
            "c",
        )
        .groupBy("w")
        .agg(F.sum("c").alias("c"))
    )
    # bigram windows carry exactly one space (tokens cannot contain one);
    # map EACH side through the vocab with one broadcast join per side
    pairs = ref.select(F.explode(window_ngrams(text_col, 2)).alias("bg")).select(
        F.substring_index("bg", " ", 1).alias("x"),
        F.substring_index("bg", " ", -1).alias("y"),
    )
    v1 = vocab.withColumnRenamed("w", "x").withColumn("__kx", F.lit(True))
    v2 = vocab.withColumnRenamed("w", "y").withColumn("__ky", F.lit(True))
    mapped = (
        pairs.join(F.broadcast(v1), "x", "left")
        .join(F.broadcast(v2), "y", "left")
        .select(
            F.when(F.col("__kx").isNotNull(), F.col("x")).otherwise(F.lit(UNK)).alias("w1"),
            F.when(F.col("__ky").isNotNull(), F.col("y")).otherwise(F.lit(UNK)).alias("w2"),
        )
    )
    bi = mapped.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    if min_bigram_count > 1:
        bi = bi.where(F.col("c12") >= min_bigram_count)
    return uni, bi


def score_documents(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Score each document by average negative log-probability of its
    bigrams under stupid backoff:

        p(w2|w1) = c12/c1                 seen bigram
                 = alpha * p_uni(w2)      otherwise
        p_uni(w) = (c(w) + 1) / (total + V + 1)   add-one over the
                   mapped vocabulary (so unseen-even-as-<unk> tokens
                   still get positive mass)

    Output: ``(id_col, n_bigrams, avg_neg_logp, ppl)`` — documents with
    fewer than 1 bigram are dropped (no evidence to score). Lower ppl =
    more reference-like; filter with ``ppl <= threshold`` (CCNet keeps
    the best-perplexity head/middle of each language bucket).

    Scale: doc bigrams explode (scan-speed), two vocab-mapping joins and
    the c1/c12 lookups — uni is vocab-bounded (broadcast); bi joins
    shuffle unless ``min_bigram_count`` keeps it broadcast-sized. The
    (total, V) normalizer rides as a broadcast one-row crossJoin — NOT a
    driver collect, so building this plan runs no job and a lazy ``uni``
    is not executed an extra time (persist uni/bi across many scoring
    calls; each action re-derives them otherwise)."""
    stats = F.broadcast(
        uni.agg(
            F.sum("c").alias("__total"), F.count(F.lit(1)).alias("__v")
        )
    )
    vocab = uni.select("w").where(F.col("w") != UNK)
    pairs = docs.select(
        F.col(id_col), F.explode(window_ngrams(text_col, 2)).alias("bg")
    ).select(
        id_col,
        F.substring_index("bg", " ", 1).alias("x"),
        F.substring_index("bg", " ", -1).alias("y"),
    )
    v1 = vocab.withColumnRenamed("w", "x").withColumn("__kx", F.lit(True))
    v2 = vocab.withColumnRenamed("w", "y").withColumn("__ky", F.lit(True))
    mapped = (
        pairs.join(F.broadcast(v1), "x", "left")
        .join(F.broadcast(v2), "y", "left")
        .select(
            id_col,
            F.when(F.col("__kx").isNotNull(), F.col("x")).otherwise(F.lit(UNK)).alias("w1"),
            F.when(F.col("__ky").isNotNull(), F.col("y")).otherwise(F.lit(UNK)).alias("w2"),
        )
    )
    c1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")))
    c2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")))
    scored = (
        mapped.join(bi, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(c2, "w2", "left")
        .crossJoin(stats)
        .select(
            id_col,
            F.when(
                F.col("c12").isNotNull(),
                F.col("c12").cast("double") / F.col("c1").cast("double"),
            )
            .otherwise(
                F.lit(alpha)
                * (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(1.0))
                / (F.col("__total") + F.col("__v") + F.lit(1)).cast("double")
            )
            .alias("p"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.avg(F.log("p"))).alias("avg_neg_logp"),
        )
        .withColumn("ppl", F.exp("avg_neg_logp"))
    )


def perplexity_filter(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Keep documents whose LM perplexity is at most ``max_ppl`` — the
    CCNet quality gate as one anti-join against the over-threshold set.
    Documents with no score (fewer than 2 tokens — no bigram evidence)
    are KEPT: this gate answers only the perplexity question; length
    policy belongs to the length filters, and a semi-join against scores
    would silently turn it into an undocumented min-length filter."""
    bad = score_documents(docs, uni, bi, text_col, id_col, alpha).where(
        F.col("ppl") > F.lit(max_ppl)
    )
    return docs.join(bad.select(id_col), id_col, "left_anti")
