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
    # Materialize the raw unigram counts (lazy persist: computed on the
    # run's first action, then reused). The vocab top-K below is
    # broadcast into one mapping join per n-gram column, and Catalyst
    # re-plans the WHOLE raw_uni subtree (corpus scan + tokenize explode +
    # count shuffle) under every broadcast — the r11 plan audit showed
    # q_bigram_lm paying 5 corpus tokenize passes and q_trigram_lm 9 where
    # 2 and 3 are the theoretical minimum (one per n-gram order). The
    # persist collapses every reuse onto one InMemoryRelation over the
    # (vocabulary-diversity-sized, sublinear in corpus) count table
    # (guide §2.4 duplicated subtrees / §5 materialized intermediates).
    # persist(MEMORY_AND_DISK), NOT localCheckpoint (r12, VERDICT r11 #5):
    # a localCheckpoint truncates lineage to executor-local blocks, so one
    # executor loss (spot kill, dynamic deallocation) makes the RDD
    # unrecoverable and fails the whole training job; the persist keeps
    # lineage — a lost block recomputes — with the same single-scan plan.
    from pyspark import StorageLevel

    raw_uni = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
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
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    mapped = _map_vocab(pairs, vocab, ["w1", "w2"])
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
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    mapped = _map_vocab(pairs, vocab, ["w1", "w2"])
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


def _map_vocab(df: DataFrame, vocab: DataFrame, cols: list[str]) -> DataFrame:
    """Map each of ``cols`` through the vocabulary (OOV -> <unk>) with one
    broadcast join per column."""
    out = df
    for c in cols:
        flag = f"__k_{c}"
        out = out.join(
            F.broadcast(
                vocab.select(F.col("w").alias(c)).withColumn(flag, F.lit(True))
            ),
            c,
            "left",
        ).withColumn(
            c, F.when(F.col(flag).isNotNull(), F.col(c)).otherwise(F.lit(UNK))
        ).drop(flag)
    return out


def train_trigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    min_bigram_count: int = 1,
    min_trigram_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Order-3 training: the bigram tables plus mapped-token trigram
    counts ``(w1, w2, w3, c123)`` — one extra corpus-scale count shuffle
    over ``train_bigram_lm``. CCNet proper uses a 5-gram; order 3 is
    where the backoff CHAIN (trigram -> bigram -> unigram) appears, and
    higher orders are the same recursion with more count tables."""
    uni, bi = train_bigram_lm(ref, text_col, vocab_size, min_bigram_count)
    vocab = uni.select("w").where(F.col("w") != UNK)
    tris = ref.select(F.explode(window_ngrams(text_col, 3)).alias("tg")).select(
        F.substring_index("tg", " ", 1).alias("w1"),
        F.substring_index(F.substring_index("tg", " ", 2), " ", -1).alias("w2"),
        F.substring_index("tg", " ", -1).alias("w3"),
    )
    tri = (
        _map_vocab(tris, vocab, ["w1", "w2", "w3"])
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
    )
    if min_trigram_count > 1:
        tri = tri.where(F.col("c123") >= min_trigram_count)
    return uni, bi, tri


def score_documents_trigram(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Stupid-backoff chain over document trigrams:

        p(w3|w1,w2) = c123/c12                    seen trigram
                    = alpha * c23/c2              else, seen bigram
                    = alpha^2 * p_uni(w3)         else
        p_uni as in ``score_documents`` (add-one over the vocabulary)

    Same lazy shape as the bigram scorer: the normalizer rides as a
    broadcast one-row crossJoin, count tables join per order. Documents
    with fewer than 3 tokens get no score row (use the bigram scorer or
    keep-unscored gating for short text)."""
    stats = F.broadcast(
        uni.agg(F.sum("c").alias("__total"), F.count(F.lit(1)).alias("__v"))
    )
    vocab = uni.select("w").where(F.col("w") != UNK)
    tgs = docs.select(
        F.col(id_col), F.explode(window_ngrams(text_col, 3)).alias("tg")
    ).select(
        id_col,
        F.substring_index("tg", " ", 1).alias("w1"),
        F.substring_index(F.substring_index("tg", " ", 2), " ", -1).alias("w2"),
        F.substring_index("tg", " ", -1).alias("w3"),
    )
    mapped = _map_vocab(tgs, vocab, ["w1", "w2", "w3"])
    bi12 = bi.select(
        F.col("w1"), F.col("w2").alias("w2"), F.col("c12").alias("c12")
    )
    bi23 = bi.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c12").alias("c23")
    )
    c2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")))
    c3 = F.broadcast(uni.select(F.col("w").alias("w3"), F.col("c").alias("c3")))
    p_uni3 = (
        (F.coalesce(F.col("c3"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("__total") + F.col("__v") + F.lit(1)).cast("double")
    )
    scored = (
        mapped.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi12, ["w1", "w2"], "left")
        .join(bi23, ["w2", "w3"], "left")
        .join(c2, "w2", "left")
        .join(c3, "w3", "left")
        .crossJoin(stats)
        .select(
            id_col,
            # c123 ⇒ c12 exists in full counts, but an aggressive
            # min_bigram_count can prune the stored c12 row — back off
            F.when(
                F.col("c123").isNotNull() & F.col("c12").isNotNull(),
                F.col("c123").cast("double") / F.col("c12").cast("double"),
            )
            .when(
                F.col("c23").isNotNull(),
                F.lit(alpha)
                * F.col("c23").cast("double") / F.col("c2").cast("double"),
            )
            .otherwise(F.lit(alpha * alpha) * p_uni3)
            .alias("p"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            (-F.avg(F.log("p"))).alias("avg_neg_logp"),
        )
        .withColumn("ppl", F.exp("avg_neg_logp"))
    )
