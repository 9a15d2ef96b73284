"""Text analysis operators: tokenization, quality stats, language ID,
document fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` (split /
higher-order filters / sha2) so the whole stage stays in codegen — at 100 TB
these run at parquet-scan speed with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Compact English-marker set; the documents fixture vocabulary includes
# 'a' and 'the'. A real deployment would plug fastText/cld3 via mapInPandas.
EN_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "on")


def tokens(text_col: str | Column, sep: str = " ") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, sep)


def token_count(text_col: str | Column) -> Column:
    return F.size(tokens(text_col))


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
# The alternation is valid in both Java regex (Spark) and RE2 (DuckDB), so
# the oracle runs the *same pattern*.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_tokens(text_col: str | Column, pattern: str = BPE_PATTERN) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(pattern), F.lit(0))


def bpe_token_count(text_col: str | Column, pattern: str = BPE_PATTERN) -> Column:
    """BPE-style pre-tokenization count (GPT-2-ish word/number/symbol split).
    An upper bound on true BPE token count; pure JVM regex — no Python."""
    return F.size(bpe_tokens(text_col, pattern))


def window_ngrams(text_col: str | Column, n: int = 2) -> Column:
    """Overlapping space-joined n-token windows as ONE codegen'd
    ``regexp_extract_all`` — empty array when the document has fewer than
    n tokens. The higher-order transform/slice/concat formulation this
    replaces is CodegenFallback (interpreted per window) and measured 6.6x
    slower at corpus scale (see dedup.shingles).

    A sentinel space is prepended so every token start is anchored by a
    space the match consumes (a ``(?:^| )`` alternation drops one window
    on space-adjacent edges — its zero-width ``^`` branch bumps the
    scanner past the space that should anchor the next token). ``[^ ]*``
    reproduces ``split(text, ' ')`` semantics exactly: consecutive spaces
    yield empty tokens that participate in windows; tabs/newlines are
    token characters, not separators.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    pat = " (?=(" + "[^ ]* " * (n - 1) + "[^ ]*))"
    return F.regexp_extract_all(F.concat(F.lit(" "), c), F.lit(pat), 1)


def stopword_ratio(text_col: str | Column, stopwords=EN_STOPWORDS) -> Column:
    """Fraction of token OCCURRENCES that are stopwords.

    Counted with one codegen'd ``regexp_extract_all`` over a sentinel-space
    anchor + whole-token lookahead (``(?= |\\z)`` rejects prefix matches like
    'an' vs 'a'; regex backtracking makes alternation order irrelevant;
    ``\\z`` not ``$`` because Java's ``$`` also matches before a final line
    terminator, which would count a trailing ``'the\\n'`` that the
    ``split(' ')`` token semantics do not) —
    the array-filter lambda this replaces is CodegenFallback, interpreted
    per token on the corpus-cleanup hot path. Group 0 is the consumed
    anchor space, so the array size IS the occurrence count. Falls back to
    the lambda for a (nonsensical) space-containing custom stopword, which
    the token-wise semantics could not express as a token regex.
    """
    import re as _re

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(c)
    if any(" " in s for s in stopwords):
        sw = F.array(*[F.lit(s) for s in stopwords])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return hits / F.size(toks)
    alt = "|".join(_re.escape(s) for s in stopwords)
    pat = " (?=(?:" + alt + r")(?= |\z))"
    hits = F.size(
        F.regexp_extract_all(F.concat(F.lit(" "), c), F.lit(pat), 0)
    )
    return hits / F.size(toks)


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char count, token count, mean token
    length, stopword ratio, distinct-token ratio (repetition signal)."""
    toks = tokens(text_col)
    return (
        df.withColumn("n_chars_m", F.length(F.col(text_col)))
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "distinct_ratio", F.size(F.array_distinct(toks)) / F.size(toks)
        )
        .withColumn("stopword_ratio", stopword_ratio(text_col))
    )


def lang_id(df: DataFrame, text_col: str = "text", threshold: float = 0.02) -> DataFrame:
    """N-gram/stopword-heuristic language ID: English-marker token ratio above
    threshold -> 'en', else 'und'."""
    return df.withColumn(
        "predicted_lang",
        F.when(stopword_ratio(text_col) > threshold, F.lit("en")).otherwise(F.lit("und")),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.1,
    max_stopword_ratio: float = 0.9,
) -> DataFrame:
    """Gopher/C4-style quality gate: keep/drop decision + the first failing
    rule as a reject reason (rules checked in a fixed order so the reason is
    deterministic). One projection, no shuffle — at 100 TB this runs at scan
    speed and the downstream pipeline filters on ``keep``."""
    toks = tokens(text_col)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    sw_ratio = stopword_ratio(text_col)
    reason = (
        F.when(n < min_tokens, F.lit("too_short"))
        .when(n > max_tokens, F.lit("too_long"))
        .when(distinct_ratio < min_distinct_ratio, F.lit("repetitive"))
        .when(sw_ratio > max_stopword_ratio, F.lit("stopword_heavy"))
    )
    return df.withColumn("reject_reason", reason).withColumn(
        "keep", F.col("reject_reason").isNull()
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Global top-k vocabulary with counts: explode -> two-stage count agg
    (map-side partial combine carries at most |vocab| rows per task into the
    shuffle) -> bounded top-k (TakeOrderedAndProject, no global sort).
    Count ties broken by token so the result is total-ordered."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token fraction
    and the share of all bigrams taken by the single most frequent bigram
    (boilerplate/template detector).

    Shape: bigrams are exploded once and counted with a two-stage groupBy
    (map-side partial combine), then one max/sum per doc — two shuffles on
    doc-sized keys, no self-joins, no Python. Documents with fewer than two
    tokens report zero bigrams and a 0.0 share."""
    toks = tokens(text_col)
    # window_ngrams yields [] below 2 tokens by construction (no space to
    # anchor a second token), matching the old size()>=2 guard — and runs
    # in codegen instead of an interpreted per-window transform
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        window_ngrams(text_col, 2).alias("__bg"),
    )
    bg_counts = (
        base.select(F.col(id_col), F.explode("__bg").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max("cnt").alias("top_bigram_n"),
            F.sum("cnt").alias("n_bigrams"),
        )
    )
    joined = base.drop("__bg").join(bg_counts, id_col, "left")
    return joined.select(
        F.col(id_col),
        "n_tokens",
        (F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens")).alias("dup_token_ratio"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long").alias("top_bigram_n"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(
            F.col("top_bigram_n") / F.col("n_bigrams"), F.lit(0.0)
        ).alias("top_bigram_share"),
    )


def rare_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 2,
) -> DataFrame:
    """Per-document rare-token fraction: the share of token OCCURRENCES
    whose corpus document frequency is <= ``max_df``. A cheap integer-only
    stand-in for LM-perplexity filtering — gibberish / OCR noise / heavy
    machine generation scores high (many tokens no other document uses),
    boilerplate scores ~0 — and because the signal is counts + one IEEE
    division it is bit-reproducible across engines (ln-based perplexity is
    not; same trade as tfidf_top_terms' linear variant).

    Plan: explode -> (doc, token) tf counts (one shuffle, map-side
    combine) -> token df counts (one shuffle of the already-reduced tf
    table, vocab-sized output) -> join on token -> per-doc agg. The df
    table is vocab-sized, so at 100 TB the token join is
    broadcast-eligible after the agg; no Python anywhere."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(dfreq, "token")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("df") <= max_df, F.col("tf")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_rare"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "n_rare",
            (F.col("n_rare") / F.col("n_tokens")).alias("rare_ratio"),
        )
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Top-``k`` collocations: adjacent token pairs ranked by lift
    ``N * df_pair / (df_x * df_y)`` — the PMI ordering without the log
    (monotone transform, so the ranking is identical and the arithmetic
    is one integer-product ratio: bit-reproducible across engines, the
    same trade as tfidf_top_terms' linear variant). Document frequencies
    (not raw counts) keep one spammy document from minting collocations.

    Plan: explode bigrams -> distinct (doc, pair) -> pair df counts (two
    shuffles, map-side combine) -> join each side's unigram df (vocab-
    sized, broadcast-eligible) -> bounded top-k. ``min_pair_docs`` floors
    support so the lift of a one-off typo pair can't dominate."""
    from pyspark.sql.window import Window  # noqa: F401  (parity with tfidf)

    toks = tokens(text_col)
    base = df.select(
        F.col(id_col), toks.alias("__w"), window_ngrams(text_col, 2).alias("__bg")
    )
    # bigram windows carry exactly one space (tokens cannot contain one),
    # so substring_index splits them back into (x, y) in codegen — the
    # struct-building transform this replaces was interpreted per window
    pair_df = (
        base.select(F.col(id_col), F.explode("__bg").alias("bg"))
        .select(
            id_col,
            F.substring_index("bg", " ", 1).alias("x"),
            F.substring_index("bg", " ", -1).alias("y"),
        )
        .distinct()
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("pair_df"))
        .where(F.col("pair_df") >= min_pair_docs)
    )
    uni = (
        base.select(F.col(id_col), F.explode("__w").alias("t"))
        .distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__N"))
    scored = (
        pair_df.join(uni.withColumnRenamed("t", "x").withColumnRenamed("df", "df_x"), "x")
        .join(uni.withColumnRenamed("t", "y").withColumnRenamed("df", "df_y"), "y")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "lift",
            (F.col("__N") * F.col("pair_df")).cast("double")
            / (F.col("df_x") * F.col("df_y")),
        )
    )
    return (
        scored.select("x", "y", "pair_df", "df_x", "df_y", "lift")
        .orderBy(F.desc("lift"), F.asc("x"), F.asc("y"))
        .limit(k)
    )


def fingerprint(text_col: str | Column) -> Column:
    """Order-insensitive content fingerprint: sha256 over the sorted distinct
    token set. Robust to token reordering; cheap (one projection)."""
    return F.sha2(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col)))), 256
    )


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint(text_col))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    idf: str = "log",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF.

    ``idf="log"`` (default) uses the standard smooth form
    ``tf * (ln((N+1)/(df+1)) + 1)`` and emits a ``score`` column.
    ``idf="linear"`` ranks by ``tf/df`` (the N-cancelled linear-IDF
    ordering) and emits only integers + rank — IEEE division is exactly
    specified, so this variant is bit-reproducible across engines (``ln``
    is implementation-defined to 1 ulp), which is what the cross-engine
    oracle uses.

    Plan: explode tokens -> (doc, token) tf counts (one shuffle) ->
    token df counts (one shuffle of the tf table, vocab-sized output) ->
    join tf with df on token (shuffle on token) -> per-doc top-k window.
    The 1-row corpus count joins via broadcast. Output:
    (doc_id, token, tf, df [, score], rank)."""
    if idf not in ("log", "linear"):
        raise ValueError(f"idf must be 'log' or 'linear': {idf!r}")
    from pyspark.sql.window import Window

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "token")
    if idf == "log":
        n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__N"))
        scored = scored.crossJoin(F.broadcast(n_docs)).withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("__N") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
        order_col = "score"
    else:
        scored = scored.withColumn(
            "__r", F.col("tf").cast("double") / F.col("df")
        )
        order_col = "__r"
    w = Window.partitionBy(id_col).orderBy(F.desc(order_col), F.asc("token"))
    out_cols = [id_col, "token", "tf", "df"] + (["score"] if idf == "log" else [])
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out_cols, "rank")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into fixed-size overlapping character chunks —
    the standard pre-tokenization step for training-sequence prep and
    chunk-level embedding/near-dup pipelines.

    Chunk ``i`` covers ``[i*stride, i*stride + size)`` with
    ``stride = size - overlap``; the last chunk may be shorter, and a
    document shorter than ``size`` yields exactly one chunk. The whole
    operation is one generated-column projection + ``posexplode`` — no
    shuffle, no Python; at 100 TB it runs at parquet-scan speed and the
    output inherits the input partitioning (each task explodes only its
    own rows).

    The chunk count/offset arithmetic uses IEEE double division + ceil so
    the DuckDB oracle (generate_series + substring) computes the identical
    boundaries (see verification.ext_queries.SQL_CHUNK_DOCUMENTS).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    chunks = F.expr(
        f"transform(sequence(0, greatest(0, cast(ceil((length({text_col}) - {size})"
        f" / cast({stride} as double)) as int))),"
        f" i -> substring({text_col}, i * {stride} + 1, {size}))"
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).withColumn("chunk_chars", F.length("chunk_text"))


GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    max_dup_line_frac: float = 0.3,
    min_required_words: int = 2,
    keep_input: bool = False,
) -> DataFrame:
    """Gopher-rule quality screen (Rae et al. 2021, Appendix A1.1) — the
    standard pretraining-corpus heuristic battery, each rule one exact
    JVM-side expression over the repo's ``split(' ')`` token contract and
    ``split('\\n')`` lines:

    * word count in [min_words, max_words]
    * mean word length in [min_mean_word_len, max_mean_word_len]
    * symbol-to-word ratio (``#`` occurrences + ``...`` occurrences per
      word) ≤ max_symbol_word_ratio
    * fraction of words containing ≥1 ASCII letter ≥ min_alpha_word_frac
    * fraction of lines starting with a bullet (``-``/``*``/``•``)
      ≤ max_bullet_line_frac; ending with ``...`` ≤ max_ellipsis_line_frac
    * duplicate-line fraction (1 - distinct/total) ≤ max_dup_line_frac
    * ≥ min_required_words distinct "required" English words present
      (GOPHER_REQUIRED_WORDS) — the cheap English-prose prior

    Output: per-document metrics + per-rule booleans + ``keep``
    (``keep_input=True`` also carries every input column through, so a
    caller can ``.where(keep)`` with NO join — the recipe path). Pure
    projection (scan-speed, no shuffle); counts are exact integers so a
    SQL oracle reproduces every metric bit-for-bit. Regex-parity notes:
    line rules are counted with one codegen'd ``regexp_extract_all``
    over the whole text (an ``F.filter`` lambda is CodegenFallback —
    interpreted per line); the ellipsis anchor is a ``(?=\\n|\\z)``
    lookahead, NOT ``$`` (Java ``$`` also matches before a final line
    terminator — a ``...\\r\\n`` line would diverge from the oracle);
    the whitespace class is spelled explicitly because Java ``\\s`` and
    RE2 ``\\s`` disagree on vertical tab."""
    toks = tokens(text_col)
    lines = F.split(F.col(text_col), "\n")
    n_words = F.size(toks)
    sum_word_len = (
        F.length(F.col(text_col)) - (n_words - F.lit(1))
    )  # total chars minus the separators BETWEEN tokens
    mean_word_len = sum_word_len.cast("double") / n_words
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), 0)
    )
    # token starts whose token contains an ASCII letter: sentinel space +
    # lookahead, the same codegen'd trick as stopword_ratio
    n_alpha_words = F.size(
        F.regexp_extract_all(
            F.concat(F.lit(" "), F.col(text_col)),
            F.lit(" (?=[^ ]*[a-zA-Z])"),
            0,
        )
    )
    n_lines = F.size(lines)
    ws = r"[ \t\f\r\x0B]"  # explicit: Java \s has \x0B, RE2 \s does not
    n_bullet_lines = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit("(?:^|\n)" + ws + r"*[-*•]"), 0
        )
    )
    n_ellipsis_lines = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\.(?=\n|\z)"), 0)
    )
    n_distinct_lines = F.size(F.array_distinct(lines))
    n_required = sum(
        (F.array_contains(toks, w).cast("int") for w in GOPHER_REQUIRED_WORDS),
        F.lit(0),
    )
    lead_cols = [F.col("*")] if keep_input else [F.col(id_col)]
    m = df.select(
        *lead_cols,
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        (n_symbols.cast("double") / n_words).alias("symbol_word_ratio"),
        (n_alpha_words.cast("double") / n_words).alias("alpha_word_frac"),
        (n_bullet_lines.cast("double") / n_lines).alias("bullet_line_frac"),
        (n_ellipsis_lines.cast("double") / n_lines).alias("ellipsis_line_frac"),
        (
            F.lit(1.0) - n_distinct_lines.cast("double") / n_lines
        ).alias("dup_line_frac"),
        n_required.alias("n_required_words"),
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbols": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_alpha": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_bullets": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "ok_ellipsis": F.col("ellipsis_line_frac") <= max_ellipsis_line_frac,
        "ok_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
        "ok_required_words": F.col("n_required_words") >= min_required_words,
    }
    out = m.select("*", *[c.alias(name) for name, c in rules.items()])
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)
