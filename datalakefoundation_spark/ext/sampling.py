"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning (a repartition or a
speculative re-run changes the sample), which makes pipelines
non-reproducible. These operators instead derive the keep/drop decision
from a content hash of a stable key, so the sample is a pure function of
the data: identical across runs, clusters, partitionings, and engines
(the DuckDB oracle reproduces it bit-for-bit with the same sha256).

Scale: one projection + filter per row, fully in whole-stage codegen; the
filter is applied at scan time so downstream stages only see kept rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# keep iff the first 8 hex chars of sha256(key) < threshold(fraction).
# 8 hex chars = 32 uniform bits; lexicographic compare on fixed-width
# lowercase hex equals numeric compare, in any engine.
_HASH_WIDTH = 8
_HASH_SPACE = 16 ** _HASH_WIDTH


def hash_threshold(fraction: float) -> str:
    """Fixed-width lowercase-hex keep threshold for a sampling fraction.

    Fraction 1.0 returns ``"g"`` — lexicographically above every 8-char
    hex prefix — so "keep everything" really keeps everything: a clamped
    ``"ffffffff"`` under the strict ``<`` filter would drop keys hashing
    to that exact prefix (~1 in 4.3 billion — a certainty at corpus
    scale) from a stratum the mixture contract promises to keep whole."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    raw = int(fraction * _HASH_SPACE)
    if raw >= _HASH_SPACE:
        return "g"
    return format(raw, f"0{_HASH_WIDTH}x")

def _bucket(key_col: Column) -> Column:
    return F.substring(F.sha2(key_col.cast("string"), 256), 1, _HASH_WIDTH)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided by sha256(key)."""
    return df.where(_bucket(F.col(key_col)) < F.lit(hash_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common languages,
    keep all of rare ones). ``rates`` maps stratum value -> keep fraction;
    strata not listed use ``default_rate``.

    The per-stratum threshold is folded into one CASE expression, so this is
    a single codegen'd filter — no join, no shuffle, and the same row always
    gets the same decision regardless of partitioning.
    """
    thr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == F.lit(value)
        t = F.lit(hash_threshold(rate))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(hash_threshold(default_rate)) if thr is None else thr.otherwise(
        F.lit(hash_threshold(default_rate))
    )
    return df.where(_bucket(F.col(key_col)) < thr)


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep rates that realize a target mixture.

    Given observed stratum sizes and target mixture ``weights`` (need not
    sum to 1 — only ratios matter), returns the keep fractions that yield
    the LARGEST sample with exactly those proportions: the stratum that is
    scarcest relative to its weight is kept whole (rate 1.0) and every
    other stratum is downsampled to match. All arithmetic is plain IEEE
    multiply/divide in a fixed order, so an engine-side reimplementation
    (the DuckDB oracle) reproduces the rates bit-for-bit."""
    if not weights:
        raise ValueError("weights must be non-empty")
    missing = [s for s, w in weights.items() if w > 0 and counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"strata with weight but no rows: {missing}")
    total = min(counts[s] / w for s, w in weights.items() if w > 0)
    return {
        s: (w * total / counts[s] if w > 0 else 0.0) for s, w in weights.items()
    }


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Deterministic training-mixture construction: sample each stratum so
    the output follows the target ``weights`` proportions, keeping as much
    data as feasible (the scarcest-relative stratum survives whole). Strata
    not in ``weights`` are dropped.

    One tiny control-plane aggregation collects the per-stratum counts
    (|strata| rows — the same bounded-collect shape as the reference's
    partition-value listing, Processing.scala:144-156); the sample itself
    is a single codegen'd hash-threshold filter, so the data pass costs one
    scan regardless of corpus size."""
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(strata_col).isin(*weights.keys()))
        .groupBy(strata_col)
        .count()
        .collect()
    }
    rates = mixture_rates(counts, weights)
    return stratified_sample(df, key_col, strata_col, rates, default_rate=0.0)


def importance_score(
    df: DataFrame,
    target_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_hex: int = 2,
) -> DataFrame:
    """Data-selection importance score via hashed n-gram features — the
    DSIR shape (Xie et al. 2023, arXiv:2302.03169): score every document
    by how much more its hashed-bigram distribution resembles a TARGET
    subset (``target_cond``, e.g. a trusted high-quality slice) than the
    raw corpus, then keep the documents the score favors.

    Features are overlapping token bigrams hashed into ``16**bucket_hex``
    buckets (first ``bucket_hex`` hex chars of sha256 — a string key, so
    any engine reproduces it). Per bucket ``b``: ``r_b`` = occurrences in
    the whole corpus, ``t_b`` = occurrences in the target subset,
    ``R = sum(r_b)``, ``T = sum(t_b)``. The per-doc score is

        score(d) = sum_b c_{d,b} * (t_b * R  -  r_b * T)

    i.e. each occurrence votes with the (T*R-scaled) probability gap
    ``p_target(b) - p_raw(b)`` — the linearized form of DSIR's
    log-likelihood-ratio ``sum c * ln(p_t/p_r)`` (first-order in
    ``p_t/p_r - 1``). The linear form is chosen deliberately: every term
    is exact int64 arithmetic, so the score — unlike a sum of ``ln``
    terms — is independent of addition order, partitioning, and engine
    libm (the same trade as tfidf_top_terms' linear-IDF variant).
    ``selected = score > 0`` ("more target-like than corpus-like") needs
    no global ordering, so selection stays a scan-time filter.

    Returns one row per input document: (``id_col``, ``score`` bigint,
    ``selected`` boolean); documents with <2 tokens score 0.

    Plan: one bigram explode -> groupBy(bucket) for the (tiny,
    16**bucket_hex-row) score table -> broadcast join -> groupBy(doc).
    Two data shuffles on (doc, bucket)-sized keys with map-side combine;
    the score table itself never shuffles the corpus. At 100 TB the
    int64 headroom needs ``t_b * R < 2^63`` — past ~10^9 total bigram
    occurrences compute the score table on a deterministic corpus sample
    (the distributions, not the per-doc counts, are what need estimating
    — exactly DSIR's own estimator), or widen to decimal."""
    from datalakefoundation_spark.ext.text import window_ngrams

    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    occ = df.select(
        F.col(id_col),
        target_cond.cast("boolean").alias("__t"),
        F.explode(window_ngrams(text_col, 2)).alias("__bg"),
    ).select(
        id_col,
        "__t",
        F.substring(F.sha2(F.col("__bg"), 256), 1, bucket_hex).alias("__b"),
    )
    buckets = occ.groupBy("__b").agg(
        F.count(F.lit(1)).alias("r_b"),
        F.sum(F.col("__t").cast("long")).alias("t_b"),
    )
    totals = buckets.agg(
        F.sum("r_b").alias("__R"), F.sum("t_b").alias("__T")
    )
    scores = buckets.crossJoin(F.broadcast(totals)).select(
        "__b",
        (F.col("t_b") * F.col("__R") - F.col("r_b") * F.col("__T")).alias("__s"),
    )
    doc_scores = (
        occ.groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .join(F.broadcast(scores), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__c") * F.col("__s")).alias("score"))
    )
    return (
        df.select(id_col)
        .join(doc_scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
            (F.coalesce(F.col("score"), F.lit(0)) > 0).alias("selected"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-group cap (domain/source balancing): keep at most
    ``cap`` rows per ``group_col`` value, chosen by ascending
    sha256(seed|key) with the key as tiebreak — a pure function of the
    data, so the SAME rows survive under any partitioning, retry, or
    engine (``df.sample``/``rand()`` would not be). The standard guard
    against a handful of giant domains dominating a crawl-derived corpus
    (e.g. the C4/Gopher per-domain caps).

    Adds ``group_rank`` (1-based) and filters to ``group_rank <= cap``.
    One shuffle on the group key; per-group window state is the group's
    rows, the same bound as any per-key top-k. For pathologically hot
    groups at 100 TB, pre-filter with an approximate per-group count and
    hash-threshold (two-stage cap) before the exact window."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql.window import Window

    h = F.sha2(
        F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")), 256
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("group_rank", F.row_number().over(w))
        .where(F.col("group_rank") <= cap)
    )


def reshard_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "",
    validate: bool = False,
) -> DataFrame:
    """Deterministic global shuffle + resharding for training order.

    Training pipelines need the corpus in a reproducible pseudo-random
    order, materialized as N shards that downstream loaders read
    round-robin. ``df.orderBy(rand(seed))`` is neither stable across
    retries/partitionings nor engine-portable; this derives both the shard
    and the within-shard position from sha256(seed || '|' || key), so the
    layout is a pure function of the data — identical across runs,
    clusters, and engines.

    Adds: ``shard`` (first 4 hash hex chars mod n_shards — 16 uniform
    bits) and ``shard_pos`` (1-based rank within the shard, ordered by the
    full hash with the key as tiebreak).

    Scale: one hash projection (codegen), one shuffle on ``shard``, and a
    per-shard sort — rank comes from ``row_number`` over (shard, hash), so
    no global ordering exists anywhere; the widest state is one shard's
    sort, exactly what a shard-file writer needs anyway. Writing the
    result ``partitionBy("shard")`` sorted by ``shard_pos`` gives the
    training-ready layout directly.

    PRECONDITION: ``key_col`` must be unique and non-null (a doc id /
    PK). Rows sharing a key (or NULL keys, which all hash identically)
    are indistinguishable to the hash, so their relative ``shard_pos``
    would be partitioning-dependent — silently breaking the determinism
    contract. ``validate=True`` spends one cheap aggregate to enforce
    this and raises on violation; leave it off only when the key is
    structurally unique (e.g. already a primary key).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if validate:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col(key_col)).alias("nn"),
            F.count_distinct(F.col(key_col)).alias("nd"),
        ).first()
        if row["nn"] < row["n"]:
            raise ValueError(
                f"reshard_shuffle: {row['n'] - row['nn']} NULL values in "
                f"key column {key_col!r} — determinism requires unique "
                "non-null keys"
            )
        if row["nd"] < row["nn"]:
            raise ValueError(
                f"reshard_shuffle: key column {key_col!r} has "
                f"{row['nn'] - row['nd']} duplicate values — determinism "
                "requires unique non-null keys"
            )
    from pyspark.sql.window import Window

    h = F.sha2(
        F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")), 256
    )
    out = df.withColumn("__h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("__h"), 1, 4), 16, 10).cast("int"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    return out.withColumn("shard_pos", F.row_number().over(w)).drop("__h")
