"""End-to-end ``clean_corpus`` certification at 1M documents (VERDICT r5
directive #9 — "the whole pipeline at scale").

The composed recipe (quality → gopher → PII → exact dedup → near-dup
clusters → decontaminate → perplexity → mixture, ``ext/recipes.py``) has
composition tests at fixture scale; this runs it ONCE at the 1M-doc
certification scale the dedup/ANN/LM tiers already use, and records what a
user running "the whole pipeline" actually sees:

  * one COLD end-to-end wall (no stage persists — the production shape:
    everything stays lazy, Spark pipelines the scan-speed gates into the
    first dedup shuffle);
  * a per-stage walk (persist stage k-1, time stage k's count) giving the
    incremental cost and survivor count of every stage;
  * the audit-count identities: survivors monotonically non-increasing,
    exact-dedup count == distinct-text count of its input, near-dup stage
    collapsing the planted 5-doc replica groups, decontamination removing
    the planted benchmark overlap, mixture honoring its per-language caps.

Corpus: sf0.1 ``documents`` (5000 base docs, ~50 words each) replicated
``replicas``× with the dedup-cert group salting (groups of 5 replicas
differ only by a per-replica marker token → planted near-dup clusters;
distinct groups share ~no shingles), carrying ``lang`` for the mixture
stage. Benchmark for decontamination: every 500th SALTED document verbatim
(so its group-mates are heavily contaminated too — planted, measurable).
Reference LM for the perplexity gate: trained on a 5% sample of the salted
corpus itself (the CCNet shape — score the crawl with an LM trained on a
trusted reference; here the reference shares the corpus distribution, so
the gate passes the bulk and the probe asserts only sane bounds).

Usage: python tools/corpus_cert.py [replicas]   (default 200 → 1M docs)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.ext.lm import train_bigram_lm  # noqa: E402
from datalakefoundation_spark.ext.recipes import clean_corpus  # noqa: E402
from datalakefoundation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GROUP = 5  # replicas per planted near-dup group (dedup_cert geometry)


def build_corpus(spark, replicas: int):
    """dedup_cert.build_corpus, carrying ``lang`` for the mixture stage:
    base × replicas via one range cross join; doc_id globalized; tokens
    group-salted (5-replica groups are mutual near-dups, cross-group
    token overlap ~0); per-replica marker token appended."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_base = base.count()
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    grp = (F.col("rep") / GROUP).cast("long")
    salted = base.crossJoin(reps).select(
        (F.col("rep") * n_base + F.col("doc_id")).alias("doc_id"),
        F.concat(
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(F.lit("_g"), grp.cast("string"), F.lit(" ")),
            ),
            F.lit(" m"),
            F.col("rep").cast("string"),
        ).alias("text"),
        F.col("lang"),
    )
    return salted, n_base


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark("corpus-cert")
    spark.sparkContext.setLogLevel("ERROR")

    gen, n_base = build_corpus(spark, replicas)
    n_docs = n_base * replicas
    rec: dict = {"replicas": replicas, "docs": n_docs}

    tmp_root = tempfile.mkdtemp(prefix="corpus_cert_")
    # materialize the corpus ONCE (the production shape: the pipeline
    # reads balanced parquet, not a generator lineage — the crossJoin
    # generator otherwise leaves every downstream map stage on its
    # handful of input partitions)
    t0 = time.time()
    gen.repartition(64).write.parquet(f"{tmp_root}/corpus.parquet")
    corpus = spark.read.parquet(f"{tmp_root}/corpus.parquet")
    rec["corpus_write_s"] = round(time.time() - t0, 1)

    # planted contamination: every 500th salted doc verbatim — its 4
    # group-mates share ~all shingles minus the marker token, so the
    # decontaminate stage has a measurable planted target
    benchmark = corpus.where(F.col("doc_id") % 500 == 0).select("text")

    # reference LM on a 5% deterministic sample of the corpus
    t0 = time.time()
    uni, bi = train_bigram_lm(
        corpus.where(F.col("doc_id") % 20 == 0), vocab_size=50_000,
        min_bigram_count=2,
    )
    uni = uni.localCheckpoint(eager=True)
    bi = bi.localCheckpoint(eager=True)
    rec["lm_train_s"] = round(time.time() - t0, 1)

    kwargs = dict(
        min_tokens=10,
        benchmark=benchmark,
        max_contaminated_frac=0.5,
        redact_pii=True,
        gopher=True,
        gopher_min_words=20,
        # per-corpus battery tuning (the Gopher paper's own practice):
        # the synthetic corpus has no English stopwords (required-words
        # prior off) and group salting stretches tokens (~+4 chars)
        gopher_kwargs={"min_required_words": 0, "max_mean_word_len": 12.0},
        perplexity=(uni, bi, 40.0),  # ~p99 of the corpus ppl distribution
        mixture=("lang", {"en": 1.0, "zh": 0.5, "de": 0.5, "fr": 0.5}),
    )

    # --- cold end-to-end: the production shape, everything lazy ---
    t0 = time.time()
    result = clean_corpus(corpus, **kwargs)
    result.df.write.parquet(f"{tmp_root}/clean.parquet")
    rec["cold_end_to_end_s"] = round(time.time() - t0, 1)
    final_count = spark.read.parquet(f"{tmp_root}/clean.parquet").count()
    rec["final_docs"] = final_count

    # --- per-stage walk: persist stage k-1 so stage k's count prices the
    # stage itself, not the whole prefix ---
    result = clean_corpus(corpus, **kwargs)
    counts: dict[str, int] = {}
    walls: dict[str, float] = {}
    prev = None
    for name, frame in result.stages:
        frame.persist()
        t0 = time.time()
        counts[name] = frame.count()
        walls[name] = round(time.time() - t0, 1)
        if prev is not None:
            prev.unpersist()
        prev = frame
    if prev is not None:
        prev.unpersist()
    rec["stage_counts"] = counts
    rec["stage_walls_s"] = walls
    print(json.dumps(rec), flush=True)

    # --- audit identities ---
    names = [n for n, _ in result.stages]
    vals = [counts[n] for n in names]
    assert vals[0] == n_docs, (names[0], vals[0], n_docs)
    assert all(a >= b for a, b in zip(vals, vals[1:])), (
        f"survivor counts must be non-increasing: {dict(zip(names, vals))}"
    )
    # exact dedup keeps exactly one doc per distinct text of its input
    idx = names.index("exact_dedup")
    distinct_texts = result.stages[idx - 1][1].select("text").distinct().count()
    assert counts["exact_dedup"] == distinct_texts, (
        counts["exact_dedup"], distinct_texts,
    )
    # planted replica groups must collapse to ~one survivor per group:
    # per base doc there are ceil(replicas/GROUP) groups, so the expected
    # survivor fraction is ceil(replicas/GROUP)/replicas (=1/GROUP once
    # replicas >= GROUP); 1.25x slack for boundary effects
    groups_per_doc = -(-replicas // GROUP)
    expected_frac = groups_per_doc / replicas
    assert counts["near_dedup"] <= counts["exact_dedup"] * expected_frac * 1.25, (
        f"planted {GROUP}-replica groups did not collapse: "
        f"{counts['near_dedup']} survivors vs {counts['exact_dedup']} "
        f"(expected ~{counts['exact_dedup'] * expected_frac:.0f})"
    )
    # decontamination removed the planted benchmark overlap
    assert counts["decontaminate"] < counts[names[names.index("decontaminate") - 1]], (
        "planted contamination was not removed"
    )
    # the ppl gate is tuned to a tail threshold: it must reject a real
    # tail, not the bulk (at 1M the salted-group distribution sits wider
    # than the small-replica tuning run — 10.8% rejected, not ~1%)
    assert counts["perplexity"] < counts["decontaminate"]
    assert counts["perplexity"] > 0.75 * counts["decontaminate"]
    assert final_count > 0

    # --- warm path: 500-doc ingest absorb against the standing index
    # (VERDICT r6 directive #8 — the steady-state shape a production
    # corpus actually runs). The index is CleanResult.index_updates (all
    # post-exact-dedup signatures); the ingest is 250 near-dup copies of
    # indexed docs (one extra marker token — must be absorbed) + 250
    # fresh-salted docs (must survive near-dedup). Only the near-dedup
    # stage is corpus-coupled — every other stage is per-doc — so the
    # equivalence assertion targets exactly it.
    t0 = time.time()
    result.index_updates.write.parquet(f"{tmp_root}/index.parquet")
    rec["index_build_s"] = round(time.time() - t0, 1)
    index = spark.read.parquet(f"{tmp_root}/index.parquet")

    dup_src = corpus.where(F.col("doc_id") % (n_docs // 250) == 0).limit(250)
    dups = dup_src.select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" ingestmarker")).alias("text"),
        F.col("lang"),
    )
    # fresh docs must be novel for NEAR-DEDUP but ordinary for the per-doc
    # gates: hash every token to a short doc-specific token (6-char, so
    # the Gopher word-length prior sees a normal corpus — a suffix-salted
    # variant stretched tokens past max_mean_word_len and the gates
    # dropped the whole batch before near-dedup). Per-doc hashing also
    # keeps fresh versions of near-dup GROUP-MATES disjoint, so no
    # fresh-fresh pair can absorb another.
    fresh = dup_src.select(
        (F.col("doc_id") + 2 * n_docs).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), t -> concat('f', "
            "substring(sha2(concat(t, cast(doc_id as string)), 256), 1, 5))), ' ')"
        ).alias("text"),
        F.col("lang"),
    )
    batch = dups.unionByName(fresh).localCheckpoint(eager=True)
    # corpus-GLOBAL calibrations are meaningless (and degenerate) on a
    # 500-doc ingest batch: the fresh docs are token-salted to be novel
    # for near-dedup, which also makes them maximally OOV for the
    # reference LM (every survivor fails the ppl gate), and a batch this
    # small can lose whole strata, which mixture_sample correctly
    # rejects. The steady-state recipe applies ppl/mixture as a post-pass
    # over the accumulated output (see stream_clean_corpus docs); the
    # warm leg certifies the one corpus-COUPLED stage, near-dedup.
    warm_kwargs = {
        k: v for k, v in kwargs.items() if k not in ("perplexity", "mixture")
    }
    t0 = time.time()
    inc = clean_corpus(batch, near_dedup_index=index, **warm_kwargs)
    inc_near = dict(inc.stages)["near_dedup"]
    survivors = {r["doc_id"] for r in inc_near.select("doc_id").collect()}
    rec["absorb_s"] = round(time.time() - t0, 1)
    rec["absorb_batch"] = batch.count()
    rec["absorb_survivors"] = len(survivors)
    print(json.dumps({k: rec[k] for k in
                      ("index_build_s", "absorb_s", "absorb_batch",
                       "absorb_survivors")}), flush=True)
    dup_ids = {r["doc_id"] for r in dups.select("doc_id").collect()}
    fresh_ids = {r["doc_id"] for r in fresh.select("doc_id").collect()}
    assert not (survivors & dup_ids), (
        f"near-dup ingest docs escaped the index: {sorted(survivors & dup_ids)[:5]}"
    )
    # every fresh doc that reached near-dedup (per-doc gates upstream may
    # trim a few) must come out the other side
    near_input = {
        r["doc_id"]
        for r in dict(inc.stages)["exact_dedup"].select("doc_id").collect()
    }
    assert (fresh_ids & near_input) <= survivors, (
        "fresh ingest docs were wrongly absorbed: "
        f"{sorted((fresh_ids & near_input) - survivors)[:5]}"
    )
    assert len(fresh_ids & near_input) >= 200, len(fresh_ids & near_input)
    # steady state is the point: absorbing 500 docs must cost a small
    # fraction of the cold full-corpus run
    assert rec["absorb_s"] < 0.2 * rec["cold_end_to_end_s"], (
        rec["absorb_s"], rec["cold_end_to_end_s"],
    )
    inc.unpersist()
    shutil.rmtree(tmp_root, ignore_errors=True)
    print("CORPUS CERT OK")


if __name__ == "__main__":
    main()
