"""Frontier-bounded reconcile vs full reconcile (VERDICT r8 directive #2).

``reconcile_survivors`` re-clusters the FULL standing index — O(corpus)
per invocation, the one maintenance op whose cost scaled with the table.
``reconcile_survivors_frontier`` re-clusters only the components reachable
from the docs ingested since the last reconcile. This probe measures both
on the same data at GROWING corpus sizes with a FIXED churn batch, and
asserts:

  * set equality: the frontier reconcile's survivors == the full
    reconcile's survivors (both directions) at every size — the
    correctness claim (stream_ingest_probe already certified full
    reconcile == the from-scratch batch twin at 1M docs, so equality
    here chains to the batch twin);
  * assignment equality: the frontier-maintained assignment state ==
    a from-scratch ``cluster_assignment`` over the same index;
  * cost ∝ churn: at the largest size the frontier wall is < 0.5x the
    full wall, and the frontier wall grows by LESS than the full wall
    as the corpus scales (its only corpus-proportional term is the
    scan-speed band-explode of the index inside the frontier band join;
    the shuffling CC runs on the churn-sized reduced graph only).

Corpus geometry (dedup_cert's, via stream_ingest_probe.gen_corpus):
sf0.1 ``documents`` (5000 base docs) x replicas, group-salted in 5s —
group members are mutual near-dups one marker token apart. The churn
batch is the final 10-replica wave (50k docs) at every corpus size, so
the x-axis varies ONLY the standing index under a constant frontier.

Usage: python tools/frontier_reconcile_probe.py [sizes]
  sizes: comma list of replica counts (default 50,100,200 ->
  250k/500k/1M docs; churn is always the last 10 replicas = 50k docs)

Banded-layout mode (r10 directive #1):
  python tools/frontier_reconcile_probe.py banded [replicas] [files]
Builds the band-key-clustered companion LakeTable (``files`` clustered
files, per-file band_key stats) over the prior index and measures the
frontier band join THROUGH it — files/bytes read after prune_spec_isin
on the frontier's distinct band keys, wall, and survivor+assignment
equality vs the signature path — for TWO churn geometries:
  * standard: the full 50k last wave. Its ~200k distinct band keys
    saturate any practical file count, so the expected skip is ~0 —
    recorded, not hidden: skipping is geometry, not magic.
  * sparse: the wave docs of 1% of base ids (~500 docs, ~2k distinct
    keys). With files >> keys (the 100 TB ratio — a petabyte index is
    ~1e6 files against ~1e5 churn keys) the prune must drop >= 50% of
    the index bytes; asserted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.ext.dedup import minhash_signature  # noqa: E402
from datalakefoundation_spark.ext.recipes import (  # noqa: E402
    cluster_assignment,
    reconcile_survivors,
    reconcile_survivors_frontier,
)
from datalakefoundation_spark.session import get_spark  # noqa: E402
from tools.stream_ingest_probe import gen_corpus  # noqa: E402

CHURN_REPLICAS = 10  # the frontier wave, constant across corpus sizes


def run_size(spark, replicas: int) -> dict:
    batches = replicas // CHURN_REPLICAS  # fixed-size waves
    gen, n_base, rpb = gen_corpus(spark, replicas, batches)
    docs = gen.select("doc_id", "text", "__batch")
    sigs = (
        minhash_signature(docs, "text", "doc_id")
        .join(docs.select("doc_id", "__batch"), "doc_id")
        .localCheckpoint(eager=True)  # signature compute is not under test
    )
    last = batches - 1
    prior_sigs = sigs.where(F.col("__batch") < last).drop("__batch")
    frontier_sigs = sigs.where(F.col("__batch") == last).drop("__batch")
    all_sigs = sigs.drop("__batch")
    rec = {
        "replicas": replicas,
        "docs": n_base * replicas,
        "churn_docs": n_base * rpb,
    }

    # state as of the previous reconcile: full clustering of the prior
    # index + the survivor set consistent with it
    assignment = cluster_assignment(prior_sigs).localCheckpoint(eager=True)
    prior_losers = assignment.where(F.col("node") != F.col("cluster_id"))
    prior_surv = docs.where(F.col("__batch") < last).join(
        prior_losers.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
    )
    # streamed shape: the churn wave's docs all arrive as fresh survivors
    surv_in = (
        prior_surv.select("doc_id")
        .unionByName(docs.where(F.col("__batch") == last).select("doc_id"))
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    full = reconcile_survivors(surv_in, all_sigs).select("doc_id").persist()
    n_full = full.count()
    rec["full_wall_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    fr = reconcile_survivors_frontier(surv_in, all_sigs, frontier_sigs, assignment)
    fr_surv = fr.df.select("doc_id").persist()
    n_frontier = fr_surv.count()
    rec["frontier_wall_s"] = round(time.time() - t0, 1)

    rec["survivors_full"] = n_full
    rec["survivors_frontier"] = n_frontier
    rec["frontier_minus_full"] = fr_surv.join(full, "doc_id", "left_anti").count()
    rec["full_minus_frontier"] = full.join(fr_surv, "doc_id", "left_anti").count()

    # assignment-state equality vs a from-scratch clustering of the full
    # index (subtract both ways on churn-pruned frames — cheap relative
    # to the reconciles themselves, and exactness is the point)
    scratch = cluster_assignment(all_sigs)
    got = fr.assignment
    rec["assign_extra"] = got.subtract(scratch).count()
    rec["assign_missing"] = scratch.subtract(got).count()
    full.unpersist()
    fr_surv.unpersist()
    return rec


def _prune_accounting(t, spec) -> dict:
    """Mirror LakeTable.read's per-file skip decision (same
    segment_may_match) and account files/bytes kept vs skipped."""
    from datalakefoundation_spark.tables.lake_table import segment_may_match

    kept = skipped = kept_b = skipped_b = 0
    for seg in t.latest_manifest().segments:
        base = f"{t.path}/{seg.dir}"
        files = seg.files or {}
        if not files:  # no per-file stats: the whole segment is read
            for root, _d, names in os.walk(base):
                for n in names:
                    if n.endswith(".parquet"):
                        kept += 1
                        kept_b += os.path.getsize(os.path.join(root, n))
            continue
        for p, st in files.items():
            size = os.path.getsize(os.path.join(base, p))
            if segment_may_match(st, spec):
                kept += 1
                kept_b += size
            else:
                skipped += 1
                skipped_b += size
    total_b = kept_b + skipped_b
    return {
        "files_kept": kept,
        "files_skipped": skipped,
        "bytes_kept": kept_b,
        "bytes_skipped": skipped_b,
        "bytes_read_pct": round(100.0 * kept_b / max(total_b, 1), 1),
    }


def run_banded(spark, replicas: int, files: int, sparse_mod: int = 100) -> dict:
    from datalakefoundation_spark.ext.dedup import band_explode
    from datalakefoundation_spark.tables.lake_table import (
        LakeTable,
        prune_spec_isin,
    )

    batches = replicas // CHURN_REPLICAS
    gen, n_base, rpb = gen_corpus(spark, replicas, batches)
    docs = gen.select("doc_id", "text", "__batch")
    sigs = (
        minhash_signature(docs, "text", "doc_id")
        .join(docs.select("doc_id", "__batch"), "doc_id")
        .localCheckpoint(eager=True)
    )
    last = batches - 1
    out = {"replicas": replicas, "docs": n_base * replicas, "files": files}

    import tempfile

    root = tempfile.mkdtemp(prefix="dlf_banded_probe_")
    scenarios = {
        # standard: the full last wave (50k at 1M) — keys saturate files
        "standard": F.col("__batch") == last,
        # sparse: the wave docs of 1/sparse_mod of base ids — the file
        # count exceeds the churn's distinct keys, the 100 TB shape
        # (sparse_mod=100 -> ~500 docs at the 1M tool run; CI uses a
        # higher mod so the geometry holds at 64-256 files)
        "sparse": (F.col("__batch") == last)
        & (F.col("doc_id") % sparse_mod < 1),
    }
    for name, cond in scenarios.items():
        frontier_sigs = sigs.where(cond).drop("__batch")
        prior_sigs = sigs.where(~cond).drop("__batch")
        rec = {"churn_docs": frontier_sigs.count()}

        # companion: prior bands, pre-clustered on band_key (the exact
        # write reconcile_clean_corpus's bootstrap performs)
        path = f"{root}/banded_{name}"
        t = LakeTable(spark, path, stats_columns=("band_key",))
        t.file_stats_max_files = files
        t0 = time.time()
        t.overwrite(
            band_explode(prior_sigs)
            .repartitionByRange(files, "band_key")
            .sortWithinPartitions("band_key"),
            operation="band_index_build",
        )
        rec["build_wall_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        fb = band_explode(frontier_sigs).select("band_key").distinct()
        keys = [r["band_key"] for r in fb.collect()]
        spec = prune_spec_isin("band_key", keys)
        rec["distinct_frontier_keys"] = len(keys)
        rec.update(_prune_accounting(t, spec))
        rec["spec_wall_s"] = round(time.time() - t0, 1)

        # prior state for the reconcile equality check
        assignment = cluster_assignment(prior_sigs).localCheckpoint(eager=True)
        losers = assignment.where("node != cluster_id").selectExpr(
            "node AS doc_id"
        )
        surv_in = (
            docs.where(~cond).select("doc_id")
            .join(losers, "doc_id", "left_anti")
            .unionByName(docs.where(cond).select("doc_id"))
            .localCheckpoint(eager=True)
        )
        all_sigs = sigs.drop("__batch")

        t0 = time.time()
        prior_banded = t.read(prune_spec=spec)
        fr_b = reconcile_survivors_frontier(
            surv_in, all_sigs, frontier_sigs, assignment,
            prior_banded=prior_banded,
        )
        surv_b = fr_b.df.select("doc_id").persist()
        rec["banded_survivors"] = surv_b.count()
        rec["banded_wall_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        fr_s = reconcile_survivors_frontier(
            surv_in, all_sigs, frontier_sigs, assignment
        )
        surv_s = fr_s.df.select("doc_id").persist()
        rec["sig_survivors"] = surv_s.count()
        rec["sig_wall_s"] = round(time.time() - t0, 1)

        rec["surv_banded_minus_sig"] = surv_b.join(
            surv_s, "doc_id", "left_anti"
        ).count()
        rec["surv_sig_minus_banded"] = surv_s.join(
            surv_b, "doc_id", "left_anti"
        ).count()
        rec["assign_diff"] = (
            fr_b.assignment.subtract(fr_s.assignment).count()
            + fr_s.assignment.subtract(fr_b.assignment).count()
        )
        surv_b.unpersist()
        surv_s.unpersist()
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "banded":
        replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 200
        files = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
        spark = get_spark("frontier-reconcile-probe")
        spark.sparkContext.setLogLevel("ERROR")
        out = run_banded(spark, replicas, files)
        print(json.dumps(out), flush=True)
        for name in ("standard", "sparse"):
            rec = out[name]
            assert rec["surv_banded_minus_sig"] == 0 == rec["surv_sig_minus_banded"], name
            assert rec["assign_diff"] == 0, name
        assert out["sparse"]["bytes_read_pct"] <= 50.0, (
            "sparse churn must skip >= 50% of index bytes: "
            f"{out['sparse']['bytes_read_pct']}% read"
        )
        print("BANDED LAYOUT PROBE OK")
        return
    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [50, 100, 200]
    )
    spark = get_spark("frontier-reconcile-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sizes": []}
    for replicas in sizes:
        rec = run_size(spark, replicas)
        out["sizes"].append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps(out), flush=True)

    for rec in out["sizes"]:
        assert rec["frontier_minus_full"] == 0 == rec["full_minus_frontier"], (
            f"survivor sets diverge at {rec['docs']} docs: "
            f"+{rec['frontier_minus_full']} -{rec['full_minus_frontier']}"
        )
        assert rec["assign_extra"] == 0 == rec["assign_missing"], (
            f"assignment state diverges at {rec['docs']} docs"
        )
    biggest = out["sizes"][-1]
    assert biggest["frontier_wall_s"] < 0.5 * biggest["full_wall_s"], (
        "frontier reconcile should undercut the full reconcile >2x at "
        f"{biggest['docs']} docs: frontier={biggest['frontier_wall_s']}s "
        f"full={biggest['full_wall_s']}s"
    )
    if len(out["sizes"]) >= 2:
        first = out["sizes"][0]
        full_growth = biggest["full_wall_s"] / max(first["full_wall_s"], 0.1)
        frontier_growth = biggest["frontier_wall_s"] / max(
            first["frontier_wall_s"], 0.1
        )
        assert frontier_growth < full_growth, (
            "frontier wall should grow slower than the full wall under a "
            f"constant churn: frontier x{frontier_growth:.2f} vs "
            f"full x{full_growth:.2f}"
        )
    print("FRONTIER RECONCILE PROBE OK")


if __name__ == "__main__":
    main()
