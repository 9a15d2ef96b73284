"""Sustained banded-reconcile probe (r12, VERDICT r11 #9 / r10 carry-over).

The banded companion index's steady-state claim rested on SINGLE-WAVE
evidence (one bootstrap + one churn append, tools/frontier_reconcile_probe
``banded`` mode). This probe drives the real pipeline —
``stream_clean_corpus`` ingest + ``reconcile_clean_corpus`` with
``banded_index_path`` — through B sustained waves at fixed corpus scale
and records, PER WAVE:

  * reconcile wall (the steady-state O(churn) claim: after the wave-0
    bootstrap, walls must stay near-flat while the standing index grows);
  * companion maintenance mode (manifest version delta: +1 append per
    wave, no rebuilds until ``recluster_segments`` is exceeded);
  * skip-rate decay (mirrored ``prune_spec_isin`` accounting over the
    companion's per-file stats for the wave's distinct band keys: the
    bootstrap segment is range-clustered so sparse key sets skip; each
    appended churn segment is key-dense, so the prunable fraction decays
    between re-clusters — recorded, not hidden);
  * equality every ``eq_every`` waves + final: the reconciled survivor set
    must EQUAL the from-scratch ``clean_corpus`` batch twin over the
    ingested prefix (the X55 convergence contract).

Corpus geometry: stream_ingest_probe.gen_corpus (sf0.1 documents x
replicas, group-salted in 5s; ~80% of every wave from wave 1 on is
cross-batch absorb/bridge work — the adversarial steady-state shape).

Usage: python tools/reconcile_sustained_probe.py [replicas] [batches] [files] [eq_every]
  default 200 20 512 5 → 1M docs in 20 x 50k-doc waves, 512-file
  companion, batch-twin equality at waves 4, 9, 14, 19.
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

from datalakefoundation_spark.session import get_spark  # noqa: E402
from datalakefoundation_spark.streaming.ops import (  # noqa: E402
    reconcile_clean_corpus,
    stream_clean_corpus,
)
from datalakefoundation_spark.tables.lake_table import (  # noqa: E402
    LakeTable,
    prune_spec_isin,
)
from tools.frontier_reconcile_probe import _prune_accounting  # noqa: E402
from tools.stream_ingest_probe import gen_corpus  # noqa: E402

CLEAN_KW = dict(min_tokens=3, redact_pii=False, span_dedup_size=None)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    eq_every = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    spark = get_spark("reconcile-sustained-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _canary

    root = tempfile.mkdtemp(prefix="dlf_sustained_")
    src = f"{root}/src"
    out, index = f"{root}/out", f"{root}/index"
    ckpt, assign = f"{root}/ckpt", f"{root}/assign"
    banded = f"{root}/banded"

    gen, n_base, rpb = gen_corpus(spark, replicas, batches)
    docs = gen.select("doc_id", "text", "__batch").persist()
    docs.count()

    results: dict = {
        "replicas": replicas,
        "batches": batches,
        "companion_files": files,
        "docs": n_base * replicas,
        "wave_docs": n_base * rpb,
        "canary_pre": round(_canary(spark), 3),
        "waves": [],
    }
    from datalakefoundation_spark.ext.dedup import band_explode

    try:
        for wave in range(batches):
            wave_docs = docs.where(F.col("__batch") == wave).select(
                "doc_id", "text"
            )
            wave_docs.coalesce(1).write.mode("append").parquet(src)
            # make the new file the stream's next trigger
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1000)
                .parquet(src)
            )
            t0 = time.time()
            stream_clean_corpus(
                stream, out, index, ckpt, clean_kwargs=dict(CLEAN_KW)
            ).awaitTermination(1800)
            ingest_wall = round(time.time() - t0, 1)

            rec: dict = {"wave": wave, "ingest_wall_s": ingest_wall}
            # mirrored skip accounting BEFORE the reconcile consumes the
            # frontier (wave 0 bootstraps — no companion yet)
            if wave > 0:
                # mirrored skip accounting: the wave's distinct band keys
                # (recomputed from the raw wave — a slight SUPERSET of the
                # post-clean frontier's keys, so the recorded skip rate is
                # a lower bound) against the companion's per-file stats
                from datalakefoundation_spark.ext.dedup import minhash_signature

                t = LakeTable(spark, banded)
                keys = [
                    r["band_key"]
                    for r in band_explode(minhash_signature(wave_docs))
                    .select("band_key")
                    .distinct()
                    .collect()
                ]
                rec["frontier_keys"] = len(keys)
                rec.update(_prune_accounting(t, prune_spec_isin("band_key", keys)))
                v_before = t.latest_manifest().version
            t0 = time.time()
            reconciled = reconcile_clean_corpus(
                spark, out, index, ckpt, assign,
                banded_index_path=banded,
                band_cluster_files=files,
            )
            n_rec = reconciled.count()
            rec["reconcile_wall_s"] = round(time.time() - t0, 1)
            rec["survivors"] = n_rec
            if wave > 0:
                v_after = LakeTable(spark, banded).latest_manifest().version
                rec["companion_commits"] = v_after - v_before
            if (wave % eq_every == eq_every - 1) or wave == batches - 1:
                from datalakefoundation_spark.ext.recipes import clean_corpus

                t0 = time.time()
                prefix = docs.where(F.col("__batch") <= wave).select(
                    "doc_id", "text"
                )
                want = clean_corpus(prefix, **CLEAN_KW).df.select("doc_id")
                got = reconciled.select("doc_id")
                rec["eq_missing"] = want.join(got, "doc_id", "left_anti").count()
                rec["eq_extra"] = got.join(want, "doc_id", "left_anti").count()
                rec["eq_wall_s"] = round(time.time() - t0, 1)
            results["waves"].append(rec)
            print(json.dumps(rec), flush=True)
        results["canary_post"] = round(_canary(spark), 3)
    finally:
        print(json.dumps(results), flush=True)
        docs.unpersist()
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)

    walls = [w["reconcile_wall_s"] for w in results["waves"][1:]]
    if len(walls) >= 8:
        head = sorted(walls[:4])[len(walls[:4]) // 2]
        tail = sorted(walls[-4:])[len(walls[-4:]) // 2]
        assert tail <= 2.0 * head, (
            f"sustained reconcile wall grew: head median {head}s vs "
            f"tail median {tail}s"
        )
    for w in results["waves"]:
        assert w.get("eq_missing", 0) == 0 and w.get("eq_extra", 0) == 0, w
    print("SUSTAINED RECONCILE PROBE OK")


if __name__ == "__main__":
    main()
