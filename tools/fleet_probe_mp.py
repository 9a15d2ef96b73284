"""Cross-PROCESS entity-fleet certification (VERDICT r6 directive #6).

``tools/fleet_probe.py`` certifies the 50-entity fleet inside ONE driver
(threads sharing a SparkSession — the ``orchestrate.process_entities``
shape). The reference's production story is N INDEPENDENT jobs: ADF
ForEach spawns one Databricks run per entity (outputs/datafactory.scala:
29-52), so the contention that matters is cross-process — separate JVMs,
separate page caches, no shared locks except the storage-level manifest
CAS. This probe runs the same mixed-strategy fleet as real OS processes:

  * K worker processes (default 4), each with its OWN SparkSession, own
    a disjoint entity subset (the ADF model: one job per entity; the
    same-entity race is pinned separately by tests/test_merge_race.py)
    and push each entity's 3 slices through real ``Processing.process()``
    runs in order;
  * every process appends bookmarks to the ONE shared watermark system
    table — with entities x 3 slices > COMPACT_THRESHOLD the fleet
    crosses the compaction boundary, exercising the cross-process
    read-vs-compaction window (the race r6 fixed in ``watermark.py``
    and ADVICE r6 extended to HadoopFS error translation);
  * afterwards the parent asserts, with a fresh session:
      - every run ok + the per-strategy metric identities
        (merge/full/historic — same contract as fleet_probe.py);
      - the watermark manifest version chain is CONTIGUOUS (every CAS
        loser retried at the next version; no clobbered commits);
      - exactly 3 bookmark appends per entity survived — zero lost,
        zero duplicated — and ``latest()`` returns the final SeqNr;
      - silver row counts match the strategy's identity.

Records fleet wall + per-process run counts in BASELINE.md.

Usage: python tools/fleet_probe_mp.py [entities] [rows_per_slice] [procs]
  (default 12 2000 4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from datalakefoundation_spark.watermark import WatermarkStore  # noqa: E402

STRATEGIES = ("merge", "full", "historic")  # keep in sync with fleet_probe


def _worker(root: str, n_entities: int, r: int, eids: list[int]) -> None:
    """One fleet member: own SparkSession, its entities' slices in order."""
    from datalakefoundation_spark.processing import Processing
    from datalakefoundation_spark.session import get_spark
    from tools.fleet_probe import fleet_metadata

    spark = get_spark(
        f"fleet-mp-worker-{os.getpid()}",
        master="local[6]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    md = fleet_metadata(root, n_entities)
    out = []
    for eid in eids:
        for s in ("s1.parquet", "s2.parquet", "s3.parquet"):
            summary = Processing(spark, md, eid, s, {}).process()
            out.append(
                {
                    "eid": eid,
                    "slice": s,
                    "inserted": summary.inserted,
                    "updated": summary.updated,
                    "deleted": summary.deleted,
                    "touched": summary.touched,
                    "unchanged": summary.unchanged,
                }
            )
    print("RESULTS " + json.dumps(out), flush=True)


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    procs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from datalakefoundation_spark.processing import Processing
    from datalakefoundation_spark.session import get_spark
    from tools.fleet_probe import fleet_metadata, write_slices

    spark = get_spark("fleet-mp-parent", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        root = f"{tmp}/fleet"
        md = fleet_metadata(root, n_entities)
        write_slices(spark, md, n_entities, r)

        # disjoint entity split, round-robin so every process carries a
        # mix of strategies
        split: list[list[int]] = [[] for _ in range(procs)]
        for i, eid in enumerate(range(1, n_entities + 1)):
            split[i % procs].append(eid)

        t0 = time.time()
        children = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    root, str(n_entities), str(r),
                    ",".join(map(str, eids)),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                cwd=REPO,
            )
            for eids in split if eids
        ]
        results: list[dict] = []
        for p in children:
            out, err = p.communicate(timeout=1800)
            assert p.returncode == 0, err.decode()[-3000:]
            for line in out.decode().splitlines():
                if line.startswith("RESULTS "):
                    results.extend(json.loads(line[len("RESULTS "):]))
        wall = round(time.time() - t0, 1)
        assert len(results) == 3 * n_entities, f"got {len(results)} runs"

        # per-strategy metric identities (same contract as fleet_probe.py)
        by = {(x["eid"], x["slice"]): x for x in results}
        for eid in range(1, n_entities + 1):
            strat = STRATEGIES[eid % len(STRATEGIES)]
            s1, s2, s3 = (by[(eid, f"s{k}.parquet")] for k in (1, 2, 3))
            if strat == "merge":
                assert (s1["inserted"], s2["inserted"], s2["updated"]) == (
                    r, r // 2, r // 2,
                ), (eid, strat, s1, s2)
                assert (s3["inserted"], s3["updated"], s3["touched"]) == (
                    0, r, r,
                ), (eid, s3)
            elif strat == "historic":
                assert s1["inserted"] == r and s2["inserted"] == r // 2
                assert s2["updated"] == r // 2, (eid, s2)
                assert (s3["inserted"], s3["updated"], s3["unchanged"]) == (
                    0, 0, r,
                ), (eid, s3)
            else:
                assert (
                    s1["inserted"] == r and s2["inserted"] == r
                    and s3["inserted"] == r
                ), (eid, strat, s1, s2, s3)

        # shared watermark table: contiguous version chain + exactly-once
        store = WatermarkStore(spark, root)
        mf = store.table.latest_manifest()
        for v in range(mf.version + 1):
            store.table.manifest_at(v)  # raises if a version file is missing
        wm_rows = store.table.read().collect()
        per_entity: dict[int, int] = {}
        for row in wm_rows:
            per_entity[row["entity_id"]] = per_entity.get(row["entity_id"], 0) + 1
        for eid in range(1, n_entities + 1):
            assert per_entity.get(eid) == 3, (
                f"entity {eid} has {per_entity.get(eid)} bookmark rows"
            )
            assert store.latest(eid).get("SeqNr") == str(r + r + r // 2 - 1)
            strat = STRATEGIES[eid % len(STRATEGIES)]
            silver = Processing(spark, md, eid, "s3.parquet", {}).silver_table()
            cnt = silver.read().count()
            want = {"merge": r + r // 2, "full": r, "historic": 2 * r}[strat]
            assert cnt == want, (eid, strat, cnt, want)

        out = {
            "entities": n_entities,
            "rows_per_slice": r,
            "processes": len(children),
            "fleet_wall_s": wall,
            "runs": len(results),
            "wm_manifest_versions": mf.version + 1,
            "wm_bookmark_rows": len(wm_rows),
        }
        print(json.dumps(out))
        print("FLEET MP PROBE OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(
            sys.argv[2],
            int(sys.argv[3]),
            int(sys.argv[4]),
            [int(x) for x in sys.argv[5].split(",")],
        )
    else:
        main()
