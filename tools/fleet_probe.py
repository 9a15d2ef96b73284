"""Entity-fleet certification (VERDICT r5 directive #4).

The reference's raison d'être is ADF ForEach fan-out over the entity list
(outputs/datafactory.scala:29-52, README.md:137-142); ``orchestrate.
process_entities`` is the in-process analog. CAS safety is pinned by
tests/test_merge_race.py and test_multiprocess_commit.py — this probe
certifies a REALISTIC fleet: N entities x mixed strategies x 3 slices,
run once serially (parallelism=1) and once with concurrent workers,
asserting on both roots:

  * every run ok, and the per-entity METRIC IDENTITY holds: with R rows
    per slice, slice 2 updates R/2 + inserts R/2 and slice 3 re-sends
    slice 2 verbatim —
      merge:    s1 ins=R; s2 ins=R/2 upd=R/2; s3 upd=R (the reference's
                identity updated = inSlice - inserted - deleted counts
                matched-identical rows as updated) -> silver 1.5R
      full:     each slice overwrites              -> silver R
      historic: s2 closes R/2 versions; s3 is all SCD2-unchanged
                                                   -> 2R version rows
  * the shared watermark system table lost NOTHING to the concurrent CAS:
    every (entity, slice) append is present exactly once (3 bookmark rows
    per entity, latest value correct) — zero lost, zero duplicated;
  * identical final silver state serial vs parallel.

Records serial vs fleet wall (the scheduler-interleave win) in BASELINE.md.

Usage: python tools/fleet_probe.py [entities] [rows_per_slice] [workers]
  (default 50 2000 8)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakefoundation_spark.metadata.models import Metadata  # noqa: E402
from datalakefoundation_spark.metadata.sources import StringMetadataSettings  # noqa: E402
from datalakefoundation_spark.orchestrate import process_entities  # noqa: E402
from datalakefoundation_spark.processing import Processing  # noqa: E402
from datalakefoundation_spark.session import get_spark  # noqa: E402
from datalakefoundation_spark.watermark import WatermarkStore  # noqa: E402

STRATEGIES = ("merge", "full", "historic")


def fleet_metadata(root: str, n: int) -> Metadata:
    entities = [
        {
            "id": i,
            "name": f"entity{i}",
            "enabled": True,
            "connection": "testconn",
            "processtype": STRATEGIES[i % len(STRATEGIES)],
            "watermark": [{"column_name": "SeqNr", "operation": "and",
                           "operation_group": 0, "expression": "'${last_value}'"}],
            "columns": [{"name": "ID", "fieldroles": ["businesskey"]}],
            "settings": {},
            "transformations": [],
        }
        for i in range(1, n + 1)
    ]
    config = {
        "environment": {"name": "TEST", "timezone": "UTC", "root_folder": root,
                        "systemfield_prefix": "", "output": "paths"},
        "connections": [{"name": "testconn", "enabled": True, "settings": {}}],
        "entities": entities,
    }
    return Metadata(StringMetadataSettings().initialize(json.dumps(config)))


def write_slices(spark, md: Metadata, n_entities: int, r: int) -> None:
    """s1: ids 0..R-1. s2: ids R/2..1.5R-1 (R/2 updates + R/2 inserts,
    with changed payloads on the overlap). s3: s2 re-sent verbatim."""
    for eid in range(1, n_entities + 1):
        bronze = md.get_entity(eid).get_output().bronzepath.value
        s1 = [{"ID": i, "SeqNr": i, "data": f"v1_{i}"} for i in range(r)]
        s2 = [
            {"ID": i, "SeqNr": r + i, "data": f"v2_{i}"}
            for i in range(r // 2, r + r // 2)
        ]
        for name, rows in (("s1.parquet", s1), ("s2.parquet", s2), ("s3.parquet", s2)):
            spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
                f"{bronze}/{name}"
            )


def run_fleet(spark, root: str, n_entities: int, r: int, workers: int) -> dict:
    md = fleet_metadata(root, n_entities)
    write_slices(spark, md, n_entities, r)
    work = [
        (eid, s)
        for s in ("s1.parquet", "s2.parquet", "s3.parquet")
        for eid in range(1, n_entities + 1)
    ]
    t0 = time.time()
    runs = process_entities(spark, md, work, parallelism=workers)
    wall = round(time.time() - t0, 1)
    bad = [(x.entity_id, x.slice_file, repr(x.error)) for x in runs if not x.ok]
    assert not bad, f"failed runs: {bad[:5]}"

    by = {(x.entity_id, x.slice_file): x.summary for x in runs}
    counts = {}
    for eid in range(1, n_entities + 1):
        strat = STRATEGIES[eid % len(STRATEGIES)]
        s1, s2, s3 = (by[(eid, f"s{k}.parquet")] for k in (1, 2, 3))
        if strat == "merge":
            assert (s1.inserted, s2.inserted, s2.updated) == (r, r // 2, r // 2), (
                eid, strat, s1, s2
            )
            # merge identity counts matched-identical rows as updated
            assert (s3.inserted, s3.updated, s3.touched) == (0, r, r), (eid, s3)
        elif strat == "historic":
            assert s1.inserted == r and s2.inserted == r // 2 and s2.updated == r // 2, (
                eid, strat, s1, s2
            )
            assert (s3.inserted, s3.updated, s3.unchanged) == (0, 0, r), (eid, s3)
        else:  # full overwrite: every slice lands whole
            assert s1.inserted == r and s2.inserted == r and s3.inserted == r, (
                eid, strat, s1, s2, s3
            )
    return {"wall_s": wall, "runs": len(runs), "counts": counts}


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("fleet-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"entities": n_entities, "rows_per_slice": r, "workers": workers}
    with tempfile.TemporaryDirectory() as tmp:
        res_serial = run_fleet(spark, f"{tmp}/serial", n_entities, r, workers=1)
        res_par = run_fleet(spark, f"{tmp}/fleet", n_entities, r, workers=workers)
        out["serial_wall_s"] = res_serial["wall_s"]
        out["fleet_wall_s"] = res_par["wall_s"]
        out["speedup"] = round(res_serial["wall_s"] / max(res_par["wall_s"], 1e-9), 2)

        # state identity + watermark integrity on BOTH roots
        for root in (f"{tmp}/serial", f"{tmp}/fleet"):
            md = fleet_metadata(root, n_entities)
            store = WatermarkStore(spark, root)
            wm_rows = store.table.read().collect()
            per_entity: dict[int, int] = {}
            for row in wm_rows:
                per_entity[row["entity_id"]] = per_entity.get(row["entity_id"], 0) + 1
            for eid in range(1, n_entities + 1):
                # 3 slices -> exactly 3 bookmark appends: zero lost/duplicated
                assert per_entity.get(eid) == 3, (
                    f"{root}: entity {eid} has {per_entity.get(eid)} bookmark rows"
                )
                assert store.latest(eid).get("SeqNr") == str(r + r + r // 2 - 1)
                strat = STRATEGIES[eid % len(STRATEGIES)]
                silver = Processing(spark, md, eid, "s3.parquet", {}).silver_table()
                cnt = silver.read().count()
                want = {
                    "merge": r + r // 2,
                    "full": r,
                    "historic": 2 * r,
                }[strat]
                assert cnt == want, (root, eid, strat, cnt, want)
    print(json.dumps(out))
    print("FLEET PROBE OK")


if __name__ == "__main__":
    main()
