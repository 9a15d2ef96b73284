"""Concurrent multi-entity orchestration: shared watermark table, one
silver table per entity, CAS-retried system-table commits."""

import json

from pyspark.sql import functions as F

from datalakefoundation_spark.metadata.models import Metadata
from datalakefoundation_spark.metadata.sources import StringMetadataSettings
from datalakefoundation_spark.orchestrate import process_entities
from datalakefoundation_spark.processing import Processing
from datalakefoundation_spark.watermark import WatermarkStore


def _multi_entity_metadata(root: str, n: int = 4) -> Metadata:
    entities = [
        {
            "id": i,
            "name": f"entity{i}",
            "enabled": True,
            "connection": "testconn",
            "processtype": "merge",
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


def test_process_entities_concurrently(spark, tmp_path):
    root = str(tmp_path / "root")
    md = _multi_entity_metadata(root, n=4)
    for eid in range(1, 5):
        bronze = md.get_entity(eid).get_output().bronzepath.value
        rows = [{"ID": i, "SeqNr": i, "data": f"e{eid}_r{i}"} for i in range(10)]
        spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
            f"{bronze}/s1.parquet"
        )
    runs = process_entities(
        spark, md, [(eid, "s1.parquet") for eid in range(1, 5)], parallelism=4
    )
    assert [r.entity_id for r in runs] == [1, 2, 3, 4]
    assert all(r.ok for r in runs), [r.error for r in runs]
    assert all(r.summary.inserted == 10 for r in runs)
    # every entity's silver landed
    for eid in range(1, 5):
        p = Processing(spark, md, eid, "s1.parquet", {})
        assert p.silver_table().read().count() == 10
    # all four watermarks survived the concurrent CAS appends
    store = WatermarkStore(spark, root)
    for eid in range(1, 5):
        assert store.latest(eid).get("SeqNr") == "9"


def test_process_entities_captures_failures(spark, tmp_path):
    root = str(tmp_path / "root2")
    md = _multi_entity_metadata(root, n=2)
    bronze = md.get_entity(1).get_output().bronzepath.value
    rows = [{"ID": i, "SeqNr": i, "data": f"r{i}"} for i in range(5)]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        f"{bronze}/s1.parquet"
    )
    runs = process_entities(
        spark, md, [(1, "s1.parquet"), (2, "missing.parquet")], parallelism=2
    )
    assert runs[0].ok and runs[0].summary.inserted == 5
    assert not runs[1].ok and runs[1].error is not None


def test_same_entity_work_items_serialize_in_order(spark, tmp_path):
    """Two slices for ONE entity in the same fleet must both land, applied
    in input order (the orchestrator chains same-entity items instead of
    manufacturing the read-compute-commit race test_merge_race.py proves
    the CAS would make one of them lose)."""
    root = str(tmp_path / "root")
    md = _multi_entity_metadata(root, n=2)
    for eid in (1, 2):
        bronze = md.get_entity(eid).get_output().bronzepath.value
        s1 = [{"ID": i, "SeqNr": i, "data": f"v1_{i}"} for i in range(10)]
        s2 = [{"ID": i, "SeqNr": 100 + i, "data": f"v2_{i}"} for i in range(5, 15)]
        spark.createDataFrame(s1).coalesce(1).write.mode("overwrite").parquet(
            f"{bronze}/s1.parquet"
        )
        spark.createDataFrame(s2).coalesce(1).write.mode("overwrite").parquet(
            f"{bronze}/s2.parquet"
        )
    work = [(1, "s1.parquet"), (2, "s1.parquet"), (1, "s2.parquet"), (2, "s2.parquet")]
    runs = process_entities(spark, md, work, parallelism=4)
    assert [(r.entity_id, r.slice_file) for r in runs] == work  # input order
    assert all(r.ok for r in runs), [str(r.error) for r in runs]
    for eid in (1, 2):
        rows = {
            r["ID"]: r["data"]
            for r in Processing(spark, md, eid, "s1.parquet", {})
            .silver_table()
            .read()
            .collect()
        }
        # 0-4 from slice 1, 5-14 updated/inserted by slice 2 ON TOP of it
        assert set(rows) == set(range(15))
        assert all(rows[i] == f"v1_{i}" for i in range(5))
        assert all(rows[i] == f"v2_{i}" for i in range(5, 15))
    # slice-2 runs saw slice-1 state: second run per entity merged, not full
    by_item = {(r.entity_id, r.slice_file): r.summary for r in runs}
    assert by_item[(1, "s2.parquet")].strategy == "merge"
    assert by_item[(1, "s2.parquet")].inserted == 5  # 10-14 new


def test_latest_survives_concurrent_compaction(spark, tmp_path):
    """The read-vs-compaction race the 50-entity fleet probe exposed: a
    reader that fetched the manifest BEFORE a compaction must re-read
    after the compactor deletes the folded segment dirs, not die with
    FileNotFoundError. Simulated deterministically: hand latest() a
    stale pre-compaction manifest on its first attempt."""
    root = str(tmp_path / "race_root")
    store = WatermarkStore(spark, root)
    for i in range(4):  # 4 CAS appends -> 4 segments
        store.write(7, {"SeqNr": ("int", str(i))})
    stale = store.table.latest_manifest()
    assert len(stale.segments) == 4
    store._compact()  # folds to 1 segment and DELETES the 4 dirs
    live = store.table.latest_manifest()
    assert len(live.segments) == 1

    calls = {"n": 0}
    real = store.table.latest_manifest

    def stale_first():
        calls["n"] += 1
        return stale if calls["n"] == 1 else real()

    store.table.latest_manifest = stale_first
    try:
        assert store.latest(7) == {"SeqNr": "3"}  # retried past the race
    finally:
        store.table.latest_manifest = real
    assert calls["n"] >= 2

    # and a compactor racing an already-finished compactor is a no-op,
    # not a crash: feed _compact the stale manifest the same way
    calls["n"] = 0
    store.table.latest_manifest = stale_first
    try:
        store._compact()  # reads stale -> segment dirs gone -> returns
    finally:
        store.table.latest_manifest = real
    assert store.latest(7) == {"SeqNr": "3"}
