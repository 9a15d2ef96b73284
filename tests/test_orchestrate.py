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
