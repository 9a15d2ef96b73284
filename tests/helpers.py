"""Shared fixtures for strategy tests (modeled on FIXTURES.md F1/F2)."""

from __future__ import annotations

import json

from datalakefoundation_spark.metadata.models import Metadata
from datalakefoundation_spark.metadata.sources import StringMetadataSettings

T0 = "2026-01-01 00:00:00"
T1 = "2026-02-01 00:00:00"
T2 = "2026-03-01 00:00:00"


def make_metadata(
    root: str,
    prefix: str = "",
    processtype: str = "merge",
    partitioned: bool = False,
    delete_missing: bool = False,
    watermark: bool = True,
) -> Metadata:
    columns = [
        {"name": "ID", "fieldroles": ["businesskey"]},
    ]
    if partitioned:
        columns.append(
            {
                "name": "",
                "newname": "Administration",
                "datatype": "integer",
                "fieldroles": ["calculated", "partition"],
                "expression": "ID % 2",
            }
        )
    entity = {
        "id": 1,
        "name": "person",
        "enabled": True,
        "connection": "testconn",
        "processtype": processtype,
        "watermark": (
            [{"column_name": "SeqNr", "operation": "and", "operation_group": 0,
              "expression": "'${last_value}'"}]
            if watermark
            else []
        ),
        "columns": columns,
        "settings": {"delete_missing": delete_missing},
        "transformations": [],
    }
    config = {
        "environment": {
            "name": "TEST",
            "timezone": "UTC",
            "root_folder": root,
            "systemfield_prefix": prefix,
            "output": "paths",
        },
        "connections": [{"name": "testconn", "enabled": True, "settings": {}}],
        "entities": [entity],
    }
    return Metadata(StringMetadataSettings().initialize(json.dumps(config)))


def write_slice(spark, metadata, slice_name: str, rows: list[dict]):
    """Write a bronze slice parquet for entity 1."""
    entity = metadata.get_entity(1)
    bronze = entity.get_output().bronzepath.value
    df = spark.createDataFrame(rows)
    df.coalesce(1).write.mode("overwrite").parquet(f"{bronze}/{slice_name}")


def rows_v1(n=10):
    return [{"ID": i, "SeqNr": i, "name": f"name{i}", "data": f"data{i}"} for i in range(n)]
