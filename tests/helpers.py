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


def find_bridge_fixture(spark):
    """Deterministic near-dup BRIDGE geometry for incremental-dedup tests:
    docs 1/2 and 3/4 form two separate near-dup clusters, doc 10 contains
    both clusters' shingle sets (the bridge), and no direct 1-4 cross pair
    exists. MinHash banding is salt-sensitive, so search salts until the
    candidate graph has exactly that shape (same loop the r8 prefix-
    consistency test pinned)."""
    from pyspark.sql import SparkSession  # noqa: F401

    from datalakefoundation_spark.ext.dedup import minhash_dedup_candidates

    for salt in range(40):
        wa = [f"a{salt}w{i}" for i in range(40)]
        wb = [f"b{salt}w{i}" for i in range(40)]
        a, a2 = " ".join(wa), " ".join(wa[:-1] + ["zz1"])
        b, b2 = " ".join(wb), " ".join(wb[:-1] + ["zz2"])
        w = a2 + " " + b2
        all_docs = spark.createDataFrame(
            [(1, a), (2, a2), (3, b), (4, b2), (10, w)],
            "doc_id long, text string",
        )
        got = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_dedup_candidates(all_docs).collect()
        }
        cross = {(x, y) for x in (1, 2) for y in (3, 4)}
        if (
            any(p in got for p in [(1, 10), (2, 10)])
            and any(p in got for p in [(3, 10), (4, 10)])
            and not (cross & got)
            and (1, 2) in got
            and (3, 4) in got
        ):
            return all_docs
    raise AssertionError("no salt produced the bridge geometry")
