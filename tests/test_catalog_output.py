"""Catalog (table) output resolution: silver_table setting -> LakeTable under
_catalog + session-catalog view (K2 parity)."""

import json

from pyspark.sql import functions as F

from datalakefoundation_spark.metadata import Metadata, StringMetadataSettings
from datalakefoundation_spark.processing import Processing
from tests.helpers import T0, rows_v1, write_slice


def test_catalog_output_registers_view(spark, lake_root):
    cfg = {
        "environment": {
            "name": "T",
            "timezone": "UTC",
            "root_folder": lake_root,
            "systemfield_prefix": "dlf_",
            "output": "paths",
        },
        "connections": [{"name": "c1", "enabled": True, "settings": {}}],
        "entities": [
            {
                "id": 1,
                "name": "person",
                "enabled": True,
                "connection": "c1",
                "processtype": "merge",
                "watermark": [],
                "columns": [{"name": "ID", "fieldroles": ["businesskey"]}],
                "settings": {"silver_table": "silver_tst.${destination}"},
                "transformations": [],
            }
        ],
    }
    md = Metadata(StringMetadataSettings().initialize(json.dumps(cfg)))
    assert md.get_entity(1).get_output().silverpath.kind == "table"
    write_slice(spark, md, "s1.parquet", rows_v1(7))
    p = Processing(spark, md, 1, "s1.parquet", {"processing.time": T0})
    p.process()
    out = spark.read.table("silver_tst.person")
    assert out.count() == 7
    assert "PK_person" in out.columns
    # second run updates the registered view's underlying version
    rows2 = rows_v1(9)
    write_slice(spark, md, "s2.parquet", rows2)
    p2 = Processing(spark, md, 1, "s2.parquet", {"processing.time": T0})
    p2.process()
    assert spark.read.table("silver_tst.person").count() == 9

    # the registration is a PERSISTENT view (not a temp view): a fresh
    # session over the same catalog reads it too (Full.scala:51-66 — a user
    # of db.tbl is not limited to the writing session). With a Hive
    # metastore the same statement persists across JVM restarts.
    fresh = spark.newSession()
    out2 = fresh.read.table("silver_tst.person")
    assert out2.count() == 9
    assert "PK_person" in out2.columns
