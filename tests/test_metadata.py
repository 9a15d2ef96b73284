import json

import pytest

from datalakefoundation_spark.core.exceptions import (
    DuplicateEntityIdException,
    EntityNotFoundException,
    MetadataNotInitializedException,
)
from datalakefoundation_spark.datafactory import get_config_items
from datalakefoundation_spark.metadata.models import Metadata, parse_datatype
from datalakefoundation_spark.metadata.sources import (
    JsonFolderMetadataSettings,
    JsonMetadataSettings,
    StringMetadataSettings,
    deep_merge,
)

CONFIG = {
    "environment": {
        "name": "TEST",
        "timezone": "Europe/Amsterdam",
        "root_folder": "/lake",
        "raw_path": "/${connection}/${entity}",
        "bronze_path": "/${connection}/${entity}",
        "silver_path": "/${connection}/${destination}",
        "systemfield_prefix": "dlf_",
        "output": "paths",
    },
    "connections": [
        {"name": "conn1", "enabled": True, "settings": {"a": "1", "shared": "conn"}},
        {"name": "offconn", "enabled": False, "settings": {}},
    ],
    "entities": [
        {
            "id": 1,
            "name": "person",
            "enabled": True,
            "connection": "conn1",
            "processtype": "delta",
            "group": "g1",
            "watermark": [{"column_name": "SeqNr", "expression": "'${last_value}'"}],
            "columns": [
                {"name": "ID", "fieldroles": ["businesskey"]},
                {"name": "old", "newname": "new", "datatype": "integer"},
                {
                    "name": "",
                    "newname": "Admin",
                    "datatype": "integer",
                    "fieldroles": ["calculated", "partition"],
                    "expression": "950",
                },
            ],
            "settings": {"shared": "entity", "silver_table": "silver_db.${destination}"},
            "transformations": [],
        },
        {"id": 2, "name": "disabled_e", "enabled": False, "connection": "conn1", "columns": []},
        {"id": 3, "name": "on_off_conn", "enabled": True, "connection": "offconn", "columns": []},
    ],
}


def md():
    return Metadata(StringMetadataSettings().initialize(json.dumps(CONFIG)))


def test_entity_lookup_and_order():
    m = md()
    assert m.get_entity(1).name == "person"
    assert [e.id for e in m.get_entities()] == [1, 2, 3]
    assert [e.id for e in m.get_entities(connection="conn1")] == [1, 2]
    assert [e.id for e in m.get_entities(group="g1")] == [1]
    with pytest.raises(EntityNotFoundException):
        m.get_entity(99)


def test_duplicate_entity_id_rejected():
    cfg = json.loads(json.dumps(CONFIG))
    cfg["entities"].append(dict(cfg["entities"][0]))
    with pytest.raises(DuplicateEntityIdException):
        Metadata(StringMetadataSettings().initialize(json.dumps(cfg)))


def test_uninitialized_settings_raise():
    with pytest.raises(MetadataNotInitializedException):
        Metadata(StringMetadataSettings())


def test_settings_hierarchy():
    e = md().get_entity(1)
    s = e.merged_settings()
    assert s["shared"] == "entity"  # entity wins over connection
    assert s["a"] == "1"  # connection setting visible


def test_processtype_alias_and_roles():
    e = md().get_entity(1)
    assert e.process_strategy == "merge"  # 'delta' alias
    assert e.businesskeys == ["ID"]
    assert e.partition_columns == ["Admin"]
    assert e.calculated_columns == {"Admin": "950"}
    assert e.casts == {"old": "int"}
    assert e.renames == {"old": "new"}


def test_enabled_semantics():
    m = md()
    assert m.get_entity(1).is_enabled()
    assert not m.get_entity(2).is_enabled()  # entity disabled
    assert not m.get_entity(3).is_enabled()  # connection disabled


def test_output_resolution_paths_and_tables():
    e = md().get_entity(1)
    out = e.get_output()
    assert out.bronzepath.kind == "path"
    assert out.bronzepath.value == "/lake/bronze/conn1/person"
    # silver_table setting forces table output for silver layer
    assert out.silverpath.kind == "table"
    assert out.silverpath.value == "silver_db.person"


def test_datatype_parse_table():
    assert parse_datatype("string") == "string"
    assert parse_datatype("integer") == "int"
    assert parse_datatype("timestamp") == "timestamp_ntz"
    assert parse_datatype("decimal(10,2)") == "decimal(10,2)"
    assert parse_datatype("decimal") == "decimal(38,18)"  # default + warn
    assert parse_datatype("wibble") == "string"  # unknown -> string + warn
    assert parse_datatype(None) == "string"


def test_json_sources(tmp_path):
    f = tmp_path / "meta.json"
    f.write_text(json.dumps(CONFIG))
    m = Metadata(JsonMetadataSettings().initialize(str(f)))
    assert m.get_entity(1).name == "person"

    # folder variant deep-merges: entities arrays concatenate
    d = tmp_path / "conf"
    d.mkdir()
    part1 = {"environment": CONFIG["environment"], "connections": CONFIG["connections"],
             "entities": CONFIG["entities"][:1]}
    part2 = {"entities": CONFIG["entities"][1:]}
    (d / "a.json").write_text(json.dumps(part1))
    (d / "b.json").write_text(json.dumps(part2))
    m2 = Metadata(JsonFolderMetadataSettings().initialize(str(d)))
    assert [e.id for e in m2.get_entities()] == [1, 2, 3]


def test_deep_merge_semantics():
    assert deep_merge({"a": {"x": 1}}, {"a": {"y": 2}}) == {"a": {"x": 1, "y": 2}}
    assert deep_merge({"l": [1]}, {"l": [2]}) == {"l": [1, 2]}
    assert deep_merge({"v": 1}, {"v": 2}) == {"v": 2}


def test_datafactory_items():
    m = md()
    items = get_config_items(m, "conn1")
    assert [i["id"] for i in items] == [1]  # only enabled entity+connection
    assert "output" in items[0]
    assert get_config_items(m, [1, 2, 3]) == items
    assert get_config_items(m, 1)[0]["id"] == 1


def test_entity_to_json_roundtrip():
    e = md().get_entity(1)
    j = e.to_json()
    assert j["output"]["silver"] == {"table": "silver_db.person"}
    assert j["columns"][0]["name"] == "ID"


def test_jdbc_metadata_source_end_to_end(spark, tmp_path):
    """JdbcMetadataSettings exercised against a real JDBC database (embedded
    Derby, shipped with Spark): the config JSON is stored in a one-row table
    and fetched through spark.read.format("jdbc"), mirroring the reference's
    SQL Server path (SqlMetadataSettings.scala:27-51) with the store-specific
    query overridden via JDBC options."""
    from datalakefoundation_spark.metadata.sources import JdbcMetadataSettings

    url = f"jdbc:derby:{tmp_path}/cfgdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    cfg_df = spark.createDataFrame([(json.dumps(CONFIG),)], "config string")
    (
        cfg_df.write.format("jdbc")
        .option("url", url)
        .option("driver", driver)
        .option("dbtable", "foundation_config")
        .mode("overwrite")
        .save()
    )

    settings = JdbcMetadataSettings().initialize(
        spark,
        url,
        driver=driver,
        query="SELECT \"config\" FROM foundation_config",
    )
    m = Metadata(settings)
    assert m.get_entity(1).name == "person"
    assert m.environment.timezone == "Europe/Amsterdam"

    with pytest.raises(ValueError, match="no rows"):
        JdbcMetadataSettings().initialize(
            spark,
            url,
            driver=driver,
            query="SELECT \"config\" FROM foundation_config WHERE 1=0",
        )
