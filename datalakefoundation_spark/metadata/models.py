"""Metadata object model (SURVEY.md §1.1).

JSON-config-compatible with the reference (same field names — see
src/test/scala/example/metadata.json): environment / connections /
entities, with entities carrying columns (fieldroles businesskey /
partition / calculated), watermarks, settings, and transformations.

Settings precedence: environment < connection < entity
(Entity.scala:124-127). Datatype parse table: EntityColumn.scala:49-80
including the decimal(38,18) default and unknown->string fallback.
"""

from __future__ import annotations

import datetime as _dt
import logging
import re
from dataclasses import dataclass, field
from typing import Any

from datalakefoundation_spark.core.exceptions import (
    DatalakeException,
    EntityNotFoundException,
)
from datalakefoundation_spark.core.expressions import substitute

logger = logging.getLogger(__name__)


def parse_datatype(name: str | None) -> str:
    """Metadata datatype string -> Spark SQL type string (EntityColumn.scala:49-80)."""
    if not name:
        return "string"
    s = name.strip().lower()
    table = {
        "string": "string",
        "integer": "int",
        "int": "int",
        "long": "long",
        "date": "date",
        "timestamp": "timestamp_ntz",
        "float": "float",
        "double": "double",
        "boolean": "boolean",
    }
    if s in table:
        return table[s]
    m = re.fullmatch(r"decimal(?:\((\d+)\s*,\s*(\d+)\))?", s)
    if m:
        if m.group(1) is None:
            logger.warning("decimal without precision/scale; defaulting to decimal(38,18)")
            return "decimal(38,18)"
        return f"decimal({m.group(1)},{m.group(2)})"
    logger.warning("unknown datatype %r; falling back to string", name)
    return "string"


@dataclass
class EntityColumn:
    name: str = ""
    newname: str = ""
    datatype: str | None = None
    fieldroles: list[str] = field(default_factory=list)
    expression: str | None = None

    @property
    def is_businesskey(self) -> bool:
        return "businesskey" in self.fieldroles

    @property
    def is_partition(self) -> bool:
        return "partition" in self.fieldroles

    @property
    def is_calculated(self) -> bool:
        return "calculated" in self.fieldroles

    @property
    def effective_name(self) -> str:
        """Post-rename name (calculated columns are created under newname)."""
        return self.newname or self.name

    @classmethod
    def from_json(cls, obj: dict) -> "EntityColumn":
        return cls(
            name=obj.get("name", "") or "",
            newname=obj.get("newname", "") or "",
            datatype=obj.get("datatype"),
            fieldroles=list(obj.get("fieldroles", []) or []),
            expression=obj.get("expression"),
        )


@dataclass
class Watermark:
    entity_id: int
    column_name: str
    expression: str = "'${last_value}'"
    operation: str = "and"
    operation_group: int = 0

    @classmethod
    def from_json(cls, entity_id: int, obj: dict) -> "Watermark":
        return cls(
            entity_id=entity_id,
            column_name=obj["column_name"],
            expression=obj.get("expression", "'${last_value}'"),
            operation=obj.get("operation", "and"),
            operation_group=int(obj.get("operation_group", 0)),
        )


@dataclass
class EntityTransformation:
    expressions: list[str] = field(default_factory=list)

    @classmethod
    def from_json(cls, obj) -> "EntityTransformation":
        if isinstance(obj, dict):
            return cls(expressions=list(obj.get("expressions", []) or []))
        if isinstance(obj, list):
            return cls(expressions=[str(x) for x in obj])
        return cls(expressions=[str(obj)])


@dataclass
class Connection:
    name: str
    enabled: bool = True
    settings: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_json(cls, obj: dict) -> "Connection":
        return cls(
            name=obj["name"],
            enabled=bool(obj.get("enabled", True)),
            settings=dict(obj.get("settings", {}) or {}),
        )


@dataclass
class Environment:
    name: str = "default"
    timezone: str = "UTC"
    root_folder: str = ""
    raw_path: str = "/${connection}/${entity}"
    bronze_path: str = "/${connection}/${entity}"
    silver_path: str = "/${connection}/${destination}"
    systemfield_prefix: str = ""
    output: str = "paths"  # "paths" | "catalog"
    # log subsystem config (Environment.scala:27-29,95-104): level default
    # WARN, appender "parquet" | "table", output path/table name
    log_level: str = "WARN"
    log_appender_type: str = "parquet"
    log_output: str = ""
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_json(cls, obj: dict) -> "Environment":
        known = {f for f in cls.__dataclass_fields__ if f != "extra"}  # type: ignore[attr-defined]
        kwargs = {k: v for k, v in obj.items() if k in known}
        extra = {k: v for k, v in obj.items() if k not in known}
        return cls(**kwargs, extra=extra)

    def now(self) -> _dt.datetime:
        """Naive 'now' in the configured timezone (Environment.scala:42-43):
        SCD2 ValidFrom/lastSeen stamps must reflect the deployment's zone,
        not the driver host's."""
        try:
            from zoneinfo import ZoneInfo

            return _dt.datetime.now(ZoneInfo(self.timezone)).replace(tzinfo=None)
        except Exception:
            return _dt.datetime.now()

    def today(self) -> str:
        return self.now().date().isoformat()


@dataclass
class OutputLocation:
    """PathLocation | TableLocation (metadata/OutputMethod.scala:4-18)."""

    kind: str  # "path" | "table"
    value: str


@dataclass
class Output:
    rawpath: OutputLocation
    bronzepath: OutputLocation
    silverpath: OutputLocation


@dataclass
class Entity:
    id: int
    name: str
    enabled: bool = True
    connection: str = ""
    processtype: str = "merge"
    group: str = ""
    destination_override: str = ""
    columns: list[EntityColumn] = field(default_factory=list)
    watermarks: list[Watermark] = field(default_factory=list)
    transformations: list[EntityTransformation] = field(default_factory=list)
    settings: dict[str, Any] = field(default_factory=dict)
    _metadata: "Metadata | None" = field(default=None, repr=False, compare=False)

    @classmethod
    def from_json(cls, obj: dict) -> "Entity":
        eid = int(obj["id"])
        return cls(
            id=eid,
            name=obj["name"],
            enabled=bool(obj.get("enabled", True)),
            connection=obj.get("connection", ""),
            processtype=str(obj.get("processtype", "merge")).lower(),
            group=obj.get("group", "") or "",
            destination_override=obj.get("destination", "") or "",
            columns=[EntityColumn.from_json(c) for c in obj.get("columns", []) or []],
            watermarks=[
                Watermark.from_json(eid, w) for w in obj.get("watermark", []) or []
            ],
            transformations=[
                EntityTransformation.from_json(t)
                for t in obj.get("transformations", []) or []
            ],
            settings=dict(obj.get("settings", {}) or {}),
        )

    # ------------------------------------------------------------ derived
    @property
    def destination(self) -> str:
        return self.destination_override or self.name

    def reset_watermark(self, spark, column_name: str, to_value: str | None = None) -> None:
        """Clear (or rewind to ``to_value``) this entity's stored bookmark
        for ``column_name`` — Entity.ResetWatermark(columnName[, toValue])
        (Entity.scala:286-296). The next incremental run re-reads from
        scratch (None) or from the given value."""
        from datalakefoundation_spark.watermark import WatermarkStore

        env = self._metadata.environment
        WatermarkStore(spark, env.root_folder).reset(self.id, column_name, to_value)

    @property
    def process_strategy(self) -> str:
        """'delta' is a legacy alias for merge (Entity.scala:113-122)."""
        pt = self.processtype
        if pt in ("merge", "delta"):
            return "merge"
        if pt in ("full", "historic"):
            return pt
        raise DatalakeException(f"unknown processtype: {self.processtype}")

    @property
    def businesskeys(self) -> list[str]:
        return [c.effective_name for c in self.columns if c.is_businesskey]

    @property
    def partition_columns(self) -> list[str]:
        return [c.effective_name for c in self.columns if c.is_partition]

    @property
    def calculated_columns(self) -> dict[str, str]:
        return {
            c.effective_name: c.expression or ""
            for c in self.columns
            if c.is_calculated and c.expression
        }

    @property
    def casts(self) -> dict[str, str]:
        """Declared datatype per ORIGINAL column name (cast happens pre-rename)."""
        return {
            c.name: parse_datatype(c.datatype)
            for c in self.columns
            if c.datatype and c.name
        }

    @property
    def renames(self) -> dict[str, str]:
        return {c.name: c.newname for c in self.columns if c.newname and c.name}

    def is_enabled(self) -> bool:
        """Entity AND its connection must be enabled (Entity.scala:81-82)."""
        if not self.enabled:
            return False
        if self._metadata and self.connection:
            conn = self._metadata.get_connection(self.connection)
            return conn.enabled if conn else False
        return True

    def merged_settings(self) -> dict[str, Any]:
        """env.extra < connection.settings < entity.settings (Entity.scala:124-127)."""
        merged: dict[str, Any] = {}
        if self._metadata:
            merged.update(self._metadata.environment.extra)
            conn = self._metadata.get_connection(self.connection)
            if conn:
                merged.update(conn.settings)
        merged.update(self.settings)
        return merged

    def template_variables(self) -> dict[str, str]:
        env = self._metadata.environment if self._metadata else Environment()
        variables = {
            "today": env.today(),
            "entity": self.name,
            "destination": self.destination,
            "connection": self.connection,
        }
        for k, v in self.merged_settings().items():
            if isinstance(v, (str, int, float, bool)):
                variables[f"settings_{k}"] = str(v)
        return variables

    def get_output(self) -> Output:
        """Resolve raw/bronze/silver locations: per-layer path or table
        overrides from settings, else environment templates
        (Entity.scala:129-192)."""
        env = self._metadata.environment if self._metadata else Environment()
        settings = self.merged_settings()
        variables = self.template_variables()

        def _loc(layer: str, template: str) -> OutputLocation:
            table_key = f"{layer}_table"
            path_key = f"{layer}_path"
            if env.output == "catalog" or table_key in settings:
                tbl = settings.get(table_key, f"{layer}.{self.destination}")
                return OutputLocation("table", substitute(str(tbl), variables))
            rel = settings.get(path_key, template)
            path = f"{env.root_folder}/{layer}{substitute(str(rel), variables)}"
            return OutputLocation("path", re.sub(r"(?<!:)//+", "/", path))

        return Output(
            rawpath=_loc("raw", env.raw_path),
            bronzepath=_loc("bronze", env.bronze_path),
            silverpath=_loc("silver", env.silver_path),
        )

    def to_json(self) -> dict:
        """Round-trip including the resolved output node (Entity.scala:328-375)."""
        out = self.get_output()
        return {
            "id": self.id,
            "name": self.name,
            "enabled": self.enabled,
            "connection": self.connection,
            "processtype": self.processtype,
            "group": self.group,
            "columns": [
                {
                    "name": c.name,
                    "newname": c.newname,
                    "datatype": c.datatype,
                    "fieldroles": c.fieldroles,
                    "expression": c.expression,
                }
                for c in self.columns
            ],
            "watermark": [
                {
                    "column_name": w.column_name,
                    "expression": w.expression,
                    "operation": w.operation,
                    "operation_group": w.operation_group,
                }
                for w in self.watermarks
            ],
            "transformations": [t.expressions for t in self.transformations],
            "settings": self.settings,
            "output": {
                "raw": {out.rawpath.kind: out.rawpath.value},
                "bronze": {out.bronzepath.kind: out.bronzepath.value},
                "silver": {out.silverpath.kind: out.silverpath.value},
            },
        }


class Metadata:
    """Parsed metadata store: entities by id, connections by name, environment.

    Unlike the reference's lazy per-call json4s extraction
    (DatalakeMetadataSettings.scala:72-76), everything is parsed once.
    """

    def __init__(self, settings) -> None:
        if not settings.is_initialized():
            from datalakefoundation_spark.core.exceptions import (
                MetadataNotInitializedException,
            )

            raise MetadataNotInitializedException("metadata settings not initialized")
        parsed = settings.parsed()
        self.environment = Environment.from_json(parsed.get("environment", {}) or {})
        self.connections = {
            c["name"]: Connection.from_json(c) for c in parsed.get("connections", []) or []
        }
        self._entities: dict[int, Entity] = {}
        self._entity_order: list[int] = []
        from datalakefoundation_spark.core.exceptions import DuplicateEntityIdException

        for obj in parsed.get("entities", []) or []:
            e = Entity.from_json(obj)
            if e.id in self._entities:
                raise DuplicateEntityIdException(f"duplicate entity id: {e.id}")
            e._metadata = self
            self._entities[e.id] = e
            self._entity_order.append(e.id)

    def get_entity(self, entity_id: int) -> Entity:
        if entity_id not in self._entities:
            raise EntityNotFoundException(f"entity {entity_id} not found")
        return self._entities[entity_id]

    def get_entities(
        self,
        *,
        connection: str | None = None,
        group: str | None = None,
        ids: list[int] | None = None,
    ) -> list[Entity]:
        """Order-preserving filtered lookup (DatalakeMetadataSettingsSpec)."""
        out = []
        for eid in self._entity_order:
            e = self._entities[eid]
            if connection is not None and e.connection != connection:
                continue
            if group is not None and e.group != group:
                continue
            if ids is not None and e.id not in ids:
                continue
            out.append(e)
        return out

    def get_connection(self, name: str) -> Connection | None:
        return self.connections.get(name)
