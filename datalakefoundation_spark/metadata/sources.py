"""Metadata settings sources: string / file / folder (deep-merged).

Reference: StringMetadataSettings.scala:7-17, JsonMetadataSettings.scala:8-15,
JsonFolderMetadataSettings.scala:17-33 (deep-merge of all *.json in a folder —
objects merged recursively, arrays concatenated, per
docs/configuration/METADATA_SOURCES.md:129).

The JDBC SQL Server source (SqlMetadataSettings.scala) is represented by
``JdbcMetadataSettings`` which builds the same one-row config query through
``spark.read.format("jdbc")`` — it requires a JDBC driver jar on the
classpath, so it raises a clear error when used without one.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


def deep_merge(a: Any, b: Any) -> Any:
    """json4s-style merge: dicts recursively, lists concatenated, b wins scalars."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(a[k], v) if k in a else v
        return out
    if isinstance(a, list) and isinstance(b, list):
        return a + b
    return b


class _BaseSettings:
    def __init__(self) -> None:
        self._parsed: dict | None = None

    def is_initialized(self) -> bool:
        return self._parsed is not None

    def parsed(self) -> dict:
        if self._parsed is None:
            from datalakefoundation_spark.core.exceptions import (
                MetadataNotInitializedException,
            )

            raise MetadataNotInitializedException("settings not initialized")
        return self._parsed


class StringMetadataSettings(_BaseSettings):
    def initialize(self, json_string: str) -> "StringMetadataSettings":
        self._parsed = json.loads(json_string)
        return self


class JsonMetadataSettings(_BaseSettings):
    def initialize(self, path: str) -> "JsonMetadataSettings":
        self._parsed = json.loads(Path(path).read_text())
        return self


class JsonFolderMetadataSettings(_BaseSettings):
    def initialize(self, folder: str) -> "JsonFolderMetadataSettings":
        merged: dict = {}
        files = sorted(Path(folder).glob("*.json"))
        if not files:
            raise FileNotFoundError(f"no *.json files in {folder}")
        for f in files:
            merged = deep_merge(merged, json.loads(f.read_text()))
        self._parsed = merged
        return self


class JdbcMetadataSettings(_BaseSettings):
    """SQL Server config source (SqlMetadataSettings.scala:27-51):
    one-row query ``SELECT config FROM cfg.fnGetFoundationConfig()``."""

    QUERY = "SELECT config FROM cfg.fnGetFoundationConfig()"

    def initialize(self, spark, jdbc_url: str, **options: str) -> "JdbcMetadataSettings":
        reader = (
            spark.read.format("jdbc")
            .option("url", jdbc_url)
            .option("query", self.QUERY)
        )
        for k, v in options.items():
            reader = reader.option(k, v)
        row = reader.load().head()
        if row is None:
            raise ValueError("JDBC metadata query returned no rows")
        self._parsed = json.loads(row[0])
        return self
