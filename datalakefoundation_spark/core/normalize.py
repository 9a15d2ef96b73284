"""Column-name normalization + schema drift detection.

Reference semantics: core/implicits.scala:13-26 (datalakeNormalize — drop
``sys_``-prefixed columns, strip ``[ +-.,;{}()\\n\\t=]+`` from every column
name) and core/implicits.scala:28-59 (datalakeSchemaCompare — name-based
added/removed column detection, warn-only).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_CLEAN_RE = re.compile(r"[ +\-.,;{}()\n\t=]+")


def clean_column_name(name: str) -> str:
    return _CLEAN_RE.sub("", name)


def datalake_normalize(df: DataFrame) -> DataFrame:
    """Drop ``sys_`` columns and scrub invalid characters from names.

    Single ``select`` (one projection node) rather than a fold of
    ``withColumnRenamed`` — identical logical plan result, fewer analyzer
    passes on wide schemas.
    """
    sys_cols = [c for c in df.columns if c.startswith("sys_")]
    if sys_cols:
        df = df.drop(*sys_cols)  # drop matches names literally (dots/spaces safe)
    keep = df.columns
    cleaned = [clean_column_name(c) for c in keep]
    if cleaned != keep:
        df = df.toDF(*cleaned)  # positional rename — no name resolution involved
    return df


def schema_compare(source: DataFrame, target: DataFrame) -> dict[str, list[str]]:
    """Name-based drift: columns added in source / removed from target.

    Warn-only in the reference (Merge.scala:85-89); callers decide what to log.
    """
    src = {f.name for f in source.schema.fields}
    tgt = {f.name for f in target.schema.fields}
    return {
        "added": sorted(src - tgt),
        "removed": sorted(tgt - src),
    }
