"""The 12-step column transformation pipeline (P1-P12).

Reference semantics: Processing.scala:94-105 applies, in this exact order:

  1. injectTransformations   (P1, Processing.scala:280-287)
  2. addCalculatedColumns    (P2, Processing.scala:259-272)
  3. calculateSourceHash     (P3, Processing.scala:168-182)
  4. addTemporalTracking     (P4, Processing.scala:214-222, Historic only)
  5. addFilenameColumn       (P5, Processing.scala:289-310)
  6. addPrimaryKey           (P6, Processing.scala:184-205)
  7. castColumns             (P7, Processing.scala:225-233)
  8. renameColumns           (P8, Processing.scala:236-244)
  9. addDeletedColumn        (P9, Processing.scala:248-253)
 10. addLastSeen             (P10, Processing.scala:256-257)
 11. datalakeNormalize       (P11, core/implicits.scala:13-26)
 12. cache + empty check     (P12, Processing.scala:106-111)

Every step is a pure ``DataFrame -> DataFrame`` function building ONE lazy
logical plan — no actions until the caller's cache/isEmpty. All expressions
are JVM-side built-ins (sha2/concat_ws/cast/expr); there are no Python UDFs
anywhere in this pipeline, so the whole chain stays inside whole-stage
codegen and Catalyst collapses the fold of projections into a single
physical Project over the scan.
"""

from __future__ import annotations

import logging
from typing import Iterable, Mapping, Sequence

logger = logging.getLogger(__name__)

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalakefoundation_spark.core.exceptions import (
    CalculatedColumnException,
    DuplicateBusinesskeyException,
)
from datalakefoundation_spark.core.normalize import datalake_normalize

# Historic open-version sentinel. The reference stores
# lit("2999-12-31").cast(TimestampType) = midnight (Processing.scala:218),
# so the on-disk value must be 00:00:00 for cross-system comparison.
VALID_TO_SENTINEL = "2999-12-31 00:00:00"

# All engine-produced timestamps are TIMESTAMP_NTZ: parsing a literal string to
# NTZ is session-timezone-independent, so results are reproducible regardless
# of the harness session's spark.sql.session.timeZone (the reference used
# TimestampType; for naive inputs the semantics are identical).
TIMESTAMP_TYPE = "timestamp_ntz"


def ts_lit(value: str) -> Column:
    """A timezone-independent timestamp literal."""
    return F.lit(value).cast(TIMESTAMP_TYPE)


# ---------------------------------------------------------------- P1
def inject_transformations(df: DataFrame, transformations: Iterable[Sequence[str]]) -> DataFrame:
    """Fold of ``df.selectExpr(*exprs)`` per transformation (arbitrary SQL
    projections from metadata)."""
    for exprs in transformations:
        exprs = list(exprs)
        if exprs:
            df = df.selectExpr(*exprs)
    return df


# ---------------------------------------------------------------- P2
def add_calculated_columns(df: DataFrame, calculated: Mapping[str, str]) -> DataFrame:
    """``withColumn(name, expr(e))`` per metadata column carrying an
    expression; invalid expression is fatal with column+expr context."""
    for name, expression in calculated.items():
        try:
            df = df.withColumn(name, F.expr(expression))
        except Exception as exc:  # AnalysisException / ParseException
            raise CalculatedColumnException(
                f"Error in calculated field: {name} expression: {expression}"
            ) from exc
    return df


# ---------------------------------------------------------------- P3
def source_hash_column(columns: Sequence[str]) -> Column:
    """sha2(concat_ws('', all given cols cast to string), 256).

    NOTE concat_ws skips NULLs (both in Spark and in the DuckDB oracle),
    matching the reference exactly (Processing.scala:178).
    """
    return F.sha2(F.concat_ws("", *[F.col(c).cast("string") for c in columns]), 256)


def calculate_source_hash(df: DataFrame, prefix: str = "") -> DataFrame:
    """Add ``{prefix}SourceHash`` over all non-system columns, if absent."""
    name = f"{prefix}SourceHash"
    if name in df.columns:
        return df
    payload = [c for c in df.columns if not _is_system(c, prefix)]
    return df.withColumn(name, source_hash_column(payload))


def _is_system(col: str, prefix: str) -> bool:
    """Columns excluded from the SourceHash payload.

    The reference excludes ONLY ``{prefix}source_filename`` and
    ``{prefix}metadata`` (Processing.scala calculateSourceHash; the
    SourceHash guard is its hasColumn early-return). Anything else the
    bronze source carries — including a ``deleted`` flag, prefixed business
    columns, or a source system's own ``PK_*``-named column — must hash, or
    changes to it would never propagate through the merge (e.g. deleted
    flipping back to false would land in the 'touch' clause and the record
    would never resurrect). The entity's own ``PK_<destination>`` cannot
    appear here: it is added at P6, after the hash (P3).
    """
    return col in {
        f"{prefix}SourceHash",
        f"{prefix}source_filename",
        f"{prefix}metadata",
    }


# ---------------------------------------------------------------- P4
def add_temporal_tracking_columns(
    df: DataFrame, processing_time: str, prefix: str = ""
) -> DataFrame:
    """Historic only: ValidFrom=processingTime, ValidTo=2999-12-31, IsCurrent=true."""
    return (
        df.withColumn(f"{prefix}ValidFrom", ts_lit(processing_time))
        .withColumn(f"{prefix}ValidTo", ts_lit(VALID_TO_SENTINEL))
        .withColumn(f"{prefix}IsCurrent", F.lit(True))
    )


# ---------------------------------------------------------------- P5
def add_filename_column(
    df: DataFrame, slice_name: str, prefix: str = "", filter_to_slice: bool = False
) -> DataFrame:
    """Add ``{p}source_filename = lit(slice)``; when bronze is a catalog
    table the same column is instead the slice *filter* (Processing.scala:289-310)."""
    name = f"{prefix}source_filename"
    if filter_to_slice and name in df.columns:
        return df.where(F.col(name) == F.lit(slice_name))
    if filter_to_slice:
        # catalog bronze lacking the filter column: the reference warns,
        # stamps the literal, and the subsequent filter matches every row —
        # i.e. the WHOLE table is processed as this slice
        # (Processing.scala:289-310). Keep the behavior, surface the warning.
        logger.warning(
            "bronze table is missing column %r for slice filtering; stamping "
            "%r on all rows — the entire table will be processed as this slice",
            name, slice_name,
        )
    return df.withColumn(name, F.lit(slice_name))


# ---------------------------------------------------------------- P6
def business_pk_column(businesskeys: Sequence[str]) -> Column:
    """PK = sha2(concat_ws('_', businesskey cols), 256) (Processing.scala:185-190)."""
    return F.sha2(F.concat_ws("_", *[F.col(c).cast("string") for c in businesskeys]), 256)


def check_duplicate_keys(
    df: DataFrame,
    destination: str,
    businesskeys: Sequence[str],
    pk_col: str | None = None,
) -> None:
    """Duplicate-key guard ACTION (Processing.scala:191-199), grouped by the
    PK *value* rather than the raw key columns: a superset of the
    reference's check that additionally aborts on concat_ws collisions —
    distinct keys like ('a_b','c') vs ('a','b_c'), or NULL-skips ('a',NULL)
    vs (NULL,'a'), map to one PK and would silently fan out the merge join
    if only the raw columns were compared.

    Best run on the already-cached slice (one groupBy over the cache);
    pass ``pk_col`` to reuse an existing PK column instead of recomputing.
    """
    if not businesskeys:
        return
    key = F.col(pk_col) if pk_col else business_pk_column(businesskeys)
    sample_keys = [c for c in businesskeys if c in df.columns]
    dupes = (
        df.groupBy(key.alias("__pk"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *([F.first(F.struct(*sample_keys)).alias("__sample")] if sample_keys else []),
        )
        .where(F.col("cnt") > 1)
    )
    bad = dupes.limit(20).collect()
    if bad:
        shown = ", ".join(
            str(r["__sample"].asDict() if "__sample" in r else r["__pk"]) for r in bad[:5]
        )
        raise DuplicateBusinesskeyException(
            f"Duplicate businesskeys in slice for {destination}: {shown}"
        )


def add_primary_key(
    df: DataFrame,
    destination: str,
    businesskeys: Sequence[str],
    check_duplicates: bool = True,
) -> DataFrame:
    """Add ``PK_<destination>``; optionally guard against duplicate keys.

    The duplicate guard is an extra groupBy+count ACTION. At 100 TB keep it
    available but optional (``check_duplicates=False``), or — as
    Processing does — defer it and run ``check_duplicate_keys`` on the
    already-cached slice so bronze and the P1-P5 transforms aren't scanned
    a second time just for the guard.
    """
    if not businesskeys:
        return df
    if check_duplicates:
        check_duplicate_keys(df, destination, businesskeys)
    return df.withColumn(f"PK_{destination}", business_pk_column(businesskeys))


# ---------------------------------------------------------------- P7
def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Fold of ``withColumn(name, col.cast(t))`` per declared datatype."""
    for name, dtype in casts.items():
        if name in df.columns:
            df = df.withColumn(name, F.col(name).cast(dtype))
    return df


# ---------------------------------------------------------------- P8
def rename_columns(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """Fold of ``withColumnRenamed(old, new)`` where new != ''."""
    for old, new in renames.items():
        if new and old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


# ---------------------------------------------------------------- P9
def add_deleted_column(df: DataFrame, prefix: str = "") -> DataFrame:
    name = f"{prefix}deleted"
    if name in df.columns:
        return df
    return df.withColumn(name, F.lit(False).cast("boolean"))


# ---------------------------------------------------------------- P10
def add_last_seen(df: DataFrame, processing_time: str, prefix: str = "") -> DataFrame:
    return df.withColumn(f"{prefix}lastSeen", ts_lit(processing_time))


# ---------------------------------------------------------------- compose
def apply_pipeline(
    df: DataFrame,
    *,
    destination: str,
    businesskeys: Sequence[str] = (),
    transformations: Iterable[Sequence[str]] = (),
    calculated: Mapping[str, str] | None = None,
    casts: Mapping[str, str] | None = None,
    renames: Mapping[str, str] | None = None,
    slice_name: str | None = None,
    processing_time: str = "1970-01-01 00:00:00",
    prefix: str = "",
    historic: bool = False,
    bronze_is_table: bool = False,
    check_duplicates: bool = True,
) -> DataFrame:
    """P1..P11 in the reference's exact order. One lazy plan; caller caches."""
    df = inject_transformations(df, transformations)
    df = add_calculated_columns(df, calculated or {})
    df = calculate_source_hash(df, prefix)
    if historic:
        df = add_temporal_tracking_columns(df, processing_time, prefix)
    if slice_name is not None:
        df = add_filename_column(df, slice_name, prefix, filter_to_slice=bronze_is_table)
    df = add_primary_key(df, destination, businesskeys, check_duplicates)
    df = cast_columns(df, casts or {})
    df = rename_columns(df, renames or {})
    df = add_deleted_column(df, prefix)
    df = add_last_seen(df, processing_time, prefix)
    df = datalake_normalize(df)
    return df
