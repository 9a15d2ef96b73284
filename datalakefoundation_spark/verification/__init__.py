"""Oracle-verified query registry.

Each module exposes ``QUERIES: dict[name -> (callable, oracle_sql | None)]``
where the callable is ``(spark, sf_dir) -> DataFrame`` and the oracle is the
equivalent DuckDB SQL over the same parquet tables. Column names are aliased
identically on both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from datalakefoundation_spark.verification import (
        core_queries,
        ext_queries,
        strategy_queries,
    )

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (core_queries, strategy_queries, ext_queries):
        for name, pair in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = pair
    return merged
