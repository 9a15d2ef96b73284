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


# The driver verifies at most this many registry rows per round (r1 and r2
# both produced exactly the first 50 keys); anything past the window never
# gets a CORRECTNESS row, so the registry must stay within it.
DRIVER_WINDOW = 50


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from datalakefoundation_spark.verification import (
        analytics_queries,
        core_queries,
        ext_queries,
        strategy_queries,
    )

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (core_queries, strategy_queries, ext_queries, analytics_queries):
        for name, pair in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = pair
    if len(merged) > DRIVER_WINDOW:
        raise ValueError(
            f"registry has {len(merged)} queries; the driver only verifies the "
            f"first {DRIVER_WINDOW} — consolidate (see core_queries.EXTRA) "
            "instead of letting queries fall off the end unverified"
        )
    return merged


def extra_queries() -> dict[str, tuple[QueryFn, str | None]]:
    """Oracle-paired queries deliberately outside the driver's 50-row window.

    Their operators are covered in the registry by consolidated queries
    (see ``core_queries.EXTRA``); these remain runnable for the benchmark
    and the local parity gates (tests/test_oracle_parity.py and
    tools/check_oracle.py, both of which include them unconditionally)."""
    from datalakefoundation_spark.verification import (
        core_queries,
        ext_queries,
        strategy_queries,
    )

    from datalakefoundation_spark.verification import analytics_queries

    merged: dict[str, tuple[QueryFn, str | None]] = dict(core_queries.EXTRA)
    merged.update(strategy_queries.EXTRA)
    merged.update(ext_queries.EXTRA)
    merged.update(analytics_queries.EXTRA)
    overlap = set(merged) & set(all_queries())
    if overlap:
        raise ValueError(f"extra queries shadow registry entries: {sorted(overlap)}")
    return merged
