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

# Steady-state window policy (r8+, now that every oracle-paired query has had
# at least one driver row — the r1–r7 first-time-verification ledger is done):
#
#   1. PERMANENT RESIDENTS — the data-safety core stays in the window every
#      round: the merge/SCD2/delete-inference family and their metric
#      identities (q_merge_upsert, q_merge_soft_delete*, q_delete_inference,
#      q_scd2_versions, q_scd2_delete_inference, q_merge_metrics,
#      q_scd2_metrics), the pipeline/projection rows that feed them
#      (q_pk_pipeline, q_cast_rename*, q_normalize_names*,
#      q_projection_pipeline*), and the flagship scan/agg rows
#      (q_pricing_summary, q_bookkeeping_aggs*, q_watermark_window*,
#      q_latest_per_key*). These guard writes that destroy data when wrong;
#      a regression there must surface in the SAME round it lands.
#      (* = currently covered via a consolidated row; see strategy/core
#      modules for which named row carries each shape.)
#   2. ROTATING SEATS — every other window seat rotates on
#      LEAST-RECENTLY-DRIVER-VERIFIED: when a query has been driver-green
#      for 2+ consecutive rounds AND its operator shape stays covered by a
#      resident or fresher row, it moves to EXTRA and the stalest
#      EXTRA-resident oracle-paired query (or a newly added one) takes the
#      seat. Ties break toward queries whose code changed this round.
#   3. ELIGIBILITY — only hash-comparable queries occupy window seats. A
#      rows-only query (oracle=None) can never produce anything but
#      `err: no_oracle` in a CORRECTNESS row (r7's q_bpe_token_count), and
#      any result with non-scalar cells errs in the driver's canonicalizer
#      — both shapes are rejected by tools/check_oracle.py and
#      tests/test_oracle_parity.py before they can burn a slot.
#
# Rotation history lives in the EXTRA dict comments of each module; the
# per-round driver ledger is CORRECTNESS_r{N}.json at the repo root.


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
