"""Multi-resolution time-series rollup cascade (the Spark-first analog of
a hypertable's continuous aggregates).

``rollup_cascade`` builds minute/hour/day (or any widening ladder of)
pre-aggregates where every level past the first is computed FROM THE
PREVIOUS LEVEL, not from raw data: the partial-aggregation state
(count / decimal sum / min / max) is chosen to be exactly re-aggregatable,
so the raw table is scanned ONCE no matter how many resolutions are
materialized. At 100 TB that is the difference between one scan + two
tiny shuffles (each level's input is the previous level's output, orders
of magnitude smaller) and one full scan per resolution.

Sums ride as ``decimal(18,4)`` partials (exact, order-independent — the
same trick every oracle-paired sum in this repo uses) and are only cast
to double in ``finalize``; count/min/max re-aggregate exactly by
construction. ``avg`` is derived at finalize time as sum/count, never
stored (a stored avg cannot be re-aggregated).

Each level is one partial-aggregated ``groupBy`` shuffle on
(bucket, key); bucket keys are integer epoch-µs multiples, portable
across engines and streaming-friendly (the tumbling µs bucketing matches
streaming/ops.windowed_counts, so a streaming head can feed the same
ladder).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hook applied to each level as it is built: persist the DataFrame and
# return the persisted read-back (e.g. write parquet + spark.read). With
# it, every coarser level aggregates the MATERIALIZED finer level instead
# of re-executing the finer level's plan once per downstream action —
# this is how a real maintenance job runs the ladder, and it keeps the
# job count proportional to the ladder depth instead of its square.
Materialize = Callable[[int, DataFrame], DataFrame]

MINUTE_US = 60_000_000
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def _bucket(col, width_us: int):
    return (col - (col % F.lit(width_us))).alias("bucket_start_us")


def rollup_cascade(
    df: DataFrame,
    ts_us_col: str = "ts_us",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    resolutions_us: tuple[int, ...] = (MINUTE_US, HOUR_US, DAY_US),
    materialize: Optional[Materialize] = None,
) -> dict[int, DataFrame]:
    """Map resolution(µs) -> pre-aggregate DataFrame with columns
    (bucket_start_us, *key_cols, n_events, sum_dec, min_value, max_value).

    ``resolutions_us`` must be ascending and each must divide the next —
    that is what makes level k+1 computable from level k (every coarse
    bucket is a disjoint union of fine buckets)."""
    for a, b in zip(resolutions_us, resolutions_us[1:]):
        if b % a != 0 or b <= a:
            raise ValueError(
                f"resolutions must be ascending and nested: {a} !| {b}"
            )
    keys = list(key_cols)
    out: dict[int, DataFrame] = {}
    finest = resolutions_us[0]
    level = df.groupBy(
        _bucket(F.col(ts_us_col), finest), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("sum_dec"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    if materialize is not None:
        level = materialize(finest, level)
    out[finest] = level
    for width in resolutions_us[1:]:
        level = _coarsen(level, width, keys)
        if materialize is not None:
            level = materialize(width, level)
        out[width] = level
    return out


def _coarsen(level: DataFrame, width: int, keys: list[str]) -> DataFrame:
    """Re-aggregate one partial-state level into a coarser one."""
    return level.groupBy(
        _bucket(F.col("bucket_start_us"), width), *keys
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize(level: DataFrame) -> DataFrame:
    """User-facing view of one rollup level: exact decimal partial -> double
    sum + derived avg. Keep the partial form when persisting levels that
    will be further re-aggregated (e.g. weekly from daily)."""
    return level.select(
        *[c for c in level.columns if c != "sum_dec"],
        F.col("sum_dec").cast("double").alias("sum_value"),
        (F.col("sum_dec").cast("double") / F.col("n_events")).alias("avg_value"),
    )


def refresh_rollup(
    raw: DataFrame,
    stored: dict[int, DataFrame],
    changed: DataFrame,
    ts_us_col: str = "ts_us",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    prune_time_range: bool = True,
    materialize: Optional[Materialize] = None,
) -> dict[int, DataFrame]:
    """Incrementally maintain a persisted rollup ladder after raw-table
    churn — the continuous-aggregate refresh half of the hypertable analog.

    ``changed`` is any DataFrame carrying the churned rows' ``(ts_us,
    *key_cols)`` — e.g. the union of pre- and post-images from
    ``tables.changes.change_feed``. Because ``min``/``max`` are not
    invertible under deletes, the refresh RECOMPUTES affected groups
    rather than folding ±deltas (the `tables/incremental.py` trick only
    works for count/sum): the affected finest-level (bucket, key) groups
    are re-aggregated from ``raw`` via one broadcast semi-join, then
    each coarser level re-aggregates only its affected buckets from the
    refreshed finer level. Cost at every level ∝ churn, never table size;
    untouched buckets are carried over by anti-join, byte-identical.

    With ``prune_time_range`` (default), the affected buckets' [min, max]
    is collected first (a bounded control-plane read: two longs,
    one job over the small change feed) and applied to ``raw`` as a
    STATIC ``ts BETWEEN`` predicate before the semi-join. Literal bounds
    are what the scan layer can act on: parquet row-group min/max
    skipping on a time-ordered table, partition pruning on a
    time-partitioned one — so typical late-data churn (bounds spanning
    hours) reads a sliver of a 100 TB table instead of all of it.
    Worst-case scattered churn degrades gracefully: the bounds cover the
    full range and the filter selects everything.

    Returns the refreshed ladder (same partial-state schema as
    ``rollup_cascade``); equivalence to a from-scratch rebuild is
    property-tested under inserts, deletes, and updates."""
    keys = list(key_cols)
    resolutions = sorted(stored)
    finest = resolutions[0]
    for a, b in zip(resolutions, resolutions[1:]):
        if b % a != 0:
            raise ValueError(f"stored resolutions must nest: {a} !| {b}")
    affected = changed.select(
        _bucket(F.col(ts_us_col), finest), *keys
    ).distinct()
    # with a materialize hook every action completes inside this call, so
    # the (churn-sized) affected set can be pinned for the ~2 broadcast
    # builds per level and safely released before returning
    pinned = materialize is not None
    if pinned:
        affected = affected.persist()
    try:
        return _refresh_levels(
            raw, stored, affected, resolutions, finest, keys,
            ts_us_col, value_col, prune_time_range, materialize, changed,
        )
    finally:
        if pinned:
            affected.unpersist()


def _refresh_levels(
    raw, stored, affected, resolutions, finest, keys,
    ts_us_col, value_col, prune_time_range, materialize, changed,
) -> dict[int, DataFrame]:
    if prune_time_range:
        # min/max straight off the feed: a partial aggregate (no distinct
        # shuffle), two longs back to the driver
        bounds = changed.agg(
            F.min(ts_us_col).alias("lo"), F.max(ts_us_col).alias("hi")
        ).first()
        if bounds["lo"] is None:  # empty feed: nothing to refresh
            return {w: stored[w] for w in resolutions}
        raw = raw.where(
            (F.col(ts_us_col) >= F.lit(bounds["lo"] - bounds["lo"] % finest))
            & (F.col(ts_us_col) < F.lit(bounds["hi"] - bounds["hi"] % finest + finest))
        )
    fresh_src = raw.join(
        F.broadcast(affected),
        on=[
            raw[ts_us_col] - raw[ts_us_col] % finest
            == affected["bucket_start_us"],
            *[raw[k] == affected[k] for k in keys],
        ],
        how="leftsemi",
    )
    fresh = rollup_cascade(
        fresh_src, ts_us_col, tuple(keys), value_col, (finest,)
    )[finest]
    out: dict[int, DataFrame] = {}
    level = stored[finest].join(
        F.broadcast(affected), on=["bucket_start_us", *keys], how="left_anti"
    ).unionByName(fresh)
    if materialize is not None:
        level = materialize(finest, level)
    out[finest] = level
    prev_affected = affected
    prev_width = finest
    for width in resolutions[1:]:
        affected_w = prev_affected.select(
            _bucket(F.col("bucket_start_us"), width), *keys
        ).distinct()
        # recompute the affected coarse groups from the REFRESHED finer
        # level (all finer buckets inside an affected coarse bucket, not
        # only the churned ones — the coarse group must re-aggregate its
        # full extent)
        fine_in = out[prev_width].alias("f").join(
            F.broadcast(affected_w).alias("c"),
            on=[
                F.col("f.bucket_start_us") - F.col("f.bucket_start_us") % width
                == F.col("c.bucket_start_us"),
                *[F.col(f"f.{k}") == F.col(f"c.{k}") for k in keys],
            ],
            how="leftsemi",
        )
        fresh_w = _coarsen(fine_in, width, keys)
        level = stored[width].join(
            F.broadcast(affected_w), on=["bucket_start_us", *keys], how="left_anti"
        ).unionByName(fresh_w)
        if materialize is not None:
            level = materialize(width, level)
        out[width] = level
        prev_affected = affected_w
        prev_width = width
    return out


def build_rollup_lake(
    raw: DataFrame,
    tables: dict[int, "LakeTable"],  # noqa: F821 — duck-typed, no import cycle
    ts_us_col: str = "ts_us",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> None:
    """Initial materialization of the ladder into LakeTables — one
    full-overwrite commit per level, raw scanned once (cascade chaining)."""
    for width, level in rollup_cascade(
        raw, ts_us_col, key_cols, value_col, tuple(sorted(tables))
    ).items():
        tables[width].overwrite(level, operation="rollup_build")


def refresh_rollup_lake(
    raw: DataFrame,
    tables: dict[int, "LakeTable"],  # noqa: F821
    changed: DataFrame,
    ts_us_col: str = "ts_us",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    prune_time_range: bool = True,
) -> dict[int, dict]:
    """Maintain a rollup ladder persisted as LakeTables with WRITE cost
    O(churn): recomputed groups land as a merge-on-read patch
    (``merge_patch`` appends them and deletion-vector-masks the superseded
    group versions) and fully-vanished groups are removed with a
    DV-only ``delete_keys`` commit — untouched group rows are never
    rewritten, unlike ``refresh_rollup``'s carry-over union, which
    rewrites each whole level per refresh. At 100 TB the minute level is
    itself billions of rows; this is the difference between a refresh
    that writes megabytes and one that rewrites the level.

    Each coarser level re-aggregates its affected buckets from the finer
    LEVEL TABLE (already refreshed this call), so raw is scanned once,
    time-range-pruned as in ``refresh_rollup``. Patch segments and DV
    refs accumulate across refreshes — run ``tables[w].optimize()`` on
    the usual MoR compaction cadence.

    Returns per-level ``{"patched": n, "deleted": m}`` commit metrics."""
    keys = list(key_cols)
    resolutions = sorted(tables)
    finest = resolutions[0]
    for a, b in zip(resolutions, resolutions[1:]):
        if b % a != 0:
            raise ValueError(f"table resolutions must nest: {a} !| {b}")
    metrics: dict[int, dict] = {}
    if prune_time_range:
        bounds = changed.agg(
            F.min(ts_us_col).alias("lo"), F.max(ts_us_col).alias("hi")
        ).first()
        if bounds["lo"] is None:  # empty feed
            return {w: {"patched": 0, "deleted": 0} for w in resolutions}
        raw = raw.where(
            (F.col(ts_us_col) >= F.lit(bounds["lo"] - bounds["lo"] % finest))
            & (F.col(ts_us_col) < F.lit(bounds["hi"] - bounds["hi"] % finest + finest))
        )
    affected = changed.select(
        _bucket(F.col(ts_us_col), finest), *keys
    ).distinct().persist()
    try:
        fresh_src = raw.join(
            F.broadcast(affected),
            on=[
                raw[ts_us_col] - raw[ts_us_col] % finest
                == affected["bucket_start_us"],
                *[raw[k] == affected[k] for k in keys],
            ],
            how="leftsemi",
        )
        fresh = rollup_cascade(
            fresh_src, ts_us_col, tuple(keys), value_col, (finest,)
        )[finest]
        affected_w = affected
        for i, width in enumerate(resolutions):
            if i > 0:
                prev = affected_w
                affected_w = prev.select(
                    _bucket(F.col("bucket_start_us"), width), *keys
                ).distinct()
                fine = tables[resolutions[i - 1]].read().alias("f")
                fine_in = fine.join(
                    F.broadcast(affected_w).alias("c"),
                    on=[
                        F.col("f.bucket_start_us")
                        - F.col("f.bucket_start_us") % width
                        == F.col("c.bucket_start_us"),
                        *[F.col(f"f.{k}") == F.col(f"c.{k}") for k in keys],
                    ],
                    how="leftsemi",
                )
                fresh = _coarsen(fine_in, width, keys)
            fresh = fresh.persist()
            try:
                # every recomputed row masks any prior version of its group;
                # for brand-new groups the mask matches nothing (DV carries
                # the key but removes no row) — correct, churn-bounded bloat
                from ..tables.lake_table import MASK_COL  # local: no cycle at import time

                n_patched = tables[width].merge_patch(
                    fresh.withColumn(MASK_COL, F.lit(True)),
                    keys=["bucket_start_us", *keys],
                    mask_col=MASK_COL,
                    operation="rollup_refresh",
                )
                vanished = affected_w.join(
                    fresh, on=["bucket_start_us", *keys], how="left_anti"
                ).persist()
                try:
                    n_deleted = vanished.count()
                    if n_deleted:
                        tables[width].delete_keys(
                            vanished, ["bucket_start_us", *keys]
                        )
                finally:
                    vanished.unpersist()
            finally:
                fresh.unpersist()
            metrics[width] = {"patched": n_patched, "deleted": n_deleted}
    finally:
        affected.unpersist()
    return metrics
