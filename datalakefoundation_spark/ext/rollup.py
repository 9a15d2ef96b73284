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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    out[finest] = level
    for width in resolutions_us[1:]:
        level = level.groupBy(
            _bucket(F.col("bucket_start_us"), width), *keys
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out[width] = level
    return out


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
) -> dict[int, DataFrame]:
    """Incrementally maintain a persisted rollup ladder after raw-table
    churn — the continuous-aggregate refresh half of the hypertable analog.

    ``changed`` is any DataFrame carrying the churned rows' ``(ts_us,
    *key_cols)`` — e.g. the union of pre- and post-images from
    ``tables.changes.change_feed``. Because ``min``/``max`` are not
    invertible under deletes, the refresh RECOMPUTES affected groups
    rather than folding ±deltas (the `tables/incremental.py` trick only
    works for count/sum): the affected finest-level (bucket, key) groups
    are re-aggregated from ``raw`` via one broadcast semi-join (at 100 TB
    this scan is partition-pruned to the touched time range — the bucket
    key IS the partition key of a time-partitioned events table), then
    each coarser level re-aggregates only its affected buckets from the
    refreshed finer level. Cost at every level ∝ churn, never table size;
    untouched buckets are carried over by anti-join, byte-identical.

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
        fresh_w = fine_in.groupBy(
            _bucket(F.col("bucket_start_us"), width), *keys
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        level = stored[width].join(
            F.broadcast(affected_w), on=["bucket_start_us", *keys], how="left_anti"
        ).unionByName(fresh_w)
        out[width] = level
        prev_affected = affected_w
        prev_width = width
    return out
