"""Temporal joins Spark lacks as built-ins — as-of join.

The reference engine has no temporal-join surface; this is part of the
100 TB extension goals (event streams joined to slowly-updating reference
series: trades→quotes, events→feature snapshots, logs→deploy markers).

Spark-first formulation: an as-of join is NOT expressed as a range join
(``l.ts >= r.ts`` alone explodes to all earlier rows per key before a
per-row argmax — quadratic in the per-key history). Instead both sides
union into one stream, one shuffle on the key, one event-time sort, and a
running ``last(right_row, ignorenulls=true)`` window carries the most
recent right row forward onto every left row — O(n log n) per key, no
row explosion, and AQE handles the partition sizing. The right row rides
as ONE struct so all matched columns come from the SAME row (per-column
fills could mix rows when the right side carries NULLs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    tolerance=None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the LARGEST ``right_ts <= left_ts`` within the same ``on`` key (ties
    at equal timestamps match — the right row sorts first). Left rows with
    no earlier right row get NULLs (left-outer semantics, like pandas
    ``merge_asof`` / DuckDB ``ASOF LEFT JOIN``).

    * ``right_cols`` — right columns to attach (default: all but key/ts);
      names must not collide with left's (rename upstream).
    * ``tolerance`` — max allowed ``left_ts - right_ts`` (same units as
      the ts columns); matches farther back are nulled, like merge_asof.
    * ``matched_ts_col`` — optionally emit the matched right timestamp.
    * Duplicate right rows on the same (key, ts): which one wins is
      unspecified — pre-aggregate the right side (e.g. ``max_by``) when
      that matters.

    Forward as-of: negate both ts columns and flip back afterwards.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(keys) and c != rts]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")

    rstruct = F.struct(
        F.col(rts).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    rside = (
        right.select(*keys, F.col(rts).alias("__ts"), rstruct.alias("__r"))
        .withColumn("__side", F.lit(0))
    )
    lside = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = lside.unionByName(rside, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__r"), ignorenulls=True).over(w)
    res = u.select(*left.columns, "__side", matched.alias("__m")).where(
        F.col("__side") == 1
    )

    ok: Column = F.col("__m").isNotNull()
    if tolerance is not None:
        ok = ok & ((F.col(left_ts) - F.col("__m.__rts")) <= F.lit(tolerance))
    out_cols = [F.col(c) for c in left.columns]
    if matched_ts_col is not None:
        out_cols.append(F.when(ok, F.col("__m.__rts")).alias(matched_ts_col))
    out_cols += [F.when(ok, F.col(f"__m.{c}")).alias(c) for c in right_cols]
    return res.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: str | Sequence[str] | None = None,
    granule: int = 3_600,
    max_granules: int | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them
    (``start_ts <= point_ts <= end_ts``, same ``on`` key if given) —
    WITHOUT the nested-loop/cartesian plan a raw inequality join produces.

    ``max_granules`` is the runaway guard: an interval covering more than
    this many buckets (a years-long interval against a seconds-sized
    granule — usually a data bug or a mis-chosen granule) FAILS the job
    with a clear message instead of exploding into millions of rows and
    dying opaquely downstream. Off by default.

    Granule bucketing: each interval explodes to the ``granule``-sized
    buckets it covers, each point computes its one bucket, and the match
    becomes an EQUI-join on (keys..., bucket) followed by the exact bound
    filter. A point's bucket intersects a covering interval in exactly one
    exploded copy, so no dedup pass is needed. One shuffle on
    (keys, bucket); interval fan-out = ceil(length/granule) rows — pick
    ``granule`` near the typical interval length so fan-out stays small
    while buckets stay selective (the standard time-binning trade-off).
    Timestamps are numeric (epoch seconds/us/ns — any consistent unit).

    Output: all point columns + all interval columns (names must be
    disjoint apart from the join keys)."""
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    g = F.lit(int(granule))
    lo_b = F.floor(F.col(start_ts) / g).cast("long")
    hi_b = F.floor(F.col(end_ts) / g).cast("long")
    if max_granules is not None:
        # the guard lives INSIDE the sequence bound so column pruning can't
        # eliminate it (a dropped standalone check column never evaluates)
        hi_b = F.when(
            hi_b - lo_b >= F.lit(int(max_granules)),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join: interval spans >= {int(max_granules)} "
                        f"granules of {int(granule)} (start="
                    ),
                    F.col(start_ts).cast("string"),
                    F.lit(", end="),
                    F.col(end_ts).cast("string"),
                    F.lit(") - raise `granule` or fix the interval"),
                )
            ).cast("long"),
        ).otherwise(hi_b)
    iv = intervals.withColumn("__b", F.explode(F.sequence(lo_b, hi_b)))
    pt = points.withColumn("__b", F.floor(F.col(point_ts) / g).cast("long"))
    j = pt.join(iv, on=keys + ["__b"], how="inner").where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return j.drop("__b")
