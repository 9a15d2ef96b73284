"""Skew mitigation: salted two-stage aggregation and bucketed co-located
joins.

At 100 TB a handful of hot keys (a viral document's near-duplicates, a
default/null business key, a dominant partner id) can make one reducer
process orders of magnitude more rows than the rest. AQE's skew-join
splitting handles joins; for *aggregations* the standard fix is salting:
shuffle on (key, salt) so a hot key spreads over ``salt_buckets`` reducers,
then combine the partials with a second (tiny) shuffle on the key alone.

Only algebraic aggregates decompose this way; count re-combines with sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fn -> (stage1 aggregate, stage2 re-combine)
_RECOMBINE = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs``: output column -> (fn, input column) with fn in
    count/sum/min/max; the input column is ignored for count.
    The salt is a uniform deterministic function of the whole row
    (xxhash64), so results are reproducible and hot keys spread evenly.
    Produces exactly the same rows as ``df.groupBy(keys).agg(...)``.
    """
    for out, (fn, _c) in aggs.items():
        if fn not in _RECOMBINE:
            raise ValueError(f"{out}: '{fn}' is not an algebraic aggregate")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt")
    partials = []
    for out, (fn, c) in aggs.items():
        agg1 = _RECOMBINE[fn][0]
        col = F.lit(1) if fn == "count" else F.col(c)
        partials.append(getattr(F, agg1)(col).alias(f"__p_{out}"))
    p = stage1.agg(*partials)
    finals = []
    for out, (fn, _c) in aggs.items():
        agg2 = _RECOMBINE[fn][1]
        finals.append(getattr(F, agg2)(F.col(f"__p_{out}")).alias(out))
    return p.groupBy(*keys).agg(*finals)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
) -> None:
    """Persist a catalog table bucketed (and sorted) on the join keys.
    Two tables bucketed the same way join WITHOUT any shuffle — the
    co-location is decided at write time, once, instead of per query.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
