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


def salt_expr(df: DataFrame, salt_buckets: int):
    """Uniform deterministic per-row salt: xxhash64 of the whole row PLUS
    the row's scan position (``monotonically_increasing_id``). Hashing
    column values alone has a classic degeneracy: a hot key's rows are
    often bit-identical duplicates (replayed records, default rows), which
    all hash to ONE salt and re-create the very straggler salting exists
    to kill. Folding in the scan position spreads even identical rows;
    determinism holds for any deterministic scan (same files -> same
    partition layout -> same ids), and aggregation results never depend on
    WHICH salt a row gets — only the partial grouping does."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs``: output column -> (fn, input column) with fn in
    count/sum/min/max; the input column is ignored for count.
    The salt spreads every key — including hot keys made of identical
    duplicate rows (see ``salt_expr``) — over ``salt_buckets`` stage-1
    reducers. Produces exactly the same rows as
    ``df.groupBy(keys).agg(...)``.
    """
    for out, (fn, _c) in aggs.items():
        if fn not in _RECOMBINE:
            raise ValueError(f"{out}: '{fn}' is not an algebraic aggregate")
    stage1 = df.withColumn("__salt", salt_expr(df, salt_buckets)).groupBy(*keys, "__salt")
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
