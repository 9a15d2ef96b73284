"""Grouped top-k with map-side partial reduction.

The idiomatic formulation (`row_number() OVER (PARTITION BY k ORDER BY v)
<= n`) shuffles EVERY row of every group to its reducer before any row is
discarded — at 100 TB a top-3-per-category over a trillion rows moves the
trillion rows. This operator reduces each input partition to its own local
top-k per group FIRST, so only ``input_partitions x k`` rows per group ever
shuffle.

Why the local reduction is mapInPandas and not a groupBy: Spark exposes no
bounded top-k aggregate — ``slice(sort_array(collect_list(...)))`` LOOKS
map-side but its partial buffers are the complete per-group lists, so the
shuffle still moves every row; a window over ``spark_partition_id`` inserts
an exchange because Catalyst cannot see that rows are already co-located
by physical partition. Per-partition bounded state is exactly the case the
Arrow-batched Python path exists for: one scan-speed pass, buffer capped at
``groups_in_partition x k`` rows, batch-incremental re-trim.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: Sequence[str] = (),
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """Top-``k`` rows per group ordered lexicographically on
    ``(order_col, *tiebreak)`` — all DESC when ``descending`` (default),
    all ASC otherwise. The single-direction lexicographic contract is what
    makes the two-stage plan exact: the local cut and the global rank use
    the identical order, so a row evicted locally can never belong to the
    global top-k (with mixed directions a k-th-boundary tie could evict
    the globally-ranked row). Pass enough ``tiebreak`` columns for a total
    order, or selection among fully-tied rows is unspecified.

    Output: keys + order_col + tiebreak + payload columns (payload
    defaults to all others) + ``rank`` (1-based)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if payload is None:
        payload = [c for c in df.columns if c not in set(keys)]
    payload = [c for c in payload if c != order_col and c not in tiebreak]
    order_fields = [order_col, *tiebreak]
    cols = [*keys, *order_fields, *payload]
    narrowed = df.select(*cols)
    schema = narrowed.schema
    asc = not descending
    kk = int(k)

    def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None
        for pdf in batches:
            buf = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            # re-trim after every batch: the buffer never exceeds
            # (groups-in-partition x k) + one batch
            buf = (
                buf.sort_values(by=order_fields, ascending=asc, kind="mergesort")
                .groupby(keys, sort=False, dropna=False)
                .head(kk)
            )
        if buf is not None and len(buf):
            yield buf

    partials = narrowed.mapInPandas(_local_topk, schema=schema)
    direction = (lambda c: F.col(c).desc()) if descending else (lambda c: F.col(c).asc())
    w = Window.partitionBy(*keys).orderBy(*[direction(c) for c in order_fields])
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select(*cols, "rank")
    )
