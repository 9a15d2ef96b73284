"""Change feed over LakeTable versions (the Delta Change Data Feed analog).

The reference relies on Delta for its storage layer; Delta's CDF records
row-level changes at write time. The versioned-parquet LakeTable keeps every
committed version readable instead (time travel), so the change feed is
*derived*: a pk-keyed diff of two committed versions. Semantics match CDF's
row shapes — ``insert`` / ``delete`` / ``update_preimage`` +
``update_postimage`` — so downstream incremental consumers (a gold layer,
a search indexer, a training-data refresh) can switch between the two
without changes.

Scale notes (100 TB): the diff is one full-outer shuffle join on the
uniform sha256 PK of exactly the two versions compared — there is no
cheaper general form for a diff when neither side is small, and both sides
prune to their own segment lists (copy-on-write means unchanged partitions
share segment files, but parquet has no file-identity pushdown, so the join
is the honest cost). For narrow consumers, pass ``compare_cols`` to limit
both the scan width and the inequality work to the columns that matter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE_COL = "_change_type"


def compute_changes(
    before: DataFrame,
    after: DataFrame,
    pk: str,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level change set turning ``before`` into ``after``, keyed by
    ``pk``:

    * pk only in ``after``            -> one ``insert`` row (after image)
    * pk only in ``before``           -> one ``delete`` row (before image)
    * pk in both, any compare col
      differs (null-safe)            -> ``update_preimage`` (before image)
                                         + ``update_postimage`` (after image)
    * pk in both, all equal          -> no rows

    Output columns: the common columns of both inputs (in ``after``'s
    order) plus ``_change_type``. ``compare_cols`` defaults to every
    common non-pk column."""
    cols = [c for c in after.columns if c in before.columns]
    if pk not in cols:
        raise ValueError(f"pk column {pk!r} must exist in both inputs")
    if compare_cols is None:
        compare_cols = [c for c in cols if c != pk]
    b = before.select(*cols).alias("b")
    a = after.select(*cols).alias("a")
    j = b.join(a, F.col(f"b.{pk}") == F.col(f"a.{pk}"), "full_outer")

    b_pk, a_pk = F.col(f"b.{pk}"), F.col(f"a.{pk}")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"b.{c}").eqNullSafe(F.col(f"a.{c}"))

    def _img(side: str, change: str):
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in cols],
            F.lit(change).alias(CHANGE_TYPE_COL),
        )

    emitted = (
        F.when(b_pk.isNull(), F.array(_img("a", "insert")))
        .when(a_pk.isNull(), F.array(_img("b", "delete")))
        .when(differs, F.array(_img("b", "update_preimage"), _img("a", "update_postimage")))
    )
    # unchanged rows fall through the when-chain to NULL; plain explode
    # drops NULL arrays, which is exactly the "no rows" case
    return j.select(F.explode(emitted).alias("__c")).select("__c.*")


def read_changes(
    table,
    from_version: int,
    to_version: int | None = None,
    pk: str | None = None,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change feed between two committed versions of a LakeTable (the
    ``table_changes(...)`` analog). ``to_version`` defaults to the latest;
    ``pk`` defaults to the single column starting with ``PK_`` (the
    engine's synthetic business-key hash)."""
    before = table.read(version=from_version)
    after = table.read(version=to_version)
    if pk is None:
        pks = [c for c in after.columns if c.startswith("PK_")]
        if len(pks) != 1:
            raise ValueError(
                f"cannot infer pk column (candidates: {pks}); pass pk= explicitly"
            )
        pk = pks[0]
    return compute_changes(before, after, pk, compare_cols)
