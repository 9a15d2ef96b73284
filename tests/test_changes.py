"""Change feed (tables/changes.py — the Delta CDF analog, derived as a
pk-keyed diff of two committed LakeTable versions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.tables.changes import compute_changes, read_changes
from datalakefoundation_spark.tables.lake_table import LakeTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk string, val int, note string")


def test_compute_changes_all_shapes(spark):
    before = _df(spark, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, None)])
    after = _df(spark, [("a", 1, "x"), ("b", 20, "y"), ("d", 4, "z")])
    out = compute_changes(before, after, "pk")
    got = {(r["pk"], r["_change_type"]): (r["val"], r["note"]) for r in out.collect()}
    assert got == {
        ("b", "update_preimage"): (2, "y"),
        ("b", "update_postimage"): (20, "y"),
        ("c", "delete"): (3, None),
        ("d", "insert"): (4, "z"),
    }
    # unchanged row 'a' emits nothing
    assert out.count() == 4


def test_compute_changes_null_safety(spark):
    """NULL -> value and value -> NULL are updates; NULL == NULL is not."""
    before = _df(spark, [("a", 1, None), ("b", 2, "set")])
    after = _df(spark, [("a", 1, "now"), ("b", 2, None)])
    out = compute_changes(before, after, "pk")
    types = sorted((r["pk"], r["_change_type"]) for r in out.collect())
    assert types == [
        ("a", "update_postimage"), ("a", "update_preimage"),
        ("b", "update_postimage"), ("b", "update_preimage"),
    ]
    same = compute_changes(before, before, "pk")
    assert same.count() == 0


def test_compute_changes_compare_cols_subset(spark):
    """With compare_cols restricted, differences in other columns are
    invisible (narrow consumers skip irrelevant churn)."""
    before = _df(spark, [("a", 1, "x")])
    after = _df(spark, [("a", 1, "CHANGED")])
    assert compute_changes(before, after, "pk", compare_cols=["val"]).count() == 0
    assert compute_changes(before, after, "pk", compare_cols=["note"]).count() == 2


def test_read_changes_between_versions(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    df0 = spark.createDataFrame(
        [("h1", 1, "a"), ("h2", 2, "b")], "PK_item string, val int, s string"
    )
    t.overwrite(df0)  # v0
    df1 = spark.createDataFrame(
        [("h1", 1, "a"), ("h3", 3, "c")], "PK_item string, val int, s string"
    )
    t.overwrite(df1)  # v1: h2 physically gone, h3 new
    out = read_changes(t, from_version=0)  # pk inferred from PK_ prefix
    got = {(r["PK_item"], r["_change_type"]) for r in out.collect()}
    assert got == {("h2", "delete"), ("h3", "insert")}

    # explicit to_version + no changes -> empty feed
    assert read_changes(t, from_version=1, to_version=1).count() == 0


def test_read_changes_pk_inference_fails_cleanly(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, 2)], "a int, b int"))
    with pytest.raises(ValueError, match="cannot infer pk"):
        read_changes(t, from_version=0)
    # explicit pk works
    t.overwrite(spark.createDataFrame([(1, 99)], "a int, b int"))
    out = read_changes(t, from_version=0, pk="a")
    assert {r["_change_type"] for r in out.collect()} == {
        "update_preimage", "update_postimage",
    }


def test_change_feed_applies_forward(spark):
    """Applying the feed to `before` reconstructs `after` exactly — the
    CDF contract an incremental consumer relies on."""
    before = _df(spark, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    after = _df(spark, [("a", 10, "x"), ("d", 4, "q")])
    feed = compute_changes(before, after, "pk")
    deletes = feed.where(F.col("_change_type").isin("delete", "update_preimage"))
    adds = feed.where(F.col("_change_type").isin("insert", "update_postimage"))
    rebuilt = (
        before.join(deletes.select("pk"), "pk", "left_anti")
        .unionByName(adds.drop("_change_type"))
    )
    assert {tuple(r) for r in rebuilt.collect()} == {tuple(r) for r in after.collect()}


# ------------------------------------------------------- incremental refresh
def _agg_of(df, spark):
    return df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("val").alias("sum_val")
    )


def test_refresh_agg_equals_full_recompute(spark):
    """The incremental refresh from a change feed must equal the full
    recompute over the post-change table — across inserts, updates,
    deletes, a fully-emptied group, and a brand-new group."""
    from datalakefoundation_spark.tables.incremental import refresh_agg

    before = spark.createDataFrame(
        [("a", "g1", 10), ("b", "g1", 5), ("c", "g2", 7), ("d", "g3", 1)],
        "pk string, g string, val int",
    )
    after = spark.createDataFrame(
        [
            ("a", "g1", 20),   # update: val 10 -> 20
            ("b", "g1", 5),    # unchanged
            ("e", "g4", 9),    # insert into a new group
            # c deleted -> g2 empties entirely; d deleted from g3
        ],
        "pk string, g string, val int",
    )
    feed = compute_changes(before, after, "pk")
    current = _agg_of(before, spark)
    refreshed = refresh_agg(current, feed, "g", sums={"sum_val": "val"})
    expect = {tuple(r) for r in _agg_of(after, spark).collect()}
    assert {tuple(r) for r in refreshed.collect()} == expect
    # g2 vanished, g4 appeared
    gs = {r["g"] for r in refreshed.collect()}
    assert gs == {"g1", "g4"}


def test_refresh_agg_group_migration(spark):
    """An update that MOVES a row between groups must decrement the old
    group and increment the new one (pre/post images carry different
    keys)."""
    from datalakefoundation_spark.tables.incremental import refresh_agg

    before = spark.createDataFrame(
        [("a", "g1", 3), ("b", "g2", 4)], "pk string, g string, val int"
    )
    after = spark.createDataFrame(
        [("a", "g2", 3), ("b", "g2", 4)], "pk string, g string, val int"
    )
    feed = compute_changes(before, after, "pk")
    refreshed = refresh_agg(_agg_of(before, spark), feed, "g", sums={"sum_val": "val"})
    got = {r["g"]: (r["n_rows"], r["sum_val"]) for r in refreshed.collect()}
    assert got == {"g2": (2, 7)}


def test_refresh_agg_first_build(spark):
    """current=None with an insert-only feed bootstraps the aggregate."""
    from datalakefoundation_spark.tables.incremental import refresh_agg

    empty = spark.createDataFrame([], "pk string, g string, val int")
    after = spark.createDataFrame(
        [("a", "g1", 1), ("b", "g1", 2)], "pk string, g string, val int"
    )
    feed = compute_changes(empty, after, "pk")
    got = refresh_agg(None, feed, "g", sums={"sum_val": "val"}).collect()
    assert [(r["g"], r["n_rows"], r["sum_val"]) for r in got] == [("g1", 2, 3)]


def test_refresh_agg_null_values_count_but_add_zero(spark):
    from datalakefoundation_spark.tables.incremental import refresh_agg

    before = spark.createDataFrame([("a", "g1", None)], "pk string, g string, val int")
    after = spark.createDataFrame(
        [("a", "g1", None), ("b", "g1", 5)], "pk string, g string, val int"
    )
    feed = compute_changes(before, after, "pk")
    got = refresh_agg(
        _agg_of(before, spark).fillna(0, ["sum_val"]), feed, "g",
        sums={"sum_val": "val"},
    ).collect()
    assert [(r["g"], r["n_rows"], r["sum_val"]) for r in got] == [("g1", 2, 5)]


def test_read_changes_across_restore(spark, tmp_path):
    """A restore() commit is an ordinary version to the change feed: the
    diff over it is the rollback itself (new rows deleted, rolled-back
    rows re-inserted)."""
    t = LakeTable(spark, str(tmp_path / "t_restore"))
    t.overwrite(
        spark.createDataFrame([("h1", 1)], "PK_item string, val int")
    )  # v0
    t.overwrite(
        spark.createDataFrame([("h2", 2)], "PK_item string, val int")
    )  # v1
    t.restore(0)  # v2
    got = {
        (r["PK_item"], r["_change_type"])
        for r in read_changes(t, from_version=1, to_version=2).collect()
    }
    assert got == {("h2", "delete"), ("h1", "insert")}
