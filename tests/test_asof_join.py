"""As-of join (ext/joins.py) — union + running-last window formulation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.ext.joins import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 25, "b"), ("u2", 5, "c"), ("u3", 50, "d")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 20, 2.0), ("u1", 30, 3.0), ("u2", 9, 9.0)],
        "k string, ts long, px double",
    )
    return left, right


def test_asof_basic_backward(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="ts", matched_ts_col="mts")
    got = {r["tag"]: (r["mts"], r["px"]) for r in out.collect()}
    assert got == {
        "a": (8, 1.0),     # 8 <= 10 < 20
        "b": (20, 2.0),    # 20 <= 25 < 30
        "c": (None, None), # u2's only right row is at 9 > 5
        "d": (None, None), # u3 has no right rows at all
    }
    assert out.count() == left.count()  # left-outer: every left row survives


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([("u1", 20)], "k string, ts long")
    right = spark.createDataFrame([("u1", 20, 7.0)], "k string, ts long, px double")
    out = asof_join(left, right, on="k", left_ts="ts").collect()
    assert out[0]["px"] == 7.0  # inclusive bound


def test_asof_tolerance(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", tolerance=3, matched_ts_col="mts"
    )
    got = {r["tag"]: r["px"] for r in out.collect()}
    # a: 10-8=2 <= 3 ok; b: 25-20=5 > 3 -> nulled
    assert got == {"a": 1.0, "b": None, "c": None, "d": None}


def test_asof_right_nulls_do_not_mix_rows(spark):
    """A NULL in the matched right row must stay NULL — not be backfilled
    from an older right row (the whole right row rides as one struct)."""
    left = spark.createDataFrame([("u1", 100)], "k string, ts long")
    right = spark.createDataFrame(
        [("u1", 10, 1.0, "old"), ("u1", 90, None, "new")],
        "k string, ts long, px double, note string",
    )
    row = asof_join(left, right, on="k", left_ts="ts").collect()[0]
    assert row["note"] == "new" and row["px"] is None


def test_asof_different_ts_names_and_col_subset(spark):
    left = spark.createDataFrame([("u1", 10)], "k string, lts long")
    right = spark.createDataFrame(
        [("u1", 8, 1.0, "x")], "k string, rts long, px double, junk string"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_cols=["px"]
    )
    assert out.columns == ["k", "lts", "px"]
    assert out.collect()[0]["px"] == 1.0


def test_asof_name_clash_raises(spark):
    left = spark.createDataFrame([("u1", 10, 1.0)], "k string, ts long, px double")
    right = spark.createDataFrame([("u1", 8, 2.0)], "k string, ts long, px double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="ts")


def test_asof_single_shuffle_plan(spark):
    """The plan must be union -> one key shuffle -> window: no join operator
    at all (a range-join formulation would explode per-key history)."""
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------- interval join
from datalakefoundation_spark.ext.joins import interval_join


def _iv_sides(spark):
    points = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 15, "b"), ("u1", 25, "c"), ("u2", 15, "d")],
        "k string, ts long, tag string",
    )
    intervals = spark.createDataFrame(
        [("u1", 0, 10, "early"), ("u1", 10, 20, "mid"), ("u2", 100, 200, "late")],
        "k string, lo long, hi long, label string",
    )
    return points, intervals


def test_interval_join_keyed(spark):
    points, intervals = _iv_sides(spark)
    out = interval_join(points, intervals, "ts", "lo", "hi", on="k", granule=7)
    got = {(r["tag"], r["label"]) for r in out.collect()}
    # inclusive bounds: ts=15 is only in [10,20]; ts=25 matches nothing;
    # u2's point at 15 is outside [100,200]
    assert got == {("a", "early"), ("b", "mid")}


def test_interval_join_boundary_inclusive_and_multi_match(spark):
    points = spark.createDataFrame([("u1", 10, "edge")], "k string, ts long, tag string")
    intervals = spark.createDataFrame(
        [("u1", 0, 10, "ends_at"), ("u1", 10, 20, "starts_at")],
        "k string, lo long, hi long, label string",
    )
    out = interval_join(points, intervals, "ts", "lo", "hi", on="k", granule=4)
    # both inclusive bounds match; the overlapping interval pair yields 2 rows
    assert {r["label"] for r in out.collect()} == {"ends_at", "starts_at"}


def test_interval_join_no_duplicate_per_long_interval(spark):
    """An interval spanning many granules still matches a point exactly
    once (the equi-join hits the single exploded copy at the point's
    bucket)."""
    points = spark.createDataFrame([("u1", 50, "p")], "k string, ts long, tag string")
    intervals = spark.createDataFrame(
        [("u1", 0, 1000, "long")], "k string, lo long, hi long, label string"
    )
    out = interval_join(points, intervals, "ts", "lo", "hi", on="k", granule=3)
    assert out.count() == 1


def test_interval_join_unkeyed_and_clash(spark):
    points = spark.createDataFrame([(5, "x")], "ts long, tag string")
    intervals = spark.createDataFrame([(0, 10, "all")], "lo long, hi long, label string")
    out = interval_join(points, intervals, "ts", "lo", "hi", granule=100)
    assert out.collect()[0]["label"] == "all"
    import pytest as _pytest
    bad = spark.createDataFrame([(0, 10, "y")], "lo long, hi long, tag string")
    with _pytest.raises(ValueError, match="overlapping"):
        interval_join(points, bad, "ts", "lo", "hi")


def test_interval_join_no_nested_loop_plan(spark):
    points, intervals = _iv_sides(spark)
    out = interval_join(points, intervals, "ts", "lo", "hi", on="k", granule=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_max_granules_guard(spark):
    """A runaway interval fails fast with a clear message instead of
    exploding into millions of granule rows; sane intervals still pass
    under the same guard."""
    points = spark.createDataFrame([("u1", 50, "p")], "k string, ts long, tag string")
    ok = spark.createDataFrame([("u1", 0, 90, "fine")], "k string, lo long, hi long, label string")
    out = interval_join(points, ok, "ts", "lo", "hi", on="k", granule=10, max_granules=100)
    assert out.count() == 1
    runaway = spark.createDataFrame(
        [("u1", 0, 10_000_000, "bug")], "k string, lo long, hi long, label string"
    )
    import pytest as _pytest
    with _pytest.raises(Exception, match="interval_join: interval spans"):
        interval_join(
            points, runaway, "ts", "lo", "hi", on="k", granule=10, max_granules=100
        ).count()
