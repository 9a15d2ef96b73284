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
