import datetime as dt

from datalakefoundation_spark.core.expressions import (
    evaluate_watermark_expression,
    safe_eval,
    substitute,
)
from datalakefoundation_spark.core.normalize import clean_column_name, schema_compare
from datalakefoundation_spark.watermark import build_window_condition
from datalakefoundation_spark.metadata.models import Watermark


def test_substitute():
    assert substitute("/x/${a}/${b}", {"a": "1", "b": "2"}) == "/x/1/2"
    # unknown vars left intact
    assert substitute("/x/${missing}", {}) == "/x/${missing}"


def test_watermark_expression_patterns():
    # quoted passthrough (the common "'${last_value}'" pattern)
    assert evaluate_watermark_expression("'${last_value}'", "10") == "10"
    # unquoted numeric
    assert evaluate_watermark_expression("${last_value}", 42) == "42"
    # date arithmetic: 7-day buffer pattern (WATERMARKS.md:259-268)
    out = evaluate_watermark_expression(
        "date.parse('${last_value}') - days(7)", "2026-01-08"
    )
    assert out == "2026-01-01"
    # eval failure -> None (filter skipped)
    assert evaluate_watermark_expression("bogus(${last_value})", "1") is None


def test_safe_eval_sandboxed():
    assert safe_eval("1 + 2") == 3
    assert safe_eval("days(2).days") == 2
    assert safe_eval("__import__('os')") is None  # no builtins
    assert safe_eval("open('/etc/passwd')") is None


def test_clean_column_name():
    assert clean_column_name("a b-c.d(e)") == "abcde"
    assert clean_column_name("x{y}=z;") == "xyz"


def test_schema_compare(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(1, "y")], "id int, b string")
    drift = schema_compare(a, b)
    assert drift == {"added": ["a"], "removed": ["b"]}


def test_window_condition_missing_column_skipped(spark):
    df = spark.createDataFrame([(1,)], "other int")
    wm = [Watermark(entity_id=1, column_name="SeqNr")]
    cond = build_window_condition(df.schema, wm, {"SeqNr": "1"}, {"SeqNr": "5"})
    assert cond is None  # column absent -> skipped entirely


def test_window_condition_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "SeqNr int")
    wm = [Watermark(entity_id=1, column_name="SeqNr")]
    cond = build_window_condition(df.schema, wm, {"SeqNr": "3"}, {"SeqNr": "'7'"})
    assert [r["SeqNr"] for r in df.where(cond).collect()] == [3, 4, 5, 6, 7]
    # one-sided bounds never produce a window: a missing previous bookmark
    # (first incremental run) must not widen delete inference to all history
    # (ProcessStrategy.scala:100-112)
    assert build_window_condition(df.schema, wm, {"SeqNr": "8"}, {"SeqNr": None}) is None
    assert build_window_condition(df.schema, wm, {"SeqNr": None}, {"SeqNr": "8"}) is None
