"""Property-based tests (hypothesis) for the pure driver-side functions —
the reference has none of these (SURVEY.md §5: no property testing), so this
strengthens the rebuild's test posture where it is cheap: no Spark involved.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from datalakefoundation_spark.core.expressions import (
    evaluate_watermark_expression,
    substitute,
)
from datalakefoundation_spark.core.normalize import clean_column_name
from datalakefoundation_spark.metadata.sources import deep_merge
from datalakefoundation_spark.strategies import merge_metrics, scd2_metrics

FORBIDDEN = set(" +-.,;{}()\n\t=")


@given(st.text(max_size=80))
def test_clean_column_name_strips_and_is_idempotent(name):
    cleaned = clean_column_name(name)
    assert not (set(cleaned) & FORBIDDEN)
    assert clean_column_name(cleaned) == cleaned  # idempotent
    # non-forbidden characters survive in order
    assert [c for c in name if c not in FORBIDDEN] == list(cleaned)


_json = st.recursive(
    st.none() | st.booleans() | st.integers() | st.text(max_size=10),
    lambda inner: st.lists(inner, max_size=4)
    | st.dictionaries(st.text(max_size=6), inner, max_size=4),
    max_leaves=12,
)


@given(_json, _json)
@settings(max_examples=200)
def test_deep_merge_b_wins_and_preserves_disjoint_keys(a, b):
    out = deep_merge(a, b)
    if isinstance(a, dict) and isinstance(b, dict):
        for k in b:
            if not (isinstance(a.get(k), (dict, list)) and isinstance(b[k], type(a.get(k)))):
                assert out[k] == b[k]  # b wins scalars / type mismatches
        for k in a:
            if k not in b:
                assert out[k] == a[k]  # a-only keys preserved
    elif isinstance(a, list) and isinstance(b, list):
        assert out == a + b  # json4s array concat
    else:
        assert out == b


@given(st.dictionaries(st.from_regex(r"[A-Za-z0-9_]{1,8}", fullmatch=True),
                       st.text(max_size=10), max_size=4),
       st.text(max_size=40))
def test_substitute_only_touches_known_vars(variables, filler):
    template = filler + "".join("${%s}" % k for k in variables)
    out = substitute(template, variables)
    for k, v in variables.items():
        assert ("${%s}" % k) not in out or str(v) == ("${%s}" % k)
    assert out.startswith(re.sub(r"\$\{([A-Za-z0-9_]+)\}",
                                 lambda m: str(variables.get(m.group(1), m.group(0))),
                                 filler))


@given(st.integers(min_value=0, max_value=10**6).flatmap(
    lambda n: st.tuples(st.just(n),
                        st.integers(0, n),
                        st.integers(0, 10**6))))
def test_merge_metric_identity(t):
    n, inserted, inferred = t
    soft = n - inserted if n - inserted >= 0 else 0
    m = merge_metrics(n, inserted, soft_deletes=soft, inferred_deletes=inferred)
    # identity: inserted + updated + deleted(soft) = records_in_slice;
    # inferred deletes come from OUTSIDE the slice and are reported separately
    assert m["inserted"] + m["updated"] + m["deleted"] == m["records_in_slice"]
    assert m["inferred_deletes"] == inferred
    assert m["touched"] == n


@given(st.integers(0, 10**6), st.integers(0, 10**6), st.integers(0, 10**6),
       st.integers(0, 10**6))
def test_scd2_metric_identity(new_versions, unchanged, extra, inferred):
    n = new_versions + unchanged + extra
    m = scd2_metrics(n, new_versions, unchanged, inferred)
    assert m["inserted"] + m["updated"] + m["unchanged"] == m["records_in_slice"]
    assert m["inserted"] == extra


@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\"\\\n"),
               min_size=1, max_size=20))
def test_watermark_verbatim_pattern_roundtrips(value):
    # the documented "'${last_value}'" pattern returns the stored value verbatim
    out = evaluate_watermark_expression("'${last_value}'", value)
    assert out == value


@given(st.integers(-10**9, 10**9))
def test_watermark_numeric_passthrough(v):
    assert evaluate_watermark_expression("${last_value}", v) == str(v)


# ---------------------------------------------------------------- stats pruning
# Soundness of the segment-stats interval evaluator: if it says a segment
# can be SKIPPED (False), then no row the stats describe can satisfy the
# window condition. The reverse (True with no matching row) is allowed —
# pruning is conservative — but a false skip silently loses deletes.

_num_vals = st.integers(min_value=-50, max_value=50)


@st.composite
def _segment_and_spec(draw):
    cols = ["a", "b", "c"]
    rows = draw(
        st.lists(
            st.fixed_dictionaries(
                {c: st.none() | _num_vals for c in cols}
            ),
            min_size=0,
            max_size=8,
        )
    )
    # stats exactly as the writer records them: min/max over non-null values,
    # all-null -> (None, None); columns can also be unrecorded (absent)
    stats = {}
    for c in draw(st.sets(st.sampled_from(cols), min_size=0, max_size=3)):
        vals = [r[c] for r in rows if r[c] is not None]
        stats[c] = {
            "min": min(vals) if vals else None,
            "max": max(vals) if vals else None,
            "t": "num",
        }
    # window spec: 1-2 AND-groups, each 1-3 (op, col, lo, hi) conditions
    def cond():
        lo = draw(_num_vals)
        hi = draw(_num_vals)
        return (draw(st.sampled_from(["and", "or"])), draw(st.sampled_from(cols)),
                str(min(lo, hi)), str(max(lo, hi)))

    spec = [
        [cond() for _ in range(draw(st.integers(1, 3)))]
        for _ in range(draw(st.integers(1, 2)))
    ]
    return rows, stats, spec


def _row_matches(row, spec):
    """Python twin of build_window_condition's fold over one row (SQL
    three-valued logic: a condition on NULL is False for this inclusive
    between; the group fold mirrors segment_may_match's)."""
    for group in spec:
        g = None
        for op, col, lo, hi in group:
            v = row[col]
            ok = v is not None and int(lo) <= v <= int(hi)
            if g is None:
                g = ok
            elif op == "or":
                g = g or ok
            else:
                g = g and ok
        if not g:
            return False
    return True


@given(_segment_and_spec())
@settings(max_examples=300)
def test_segment_may_match_is_sound(case):
    from datalakefoundation_spark.tables.lake_table import segment_may_match

    rows, stats, spec = case
    if not segment_may_match(stats, spec):
        assert not any(_row_matches(r, spec) for r in rows), (
            f"pruned a segment containing a matching row: {rows} {stats} {spec}"
        )
