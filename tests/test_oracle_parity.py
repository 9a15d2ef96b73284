"""Full-registry oracle parity at sf0.001 — the local twin of the driver's
correctness gate.

Runs EVERY registry query plus every EXTRA query (the oracle-paired
formulations consolidated out of the driver's 50-row window) against its
DuckDB oracle using the exact canonicalization of tools/check_oracle.py
(pandas round-trip on both sides, column-name sort, order-insensitive value
multiset). This is what catches a driver-environment breakage — like r2's
events timestamp re-encoding — before the round's CORRECTNESS file does.

sf0.001 keeps the whole sweep under ~2 min on local[8].
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakefoundation_spark.verification import (  # noqa: E402
    DRIVER_WINDOW,
    all_queries,
    extra_queries,
)
from tools.check_oracle import (  # noqa: E402
    TABLES,
    canon_pdf,
    driver_incompatible_cols,
)

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _registry():
    merged = dict(all_queries())
    merged.update(extra_queries())
    return merged


def test_registry_fits_driver_window():
    assert len(all_queries()) <= DRIVER_WINDOW


def test_every_registry_query_has_unique_name():
    reg, extra = all_queries(), extra_queries()
    assert not set(reg) & set(extra)


def test_gate_rejects_array_valued_results():
    """The driver's canonicalizer sort_values/factorizes raw cells and
    throws on lists (r7: q_embedding_quantize) — the local gate must flag
    that shape BEFORE it burns a driver round."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {"id": [1, 2], "vec": [[1, 2], [3, 4]], "arr": [np.array([1]), np.array([2])]}
    )
    assert driver_incompatible_cols(pdf) == ["vec", "arr"]
    assert driver_incompatible_cols(pdf[["id"]]) == []


@pytest.mark.parametrize("name", sorted(_registry()))
def test_oracle_parity(name, spark, duck):
    fn, sql = _registry()[name]
    s_pdf = fn(spark, SF_DIR).toPandas()
    if name in all_queries():
        bad = driver_incompatible_cols(s_pdf)
        assert not bad, (
            f"driver-window query emits non-scalar columns {bad}; the driver "
            "canonicalizer cannot hash list cells — explode to scalar rows"
        )
    if sql is None:
        # rows-only contract: must at least run and produce a stable schema
        assert list(s_pdf.columns)
        return
    d_pdf = duck.sql(sql).df()
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), "schema mismatch"
    assert len(s_pdf) == len(d_pdf), f"rowcount {len(s_pdf)} != {len(d_pdf)}"
    cs, cd = canon_pdf(s_pdf), canon_pdf(d_pdf)
    if cs != cd:
        bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
        raise AssertionError(
            f"value mismatch at sorted row {bad}:\n spark: {cs[bad][:300]}\n duck : {cd[bad][:300]}"
        )


def test_window_rows_all_hash_comparable():
    """Eligibility policy §3 (verification/__init__.py): a rows-only query
    (oracle=None) can never produce anything but `err: no_oracle` in a
    driver CORRECTNESS row — those belong in EXTRA, never in the window."""
    rows_only = [n for n, (_fn, sql) in all_queries().items() if sql is None]
    assert rows_only == [], f"window seats without an oracle: {rows_only}"


def test_every_extra_row_is_exercised_by_this_gate():
    """Registry-drift pin (VERDICT r8 directive #8): the parametrization
    source of test_oracle_parity must be exactly window ∪ EXTRA, so a
    future rotation can't orphan an EXTRA row from the local gate."""
    assert set(_registry()) == set(all_queries()) | set(extra_queries())


def test_rotation_policy_no_query_starves():
    """Mechanical pin of the window-rotation policy (VERDICT r9 directive
    #7): reading the recorded CORRECTNESS_r*.json ledger, every
    oracle-paired query must either have held a driver seat within the
    last MAX_STALE_ROUNDS recorded rounds, or hold one NOW (i.e. sit in
    the current 50-row window, scheduled for the next driver run). A
    never-seated oracle-paired query must be in the window — new rows
    take a seat in their debut round. A policy slip therefore fails CI
    in the round it happens instead of surfacing as a stale-verification
    note in a later verdict."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not files:
        pytest.skip("no CORRECTNESS history recorded yet")
    last_seen: dict[str, int] = {}
    latest = 0
    for path in files:
        n = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        latest = max(latest, n)
        for key in json.load(open(path)):
            last_seen[key] = max(last_seen.get(key, 0), n)

    # ceil(extras / seats-rotated-per-round) bounds the full cycle; the
    # observed cadence is ~11 seats/round over ~63 extras => <= 6 rounds.
    # Rounds 11-12 are OPTIMIZATION rounds whose driver contract FREEZES
    # the declared window (removing or renaming a declared query is graded
    # as a regression regardless of rotation hygiene), so the staleness
    # clock pauses for those two recorded rounds: the budget is 6 rotating
    # rounds + the 2 frozen ones. Build rounds resume rotation at r13 and
    # the r4-stale cohort takes the first seats then.
    FROZEN_WINDOW_ROUNDS = 2  # r11, r12 (optimization phase)
    MAX_STALE_ROUNDS = 6 + FROZEN_WINDOW_ROUNDS
    window = set(all_queries())
    starving = []
    for name, (_fn, sql) in _registry().items():
        if sql is None:
            continue  # rows-only: structurally ineligible for a seat
        stale = latest - last_seen.get(name, -10**6)
        if stale > MAX_STALE_ROUNDS and name not in window:
            starving.append((name, last_seen.get(name, None)))
    assert not starving, (
        f"oracle-paired queries starving past {MAX_STALE_ROUNDS} rounds and "
        f"not scheduled in the current window (latest ledger r{latest}): "
        f"{sorted(starving)} — rotate them into QUERIES per "
        "verification/__init__.py"
    )
