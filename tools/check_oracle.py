"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted column names, and an order-insensitive canonicalized value
multiset.

Crucially, both sides are round-tripped through pandas BEFORE comparison,
exactly like the driver: Spark rows via ``pd.DataFrame(df.collect())`` and
DuckDB via ``rel.df()``. This surfaces the two canonicalization traps that
made round-1's local gate mispredict the driver: (a) DuckDB ``.df()``
converts DECIMAL/HUGEINT aggregates to float64 while Spark keeps
Decimal/int64, and (b) pandas nanosecond timestamps overflow on the
``2999-12-31`` SCD2 sentinel (OutOfBoundsDatetime). A value that differs in
pandas dtype differs in canon here, and a pandas conversion error is a FAIL.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        if isinstance(v, float):
            return "NaN"
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # dates and timestamps share one canonical form: Spark keeps DATE as
    # datetime.date objects in pandas while DuckDB .df() yields midnight
    # Timestamps — the driver's r1 gate passed that pairing, so ours must too
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat() + " 00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, np.ndarray):
        return canon(list(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def driver_incompatible_cols(pdf):
    """Columns the DRIVER's canonicalizer cannot handle: it sort_values/
    factorizes raw pandas cells, which throws ``unhashable type`` on any
    list/array/dict/set value. Our local canon string-encodes those
    (see ``canon``) so it would silently PASS a result shape the driver
    errs on — r7's ``q_embedding_quantize`` red. Every query in the
    driver's 50-row window must therefore emit only scalar cells; this
    is enforced in ``main`` below and in tests/test_oracle_parity.py.
    """
    import numpy as np

    bad = []
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype == object:
            for v in col:
                if isinstance(v, (list, tuple, dict, set, np.ndarray)):
                    bad.append(c)
                    break
    return bad


def canon_pdf(pdf):
    """Order-insensitive canonical multiset of a pandas DataFrame's values.

    Columns are sorted by name first (the driver's compare does the same),
    so Spark/DuckDB column ordering differences don't matter but dtype
    differences after pandas conversion do.
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = pdf.itertuples(index=False, name=None)
    return sorted("|".join(canon(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import duckdb

    import __spark_entry__ as entry_mod
    from datalakefoundation_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import pandas as pd

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = set(qs)  # driver-verified rows: scalar-cell shape enforced
    # also gate the oracle-paired queries deliberately outside the driver's
    # 50-row registry window (operators covered by consolidated registry rows)
    from datalakefoundation_spark.verification import extra_queries

    for name, (fn, sql) in extra_queries().items():
        qs[name] = fn
        if sql is not None:
            oracles[name] = sql
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_start = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # toPandas() replicates the driver: timestamp columns are astype'd
            # to datetime64[ns], so the 2999 sentinel raises OutOfBoundsDatetime
            # — that's a real driver failure, not a gate bug.
            s_pdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark/pandas error: {type(e).__name__}: {e}")
            continue
        if name in window:
            bad = driver_incompatible_cols(s_pdf)
            if bad:
                failures.append(name)
                print(
                    f"FAIL  {name}: non-scalar result columns {bad} — the "
                    "driver's canonicalizer cannot hash list/array cells; "
                    "explode to scalar rows (see q_random_projection)"
                )
                continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only) — {len(s_pdf)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            d_pdf = rel.df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        dur = time.time() - t_start
        if sorted(s_pdf.columns) != sorted(d_pdf.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}")
            continue
        if len(s_pdf) != len(d_pdf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(s_pdf)} duck={len(d_pdf)}")
            continue
        cs, cd = canon_pdf(s_pdf), canon_pdf(d_pdf)
        if cs != cd:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
            print(f"FAIL  {name}: values differ; first diff at sorted row {bad}:")
            print(f"      spark: {cs[bad][:300]}")
            print(f"      duck : {cd[bad][:300]}")
            continue
        print(f"PASS  {name}  ({len(s_pdf)} rows, {dur:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
