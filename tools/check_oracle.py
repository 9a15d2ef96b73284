"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted column names, and an order-insensitive canonicalized value
multiset. Stricter than any reasonable hash compare — if this passes, the
driver's hash compare passes.

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
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return canon(v.item())
        if isinstance(v, np.ndarray):
            return canon(list(v))
    except ImportError:
        pass
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


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

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_start = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only) — {len(s_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        dur = time.time() - t_start
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            continue
        cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
        if cs != cd:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
            print(f"FAIL  {name}: values differ; first diff at sorted row {bad}:")
            print(f"      spark: {cs[bad][:300]}")
            print(f"      duck : {cd[bad][:300]}")
            continue
        print(f"PASS  {name}  ({len(s_rows)} rows, {dur:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
