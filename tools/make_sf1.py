"""Build a replicated ~sf1 dataset for the second bench scale point
(VERDICT r7 directive #8).

The driver ships sf{0.001,0.01,0.1}; scale claims need a second measured
point, so this tool replicates sf0.1 x10 into an sf1-SHAPED directory:

* scaling tables (customer/supplier/part/orders/lineitem/events) replicate
  with per-replica KEY OFFSETS (stride = max(key)+1), so every FK
  relationship — and therefore every join's selectivity — is preserved and
  result sizes scale ~linearly, like a real TPC-H scale-up;
* region/nation stay verbatim (constant-size at every TPC-H SF);
* documents replicate with per-replica TOKEN SALTING (dedup_cert's trick):
  verbatim copies would be exact/near dups of each other and turn the
  dedup benchmarks quadratic in the replica count, which a real sf1 corpus
  (10x more DISTINCT docs) would not do;
* embeddings for replicas r>0 are regenerated as deterministic
  pseudo-random vectors (integer hash of (vec_id, dim), uniform in [-1,1]) — verbatim
  copies would be cosine-1 duplicates and blow up the similarity
  benchmarks the same way.

This is a BENCH-scale dataset (timing curves), not a correctness oracle —
the oracle gate stays at the driver's sf0.01.

Usage: python tools/make_sf1.py [out_dir] [replicas]   (default
  /root/testdata_sf1 10; refuses to write inside /root/testdata)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ap = os.path.abspath(out)
    if ap == "/root/testdata" or ap.startswith("/root/testdata" + os.sep):
        raise SystemExit("refusing to write inside /root/testdata")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, (os.cpu_count() or 8) // 2)}")
    src = {t: f"{SF_DIR}/{t}.parquet" for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]}

    def stride(table: str, col: str) -> int:
        return con.sql(
            f"SELECT max({col}) + 1 FROM read_parquet('{src[table]}')"
        ).fetchone()[0]

    sc = stride("customer", "c_custkey")
    ss = stride("supplier", "s_suppkey")
    sp = stride("part", "p_partkey")
    so = stride("orders", "o_orderkey")
    se = stride("events", "event_id")
    su = stride("events", "user_id")
    sd = stride("documents", "doc_id")
    sv = stride("embeddings", "vec_id")

    t0 = time.time()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src[t]}')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    rep = f"(SELECT unnest(range({reps})) AS r)"
    plans = {
        "customer": f"""
            SELECT c_custkey + r * {sc} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM read_parquet('{src['customer']}'), {rep}""",
        "supplier": f"""
            SELECT s_suppkey + r * {ss} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM read_parquet('{src['supplier']}'), {rep}""",
        "part": f"""
            SELECT p_partkey + r * {sp} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM read_parquet('{src['part']}'), {rep}""",
        "orders": f"""
            SELECT o_orderkey + r * {so} AS o_orderkey,
                   o_custkey + r * {sc} AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{src['orders']}'), {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + r * {so} AS l_orderkey,
                   l_partkey + r * {sp} AS l_partkey,
                   l_suppkey + r * {ss} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src['lineitem']}'), {rep}""",
        "events": f"""
            SELECT event_id + r * {se} AS event_id, ts,
                   user_id + r * {su} AS user_id, event_type, value, props
            FROM read_parquet('{src['events']}'), {rep}""",
        "documents": f"""
            SELECT doc_id + r * {sd} AS doc_id,
                   CASE WHEN r = 0 THEN text ELSE
                     replace(text, ' ', '_r' || CAST(r AS VARCHAR) || ' ')
                   END AS text,
                   lang, source, n_chars
            FROM read_parquet('{src['documents']}'), {rep}""",
        "embeddings": f"""
            SELECT vec_id + r * {sv} AS vec_id,
                   CASE WHEN r = 0 THEN embedding ELSE
                     list_transform(range(1, len(embedding) + 1),
                       i -> CAST((CAST(hash((vec_id + r * {sv}) * 64 + i)
                                       % 2001 AS DOUBLE) - 1000.0) / 1000.0
                          AS FLOAT))
                   END AS embedding,
                   label
            FROM read_parquet('{src['embeddings']}'), {rep}""",
    }
    for t, q in plans.items():
        con.execute(
            f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
