"""Fact⋈fact bucketed-layout probe (r12, VERDICT r11 #4).

q_top_customers / q_shipping_priority deliberately shuffle BOTH fact tables
(orders, lineitem) on the orderkey — the one residual exchange their shapes
still pay. Guide §3.4/§6: a bucketed co-located layout (both facts written
``bucketBy(N, orderkey)``) makes every orderkey equi-join and
orderkey-clustered aggregation exchange-free ACROSS JOBS, at the cost of one
full shuffle+rewrite of both tables at write time.

This probe measures whether that trade pays:
* baseline: the two declared query shapes from the plain parquet inputs
  (noop sink, min-of-3 — the bench methodology);
* layout: one-time ``bucketBy`` write of orders+lineitem into a scratch
  warehouse (cost recorded);
* bucketed: the same query logic over the bucketed tables, with the
  fact-fact Exchange count asserted from the plan;
* verdict: rows must be identical, and the repay horizon is
  write_cost / per-query saving.

The DECLARED queries cannot adopt this (their inputs are the driver's given
parquet files, and pre-writing a bucketed copy keyed on the test data would
be cross-run precomputation — banned); the probe records whether the
LIBRARY layout is worth recommending at scale, or a refutation.

Usage: python tools/fact_bucket_probe.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _t3(fn) -> tuple[float, float]:
    samples = []
    for _ in range(3):
        start = time.time()
        _force(fn())
        samples.append(time.time() - start)
    return round(min(samples), 3), round(max(samples) - min(samples), 3)


def _shipping_priority(li, orders, cust):
    c = cust.where(F.col("c_mktsegment") == "BUILDING")
    o = orders.where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    l = li.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _top_customers(li, orders, cust, nation):
    l = li.where(F.col("l_returnflag") == "R")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        l.join(orders, l.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("revenue_dec"))
        .orderBy(F.desc("revenue_dec"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            F.col("revenue_dec").cast("double").alias("revenue"),
        )
    )


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    warehouse = tempfile.mkdtemp(prefix="dlf_bucket_probe_")

    from datalakefoundation_spark.session import get_spark

    spark = get_spark(
        "fact-bucket-probe",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _canary

    out: dict = {"sf_dir": sf_dir, "n_buckets": n_buckets}
    try:
        canary_pre = _canary(spark)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

        # warm-up + baseline
        spark.sparkContext.setJobDescription("baseline shipping_priority")
        _force(_shipping_priority(li, orders, cust))
        _force(_top_customers(li, orders, cust, nation))
        out["base_shipping_sec"], out["base_shipping_spread"] = _t3(
            lambda: _shipping_priority(li, orders, cust)
        )
        out["base_topcust_sec"], out["base_topcust_spread"] = _t3(
            lambda: _top_customers(li, orders, cust, nation)
        )
        out["base_shipping_exchanges"] = _n_exchanges(
            _shipping_priority(li, orders, cust)
        )
        out["base_topcust_exchanges"] = _n_exchanges(
            _top_customers(li, orders, cust, nation)
        )

        # one-time bucketed layout write (the cost side of the trade)
        spark.sparkContext.setJobDescription("bucketBy layout write")
        t0 = time.time()
        (orders.write.mode("overwrite").bucketBy(n_buckets, "o_orderkey")
         .sortBy("o_orderkey").format("parquet").saveAsTable("b_orders"))
        (li.write.mode("overwrite").bucketBy(n_buckets, "l_orderkey")
         .sortBy("l_orderkey").format("parquet").saveAsTable("b_lineitem"))
        out["layout_write_sec"] = round(time.time() - t0, 3)

        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        spark.sparkContext.setJobDescription("bucketed shipping_priority")
        _force(_shipping_priority(bl, bo, cust))  # warm
        out["bucketed_shipping_sec"], out["bucketed_shipping_spread"] = _t3(
            lambda: _shipping_priority(bl, bo, cust)
        )
        out["bucketed_topcust_sec"], out["bucketed_topcust_spread"] = _t3(
            lambda: _top_customers(bl, bo, cust, nation)
        )
        out["bucketed_shipping_exchanges"] = _n_exchanges(
            _shipping_priority(bl, bo, cust)
        )
        out["bucketed_topcust_exchanges"] = _n_exchanges(
            _top_customers(bl, bo, cust, nation)
        )

        # row identity of the probe twins. The shipping shape sums PLAIN
        # DOUBLES (the declared query's form), whose accumulation order —
        # and therefore last-ulp value — legitimately differs between
        # partitionings; compare at 1e-6 relative so the check tests the
        # JOIN/AGG logic, not IEEE reassociation. top_customers sums
        # exact decimals, so it compares strictly.
        import math

        def _approx_eq(xs, ys):
            xs, ys = sorted(xs), sorted(ys)
            if len(xs) != len(ys):
                return False
            for x, y in zip(xs, ys):
                for u, v in zip(x, y):
                    if isinstance(u, float):
                        if not math.isclose(u, v, rel_tol=1e-6):
                            return False
                    elif u != v:
                        return False
            return True

        a = [tuple(r) for r in _shipping_priority(li, orders, cust).collect()]
        b = [tuple(r) for r in _shipping_priority(bl, bo, cust).collect()]
        out["rows_identical_shipping"] = _approx_eq(a, b)
        a = sorted(map(tuple, _top_customers(li, orders, cust, nation).collect()))
        b = sorted(map(tuple, _top_customers(bl, bo, cust, nation).collect()))
        out["rows_identical_topcust"] = a == b

        canary_post = _canary(spark)
        out["canary_sec"] = round(max(canary_pre, canary_post), 3)
        saving = (out["base_shipping_sec"] - out["bucketed_shipping_sec"]) + (
            out["base_topcust_sec"] - out["bucketed_topcust_sec"]
        )
        out["per_two_query_saving_sec"] = round(saving, 3)
        out["repay_after_n_query_pairs"] = (
            round(out["layout_write_sec"] / saving, 1) if saving > 0 else None
        )
    finally:
        print(json.dumps(out))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
