"""Capture `.explain("formatted")` for every headline bench query into
plans/<round>/<query>_<tag>.txt (optimization-round evidence files).

Usage: python tools/capture_plans.py <tag> [sf_dir] [round_dir] [query ...]
  tag        "before" or "after" (file suffix)
  sf_dir     default /root/testdata/sf0.1
  round_dir  default plans/r11
  query ...  subset of names; default = bench.HEADLINE + load strategies'
             core plans are captured separately (they are write paths).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    round_dir = sys.argv[3] if len(sys.argv) > 3 else "plans/r11"
    only = set(sys.argv[4:])

    import bench
    from datalakefoundation_spark.session import get_spark
    from datalakefoundation_spark.verification import all_queries

    os.makedirs(round_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registry = all_queries()
    names = list(bench.HEADLINE)
    for name in names:
        if only and name not in only:
            continue
        fn = registry.get(name, (None,))[0] or bench.EXTRA_BENCH_QUERIES.get(name)
        if fn is None:
            print(f"{name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        out = os.path.join(round_dir, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
