"""Blocked-ANN floor-crossing scale probe (r12, VERDICT r11 #3).

Every size-adaptive blocked default (lsh_topk / ivf_topk / semantic_dedup /
lsh_near_dup_scored / ivf_pq_topk) resolves to the PER-PAIR plan at every
driver SF — by design (the 4 MiB plan-size floor sits above sf0.1's
~0.8 MiB embeddings estimate). The at-scale claim therefore needs one
driver-visible scale point ABOVE the floor: the sf1-shaped embeddings
(tools/make_sf1.py, ~10x rows) cross it, the auto path flips to blocked,
and this probe records per-pair vs blocked wall on the same session with
the bench canary, plus the auto plan dump proving FlatMapGroupsInPandas.

Usage: python tools/ann_scale_probe.py [sf1_dir] [k]
Writes plans/r12/q_ann_lsh_sf1_auto.txt and prints one JSON evidence line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _t3(fn) -> tuple[float, float]:
    samples = []
    for _ in range(3):
        start = time.time()
        _force(fn())
        samples.append(time.time() - start)
    return round(min(samples), 3), round(max(samples) - min(samples), 3)


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from datalakefoundation_spark.session import get_spark
    from datalakefoundation_spark.ext import similarity as SIM
    from bench import _canary

    spark = get_spark("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf1_dir": sf1, "k": k}
    embs = spark.read.parquet(f"{sf1}/embeddings.parquet")
    est = SIM._plan_size_bytes(embs)
    floor = int(
        os.environ.get("SPARK_GRAFT_LSH_BLOCKED_MIN_BYTES", str(4 * 1024 * 1024))
    )
    out["plan_size_bytes"] = est
    out["floor_bytes"] = floor
    out["auto_resolves_blocked"] = SIM._resolve_blocked(embs, "vec_id", None)

    canary_pre = _canary(spark)
    # warm-up: one pass of each form
    spark.sparkContext.setJobDescription("warmup")
    _force(SIM.lsh_topk(embs, k=k, blocked=False))
    _force(SIM.lsh_topk(embs, k=k, blocked=True))
    spark.sparkContext.setJobDescription("lsh_topk per-pair")
    out["per_pair_sec"], out["per_pair_spread"] = _t3(
        lambda: SIM.lsh_topk(embs, k=k, blocked=False)
    )
    spark.sparkContext.setJobDescription("lsh_topk blocked")
    out["blocked_sec"], out["blocked_spread"] = _t3(
        lambda: SIM.lsh_topk(embs, k=k, blocked=True)
    )
    spark.sparkContext.setJobDescription("lsh_topk auto")
    out["auto_sec"], out["auto_spread"] = _t3(lambda: SIM.lsh_topk(embs, k=k))
    canary_post = _canary(spark)
    out["canary_sec"] = round(max(canary_pre, canary_post), 3)
    out["speedup_blocked_vs_per_pair"] = (
        round(out["per_pair_sec"] / out["blocked_sec"], 2)
        if out["blocked_sec"] > 0
        else None
    )

    # prove the auto plan at this SF is the blocked shape
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)
    auto_df = SIM.lsh_topk(embs, k=k)
    plan = auto_df._sc._jvm.PythonSQLUtils.explainString(
        auto_df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(plan_dir, "q_ann_lsh_sf1_auto.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    out["auto_plan_has_flatmapgroups"] = "FlatMapGroupsInPandas" in plan
    out["plan_dump"] = os.path.relpath(path, here)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
