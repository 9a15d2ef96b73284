"""Row-identity of the blocked (matmul mapInPandas) ANN paths vs their
per-pair twins, plus edge cases the cert corpus can hit (zero vectors,
ties, self-exclusion). The blocked paths exist so the 1M-vector
certification (tools/ann_cert.py) has an exact ground truth and an IVF
assignment that survives K≈1000 centroids; their contract is BIT-identical
results (same IEEE fold order, same tie rules), not approximate agreement.
"""

import os

import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.ext import similarity as SIM

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in df.collect()
    )


def test_brute_force_blocked_row_identical(spark, embs):
    base = SIM.brute_force_topk(
        embs.where(F.col("vec_id") % 25 == 0), embs, k=7
    )
    blocked = SIM.brute_force_topk_blocked(embs, k=7, query_stride=25)
    assert _rows(blocked) == _rows(base)


def test_brute_force_blocked_self_excluded_and_k_bound(spark, embs):
    out = SIM.brute_force_topk_blocked(embs, k=3, query_stride=100).collect()
    assert out, "expected results"
    per_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_brute_force_blocked_query_cap(spark, embs):
    with pytest.raises(ValueError, match="max_queries"):
        SIM.brute_force_topk_blocked(embs, k=2, query_stride=1, max_queries=10)


def test_ivf_assign_blocked_identical(spark, embs):
    a = {
        (r["vec_id"], r["cluster_id"])
        for r in SIM.ivf_assign(embs, centroid_stride=37).collect()
    }
    b = {
        (r["vec_id"], r["cluster_id"])
        for r in SIM.ivf_assign(embs, centroid_stride=37, blocked=True).collect()
    }
    assert a == b


def test_ivf_topk_blocked_identical(spark, embs):
    base = SIM.ivf_topk(embs, k=5, query_stride=50, nprobe=3)
    blk = SIM.ivf_topk(embs, k=5, query_stride=50, nprobe=3, blocked=True)
    assert _rows(blk) == _rows(base)


def test_ivf_probes_blocked_nprobe_fanout(spark, embs):
    probes = SIM.ivf_probes(
        embs, F.col("vec_id") % 50 == 0, nprobe=3, blocked=True
    ).collect()
    per_vec = {}
    for r in probes:
        per_vec.setdefault(r["vec_id"], set()).add(r["cluster_id"])
    assert per_vec and all(len(cells) == 3 for cells in per_vec.values())
    base = SIM.ivf_probes(embs, F.col("vec_id") % 50 == 0, nprobe=3).collect()
    base_pv = {}
    for r in base:
        base_pv.setdefault(r["vec_id"], set()).add(r["cluster_id"])
    assert per_vec == base_pv


def test_blocked_zero_vector_nan_ranks_first(spark):
    # zero-norm cosine is NaN; Spark's desc order puts NaN first, so a
    # zero query ranks every neighbor NaN and keeps id-ascending order —
    # the blocked partials must reproduce that (inf sort-key mirror)
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = SIM.brute_force_topk(df.where("vec_id = 0"), df, k=2)
    blk = SIM.brute_force_topk_blocked(df, k=2, query_pred=F.col("vec_id") == 0)

    def key(df_):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], str(r["cosine"]))
            for r in df_.collect()
        )

    assert key(blk) == key(base)


def test_ivf_pq_blocked_identical(spark, embs):
    base = SIM.ivf_pq_topk(embs, k=3, query_stride=100, nprobe=2, rerank=16)
    blk = SIM.ivf_pq_topk(
        embs, k=3, query_stride=100, nprobe=2, rerank=16, blocked=True
    )
    assert _rows(blk) == _rows(base)
