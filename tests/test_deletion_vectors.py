"""Merge-on-read deletion vectors (tables/lake_table.py merge_patch /
delete_keys): patch commits append only changed rows and mask superseded
versions in older segments via key anti-joins; compaction/optimize
materialize; vacuum/gc keep dv dirs alive while referenced.
"""

import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.tables.lake_table import MASK_COL, LakeTable


def _base(spark, n=100):
    return spark.range(n).select(
        F.sha2(F.col("id").cast("string"), 256).alias("pk"),
        F.col("id").alias("val"),
    )


def _patch(spark, updates: dict[int, int], inserts: dict[int, int]):
    """Patch rows: updates mask their old version, inserts mask nothing."""
    rows = [(str(k), v, True) for k, v in updates.items()] + [
        (str(k), v, False) for k, v in inserts.items()
    ]
    df = (
        _spark_df(spark, rows)
        .select(
            F.sha2(F.col("_1"), 256).alias("pk"),
            F.col("_2").alias("val"),
            F.col("_3").alias(MASK_COL),
        )
    )
    return df


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, "_1 string, _2 long, _3 boolean")


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_base(spark))
    return t


def _state(t):
    return {r["pk"]: r["val"] for r in t.read().collect()}


def _pk(i: int) -> str:
    import hashlib

    return hashlib.sha256(str(i).encode()).hexdigest()


def test_merge_patch_masks_updates_keeps_inserts(spark, table):
    rows = table.merge_patch(
        _patch(spark, updates={2: 2000, 3: 3000}, inserts={500: 500}),
        keys=["pk"], mask_col=MASK_COL,
    )
    assert rows == 3
    st = _state(table)
    assert len(st) == 101  # 100 base + 1 insert, updated pks not duplicated
    assert st[_pk(2)] == 2000 and st[_pk(3)] == 3000
    assert st[_pk(500)] == 500
    assert st[_pk(1)] == 1
    assert MASK_COL not in table.read().columns
    # time travel: version 0 is the unpatched base
    assert {r["pk"]: r["val"] for r in table.read(version=0).collect()}[_pk(2)] == 2


def test_second_patch_supersedes_first(spark, table):
    table.merge_patch(_patch(spark, {2: 20}, {}), keys=["pk"], mask_col=MASK_COL)
    table.merge_patch(_patch(spark, {2: 200}, {}), keys=["pk"], mask_col=MASK_COL)
    st = _state(table)
    assert st[_pk(2)] == 200 and len(st) == 100


def test_empty_patch_commits_nothing(spark, table):
    v = table.latest_manifest().version
    rows = table.merge_patch(
        _patch(spark, {}, {}), keys=["pk"], mask_col=MASK_COL
    )
    assert rows == 0
    assert table.latest_manifest().version == v
    # no orphaned segment dir left behind
    assert table.gc_orphans(older_than_seconds=0) == []


def test_delete_keys_hard_delete_and_resurrection(spark, table):
    victims = spark.createDataFrame([( _pk(5),), (_pk(6),)], "pk string")
    table.delete_keys(victims, keys=["pk"])
    st = _state(table)
    assert _pk(5) not in st and _pk(6) not in st and len(st) == 98
    # time travel still shows them
    assert _pk(5) in {r["pk"] for r in table.read(version=0).collect()}
    # re-insert AFTER the delete: the dv is attached only to older segments,
    # so the new row must resurface
    table.merge_patch(
        _patch(spark, {}, {5: 5555}), keys=["pk"], mask_col=MASK_COL
    )
    st = _state(table)
    assert st[_pk(5)] == 5555 and len(st) == 99


def test_compaction_materializes_dv(spark, table):
    table.merge_patch(_patch(spark, {1: 10, 2: 20}, {300: 300}), keys=["pk"], mask_col=MASK_COL)
    before = _state(table)
    folded = table.compact_small_segments(small_rows=10_000)
    assert folded  # base + patch both under the threshold
    mf = table.latest_manifest()
    assert all(not s.dv for s in mf.segments)
    assert _state(table) == before
    assert MASK_COL not in table.read().columns


def test_optimize_materializes_dv(spark, table):
    victims = spark.createDataFrame([(_pk(7),)], "pk string")
    table.delete_keys(victims, keys=["pk"])
    table.optimize()
    mf = table.latest_manifest()
    assert all(not s.dv for s in mf.segments)
    assert _pk(7) not in _state(table) and len(_state(table)) == 99


def test_vacuum_keeps_live_dv_dirs(spark, table):
    victims = spark.createDataFrame([(_pk(8),)], "pk string")
    table.delete_keys(victims, keys=["pk"])
    table.vacuum(retain_last=1)
    # the dv dir is referenced by the current version — must survive vacuum
    st = _state(table)
    assert _pk(8) not in st and len(st) == 99
    # after materialization the dv dir is unreferenced and vacuumable
    table.optimize()
    removed = table.vacuum(retain_last=1)
    assert any("-dv-" in d for d in removed)
    assert len(_state(table)) == 99


def test_multi_key_dv_masks_version_not_pk(spark, tmp_path):
    """Composite keys (the SCD2 shape): masking (pk, vfrom) removes one
    version, other versions of the same pk survive."""
    t = LakeTable(spark, str(tmp_path / "v"))
    t.overwrite(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)], "pk string, vfrom int, val int"
        )
    )
    patch = spark.createDataFrame(
        [("a", 2, 25, True)], f"pk string, vfrom int, val int, {MASK_COL} boolean"
    )
    t.merge_patch(patch, keys=["pk", "vfrom"], mask_col=MASK_COL)
    rows = {(r["pk"], r["vfrom"]): r["val"] for r in t.read().collect()}
    assert rows == {("a", 1): 10, ("a", 2): 25, ("b", 1): 30}


def test_view_sql_applies_dv(spark, table):
    table.merge_patch(_patch(spark, {4: 40}, {600: 600}), keys=["pk"], mask_col=MASK_COL)
    victims = spark.createDataFrame([(_pk(9),)], "pk string")
    table.delete_keys(victims, keys=["pk"])
    via_view = {r["pk"]: r["val"] for r in spark.sql(table.to_view_sql()).collect()}
    assert via_view == _state(table)
    assert MASK_COL not in spark.sql(table.to_view_sql()).columns


def test_bucketed_table_patch(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "b"), bucket_pk="pk", n_buckets=4)
    t.overwrite(_base(spark, n=200))
    t.merge_patch(_patch(spark, {10: 100_000}, {999: 999}), keys=["pk"], mask_col=MASK_COL)
    st = _state(t)
    assert st[_pk(10)] == 100_000 and st[_pk(999)] == 999 and len(st) == 201
    # patch rode the bucketed write path: its segment owns bucket values
    patch_seg = t.latest_manifest().segments[-1]
    assert patch_seg.partitions is not None


def test_dv_mask_join_broadcasts_once(spark, table):
    """Deletion vectors apply as ONE broadcast join over a global
    version-keyed mask table — per-patch anti-joins built O(patches^2)
    distinct broadcast exchanges and made reads slow down quadratically
    with live patches (measured 0.5 s -> 19.6 s at 32 patches / 2M rows)."""
    for i in range(4):
        table.merge_patch(
            _patch(spark, {i: 10 * i}, {}), keys=["pk"], mask_col=MASK_COL
        )
    plan = table.read()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    assert "LeftOuter, BuildRight" in plan
    assert "BroadcastNestedLoop" not in plan


def test_cow_replace_preserves_dv_on_kept_segments(spark, tmp_path):
    """Review repro: a copy-on-write replace of one bucket must NOT drop
    the dv refs on kept segments — the patch-masked old version (and
    delete_keys-erased rows) must stay invisible."""
    t = LakeTable(spark, str(tmp_path / "t"), bucket_pk="pk", n_buckets=4)
    t.overwrite(_base(spark, n=100))
    t.merge_patch(_patch(spark, {2: 2000}, {}), keys=["pk"], mask_col=MASK_COL)
    t.delete_keys(spark.createDataFrame([(_pk(3),)], "pk string"), keys=["pk"])
    # replace a bucket that does NOT hold pk2/pk3's rows: pick the bucket
    # of pk7 and rewrite just that bucket's current content
    from datalakefoundation_spark.tables.lake_table import BUCKET_COL, bucket_expr

    b7 = (
        _base(spark, n=100)
        .withColumn(BUCKET_COL, bucket_expr("pk", 4))
        .where(F.col("pk") == _pk(7))
        .collect()[0][BUCKET_COL]
    )
    content = t.read(keep_bucket=True).where(F.col(BUCKET_COL) == b7).drop(BUCKET_COL)
    t.replace_partitions(content, [{BUCKET_COL: str(b7)}])
    st = _state(t)
    assert st[_pk(2)] == 2000, "masked old version resurrected by CoW replace"
    assert _pk(3) not in st, "hard-deleted key resurrected by CoW replace"
    assert len(st) == 99


def test_dynamic_overwrite_preserves_dv(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "p"), partition_by=["p"])
    t.overwrite(
        spark.createDataFrame(
            [("a", 0, 1), ("b", 0, 2), ("c", 1, 3)], "pk string, p int, val int"
        )
    )
    t.delete_keys(spark.createDataFrame([("a",)], "pk string"), keys=["pk"])
    # dynamic overwrite of partition 1 only — partition 0 keeps its dv
    t.overwrite(
        spark.createDataFrame([("d", 1, 9)], "pk string, p int, val int"),
        dynamic=True,
    )
    rows = {r["pk"]: r["val"] for r in t.read().collect()}
    assert rows == {"b": 2, "d": 9}


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_compaction_coalesces_surviving_dv_refs(spark, tmp_path):
    """A big base segment (not folded) accumulates one dv ref per patch;
    compaction must coalesce them into ONE merged ref while the folded
    patch tail materializes — state identical, read fan-in O(1)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_base(spark, n=2000))
    for i in range(6):
        t.merge_patch(
            _patch(spark, {i: 10_000 + i}, {5000 + i: i}),
            keys=["pk"], mask_col=MASK_COL,
        )
    before = _state(t)
    base_seg = t.latest_manifest().segments[0]
    assert len(base_seg.dv) == 6
    folded = t.compact_small_segments(small_rows=1000)  # folds the 6 patches
    assert len(folded) == 6
    mf = t.latest_manifest()
    base_after = next(s for s in mf.segments if s.dir == base_seg.dir)
    assert len(base_after.dv) == 1 and base_after.dv[0]["flag"] is None
    assert _state(t) == before
    # merged dv dir survives vacuum while referenced
    t.vacuum(retain_last=1)
    assert _state(t) == before

def test_mor_read_batches_segments_and_dv_dirs(spark, table):
    """A trickle-merged table (the fastest segment accumulator: one patch
    segment + one dv dir per merge) must read through a BOUNDED number of
    parquet relations, not O(patches): the data segments collapse into one
    multi-path scan with per-row versions parsed from _metadata.file_path,
    and same-(keys, flag) dv dirs collapse into one multi-path mask scan.
    The per-relation form measured 17.5 s at 32 patches / 2M rows; the
    batched form 6.3 s (tools/mor_read_probe.py)."""
    for i in range(12):
        table.merge_patch(
            _patch(spark, {i: 10 * i}, {1000 + i: i}), keys=["pk"], mask_col=MASK_COL
        )
    df = table.read()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_rel = plan.count("Relation [")
    assert n_rel <= 3, f"{n_rel} relations for 13 segments:\n{plan[:3000]}"
    st = {r["pk"]: r["val"] for r in df.collect()}
    assert len(st) == 112
    assert st[_pk(5)] == 50 and st[_pk(1005)] == 5 and st[_pk(99)] == 99


def test_mor_read_batches_bucketed_segments(spark, tmp_path):
    """Bucketed MoR tables batch via their __dlf_bucket leaf dirs (multi-
    root hive discovery rejects mixed roots); correctness and the bounded
    relation count must both hold on keep_bucket=False reads."""
    t = LakeTable(spark, str(tmp_path / "bm"), bucket_pk="pk", n_buckets=4)
    t.overwrite(_base(spark, n=200))
    for i in range(6):
        t.merge_patch(
            _patch(spark, {i: 7 * i}, {500 + i: i}), keys=["pk"], mask_col=MASK_COL
        )
    df = t.read()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_rel = plan.count("Relation [")
    assert n_rel <= 3, f"{n_rel} relations for 7 bucketed segments:\n{plan[:3000]}"
    st = {r["pk"]: r["val"] for r in df.collect()}
    assert len(st) == 206
    assert st[_pk(3)] == 21 and st[_pk(503)] == 3 and st[_pk(150)] == 150
