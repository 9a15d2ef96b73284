from pyspark.sql import functions as F

from datalakefoundation_spark.tables.lake_table import LakeTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, p string, v string")


def test_overwrite_and_read(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t1"))
    assert not t.exists()
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    assert t.exists()
    assert t.read().count() == 2
    t.overwrite(_df(spark, [(3, "a", "z")]))
    assert t.read().count() == 1
    assert t.latest_manifest().version == 1


def test_append(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t2"))
    t.overwrite(_df(spark, [(1, "a", "x")]))
    t.append(_df(spark, [(2, "b", "y")]))
    assert t.read().count() == 2


def test_dynamic_partition_overwrite(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t3"), partition_by=["p"])
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y"), (3, "b", "z")]))
    # dynamic overwrite of partition 'b' only
    t.overwrite(_df(spark, [(9, "b", "new")]), dynamic=True)
    out = {(r["k"], r["p"]) for r in t.read().collect()}
    assert out == {(1, "a"), (9, "b")}


def test_replace_partitions_cow(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t4"), partition_by=["p"])
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    t.replace_partitions(_df(spark, [(5, "a", "x2")]), [{"p": "a"}])
    out = {(r["k"], r["p"]) for r in t.read().collect()}
    assert out == {(5, "a"), (2, "b")}
    # the untouched partition still points at the ORIGINAL segment (no rewrite)
    mf = t.latest_manifest()
    dirs = {seg.dir for seg in mf.segments}
    assert any(d.startswith("data/v00000") for d in dirs)
    assert any(d.startswith("data/v00001") for d in dirs)


def test_partition_move_keeps_row_visible(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t5"), partition_by=["p"])
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    # merge result writes a row that moved from partition a to c
    t.replace_partitions(_df(spark, [(1, "c", "moved")]), [{"p": "a"}])
    out = {(r["k"], r["p"]) for r in t.read().collect()}
    assert (1, "c") in out and (2, "b") in out


def test_time_travel_and_vacuum(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t6"))
    t.overwrite(_df(spark, [(1, "a", "x")]))
    t.overwrite(_df(spark, [(2, "b", "y")]))
    assert t.read(version=0).head()["k"] == 1
    assert t.read().head()["k"] == 2
    assert len(t.history()) == 2
    removed = t.vacuum()
    assert len(removed) == 1 and removed[0].startswith("data/v00000")
    assert t.read().head()["k"] == 2


def test_schema_evolution_union(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t7"))
    t.overwrite(_df(spark, [(1, "a", "x")]))
    wider = spark.createDataFrame([(2, "b", "y", 1.5)], "k int, p string, v string, extra double")
    t.append(wider)
    out = t.read()
    assert "extra" in out.columns
    assert out.where(F.col("extra").isNull()).count() == 1


def test_optimize_compacts_and_preserves_content(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t8"), partition_by=["p"])
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    t.append(_df(spark, [(3, "a", "z")]))
    t.append(_df(spark, [(4, "b", "w")]))
    before = {(r["k"], r["p"], r["v"]) for r in t.read().collect()}
    assert len(t.latest_manifest().segments) == 3
    t.optimize(cluster_by=["k"])
    mf = t.latest_manifest()
    assert mf.operation == "optimize" and len(mf.segments) == 1
    after = {(r["k"], r["p"], r["v"]) for r in t.read().collect()}
    assert after == before
    # old versions still readable until vacuum
    assert t.read(version=mf.version - 1).count() == 4
    t.vacuum()
    assert {(r["k"], r["p"], r["v"]) for r in t.read().collect()} == before


def test_optimize_unpartitioned(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t9"))
    t.overwrite(_df(spark, [(i, "a", "x") for i in range(10)]))
    t.append(_df(spark, [(100 + i, "b", "y") for i in range(10)]))
    t.optimize(cluster_by=["k"], target_partitions=2)
    assert t.read().count() == 20
    assert len(t.latest_manifest().segments) == 1


def test_commit_is_compare_and_swap(spark, tmp_path):
    import pytest

    from datalakefoundation_spark.core.exceptions import ConcurrentCommitException
    from datalakefoundation_spark.tables.lake_table import Manifest

    t = LakeTable(spark, str(tmp_path / "cas"))
    m = Manifest(version=0, partition_by=[], segments=[], operation="append", timestamp=0.0)
    t._commit(m)
    with pytest.raises(ConcurrentCommitException):
        t._commit(m)  # same version again -> conflict, not silent replace
    assert t.latest_manifest().version == 0


def test_hadoop_fs_lifecycle_over_file_uri(spark, tmp_path):
    """The control plane runs against the JVM Hadoop FileSystem when the
    table path is a scheme-qualified URI — same code path an hdfs:// or
    s3a:// deployment takes, driven here through file:// locally. Covers
    manifest listing/commit, partition-dir walking, CoW replace, history,
    CAS conflict, and vacuum."""
    from datalakefoundation_spark.core.exceptions import ConcurrentCommitException
    from datalakefoundation_spark.tables.fs import HadoopFS
    from datalakefoundation_spark.tables.lake_table import Manifest

    import pytest

    t = LakeTable(spark, f"file://{tmp_path}/hdfs_t", partition_by=["p"])
    assert isinstance(t.fs, HadoopFS)
    assert not t.exists()
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    assert t.read().count() == 2
    t.replace_partitions(_df(spark, [(5, "a", "x2")]), [{"p": "a"}])
    out = {(r["k"], r["p"]) for r in t.read().collect()}
    assert out == {(5, "a"), (2, "b")}
    assert [m.version for m in t.history()] == [0, 1]
    # CAS: recommitting an existing version must fail, not clobber
    with pytest.raises(ConcurrentCommitException):
        t._commit(Manifest(version=1))
    removed = t.vacuum()
    assert t.read().count() == 2
    assert [m.version for m in t.history()] == [1]
    assert removed == []  # v0 segment still co-owns partition b


def test_watermark_store_over_file_uri(spark, tmp_path):
    """Driver-side pyarrow bookmark reads/writes route through the same FS
    abstraction (put_bytes/read_bytes on HadoopFS for URI roots)."""
    from datalakefoundation_spark.watermark import WatermarkStore

    ws = WatermarkStore(spark, f"file://{tmp_path}/lake")
    ws.write(1, {"SeqNr": ("int", "42")})
    ws.write(1, {"SeqNr": ("int", "43")})
    assert ws.latest(1) == {"SeqNr": "43"}
    ws.reset(1, "SeqNr")
    assert ws.latest(1) == {"SeqNr": None}


def test_hadoop_fs_translates_missing_paths(spark, tmp_path):
    """A concurrently-deleted segment must surface as Python
    FileNotFoundError (read_bytes) / [] (listdir) / False (isdir) on
    HadoopFS too — WatermarkStore.latest()'s re-read retry and _compact's
    concurrent-fold guard key on FileNotFoundError, so an untranslated
    Py4JJavaError (java.io.FileNotFoundException) on hdfs://-style roots
    would resurrect the read-vs-compaction race the fleet probe exposed."""
    import pytest

    from datalakefoundation_spark.tables.fs import HadoopFS

    fs = HadoopFS(spark, f"file://{tmp_path}")
    gone = f"file://{tmp_path}/no/such/segment"
    with pytest.raises(FileNotFoundError):
        fs.read_bytes(f"{gone}/part-00000.parquet")
    assert fs.listdir(gone) == []
    assert fs.isdir(gone) is False


def test_time_travel_by_timestamp(spark, tmp_path):
    """timestampAsOf analog: read the newest version committed at or before
    a given unix time."""
    import time as _time

    import pytest

    t = LakeTable(spark, str(tmp_path / "tt"))
    t.overwrite(_df(spark, [(1, "a", "x")]))
    after_v0 = _time.time()
    _time.sleep(0.05)
    t.overwrite(_df(spark, [(2, "b", "y"), (3, "c", "z")]))

    assert t.version_at_timestamp(after_v0) == 0
    assert t.read(as_of_timestamp=after_v0).count() == 1
    assert t.read(as_of_timestamp=_time.time()).count() == 2
    with pytest.raises(FileNotFoundError):
        t.version_at_timestamp(after_v0 - 1e6)


def test_optimize_bucketed_table_clusters_within_buckets(spark, tmp_path):
    """optimize() on a PK-hash-bucketed table keeps the bucket layout (and
    manifest bucketing record), folds per-bucket small files, and preserves
    content — the global range-repartition path would be undone by the
    bucket-dir write."""
    from pyspark.sql import functions as F

    t = LakeTable(spark, str(tmp_path / "bop"), bucket_pk="pk", n_buckets=4)
    df = spark.createDataFrame(
        [(f"{i:02x}{'0'*62}", i, f"v{i}") for i in range(64)], "pk string, k int, v string"
    )
    t.overwrite(df)
    t.append(df.withColumn("k", F.col("k") + 100))
    before = t.read().count()
    t.optimize(cluster_by=["k"])
    assert t.read().count() == before
    mf = t.latest_manifest()
    assert mf.bucketing == {"pk": "pk", "n": 4}
    assert len(mf.segments) == 1
    # bucket dirs survived the rewrite
    seg_dirs = t.fs.listdir(f"{t.path}/{mf.segments[0].dir}")
    assert any(d.startswith("__dlf_bucket=") for d in seg_dirs)
    # a fresh instance with NO bucket config adopts the stored layout
    t2 = LakeTable(spark, str(tmp_path / "bop"))
    assert t2.bucket_pk == "pk" and t2.n_buckets == 4
    assert "__dlf_bucket" not in t2.read().columns


def test_compact_small_segments_folds_only_the_tail(spark, tmp_path):
    """Incremental compaction folds small segments into one and leaves the
    large segment's files untouched (the 100 TB maintenance shape)."""
    from datalakefoundation_spark.tables.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), stats_columns=["seq"])
    big = spark.createDataFrame([(i, "big") for i in range(500)], "seq int, src string")
    t.overwrite(big)
    for lo in (1000, 2000, 3000):
        t.append(spark.createDataFrame(
            [(lo + i, "tail") for i in range(5)], "seq int, src string"
        ))
    mf0 = t.latest_manifest()
    assert len(mf0.segments) == 4
    big_dir = mf0.segments[0].dir
    assert mf0.segments[0].rows == 500 and mf0.segments[1].rows == 5

    folded = t.compact_small_segments(small_rows=100)
    assert len(folded) == 3 and big_dir not in folded
    mf1 = t.latest_manifest()
    assert mf1.operation == "compact"
    assert [s.dir for s in mf1.segments][0] == big_dir  # untouched
    assert len(mf1.segments) == 2
    merged = [s for s in mf1.segments if s.dir != big_dir][0]
    assert merged.rows == 15
    assert merged.stats["seq"] == {"min": 1000, "max": 3004, "t": "num"}
    assert t.read().count() == 515
    # nothing else to fold now (one small merged segment is below 2 candidates)
    assert t.compact_small_segments(small_rows=100) == []


def test_compact_small_segments_needs_two_candidates(spark, tmp_path):
    from datalakefoundation_spark.tables.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1,)], "a int"))
    assert t.compact_small_segments() == []


def test_restore_rolls_back_without_copying(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tr1"))
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))     # v0
    t.overwrite(_df(spark, [(9, "z", "only")]))                 # v1
    t.append(_df(spark, [(10, "z", "more")]))                   # v2
    new_v = t.restore(0)
    assert new_v == 3
    assert {r["k"] for r in t.read().collect()} == {1, 2}
    # no data copied: the restore commit references v0's segment dir
    restored_dirs = {s.dir for s in t.latest_manifest().segments}
    assert len(restored_dirs) == 1 and next(iter(restored_dirs)).startswith("data/v00000")
    # rolled-over versions stay time-travel readable
    assert {r["k"] for r in t.read(version=2).collect()} == {9, 10}
    assert t.latest_manifest().operation == "restore"
    # writes after the restore continue the chain
    t.append(_df(spark, [(3, "c", "w")]))
    assert {r["k"] for r in t.read().collect()} == {1, 2, 3}


def test_restore_refuses_vacuumed_version(spark, tmp_path):
    import pytest

    t = LakeTable(spark, str(tmp_path / "tr2"))
    t.overwrite(_df(spark, [(1, "a", "x")]))    # v0
    t.overwrite(_df(spark, [(2, "b", "y")]))    # v1
    t.vacuum(retain_last=1)                     # v0's manifest + dir are gone
    # match the curated message, NOT the word 'vacuumed' alone — pytest's
    # tmp dir path contains this test's own name, which would match too
    with pytest.raises(FileNotFoundError, match="cannot restore .*manifest was vacuumed"):
        t.restore(0)
    # segment dir gone but manifest retained (e.g. foreign deletion): the
    # dir-level guard fires instead of committing an unreadable manifest
    t.overwrite(_df(spark, [(3, "c", "z")]))    # v2
    v1_dir = t.manifest_at(1).segments[0].dir
    t.fs.delete_tree(f"{t.path}/{v1_dir}")
    with pytest.raises(FileNotFoundError, match="cannot restore .*segment dirs"):
        t.restore(1)


def test_restore_across_rebucketing_does_not_corrupt_layout(spark, tmp_path):
    """Restoring an UNBUCKETED version from an instance that is currently
    bucketed must commit the restored manifest with bucketing=None — a
    stamped-on live layout would make every later writer prune merges
    against bucket dirs that don't exist (silent row loss)."""
    path = str(tmp_path / "tr_layout")
    t = LakeTable(spark, path)
    t.overwrite(_df(spark, [(1, "a", "0" * 64), (2, "b", "1" * 64)]))  # v0 plain
    t.set_layout(bucket_pk="v", n_buckets=4, force=True)
    t.overwrite(_df(spark, [(9, "z", "f" * 64)]))                      # v1 bucketed
    assert t.latest_manifest().bucketing is not None
    t.restore(0)                                                        # v2 = v0
    mf = t.latest_manifest()
    assert mf.bucketing is None and mf.partition_by == []
    assert t.bucket_pk is None and t.partition_by == []
    # a FRESH instance adopts the plain layout and reads/writes correctly
    t2 = LakeTable(spark, path)
    assert t2.bucket_pk is None
    assert {r["k"] for r in t2.read().collect()} == {1, 2}
    t2.append(_df(spark, [(3, "c", "2" * 64)]))
    assert {r["k"] for r in t2.read().collect()} == {1, 2, 3}


def test_restore_by_timestamp_and_bucketed_layout(spark, tmp_path):
    import time as _time

    t = LakeTable(spark, str(tmp_path / "tr3"), bucket_pk="v", n_buckets=4)
    t.overwrite(_df(spark, [(i, "a", f"{i:064x}") for i in range(10)]))  # v0
    ts_after_v0 = _time.time()
    t.overwrite(_df(spark, [(99, "b", "f" * 64)]))                       # v1
    t.restore(as_of_timestamp=ts_after_v0)
    assert t.read().count() == 10
    # instance re-adopted the restored bucketed layout
    assert t.bucket_pk == "v" and t.n_buckets == 4


def test_vacuum_retain_seconds_keeps_recent_versions(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tr4"))
    t.overwrite(_df(spark, [(1, "a", "x")]))    # v0
    t.overwrite(_df(spark, [(2, "b", "y")]))    # v1
    t.overwrite(_df(spark, [(3, "c", "z")]))    # v2
    # all commits are seconds old -> a 1-hour horizon keeps everything
    removed = t.vacuum(retain_last=1, retain_seconds=3600)
    assert removed == []
    assert {r["k"] for r in t.read(version=0).collect()} == {1}
    # horizon 0 falls back to pure version-count retention
    removed = t.vacuum(retain_last=1, retain_seconds=0)
    assert removed != []
    assert {r["k"] for r in t.read().collect()} == {3}


def test_stats_summary_control_plane_bounds(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "ss1"), stats_columns=["k", "v"])
    t.overwrite(_df(spark, [(1, "a", "m"), (5, "b", "q")]))
    t.append(_df(spark, [(3, "c", "zz")]))
    s = t.stats_summary()
    assert s["k"] == {"min": 1, "max": 5, "t": "num"}
    assert s["v"] == {"min": "m", "max": "zz", "t": "str"}
    # an older version answers from ITS manifest
    assert t.stats_summary(version=0)["k"]["max"] == 5
    assert t.stats_summary(version=0)["v"]["max"] == "q"


def test_stats_summary_omits_unknown_columns(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "ss2"), stats_columns=["k"])
    t.overwrite(_df(spark, [(1, "a", "x")]))
    # second segment written by an instance NOT recording stats for k
    t2 = LakeTable(spark, str(tmp_path / "ss2"))
    t2.append(_df(spark, [(9, "b", "y")]))
    assert t2.stats_summary() == {}  # k unknown in one segment -> omitted


def test_plain_segments_read_as_one_batched_relation(spark, tmp_path):
    """Plain whole-dir segments must land in ONE multi-path parquet
    relation, not a per-segment union chain — the per-segment form's
    driver plan build measured 6.1 s at 100 tiny segments and 60.3 s at
    1000 (tools/segment_probe.py); batched: 0.7 s / 1.9 s."""
    import time

    t = LakeTable(spark, str(tmp_path / "many"))
    one = spark.range(5).selectExpr("id", "id * 2 AS v")
    for _ in range(40):
        t.append(one)
    start = time.time()
    df = t.read()
    build = time.time() - start
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan[:2000]
    assert df.count() == 200
    # generous wall bound (pre-fix this was multi-second at 40+ segments)
    assert build < 5.0, f"plan build took {build:.2f}s for 40 segments"


def test_batched_read_keeps_schema_evolution_semantics(spark, tmp_path):
    """Additively-evolved segments inside the batched read must behave
    like unionByName(allowMissingColumns): old rows read typed NULLs."""
    t = LakeTable(spark, str(tmp_path / "evo"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.append(spark.createDataFrame([(2, "b", 7.5)], "id long, v string, extra double"))
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    rows = {r["id"]: r for r in t.read().collect()}
    assert set(rows[1].asDict()) == {"id", "v", "extra"}
    assert rows[1]["extra"] is None and rows[3]["extra"] is None
    assert rows[2]["extra"] == 7.5
