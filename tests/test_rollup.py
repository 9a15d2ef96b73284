"""Incremental rollup (continuous-aggregate) maintenance: refresh_rollup
must produce byte-identical state to a from-scratch rollup_cascade rebuild
under inserts, deletes, updates, and group-migrating updates."""

import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.ext import rollup as RU
from datalakefoundation_spark.tables.changes import compute_changes
from datalakefoundation_spark.verification.core_queries import read_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return (
        read_events(spark, SF)
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .select("event_id", "ts_us", "event_type", "value")
        .cache()
    )


def _levels_equal(a, b, label):
    ga = {tuple(r) for r in a.collect()}
    gb = {tuple(r) for r in b.collect()}
    assert ga == gb, f"{label}: refresh diverges from full rebuild"


def _apply_churn(spark, events):
    """inserts + deletes + plain updates + a ts-migrating update."""
    ids = [r["event_id"] for r in events.select("event_id").orderBy("event_id").limit(40).collect()]
    delete_ids = ids[:10]
    update_ids = ids[10:20]
    migrate_ids = ids[20:25]
    base = events.where(~F.col("event_id").isin(delete_ids))
    base = base.withColumn(
        "value",
        F.when(F.col("event_id").isin(update_ids), F.col("value") * 3 + 1).otherwise(
            F.col("value")
        ),
    )
    # migrate across buckets AND event_type: pre- and post-image land in
    # different (bucket, key) groups
    base = base.withColumn(
        "ts_us",
        F.when(
            F.col("event_id").isin(migrate_ids),
            F.col("ts_us") + F.lit(2 * RU.DAY_US),
        ).otherwise(F.col("ts_us")),
    ).withColumn(
        "event_type",
        F.when(F.col("event_id").isin(migrate_ids), F.lit("migrated")).otherwise(
            F.col("event_type")
        ),
    )
    inserts = spark.createDataFrame(
        [
            (9_000_001, 1_700_000_000_000_000, "purchase", 12.5),
            (9_000_002, 1_700_000_000_000_000 + RU.HOUR_US, "newtype", -3.25),
        ],
        "event_id long, ts_us long, event_type string, value double",
    )
    return base.unionByName(inserts).cache()


def test_refresh_rollup_equals_full_rebuild(spark, events):
    stored = {w: lv.cache() for w, lv in RU.rollup_cascade(events).items()}
    after = _apply_churn(spark, events)
    feed = compute_changes(events, after, pk="event_id")
    refreshed = RU.refresh_rollup(after, stored, feed)
    expected = RU.rollup_cascade(after)
    assert set(refreshed) == set(expected)
    for width in expected:
        _levels_equal(refreshed[width], expected[width], f"width={width}")


def test_refresh_rollup_noop_feed_is_identity(spark, events):
    stored = {w: lv.cache() for w, lv in RU.rollup_cascade(events).items()}
    empty = compute_changes(events, events, pk="event_id")
    assert empty.count() == 0
    refreshed = RU.refresh_rollup(events, stored, empty)
    for width, lv in stored.items():
        _levels_equal(refreshed[width], lv, f"noop width={width}")


def test_refresh_rollup_recomputes_only_affected_raw_groups(spark, events):
    """The raw-side recompute input must be limited to the churned
    (bucket, key) groups — cost ∝ churn, not table size."""
    after = _apply_churn(spark, events)
    feed = compute_changes(events, after, pk="event_id")
    affected = feed.select(
        (F.col("ts_us") - F.col("ts_us") % RU.MINUTE_US).alias("b"), "event_type"
    ).distinct()
    n_affected_rows = (
        after.join(
            affected,
            on=[
                after["ts_us"] - after["ts_us"] % RU.MINUTE_US == affected["b"],
                after["event_type"] == affected["event_type"],
            ],
            how="leftsemi",
        )
    ).count()
    assert n_affected_rows < after.count() * 0.5, (
        "fixture churn unexpectedly touches most of the table; "
        "the proportionality assertion below would be vacuous"
    )
    # the refreshed finest level differs from stored ONLY on affected groups
    stored = {w: lv.cache() for w, lv in RU.rollup_cascade(events).items()}
    refreshed = RU.refresh_rollup(after, stored, feed)
    untouched_before = stored[RU.MINUTE_US].join(
        affected.withColumnRenamed("b", "bucket_start_us"),
        on=["bucket_start_us", "event_type"],
        how="left_anti",
    )
    untouched_after = refreshed[RU.MINUTE_US].join(
        affected.withColumnRenamed("b", "bucket_start_us"),
        on=["bucket_start_us", "event_type"],
        how="left_anti",
    )
    _levels_equal(untouched_before, untouched_after, "untouched carried over")


def test_refresh_rollup_lake_equals_rebuild(spark, events, tmp_path):
    """Ladder persisted as LakeTables, maintained with patch-only writes:
    post-refresh table contents must equal a from-scratch rebuild."""
    from datalakefoundation_spark.tables.lake_table import LakeTable

    tables = {
        w: LakeTable(spark, str(tmp_path / f"lv_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(events, tables)
    after = _apply_churn(spark, events)
    feed = compute_changes(events, after, pk="event_id")
    metrics = RU.refresh_rollup_lake(after, tables, feed)
    expected = RU.rollup_cascade(after)
    for w in expected:
        got = tables[w].read().select(*expected[w].columns)
        _levels_equal(got, expected[w], f"lake width={w}")
    assert metrics[RU.MINUTE_US]["patched"] > 0
    # write cost is the patch, not the level: the refresh commit's segment
    # rows must be ≈ affected groups, far below the full level row count
    assert metrics[RU.MINUTE_US]["patched"] < tables[RU.MINUTE_US].read().count()


def test_refresh_rollup_lake_vanished_group(spark, tmp_path):
    """Deleting every event of a (bucket, key) group must remove the group
    row from every level (the delete_keys leg)."""
    from datalakefoundation_spark.tables.lake_table import LakeTable

    t0 = 1_700_000_000_000_000
    base = spark.createDataFrame(
        [
            (1, t0, "solo", 1.0),
            (2, t0 + 1_000_000, "solo", 2.0),
            (3, t0, "keep", 5.0),
            (4, t0 + RU.DAY_US, "keep", 7.0),
        ],
        "event_id long, ts_us long, event_type string, value double",
    )
    tables = {
        w: LakeTable(spark, str(tmp_path / f"v_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(base, tables)
    after = base.where(F.col("event_type") != "solo")
    feed = compute_changes(base, after, pk="event_id")
    # threshold > 1 disables the adaptive rebuild: this test exercises the
    # patch + delete_keys legs, which a 4-row fixture would otherwise skip
    metrics = RU.refresh_rollup_lake(after, tables, feed, rebuild_threshold=2.0)
    assert metrics[RU.MINUTE_US]["deleted"] == 1
    for w in tables:
        rows = tables[w].read().where(F.col("event_type") == "solo").count()
        assert rows == 0, f"width={w}: vanished group still visible"
        expected = RU.rollup_cascade(after, resolutions_us=(w,))[w]
        _levels_equal(
            tables[w].read().select(*expected.columns), expected, f"width={w}"
        )


def test_refresh_rollup_lake_adaptive_rebuild(spark, events, tmp_path):
    """When churn touches ≥ threshold of a level's groups, the level must
    be rebuilt wholesale (one overwrite commit) — and still match."""
    from datalakefoundation_spark.tables.lake_table import LakeTable

    tables = {
        w: LakeTable(spark, str(tmp_path / f"a_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(events, tables)
    # churn EVERY row: worst-case scattered update
    after = events.withColumn("value", F.col("value") + 1.0)
    feed = compute_changes(events, after, pk="event_id")
    metrics = RU.refresh_rollup_lake(after, tables, feed)
    assert all(m["rebuilt"] for m in metrics.values()), metrics
    assert all(
        t.latest_manifest().operation == "rollup_rebuild" for t in tables.values()
    )
    expected = RU.rollup_cascade(after)
    for w in expected:
        got = tables[w].read().select(*expected[w].columns)
        _levels_equal(got, expected[w], f"adaptive width={w}")


def test_fold_rollup_inserts_equals_rebuild(spark, events, tmp_path):
    """Insert-only fold: ladder after folding a batch must equal a rebuild
    over base ∪ batch — including brand-new groups and min/max movement."""
    from datalakefoundation_spark.tables.lake_table import LakeTable

    tables = {
        w: LakeTable(spark, str(tmp_path / f"f_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(events, tables)
    batch = spark.createDataFrame(
        [
            (9_100_001, 1_700_000_000_000_000, "purchase", 1e9),  # max mover
            (9_100_002, 1_700_000_000_000_000, "purchase", -1e9),  # min mover
            (9_100_003, 1_700_000_005_000_000, "brandnew", 3.5),  # new group
        ],
        "event_id long, ts_us long, event_type string, value double",
    )
    patched = RU.fold_rollup_inserts(batch, tables)
    assert all(n > 0 for n in patched.values())
    expected = RU.rollup_cascade(events.unionByName(batch))
    for w in expected:
        got = tables[w].read().select(*expected[w].columns)
        _levels_equal(got, expected[w], f"fold width={w}")


def test_stream_rollup_restart_exactly_once(spark, events, tmp_path):
    """stream_rollup over a file source: run to completion, add more
    files, restart on the same checkpoint — final ladder must equal a
    batch rebuild over everything, with no double-folded batches."""
    from datalakefoundation_spark.streaming.ops import stream_rollup
    from datalakefoundation_spark.tables.lake_table import LakeTable

    src = tmp_path / "src"
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(str(src))
    tables = {
        w: LakeTable(spark, str(tmp_path / f"s_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    schema = "event_id long, ts_us long, event_type string, value double"
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(str(src))
        )
        q = stream_rollup(stream, tables, ckpt)
        q.awaitTermination(120)

    run()
    mid = RU.rollup_cascade(first)
    for w in mid:
        _levels_equal(
            tables[w].read().select(*mid[w].columns), mid[w], f"mid width={w}"
        )
    second.write.mode("append").parquet(str(src))
    run()
    expected = RU.rollup_cascade(events)
    for w in expected:
        _levels_equal(
            tables[w].read().select(*expected[w].columns),
            expected[w],
            f"final width={w}",
        )


def test_rollup_hll_distinct_reaggregates(spark, events):
    """Mergeable distinct sketch: coarse-level estimates derived by
    unioning fine sketches must equal sketching the coarse bucket
    directly, and estimates must be near the exact distinct counts."""
    ev = events.withColumn("uid", F.col("event_id") % 37)
    ladder = RU.rollup_cascade(ev, distinct_col="uid")
    day = RU.finalize(ladder[RU.DAY_US]).select(
        "bucket_start_us", "event_type", "approx_distinct"
    )
    direct = RU.finalize(
        RU.rollup_cascade(ev, distinct_col="uid", resolutions_us=(RU.DAY_US,))[
            RU.DAY_US
        ]
    ).select("bucket_start_us", "event_type", "approx_distinct")
    got = {tuple(r[:2]): r[2] for r in day.collect()}
    want = {tuple(r[:2]): r[2] for r in direct.collect()}
    assert got == want, "union-of-fine-sketches != direct coarse sketch"
    exact = {
        tuple(r[:2]): r[2]
        for r in ev.groupBy(
            (F.col("ts_us") - F.col("ts_us") % RU.DAY_US).alias("b"),
            "event_type",
        )
        .agg(F.countDistinct("uid").alias("d"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])


def test_rollup_hll_refresh_and_fold(spark, events, tmp_path):
    """The sketch column must survive both maintenance paths: a general
    refresh (recompute) and an insert-only fold — estimate-equal to a
    from-scratch rebuild."""
    from datalakefoundation_spark.tables.lake_table import LakeTable

    ev = events.withColumn("uid", F.col("event_id") % 37)

    def estimates(level_df):
        return {
            tuple(r[:2]): r[2]
            for r in RU.finalize(level_df)
            .select("bucket_start_us", "event_type", "approx_distinct")
            .collect()
        }

    # refresh path (plain DataFrames)
    stored = {
        w: lv.cache()
        for w, lv in RU.rollup_cascade(ev, distinct_col="uid").items()
    }
    after = ev.where(F.col("event_id") % 5 != 0)  # deletes
    feed = compute_changes(ev, after, pk="event_id")
    refreshed = RU.refresh_rollup(after, stored, feed, distinct_col="uid")
    rebuilt = RU.rollup_cascade(after, distinct_col="uid")
    for w in rebuilt:
        assert estimates(refreshed[w]) == estimates(rebuilt[w]), f"refresh w={w}"

    # fold path (LakeTables, insert-only)
    tables = {
        w: LakeTable(spark, str(tmp_path / f"h_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(after, tables, distinct_col="uid")
    batch = spark.createDataFrame(
        [(9_200_001, 1_700_000_000_000_000, "purchase", 2.0, 999)],
        "event_id long, ts_us long, event_type string, value double, uid long",
    )
    RU.fold_rollup_inserts(batch, tables, distinct_col="uid")
    folded_all = RU.rollup_cascade(after.unionByName(batch), distinct_col="uid")
    for w in folded_all:
        assert estimates(tables[w].read()) == estimates(folded_all[w]), f"fold w={w}"


def test_gapfill_strategies(spark):
    """Synthetic 1-key ladder with two interior gaps and one leading gap:
    zero fills 0, locf carries, linear interpolates exactly; observed rows
    pass through untouched and `gap` flags only synthesized rows."""
    m = RU.MINUTE_US
    level = spark.createDataFrame(
        [(2 * m, "k", 10, 10.0), (5 * m, "k", 40, 40.0), (6 * m, "k", 100, 7.0)],
        "bucket_start_us long, event_type string, n_events long, v double",
    )
    base = {"bounds": (0, 6 * m), "value_cols": ("n_events", "v")}

    rows = {
        r["bucket_start_us"] // m: r
        for r in RU.gapfill(level, m, strategy="zero", **base).collect()
    }
    assert [rows[i]["n_events"] for i in range(7)] == [0, 0, 10, 0, 0, 40, 100]
    assert [rows[i]["gap"] for i in range(7)] == [
        True, True, False, True, True, False, False,
    ]

    rows = {
        r["bucket_start_us"] // m: r
        for r in RU.gapfill(level, m, strategy="locf", **base).collect()
    }
    assert [rows[i]["n_events"] for i in range(7)] == [
        None, None, 10, 10, 10, 40, 100,
    ]

    rows = {
        r["bucket_start_us"] // m: r
        for r in RU.gapfill(level, m, strategy="linear", **base).collect()
    }
    got = [rows[i]["v"] for i in range(7)]
    assert got[:2] == [None, None]  # leading gaps have no left anchor
    assert got[2:] == [10.0, 20.0, 30.0, 40.0, 7.0]


def test_gapfill_spans_per_key_without_bounds(spark):
    """Without bounds, each key's grid spans only its own observed range."""
    m = RU.MINUTE_US
    level = spark.createDataFrame(
        [(0, "a", 1, 1.0), (3 * m, "a", 2, 2.0), (10 * m, "b", 5, 5.0)],
        "bucket_start_us long, event_type string, n_events long, v double",
    )
    out = RU.gapfill(level, m, strategy="zero", value_cols=("n_events",))
    per_key = {
        r["event_type"]: r["cnt"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_key == {"a": 4, "b": 1}


def test_time_weighted_avg_hand_computed(spark):
    """LOCF integral on a hand-checkable fixture: a value held across a
    bucket boundary splits its weight; last sample contributes nothing."""
    h = RU.HOUR_US
    df = spark.createDataFrame(
        [
            # key "a": 10 held [0, h/2), 30 held [h/2, 1.5h), 50 last (no next)
            (0, "a", 10.0),
            (h // 2, "a", 30.0),
            (h + h // 2, "a", 50.0),
            # key "b": single sample -> no output rows at all
            (0, "b", 7.0),
        ],
        "ts_us long, event_type string, value double",
    )
    rows = {
        (r["event_type"], r["bucket_start_us"] // h): r
        for r in RU.time_weighted_avg(df, resolution_us=h).collect()
    }
    assert set(rows) == {("a", 0), ("a", 1)}
    # bucket 0: 10 for h/2 + 30 for h/2 -> 20, fully covered
    r0 = rows[("a", 0)]
    assert r0["twa"] == 20.0 and r0["covered_us"] == h
    # bucket 1: 30 held for h/2 only -> twa 30, half covered
    r1 = rows[("a", 1)]
    assert r1["twa"] == 30.0 and r1["covered_us"] == h // 2


def test_time_weighted_avg_duplicate_ts_deterministic(spark):
    """Tied timestamps order by value: the LARGEST tied value holds the
    following interval, the rest drop at zero width — same answer on
    every run and in the oracle."""
    h = RU.HOUR_US
    df = spark.createDataFrame(
        [(0, "a", 10.0), (0, "a", 99.0), (h // 2, "a", 99.0), (h, "a", 1.0)],
        "ts_us long, event_type string, value double",
    )
    for _ in range(3):
        rows = RU.time_weighted_avg(df.repartition(8), resolution_us=h).collect()
        assert len(rows) == 1
        assert rows[0]["twa"] == 99.0 and rows[0]["covered_us"] == h


def test_histogram_percentiles(spark, events):
    """Fixed-grid histogram: ladder re-aggregation is exact (minute→day ==
    direct day binning), and interpolated percentiles land within one bin
    width of the exact percentile."""
    lo, hi, nbins = 0.0, 500.0, 50
    minute = RU.value_histogram(events, lo, hi, nbins)
    via_ladder = RU.coarsen_histogram(minute, RU.DAY_US)
    direct = RU.value_histogram(events, lo, hi, nbins, resolution_us=RU.DAY_US)
    a = {tuple(r) for r in via_ladder.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b, "histogram ladder re-aggregation not exact"

    got = {
        (r["bucket_start_us"], r["event_type"], r["p"]): r["value"]
        for r in RU.percentiles_from_histogram(direct, lo, hi, nbins).collect()
    }
    # guarantee: the interpolated value lies in the same bin as the
    # ceil(p*n)-th order statistic (type-1 quantile) -> within one bin
    # width of it. (Interpolated-percentile definitions can differ by a
    # whole inter-sample gap on sparse groups, so that is NOT the bound.)
    exact = {
        (r["b"], r["event_type"], p): r[f"q{int(p*100)}"]
        for r in events.groupBy(
            (F.col("ts_us") - F.col("ts_us") % RU.DAY_US).alias("b"), "event_type"
        )
        .agg(
            *[
                F.expr(
                    f"sort_array(collect_list(value))"
                    f"[cast(ceil({p} * count(value)) as int) - 1]"
                ).alias(f"q{int(p*100)}")
                for p in (0.5, 0.9, 0.99)
            ]
        )
        .collect()
        for p in (0.5, 0.9, 0.99)
    }
    assert set(got) == set(exact)
    binw = (hi - lo) / nbins
    for k, v in got.items():
        assert abs(v - exact[k]) <= binw, (k, v, exact[k])


def test_refresh_rollup_rejects_non_nested_store(spark, events):
    stored = RU.rollup_cascade(events, resolutions_us=(RU.MINUTE_US,))
    stored[90_000_000] = stored[RU.MINUTE_US]
    feed = compute_changes(events, events, pk="event_id")
    with pytest.raises(ValueError):
        RU.refresh_rollup(events, stored, feed)


def test_retention_cohorts_hand_computed(spark):
    """3 users: u1 active days 0,1,3; u2 days 1,1 (dup events same day);
    u3 day 3 only. Cohort(u1)=d0, cohort(u2)=d1, cohort(u3)=d3."""
    d = RU.DAY_US
    ev = spark.createDataFrame(
        [
            (1, 0, "x", 0.0), (2, d + 5, "x", 0.0), (3, 3 * d, "x", 0.0),  # u1
            (4, d, "x", 0.0), (5, d + 9, "x", 0.0),                        # u2
            (6, 3 * d + 1, "x", 0.0),                                      # u3
        ],
        "event_id long, ts_us long, event_type string, value double",
    ).withColumn(
        "user_id",
        F.when(F.col("event_id") <= 3, 1)
        .when(F.col("event_id") <= 5, 2)
        .otherwise(3),
    )
    got = {
        (r["cohort_start_us"] // d, r["period"]): r["n_active"]
        for r in RU.retention_cohorts(ev).collect()
    }
    assert got == {
        (0, 0): 1,  # u1 day 0
        (0, 1): 1,  # u1 day 1
        (0, 3): 1,  # u1 day 3
        (1, 0): 1,  # u2 day 1 (dup events -> one active)
        (3, 0): 1,  # u3 day 3
    }


def test_anomaly_scores_hand_computed(spark):
    """Flat series of 10s with one 100 spike: the spike z is huge, flat
    rows after warm-up have z NULL (zero variance), rows before
    min_history have NULL mean and z."""
    h = RU.HOUR_US
    rows = [(i * h, "k", 10 if i != 20 else 100) for i in range(24)]
    level = spark.createDataFrame(
        rows, "bucket_start_us long, event_type string, n_events long"
    )
    out = {
        r["bucket_start_us"] // h: r
        for r in RU.anomaly_scores(level, trailing=12, min_history=6).collect()
    }
    for i in range(6):  # not enough history
        assert out[i]["trailing_mean"] is None and out[i]["z"] is None
    assert out[10]["trailing_mean"] == 10.0 and out[10]["z"] is None  # flat
    assert out[20]["z"] is None or out[20]["z"] > 100  # spike vs zero-var window
    # the window BEFORE the spike is all 10s -> zero variance -> z NULL even
    # for the spike itself; the rows AFTER include the spike in their window
    assert out[21]["z"] is not None and abs(out[21]["z"]) < 1.0


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_refresh_equivalence_under_random_churn(spark, tmp_path, seed):
    """Randomized churn (seeded): dels/updates/ts-migrations/inserts drawn
    per-seed over a synthetic corpus — refresh_rollup AND the lake path
    must both equal a from-scratch rebuild. Catches interaction bugs the
    hand-built fixture can't (e.g. a migration landing in an insert's
    bucket, churn clustering entirely inside one hour)."""
    import random

    rng = random.Random(seed)
    t0 = 1_700_000_000_000_000
    n = 400
    rows = [
        (
            i,
            t0 + rng.randrange(0, 3 * RU.DAY_US),
            f"type_{rng.randrange(4)}",
            round(rng.uniform(-50, 50), 3),
        )
        for i in range(n)
    ]
    base = spark.createDataFrame(
        rows, "event_id long, ts_us long, event_type string, value double"
    ).cache()
    ids = list(range(n))
    rng.shuffle(ids)
    dels, upds, migs = set(ids[:30]), set(ids[30:60]), set(ids[60:75])
    after = (
        base.where(~F.col("event_id").isin(dels))
        .withColumn(
            "value",
            F.when(F.col("event_id").isin(upds), F.col("value") * 2 - 1).otherwise(
                F.col("value")
            ),
        )
        .withColumn(
            "ts_us",
            F.when(
                F.col("event_id").isin(migs),
                F.col("ts_us") + F.lit(rng.randrange(1, 40) * RU.HOUR_US),
            ).otherwise(F.col("ts_us")),
        )
    )
    inserts = spark.createDataFrame(
        [
            (
                n + j,
                t0 + rng.randrange(0, 3 * RU.DAY_US),
                f"type_{rng.randrange(4)}",
                round(rng.uniform(-50, 50), 3),
            )
            for j in range(20)
        ],
        "event_id long, ts_us long, event_type string, value double",
    )
    after = after.unionByName(inserts).cache()
    feed = compute_changes(base, after, pk="event_id")
    expected = RU.rollup_cascade(after)

    stored = {w: lv.cache() for w, lv in RU.rollup_cascade(base).items()}
    refreshed = RU.refresh_rollup(after, stored, feed)
    for w in expected:
        _levels_equal(refreshed[w], expected[w], f"seed={seed} plain w={w}")

    from datalakefoundation_spark.tables.lake_table import LakeTable

    tables = {
        w: LakeTable(spark, str(tmp_path / f"r{seed}_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(base, tables)
    RU.refresh_rollup_lake(after, tables, feed)
    for w in expected:
        _levels_equal(
            tables[w].read().select(*expected[w].columns),
            expected[w],
            f"seed={seed} lake w={w}",
        )


def test_replay_key_folded_walkback(spark, tmp_path):
    """The stream_rollup replay check must find the newest fold commit
    even past interleaved maintenance commits (which carry no key), stop
    at the FIRST key found (an older batch's key must not answer True),
    and respect the walk cap."""
    from datalakefoundation_spark.streaming.ops import replay_key_folded
    from datalakefoundation_spark.tables.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "rk"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    assert replay_key_folded(t, "s:0") is False  # table absent
    t.overwrite(df, operation="rollup_fold", metrics={"__replay_key": "s:0"})
    assert replay_key_folded(t, "s:0") is True
    assert replay_key_folded(t, "s:1") is False
    # maintenance commit WITHOUT a key on top: walk must skip it
    t.append(df)
    assert replay_key_folded(t, "s:0") is True
    # a newer fold supersedes: the old key no longer answers True
    from datalakefoundation_spark.tables.lake_table import MASK_COL
    t.merge_patch(
        df.withColumn(MASK_COL, F.lit(True)), keys=["id"], mask_col=MASK_COL,
        operation="rollup_fold", metrics={"__replay_key": "s:1"},
    )
    assert replay_key_folded(t, "s:1") is True
    assert replay_key_folded(t, "s:0") is False
    # cap: bury the fold under more no-key commits than max_back allows
    for _ in range(4):
        t.append(df)
    assert replay_key_folded(t, "s:1", max_back=3) is False
    assert replay_key_folded(t, "s:1", max_back=10) is True


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_refresh_rollup_lake_multi_round_then_compact(spark, tmp_path):
    """Five sequential churn rounds against the same ladder (patches and
    DVs stack across commits), then optimize() on every level: contents
    must equal a rebuild from the final corpus at every step, and
    compaction must not change them."""
    import random

    rng = random.Random(7)
    t0 = 1_700_000_000_000_000
    rows = [
        (
            i,
            t0 + rng.randrange(0, 2 * RU.DAY_US),
            f"type_{rng.randrange(3)}",
            round(rng.uniform(0, 20), 2),
        )
        for i in range(200)
    ]
    cur = spark.createDataFrame(
        rows, "event_id long, ts_us long, event_type string, value double"
    ).cache()
    from datalakefoundation_spark.tables.lake_table import LakeTable

    tables = {
        w: LakeTable(spark, str(tmp_path / f"m_{w}"))
        for w in (RU.MINUTE_US, RU.HOUR_US, RU.DAY_US)
    }
    RU.build_rollup_lake(cur, tables)
    next_id = 200
    for rnd in range(5):
        # sort before shuffling: collect() order is partitioning-dependent,
        # and an unsorted base would make the "seeded" churn irreproducible
        ids = sorted(r["event_id"] for r in cur.select("event_id").collect())
        rng.shuffle(ids)
        dels, upds = set(ids[:10]), set(ids[10:20])
        after = (
            cur.where(~F.col("event_id").isin(dels))
            .withColumn(
                "value",
                F.when(
                    F.col("event_id").isin(upds), F.col("value") + 1.5
                ).otherwise(F.col("value")),
            )
            .unionByName(
                spark.createDataFrame(
                    [
                        (
                            next_id + j,
                            t0 + rng.randrange(0, 2 * RU.DAY_US),
                            f"type_{rng.randrange(3)}",
                            round(rng.uniform(0, 20), 2),
                        )
                        for j in range(8)
                    ],
                    "event_id long, ts_us long, event_type string, value double",
                )
            )
            .cache()
        )
        next_id += 8
        feed = compute_changes(cur, after, pk="event_id")
        # disable adaptive rebuild: this test is ABOUT patch stacking
        RU.refresh_rollup_lake(after, tables, feed, rebuild_threshold=2.0)
        expected = RU.rollup_cascade(after)
        for w in expected:
            _levels_equal(
                tables[w].read().select(*expected[w].columns),
                expected[w],
                f"round={rnd} w={w}",
            )
        cur = after
    # patches really did stack across the five rounds
    assert len(tables[RU.MINUTE_US].latest_manifest().segments) > 3
    for w, t in tables.items():
        t.optimize()
        expected = RU.rollup_cascade(cur, resolutions_us=(w,))[w]
        _levels_equal(
            t.read().select(*expected.columns), expected, f"compacted w={w}"
        )
