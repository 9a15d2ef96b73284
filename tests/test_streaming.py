"""Structured Streaming tests: file-source stream -> windowed agg / stateful
sessionization -> memory sink, driven with availableNow triggers."""

import datetime as dt

import pytest

from datalakefoundation_spark.streaming import (
    read_event_stream,
    sessionize,
    stream_to_lake,
    windowed_counts,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _ts(minute, second=0):
    return dt.datetime(2026, 8, 1, 10, minute, second)


def test_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(
        spark,
        src,
        [
            (1, _ts(0, 10), 1, "click", 1.0),
            (2, _ts(0, 50), 2, "click", 2.0),
            (3, _ts(1, 10), 1, "view", 3.0),
            (4, _ts(3, 10), 3, "click", 4.0),
        ],
    )
    stream = read_event_stream(spark, src)
    q = (
        windowed_counts(stream, window="1 minute")
        .writeStream.format("memory")
        .queryName("wc_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; rerun with new late-enough data
    _write_events(spark, src, [(9, _ts(20, 0), 9, "click", 1.0)])
    q2 = (
        windowed_counts(stream, window="1 minute")
        .writeStream.format("memory")
        .queryName("wc_test2")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = {
        (r["window_start"].minute, r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM wc_test2").collect()
    }
    assert rows[(0, "click")] == 2
    assert rows[(1, "view")] == 1
    assert rows[(3, "click")] == 1


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_sessionize(spark, tmp_path):
    src = str(tmp_path / "events2")
    _write_events(
        spark,
        src,
        [
            (1, _ts(0), 1, "click", 1.0),
            (2, _ts(5), 1, "click", 1.0),
            (3, _ts(50), 1, "click", 1.0),  # >30min gap -> new session
            (4, _ts(2), 2, "view", 1.0),
        ],
    )
    stream = read_event_stream(spark, src)
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions_test").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    closed_u1 = [r for r in by_user[1] if r["closed"]]
    assert len(closed_u1) == 1  # the first session closed by the 50-min event
    assert closed_u1[0]["n_events"] == 2
    open_u1 = [r for r in by_user[1] if not r["closed"]]
    assert open_u1 and open_u1[-1]["n_events"] == 1
    assert len(by_user[2]) == 1 and by_user[2][0]["n_events"] == 1


def test_stream_to_lake_bronze_append(spark, tmp_path):
    src = str(tmp_path / "events3")
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    _write_events(spark, src, [(i, _ts(i % 60), i, "click", 1.0) for i in range(20)])
    q = stream_to_lake(read_event_stream(spark, src), bronze, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(bronze).count() == 20


def test_stream_dedup(spark, tmp_path):
    from datalakefoundation_spark.streaming import stream_dedup

    src = str(tmp_path / "events4")
    _write_events(
        spark,
        src,
        [
            (1, _ts(0), 1, "click", 1.0),
            (1, _ts(0, 30), 1, "click", 1.0),  # replayed within watermark -> dropped
            (2, _ts(1), 2, "view", 2.0),
            (2, _ts(1), 2, "view", 2.0),       # exact replay -> dropped
            (3, _ts(2), 3, "click", 3.0),
        ],
    )
    q = (
        stream_dedup(read_event_stream(spark, src))
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup_test").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_stream_merge_to_silver_upserts(spark, tmp_path, mode):
    """Micro-batch upserts in both write modes — mor is the mode built for
    this cadence (O(batch) patch per trigger instead of bucket rewrites)."""
    from datalakefoundation_spark.processing import Processing
    from datalakefoundation_spark.streaming import stream_merge_to_silver
    from tests.helpers import make_metadata

    md = make_metadata(str(tmp_path / "root"), processtype="merge")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt_merge")

    def as_entity_stream():
        return (
            read_event_stream(spark, src)
            .selectExpr(
                "event_id AS ID", "event_id AS SeqNr",
                "event_type AS name", "value AS data",
            )
        )

    opts = {"write_mode": mode}
    _write_events(spark, src, [(i, _ts(i % 60), i, "click", 1.0) for i in range(5)])
    q = stream_merge_to_silver(as_entity_stream(), md, 1, ckpt, options=opts)
    q.awaitTermination(120)
    silver = Processing(spark, md, 1, "stream_batch_000000000000.parquet", {}).silver_table()
    assert silver.read().count() == 5

    # second wave: 3 replays with changed payload + 3 new keys; the
    # checkpoint ensures only the new files feed batch 1, the merge upserts
    _write_events(spark, src, [(i, _ts(i % 60), i, "click", 9.0) for i in range(3, 9)])
    q2 = stream_merge_to_silver(as_entity_stream(), md, 1, ckpt, options=opts)
    q2.awaitTermination(120)
    out = silver.read()
    assert out.count() == 9
    by_id = {r["ID"]: r["data"] for r in out.collect()}
    assert by_id[2] == 1.0 and by_id[3] == 9.0 and by_id[8] == 9.0
    assert out.count() == out.select("PK_person").distinct().count()
    if mode == "mor":
        # batch upserts landed as patch segments with dv refs, not rewrites
        mf = silver.latest_manifest()
        assert mf.operation == "merge"
        assert any(s.dv for s in mf.segments)


def test_stream_merge_restart_replays_batch_exactly_once(spark, tmp_path):
    """Exactly-once across a crash/restart: the query dies after a batch's
    merge fully landed in silver but BEFORE its checkpoint commit was
    recorded (crash injected at exactly that point inside foreachBatch).
    On restart Structured Streaming replays that batch from the offsets
    log with the same batch id and file set; the batch-id-keyed bronze
    slice is overwritten in place and the merge is idempotent by PK, so
    silver must hold zero duplicate PKs and exactly the distinct keys
    ever streamed."""
    import os

    from datalakefoundation_spark.processing import Processing
    from datalakefoundation_spark.streaming import stream_merge_to_silver
    from tests.helpers import make_metadata

    md = make_metadata(str(tmp_path / "root"), processtype="merge")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt_restart")

    def entity_stream():
        return read_event_stream(spark, src, max_files_per_trigger=1).selectExpr(
            "event_id AS ID", "event_id AS SeqNr",
            "event_type AS name", "value AS data",
        )

    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        _write_events(
            spark, src,
            [(i * 10 + j, _ts((i * 10 + j) % 60), i, "click", 1.0) for j in range(3)],
        )

    # crash AFTER the merge of batch 2 committed to silver, BEFORE the
    # stream recorded the batch as done — the dangerous half-done state
    state = {"crashed": False}
    orig_process = Processing.process

    def crashing_process(self, strategy=None):
        result = orig_process(self, strategy)
        if self.slice_file == "stream_batch_000000000002.parquet" and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash after merge, before checkpoint commit")
        return result

    Processing.process = crashing_process
    try:
        q = stream_merge_to_silver(entity_stream(), md, 1, ckpt)
        try:
            q.awaitTermination(180)
            assert False, "query should have died on the injected crash"
        except Exception:
            pass
    finally:
        Processing.process = orig_process
    assert state["crashed"]

    silver = Processing(
        spark, md, 1, "stream_batch_000000000000.parquet", {}
    ).silver_table()
    assert silver.read().count() == 9  # batch 2's merge DID land
    committed = [c for c in os.listdir(f"{ckpt}/commits") if not c.startswith(".")]
    assert len(committed) == 2  # ...but its checkpoint commit did not
    n_slices_before = len(
        [f for f in os.listdir(md.get_entity(1).get_output().bronzepath.value)
         if f.startswith("stream_batch_")]
    )

    # restart with new data queued as well: the replayed batch re-merges
    # the SAME rows (idempotent), then the new batch lands
    _write_events(spark, src, [(100 + j, _ts(30), 99, "click", 2.0) for j in range(3)])
    q2 = stream_merge_to_silver(entity_stream(), md, 1, ckpt)
    assert q2.awaitTermination(180)

    out = silver.read()
    ids = [r["ID"] for r in out.select("ID").collect()]
    assert sorted(ids) == sorted(set(ids)), "duplicate business keys after replay"
    assert len(set(ids)) == 12
    assert out.count() == out.select("PK_person").distinct().count()
    # the replayed batch overwrote its own bronze slice, not a new one:
    # slice count grew only by the genuinely-new batch
    n_slices_after = len(
        [f for f in os.listdir(md.get_entity(1).get_output().bronzepath.value)
         if f.startswith("stream_batch_")]
    )
    assert n_slices_after == n_slices_before + 1


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_sessionize_stream_matches_batch_model(spark, tmp_path):
    """Equivalence: the stateful streaming sessionizer must produce exactly
    the session boundaries a batch gap-split over the same events produces
    — closed sessions where later activity exists, one open tail session
    per user. Randomized (seeded) event history across 3 users."""
    import random

    rng = random.Random(13)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = dt.datetime(2026, 8, 1, 8, 0, 0)
        for _ in range(rng.randint(15, 25)):
            # gaps: mostly short (same session), sometimes >30min (split)
            gap_min = rng.choice([1, 2, 5, 8, 40, 95])
            t = t + dt.timedelta(minutes=gap_min, seconds=rng.randint(0, 59))
            rows.append((eid, t, user, "click", 1.0))
            eid += 1

    # batch reference model: sort per user, split on >30min inactivity
    expected = set()
    by_user = {}
    for _eid, t, user, _et, _v in rows:
        by_user.setdefault(user, []).append(t)
    for user, times in by_user.items():
        times.sort()
        start, last, n = times[0], times[0], 1
        for t in times[1:]:
            if t - last > dt.timedelta(minutes=30):
                expected.add((user, start, last, n, True))
                start, n = t, 0
            n += 1
            last = t
        expected.add((user, start, last, n, False))  # open tail session

    src = str(tmp_path / "events_eq")
    _write_events(spark, src, rows)
    q = (
        sessionize(read_event_stream(spark, src))
        .writeStream.format("memory")
        .queryName("sessions_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM sessions_eq").collect()
    # a session re-emitted across micro-batches only ever grows: keep the
    # final emission per (user, start) — closed wins, else max n_events
    final = {}
    for r in emitted:
        key = (r["user_id"], r["session_start"])
        cur = final.get(key)
        if cur is None or (r["closed"], r["n_events"]) > (cur["closed"], cur["n_events"]):
            final[key] = r
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["closed"])
        for r in final.values()
    }
    assert got == expected


def test_stream_dedup_index_matches_batch(spark, tmp_path):
    """Streamed incremental near-dup indexing == the from-scratch batch run:
    union of every micro-batch's candidate pairs equals
    minhash_dedup_candidates over the whole corpus, and the signature index
    accumulates exactly one row per document — including across a stream
    restart that ingests new files into the same checkpoint/index."""
    from datalakefoundation_spark.ext.dedup import minhash_dedup_candidates
    from datalakefoundation_spark.streaming import stream_dedup_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    part1 = docs.where("doc_id < 200")
    part2 = docs.where("doc_id >= 200 and doc_id < 350")
    part3 = docs.where("doc_id >= 350")

    src = str(tmp_path / "docs_src")
    index = str(tmp_path / "sig_index")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt_idx")
    part1.coalesce(1).write.mode("append").parquet(src)
    part2.coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_dedup_index(stream, index, ckpt, pairs_path=pairs)
        q.awaitTermination(180)

    run()
    # restart with one more file -> only the new file is processed
    part3.coalesce(1).write.mode("append").parquet(src)
    run()

    from datalakefoundation_spark.tables.lake_table import LakeTable

    idx = LakeTable(spark, index).read()
    assert idx.count() == docs.count()
    assert idx.select("doc_id").distinct().count() == docs.count()

    got = sorted(
        map(tuple, spark.read.parquet(pairs).select("doc_a", "doc_b").distinct().collect())
    )
    want = sorted(map(tuple, minhash_dedup_candidates(docs).collect()))
    assert got == want


def test_quality_filter_and_pii_scrub_work_on_streams(spark, tmp_path):
    """The scan-speed text operators are stateless projections/filters, so
    they compose onto streaming DataFrames unchanged — the claim that one
    operator library serves both latency modes."""
    from datalakefoundation_spark.ext import text as TX
    from datalakefoundation_spark.ext.pii import pii_scrub

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    src = str(tmp_path / "qdocs")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    def gate(df):
        # quality filter -> Gopher battery (keep_input carries the source
        # columns so the battery is a plain filter on streams too) -> PII
        base = TX.quality_filter(df, min_tokens=10).where("keep").drop(
            "keep", "reject_reason"
        )
        gq = TX.gopher_quality(
            base, min_words=5, min_required_words=0, keep_input=True
        )
        return pii_scrub(gq.where("keep").select(*base.columns))

    cleaned = gate(stream)
    q = (
        cleaned.writeStream.format("memory")
        .queryName("stream_quality")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stream_quality")
    want = gate(docs)
    assert got.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream join: same-key events within the ±1 minute
    range pair up; out-of-range and other-key events don't. Batch
    equivalence: the same join condition over the static frames must
    produce the identical inner-join result set."""
    from datalakefoundation_spark.streaming.ops import stream_stream_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_events(
        spark,
        lsrc,
        [
            (1, _ts(0, 0), 1, "view", 1.0),
            (2, _ts(5, 0), 2, "view", 2.0),
            (3, _ts(9, 0), 1, "view", 3.0),
        ],
    )
    _write_events(
        spark,
        rsrc,
        [
            (10, _ts(0, 30), 1, "click", 1.0),   # pairs with event 1 (30 s)
            (11, _ts(7, 0), 2, "click", 2.0),    # 2 min from event 2 -> out of range
            (12, _ts(9, 40), 1, "click", 3.0),   # pairs with event 3 (40 s)
            (13, _ts(0, 20), 9, "click", 4.0),   # other key
        ],
    )
    joined = stream_stream_join(
        read_event_stream(spark, lsrc), read_event_stream(spark, rsrc)
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    assert got == {(1, 10), (3, 12)}
    # batch twin over the same static data
    batch = stream_stream_join(
        spark.read.parquet(lsrc).selectExpr(
            "event_id", "ts", "user_id", "event_type", "value"
        ),
        spark.read.parquet(rsrc).selectExpr(
            "event_id", "ts", "user_id", "event_type", "value"
        ),
    )
    assert {
        (r["l_event_id"], r["r_event_id"]) for r in batch.collect()
    } == got


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_stream_clean_corpus_matches_batch(spark, tmp_path):
    """Streamed full-recipe cleaning == the from-scratch clean_corpus over
    the concatenated corpus: per-doc gates are stateless, within-batch
    exact dups fall to the recipe's own stage, and CROSS-batch duplicates
    (verbatim and near) lose to the standing signature index — including
    across a stream restart that ingests a new file into the same
    checkpoint/index."""
    from datalakefoundation_spark.ext.recipes import clean_corpus
    from datalakefoundation_spark.streaming import stream_clean_corpus
    from datalakefoundation_spark.tables.lake_table import LakeTable

    words = [f"tok{i}" for i in range(400)]

    def doc(seed, sub=()):
        toks = [words[(seed * 13 + j * 7) % 400] for j in range(40)]
        for pos, w in sub:
            toks[pos] = w
        return " ".join(toks)

    b1 = [(i, doc(i)) for i in range(20)]
    b1.append((20, doc(3, [(5, "changed")])))      # near-dup of 3, same batch
    b1.append((21, doc(11)))                       # verbatim dup, same batch
    b2 = [
        (100, doc(50)),
        (101, doc(7, [(9, "changed")])),           # near-dup of batch-1 doc 7
        (102, doc(11)),                            # VERBATIM copy of batch-1 doc
        (103, "too short"),                        # quality-gate drop
    ]
    b3 = [
        (200, doc(60)),
        (201, doc(60, [(11, "changed")])),         # new pair: 200 survives
        (202, doc(50, [(3, "changed")])),          # near-dup of batch-2 doc 100
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "clean_out")
    index = str(tmp_path / "sig_index")
    ckpt = str(tmp_path / "ckpt_clean")
    kw = dict(min_tokens=5, redact_pii=False)

    def write_batch(rows, order):
        # the file source admits files oldest-mtime-first; pin explicit,
        # strictly increasing mtimes so batch order == id order regardless
        # of write latency under load (the equivalence contract requires
        # ingest-ordered ids)
        import os
        import time as _time

        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        t = _time.time() - 3600 + order * 60
        for root, _dirs, files in os.walk(src):
            for f in files:
                p = os.path.join(root, f)
                if os.path.getmtime(p) > t:
                    os.utime(p, (t, t))

    write_batch(b1, 1)
    write_batch(b2, 2)

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_clean_corpus(stream, out, index, ckpt, clean_kwargs=kw)
        q.awaitTermination(180)

    run()
    # restart with one more file -> only the new file is processed
    write_batch(b3, 3)
    run()

    all_docs = spark.createDataFrame(b1 + b2 + b3, schema)
    want = {r["doc_id"] for r in clean_corpus(all_docs, **kw).df.collect()}
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == want
    # cross-batch losers: 101/202 to indexed near-dups, 102 verbatim to an
    # indexed doc, 201 within its own batch; 103 to the quality gate. (100
    # and 200 lose too — the generator makes them accidental near-dups of
    # base docs 16 and 6, exactly the cross-batch transitivity the index
    # must catch.)
    assert {100, 101, 102, 103, 200, 201, 202} & got == set()
    assert 0 in got
    # index: one signature row per doc that reached near-dedup (losers kept;
    # the quality drop and the within-batch exact dup never reach it)
    idx = LakeTable(spark, index).read()
    n_docs = all_docs.count()
    assert idx.count() == n_docs - 2
    assert idx.select("doc_id").distinct().count() == n_docs - 2


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_stream_clean_corpus_seeds_from_batch_built_index(spark, tmp_path):
    """A standing index bootstrapped by a BATCH clean_corpus run (the X50
    cold-build flow: CleanResult.index_updates appended to a LakeTable,
    no __batch_key column) must seed the stream: the first micro-batch
    treats every stored signature as prior instead of dying on the
    missing column, so near-dups of seeded docs are absorbed."""
    from datalakefoundation_spark.ext.recipes import clean_corpus
    from datalakefoundation_spark.streaming import (
        read_clean_corpus_output,
        stream_clean_corpus,
    )
    from datalakefoundation_spark.tables.lake_table import LakeTable

    words = [f"tok{i}" for i in range(400)]

    def doc(seed, sub=()):
        # (seed*73 + j)*131 mod 400: two docs a,b share a token run only at
        # shift k ≡ 73(a-b) mod 400; for the seeds used here every such k
        # falls outside ±40, so no accidental cross-doc shingle overlap
        toks = [words[((seed * 73 + j) * 131) % 400] for j in range(40)]
        for pos, w in sub:
            toks[pos] = w
        return " ".join(toks)

    schema = "doc_id long, text string"
    kw = dict(min_tokens=5, redact_pii=False)

    # cold batch build: clean 3 docs, seed the index from its signatures
    cold = spark.createDataFrame([(i, doc(i)) for i in range(3)], schema)
    res = clean_corpus(cold, **kw)
    index = str(tmp_path / "seeded_index")
    tbl = LakeTable(spark, index)
    tbl.append(res.index_updates)  # no __batch_key — the batch flow's shape
    res.unpersist()

    # stream TWO micro-batches, each with a near-dup of a seeded doc: batch
    # 2 exercises the post-append shape where seed rows read back with
    # __batch_key NULL (schema evolution) and must still count as prior
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import os as _os
    import time as _time

    def write_file(rows, order):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        t = _time.time() - 3600 + order * 60
        for root, _dirs, files in _os.walk(src):
            for f in files:
                p = _os.path.join(root, f)
                if _os.path.getmtime(p) > t:
                    _os.utime(p, (t, t))

    write_file([(10, doc(1, [(4, "changed")])), (11, doc(30))], 1)
    write_file([(12, doc(2, [(6, "changed")])), (13, doc(31))], 2)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_clean_corpus(stream, out, index, ckpt, clean_kwargs=kw)
    q.awaitTermination(180)

    got = {r["doc_id"] for r in read_clean_corpus_output(spark, out, ckpt).collect()}
    assert 10 not in got  # absorbed against the batch-seeded index
    assert 12 not in got  # batch 2: seed rows (NULL key) still prior
    assert got == {11, 13}
    # the stream appended signature rows for every doc that reached
    # near-dedup, on top of the 3 seeded rows
    idx = tbl.read()
    assert "__batch_key" in idx.columns
    assert idx.count() == 3 + 4
    assert idx.where("__batch_key IS NULL").count() == 3


def test_stream_clean_corpus_rejects_span_dedup(spark, tmp_path):
    """span ownership is cross-document (a later batch keeps spans an
    earlier batch's doc already owns) — streamed-union equivalence breaks,
    so the kwarg must be rejected, not silently accepted."""
    from datalakefoundation_spark.streaming import stream_clean_corpus

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(ValueError, match="span_dedup_size"):
        stream_clean_corpus(
            stream,
            str(tmp_path / "o"),
            str(tmp_path / "i"),
            str(tmp_path / "c"),
            clean_kwargs={"span_dedup_size": 20},
        )


def test_salted_stream_stream_join_matches_plain(spark, tmp_path):
    """Salted front-end: row-identical to the unsalted join — each left row
    carries one salt, the right replicas cover every salt, so every
    matching pair meets exactly once — including a hot key contributing
    many events to both sides (the case salting exists for)."""
    from datalakefoundation_spark.streaming.ops import (
        salted_stream_stream_join,
        stream_stream_join,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    hot_l = [(100 + i, _ts(2, i), 7, "view", float(i)) for i in range(12)]
    hot_r = [(200 + i, _ts(2, 30 + i % 25), 7, "click", float(i)) for i in range(12)]
    _write_events(
        spark,
        lsrc,
        [(1, _ts(0, 0), 1, "view", 1.0), (3, _ts(9, 0), 1, "view", 3.0)] + hot_l,
    )
    _write_events(
        spark,
        rsrc,
        [
            (10, _ts(0, 30), 1, "click", 1.0),
            (12, _ts(9, 40), 1, "click", 3.0),
            (13, _ts(0, 20), 9, "click", 4.0),
        ]
        + hot_r,
    )

    def run(fn, name, **kw):
        q = (
            fn(read_event_stream(spark, lsrc), read_event_stream(spark, rsrc), **kw)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["l_event_id"], r["r_event_id"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    plain = run(stream_stream_join, "ssj_plain_r8")
    salted = run(salted_stream_stream_join, "ssj_salted_r8", salt_buckets=4)
    assert salted == plain
    assert len(plain) > 100  # the hot key's pair product is actually present
    # hot-key-scoped form (r9): only user 7 is replicated — cold keys take
    # salt 0 on both sides — and the pair set is STILL identical
    hot_scoped = run(
        salted_stream_stream_join, "ssj_hot_r9", salt_buckets=4, hot_keys=[7]
    )
    assert hot_scoped == plain
    # a stale/wrong hot list degrades only the spread, never the rows
    stale = run(
        salted_stream_stream_join, "ssj_stale_r9", salt_buckets=4, hot_keys=[9999]
    )
    assert stale == plain
    with pytest.raises(ValueError, match="hot_keys"):
        salted_stream_stream_join(
            read_event_stream(spark, lsrc), read_event_stream(spark, rsrc),
            hot_keys=[],
        )
    # salt columns are internal
    assert not any(
        c.startswith("__") for c in salted_stream_stream_join(
            read_event_stream(spark, lsrc), read_event_stream(spark, rsrc)
        ).columns
    )
    with pytest.raises(ValueError, match="unmatched right"):
        salted_stream_stream_join(
            read_event_stream(spark, lsrc), read_event_stream(spark, rsrc),
            how="full_outer",
        )


def test_windowed_stream_join_matches_batch(spark, tmp_path):
    """Pre-aggregate-then-join: per-(key, window) aggregates from both
    streams equi-joined on the window — matches the batch groupBy+join
    twin once the watermark has passed the windows (later data batches
    drive emission, mirroring production)."""
    from pyspark.sql import functions as F

    from datalakefoundation_spark.streaming.ops import windowed_stream_join

    src = str(tmp_path / "ev")
    early = [
        (1, _ts(0, 10), 1, "view", 1.0),
        (2, _ts(0, 40), 1, "view", 2.0),
        (3, _ts(0, 20), 2, "view", 4.0),
        (4, _ts(1, 15), 1, "view", 8.0),
    ]
    late = [(9, _ts(30, 0), 3, "view", 0.0)]  # advances the watermark
    _write_events(spark, src, early)
    import os as _os
    import time as _time

    t = _time.time() - 3600
    for root, _dirs, files in _os.walk(src):
        for f in files:
            _os.utime(_os.path.join(root, f), (t, t))
    _write_events(spark, src, late)

    def streams():
        s = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return s

    j = windowed_stream_join(
        streams(),
        streams(),
        left_aggs=[F.count("*").alias("l_n"), F.sum("value").alias("l_sum")],
        right_aggs=[F.count("*").alias("r_n")],
    )
    q = (
        j.writeStream.format("memory")
        .queryName("wsj_r8")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["window_start"].minute, r["l_n"], r["l_sum"], r["r_n"])
        for r in spark.sql("SELECT * FROM wsj_r8").collect()
    }
    # batch twin over the closed windows (minute 0 and 1)
    all_rows = spark.read.parquet(src).where("ts < timestamp'2026-08-01 10:05:00'")
    g = all_rows.groupBy(
        F.window("ts", "1 minute").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    want = {
        (r["user_id"], r["w"].start.minute, r["n"], r["s"], r["n"])
        for r in g.collect()
    }
    assert got == want and len(want) == 3


def test_detect_hot_keys(spark):
    """Calibration helper: keys above the share threshold, capped, exact."""
    from datalakefoundation_spark.streaming.ops import detect_hot_keys

    rows = [(i, 7) for i in range(60)] + [(i, 8) for i in range(30)] + [
        (100 + i, i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    got = detect_hot_keys(df, "user_id", min_share=0.2)
    assert got == [7, 8]  # ordered by count desc
    assert detect_hot_keys(df.limit(0), "user_id") == []
    with pytest.raises(ValueError, match="max_keys"):
        detect_hot_keys(df, "user_id", min_share=0.001, max_keys=3)


def test_windowed_stream_join_rejects_alias_collisions(spark, tmp_path):
    """Agg aliases colliding across sides or with reserved output columns
    must fail at the CALL SITE, not as an ambiguous reference at the sink."""
    from pyspark.sql import functions as F

    from datalakefoundation_spark.streaming.ops import windowed_stream_join

    src = str(tmp_path / "ev")
    _write_events(spark, src, [(1, _ts(0, 10), 1, "view", 1.0)])
    s = read_event_stream(spark, src)
    with pytest.raises(ValueError, match="duplicate agg alias"):
        windowed_stream_join(
            s, s, left_aggs=[F.count("*").alias("n")],
            right_aggs=[F.count("*").alias("n")],
        )
    with pytest.raises(ValueError, match="reserved"):
        windowed_stream_join(
            s, s, left_aggs=[F.count("*").alias("window_start")],
            right_aggs=[F.count("*").alias("r_n")],
        )
    with pytest.raises(ValueError, match="reserved"):
        windowed_stream_join(
            s, s, key="user_id", left_aggs=[F.count("*").alias("user_id")],
            right_aggs=[F.count("*").alias("r_n")],
        )


def test_stream_id_normalizes_checkpoint_spellings(tmp_path):
    """Equivalent spellings of one checkpoint directory must map to ONE
    stream id — a reader spelling the path differently than the writer
    would otherwise look for a missing stream=<id> subtree (ADVICE r8)."""
    import os

    from datalakefoundation_spark.streaming.ops import _stream_id

    p = str(tmp_path / "ck")
    base = _stream_id(p)
    assert _stream_id(p + "/") == base
    assert _stream_id(p + "//") == base
    assert _stream_id("file://" + p) == base
    rel = os.path.relpath(p)
    assert _stream_id(rel) == base
    # remote-scheme URIs: verbatim apart from the trailing slash
    assert _stream_id("s3a://bucket/ck/") == _stream_id("s3a://bucket/ck")
    assert _stream_id("s3a://bucket/ck") != base


def test_salted_join_accepts_nested_map_schema(spark, tmp_path):
    """The salt must exclude map-typed columns at ANY nesting depth —
    xxhash64 rejects them at plan time (ADVICE r8: array<map<..>> slipped
    through the old top-level-only check)."""
    from pyspark.sql import functions as F

    from datalakefoundation_spark.streaming.ops import salted_stream_stream_join

    src = str(tmp_path / "ev")
    _write_events(
        spark, src,
        [(1, _ts(0, 0), 1, "view", 1.0), (2, _ts(0, 30), 1, "click", 2.0)],
    )
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    def stream():
        s = spark.readStream.schema(schema).parquet(src)
        return (
            s.withColumn("props", F.create_map(F.lit("k"), F.col("event_type")))
            .withColumn("tags", F.array(F.create_map(F.lit("a"), F.lit("b"))))
            .withColumn(
                "meta",
                F.struct(F.create_map(F.lit("m"), F.lit(1)).alias("inner")),
            )
        )

    j = salted_stream_stream_join(stream(), stream(), salt_buckets=4)
    q = (
        j.writeStream.format("memory").queryName("ssj_map_r9")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj_map_r9").collect()
    }
    assert got == {(1, 1), (1, 2), (2, 1), (2, 2)}


def test_windowed_stream_join_sliding_matches_batch(spark, tmp_path):
    """Sliding windows through the pre-aggregate-then-join recipe: each
    event lands in window/slide overlapping windows on BOTH sides, window
    equality still drives the join, and the closed-window output equals
    the batch sliding groupBy+join twin."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from datalakefoundation_spark.streaming.ops import windowed_stream_join

    src = str(tmp_path / "ev")
    early = [
        (1, _ts(0, 10), 1, "view", 1.0),
        (2, _ts(0, 40), 1, "view", 2.0),
        (3, _ts(1, 15), 1, "view", 4.0),
        (4, _ts(1, 45), 2, "view", 8.0),
    ]
    late = [(9, _ts(30, 0), 3, "view", 0.0)]  # advances the watermark
    _write_events(spark, src, early)
    t = _time.time() - 3600
    for root, _dirs, files in _os.walk(src):
        for f in files:
            _os.utime(_os.path.join(root, f), (t, t))
    _write_events(spark, src, late)

    def streams():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    j = windowed_stream_join(
        streams(),
        streams(),
        left_aggs=[F.count("*").alias("l_n"), F.sum("value").alias("l_sum")],
        right_aggs=[F.count("*").alias("r_n")],
        window="2 minutes",
        slide="1 minute",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("wsj_slide_r9")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["window_start"].minute, r["l_n"], r["l_sum"], r["r_n"])
        for r in spark.sql("SELECT * FROM wsj_slide_r9").collect()
    }
    # batch twin over the windows the watermark closed (ends <= 10:05)
    all_rows = spark.read.parquet(src).where("ts < timestamp'2026-08-01 10:05:00'")
    g = (
        all_rows.groupBy(
            F.window("ts", "2 minutes", "1 minute").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .where(F.col("w.end") <= F.lit("2026-08-01 10:05:00").cast("timestamp"))
    )
    want = {
        (r["user_id"], r["w"].start.minute, r["n"], r["s"], r["n"])
        for r in g.collect()
    }
    assert got == want
    # every early event appears in exactly 2 of the overlapping windows
    assert len(want) >= 5


def test_session_overlap_join_matches_batch(spark, tmp_path):
    """Two sessionized streams joined on per-key interval OVERLAP — the
    composition windowed_stream_join's docstring points session shapes at.
    Closed sessions only; overlap semantics checked against a batch join
    twin; open and over-long sessions excluded by contract."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from datalakefoundation_spark.streaming.ops import session_overlap_join

    def ts(minute):
        return _dt.datetime(2026, 8, 1, 10, 0, 0) + _dt.timedelta(minutes=minute)

    schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, closed boolean"
    )
    lrows = [
        (1, ts(0), ts(10), 3, True),    # overlaps r1 and r2
        (1, ts(30), ts(40), 2, True),   # overlaps nothing
        (2, ts(0), ts(5), 1, True),     # same interval, other key
        (3, ts(0), ts(10), 9, False),   # open -> excluded
        (4, ts(0), ts(200), 5, True),   # > max_session -> excluded
    ]
    rrows = [
        (1, ts(5), ts(12), 4, True),    # overlaps l1
        (1, ts(10), ts(20), 1, True),   # touches l1 at minute 10 (inclusive)
        (2, ts(6), ts(9), 1, True),     # no overlap with l3 ([0,5])
        (3, ts(0), ts(10), 2, True),
    ]
    lsrc, rsrc = str(tmp_path / "ls"), str(tmp_path / "rs")
    spark.createDataFrame(lrows, schema).coalesce(1).write.parquet(lsrc)
    spark.createDataFrame(rrows, schema).coalesce(1).write.parquet(rsrc)

    j = session_overlap_join(
        spark.readStream.schema(schema).parquet(lsrc),
        spark.readStream.schema(schema).parquet(rsrc),
        max_session="1 hour",
    )
    q = (
        j.writeStream.format("memory").queryName("soj_r9")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_key"], r["l_start"].minute, r["r_start"].minute)
        for r in spark.sql("SELECT * FROM soj_r9").collect()
    }
    # batch twin: closed, bounded sessions joined on interval intersection
    lb = spark.read.parquet(lsrc).where(
        "closed AND session_end <= session_start + INTERVAL 1 HOUR"
    )
    rb = spark.read.parquet(rsrc).where(
        "closed AND session_end <= session_start + INTERVAL 1 HOUR"
    )
    want = {
        (r["user_id"], r["ls"].minute, r["rs"].minute)
        for r in lb.alias("l")
        .join(
            rb.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.session_start") <= F.col("r.session_end"))
            & (F.col("r.session_start") <= F.col("l.session_end")),
        )
        .select(
            F.col("l.user_id"),
            F.col("l.session_start").alias("ls"),
            F.col("r.session_start").alias("rs"),
        )
        .collect()
    }
    assert got == want
    assert (1, 0, 5) in got and (1, 0, 10) in got  # incl. the touching pair
    assert not any(k == 3 or k == 4 for k, _a, _b in got)


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_reconcile_clean_corpus_state_maintenance(spark, tmp_path):
    """X55 wired to the streaming pipeline: reconcile_clean_corpus
    bootstraps the assignment LakeTable from the standing index, converges
    the streamed survivors to the batch set across a bridge ingested in a
    LATER stream generation, tracks reconciled batches in the same commit
    as the assignment patch, and no-ops (no new table version) when
    nothing new arrived."""
    import os as _os
    import time as _time

    from datalakefoundation_spark.ext.recipes import clean_corpus
    from datalakefoundation_spark.streaming.ops import (
        reconcile_clean_corpus,
        stream_clean_corpus,
    )
    from datalakefoundation_spark.tables.lake_table import LakeTable
    from tests.helpers import find_bridge_fixture

    fixture = find_bridge_fixture(spark)
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    out, index = str(tmp_path / "out"), str(tmp_path / "index")
    ckpt, assign = str(tmp_path / "ckpt"), str(tmp_path / "assign")
    kw = dict(min_tokens=3, redact_pii=False)

    def write_batch(df, order):
        df.coalesce(1).write.mode("append").parquet(src)
        t = _time.time() - 3600 + order * 60
        for root, _dirs, files in _os.walk(src):
            for f in files:
                p = _os.path.join(root, f)
                if _os.path.getmtime(p) > t:
                    _os.utime(p, (t, t))

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_clean_corpus(
            stream, out, index, ckpt, clean_kwargs=kw
        ).awaitTermination(180)

    # wave 1: the two separate clusters -> streamed survivors {1, 3}
    write_batch(fixture.where("doc_id < 10"), 1)
    run()
    rec1 = {r["doc_id"] for r in reconcile_clean_corpus(
        spark, out, index, ckpt, assign).collect()}
    assert rec1 == {1, 3}  # nothing to bridge yet
    t = LakeTable(spark, assign)
    v_boot = t.latest_manifest().version

    # wave 2: the bridge doc arrives in a NEW stream generation
    write_batch(fixture.where("doc_id = 10"), 2)
    run()
    streamed = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert streamed == {1, 3}  # the stream cannot retract survivor 3
    rec2 = {r["doc_id"] for r in reconcile_clean_corpus(
        spark, out, index, ckpt, assign).collect()}
    want = {r["doc_id"] for r in clean_corpus(fixture, **kw).df.collect()}
    assert rec2 == want == {1}
    v_after = t.latest_manifest().version
    assert v_after == v_boot + 1  # one patch commit for the new batch

    # replay / quiet period: no new batches -> pure no-op, same answer
    rec3 = {r["doc_id"] for r in reconcile_clean_corpus(
        spark, out, index, ckpt, assign).collect()}
    assert rec3 == {1}
    assert t.latest_manifest().version == v_after

    # ledger is COMPACTED: one watermark per stream generation, not an
    # ever-growing key list (O(generations) manifest metrics forever)
    mm = t.latest_manifest().metrics
    wm = mm["__reconciled_watermarks"]
    assert len(wm) >= 1 and all(int(v) >= 0 for v in wm.values())
    assert "__reconciled_keys" not in mm

    # legacy-format migration: a pre-compaction ledger (key list) written
    # by an older build must still be read as done -> next call no-ops
    idx_keys = sorted(
        r["__batch_key"]
        for r in LakeTable(spark, index).read().select("__batch_key")
        .distinct().collect()
    )
    empty = LakeTable(spark, assign).read().limit(0)
    t.append(empty, metrics={"__reconciled_keys": idx_keys})
    v_legacy = t.latest_manifest().version
    rec4 = {r["doc_id"] for r in reconcile_clean_corpus(
        spark, out, index, ckpt, assign).collect()}
    assert rec4 == {1}
    assert t.latest_manifest().version == v_legacy

    # patch-tail maintenance: a third stream wave + a tiny
    # auto_compact_segments threshold folds the assignment patches; the
    # ledger walk reads past the metric-less compaction commit, so a
    # fourth call is still a version-stable no-op with the same answer
    zz = [f"zz{i}" for i in range(30)]
    extra = spark.createDataFrame(
        [(40, " ".join(zz)), (41, " ".join(zz[:-1] + ["yy"]))],  # near-dup pair
        "doc_id long, text string",
    )
    write_batch(extra, 3)
    run()
    rec5 = {r["doc_id"] for r in reconcile_clean_corpus(
        spark, out, index, ckpt, assign, auto_compact_segments=1).collect()}
    assert rec5 == {1, 40}
    ops = [m.operation for m in t.history()]
    assert any("compact" in op for op in ops), ops
    v5 = t.latest_manifest().version
    rec6 = {r["doc_id"] for r in reconcile_clean_corpus(
        spark, out, index, ckpt, assign).collect()}
    assert rec6 == {1, 40}
    assert t.latest_manifest().version == v5
    # the within-wave near-dup was absorbed by the stream; the reconcile
    # assignment must also know it
    assign_rows = {
        (r["node"], r["cluster_id"]) for r in t.read().collect()
    }
    assert (41, 40) in assign_rows


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_finalize_corpus_matches_batch_postpass(spark, tmp_path):
    """finalize_corpus (the batch post-pass companion): reconcile + span
    dedup over the streamed output must equal the from-scratch clean_corpus
    run with the same span settings — the corpus-global stages land on
    exactly the batch survivor set."""
    import os as _os
    import time as _time

    from datalakefoundation_spark.ext.recipes import clean_corpus
    from datalakefoundation_spark.streaming.ops import (
        finalize_corpus,
        stream_clean_corpus,
    )
    from tests.helpers import find_bridge_fixture

    bridge = find_bridge_fixture(spark)
    # doc 5: 8 tokens copied from doc 1's text + a unique remainder — span
    # dedup strips the copied windows while doc-level dedup keeps the doc
    a_text = bridge.where("doc_id = 1").head()["text"]
    extra = " ".join(a_text.split()[:8] + [f"uniq{i}" for i in range(30)])
    fixture = bridge.unionByName(
        spark.createDataFrame([(5, extra)], "doc_id long, text string")
    )
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    out, index = str(tmp_path / "out"), str(tmp_path / "index")
    ckpt, assign = str(tmp_path / "ckpt"), str(tmp_path / "assign")
    kw = dict(min_tokens=3, redact_pii=False)

    def write_batch(df, order):
        df.coalesce(1).write.mode("append").parquet(src)
        t = _time.time() - 3600 + order * 60
        for root, _dirs, files in _os.walk(src):
            for f in files:
                p = _os.path.join(root, f)
                if _os.path.getmtime(p) > t:
                    _os.utime(p, (t, t))

    write_batch(fixture.where("doc_id < 10"), 1)
    write_batch(fixture.where("doc_id = 10"), 2)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    stream_clean_corpus(stream, out, index, ckpt, clean_kwargs=kw).awaitTermination(
        180
    )

    got = {
        (r["doc_id"], r["text"])
        for r in finalize_corpus(
            spark, out, ckpt, reconcile=(index, assign),
            span_dedup_size=5, min_tokens=3,
        ).collect()
    }
    want = {
        (r["doc_id"], r["text"])
        for r in clean_corpus(fixture, span_dedup_size=5, **kw).df.collect()
    }
    assert got == want
    by_id = dict(got)
    assert 1 in by_id
    if 5 in by_id:  # span stage really rewrote the partial copy
        assert "uniq0" in by_id[5] and len(by_id[5].split()) < 38


def test_salted_join_row_identity_property(spark):
    """Batch-mode property: for RANDOM data, bucket counts, and hot lists
    (empty-ish, partial, full, wrong), the salted join's pair set equals
    the plain join's — the row-identity theorem over the whole knob space,
    cheap because batch mode skips the streaming harness."""
    import random

    from datalakefoundation_spark.streaming.ops import (
        salted_stream_stream_join,
        stream_stream_join,
    )

    rng = random.Random(20260816)
    for trial in range(5):
        n = rng.randint(20, 60)
        rows = [
            (
                i,
                _ts(rng.randint(0, 9), rng.randint(0, 59)),
                rng.randint(1, 4),  # few keys -> dense pair structure
                "e",
                float(i),
            )
            for i in range(n)
        ]
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double"
        )
        left = spark.createDataFrame(rows[: n // 2], schema)
        right = spark.createDataFrame(rows[n // 2 :], schema)
        plain = {
            (r["l_event_id"], r["r_event_id"])
            for r in stream_stream_join(left, right, within="3 minutes").collect()
        }
        hot_opts = [None, [1], [2, 3], [1, 2, 3, 4], [999]]
        hot = hot_opts[trial % len(hot_opts)]
        buckets = rng.choice([2, 4, 8])
        salted = {
            (r["l_event_id"], r["r_event_id"])
            for r in salted_stream_stream_join(
                left, right, within="3 minutes",
                salt_buckets=buckets, hot_keys=hot,
            ).collect()
        }
        assert salted == plain, (trial, hot, buckets, salted ^ plain)
        assert len(plain) > 0


def test_session_overlap_join_hot_keys_row_identity(spark, tmp_path):
    """Hot-key-scoped salting must be invisible in the RESULT — identical
    rows for any hot list (the real hot key, a partial list, a stale/wrong
    list) and any bucket count; only the state spread changes (r9 ADVICE /
    r10 directive #4). Also pins the empty-list rejection."""
    import datetime as _dt
    import random

    from datalakefoundation_spark.streaming.ops import session_overlap_join

    rng = random.Random(10)

    def ts(minute):
        return _dt.datetime(2026, 8, 2, 9, 0, 0) + _dt.timedelta(minutes=minute)

    schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, closed boolean"
    )
    # Zipf-ish: user 1 is hot, plus open/over-long rows that must drop
    rows = []
    for i in range(120):
        uid = 1 if rng.random() < 0.5 else rng.randrange(2, 12)
        start = rng.randrange(0, 50)
        rows.append(
            (uid, ts(start), ts(start + rng.randrange(1, 8)),
             i, rng.random() > 0.1)
        )
    rows.append((1, ts(0), ts(500), 999, True))  # > max_session: excluded
    lsrc, rsrc = str(tmp_path / "ls"), str(tmp_path / "rs")
    spark.createDataFrame(rows[:60], schema).coalesce(1).write.parquet(lsrc)
    spark.createDataFrame(rows[60:], schema).coalesce(1).write.parquet(rsrc)

    def run(name, **kw):
        j = session_overlap_join(
            spark.readStream.schema(schema).parquet(lsrc),
            spark.readStream.schema(schema).parquet(rsrc),
            max_session="1 hour",
            **kw,
        )
        q = (
            j.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        out = {
            (r["l_key"], r["l_n_events"], r["r_n_events"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        # salt plumbing must not leak into the output schema
        assert not any(
            c.startswith("__") for c in spark.table(name).columns
        )
        return out

    plain = run("soj_plain")
    assert len(plain) > 50  # the fixture must actually exercise overlap
    assert run("soj_hot", hot_keys=[1]) == plain
    assert run("soj_hot4", hot_keys=[1, 2, 3], salt_buckets=4) == plain
    assert run("soj_stale", hot_keys=[999], salt_buckets=2) == plain

    with pytest.raises(ValueError, match="hot_keys"):
        session_overlap_join(
            spark.readStream.schema(schema).parquet(lsrc),
            spark.readStream.schema(schema).parquet(rsrc),
            hot_keys=[],
        )
    with pytest.raises(ValueError, match="salt_buckets"):
        session_overlap_join(
            spark.readStream.schema(schema).parquet(lsrc),
            spark.readStream.schema(schema).parquet(rsrc),
            hot_keys=[1],
            salt_buckets=1,
        )


def test_sessionize_cannot_feed_stream_join_in_one_query(spark, tmp_path):
    """PIN the Spark restriction the docstrings now document (r9 ADVICE):
    applyInPandasWithState composed with another stateful operator in ONE
    streaming query is rejected at analysis/start time — the production
    composition must cross a persistence boundary (sessionize -> sink ->
    re-read closed sessions -> session_overlap_join), which is exactly what
    the other session tests exercise. If a future Spark lifts the
    restriction this test will fail loudly and the docs should be revised."""
    from pyspark.errors import AnalysisException

    from datalakefoundation_spark.streaming.ops import (
        session_overlap_join,
        sessionize,
    )

    src = str(tmp_path / "ev")
    _write_events(spark, src, [(1, _ts(0, 10), 1, "view", 1.0)])
    left = sessionize(read_event_stream(spark, src))
    right = sessionize(read_event_stream(spark, src))
    j = session_overlap_join(left, right)
    with pytest.raises((AnalysisException, Exception)) as exc:
        q = (
            j.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(60)
        finally:
            q.stop()
    msg = str(exc.value)
    assert (
        "applyInPandasWithState" in msg
        or "flatMapGroupsWithState" in msg
        or "Multiple" in msg
        or "stateful" in msg.lower()
    ), msg


def test_stream_id_rejects_remote_file_authority():
    """file://host/path has no local filesystem to resolve against — the
    old code folded the host into a CWD-relative path (r9 ADVICE)."""
    from datalakefoundation_spark.streaming.ops import _stream_id

    with pytest.raises(ValueError, match="authority"):
        _stream_id("file://remotehost/data/ck")
    # empty and localhost authorities stay accepted (both mean local)
    assert _stream_id("file:///data/ck") == _stream_id("/data/ck")
    assert _stream_id("file://localhost/data/ck") == _stream_id("/data/ck")


def test_read_clean_corpus_output_probes_legacy_stream_id(spark, tmp_path):
    """Checkpoints created BEFORE id normalization own stream=<raw-hash>
    subtrees; the reader must fall back to them, and when an upgrade split
    one generation across both ids it must drop legacy batch ids the new
    subtree also carries (a post-upgrade replay rewrites that batch under
    the new id — keeping both copies would double-count it)."""
    from datalakefoundation_spark.streaming.ops import (
        _raw_stream_id,
        _stream_id,
        read_clean_corpus_output,
    )

    ck = str(tmp_path / "ck") + "/"  # non-canonical spelling: ids differ
    legacy, current = _raw_stream_id(ck), _stream_id(ck)
    assert legacy != current
    out = str(tmp_path / "out")

    def write(sid, bid, ids):
        spark.createDataFrame(
            [(i, f"d{i}") for i in ids], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{out}/stream={sid}/batch_id={bid:012d}")

    # legacy-only generation: fallback must find it
    write(legacy, 0, [1, 2])
    got = {r["doc_id"] for r in read_clean_corpus_output(spark, out, ck).collect()}
    assert got == {1, 2}

    # upgrade seam: batch 1 exists under BOTH ids (post-upgrade replay of a
    # pre-upgrade batch, possibly with different survivors); batch 2 is new
    write(legacy, 1, [3, 4])
    write(current, 1, [3])
    write(current, 2, [5])
    rows = read_clean_corpus_output(spark, out, ck).collect()
    got = sorted(r["doc_id"] for r in rows)
    assert got == [1, 2, 3, 5], got  # 4 dropped with the superseded batch

    # canonical spelling: single id, no fallback path taken
    ck2 = str(tmp_path / "ck2")
    out2 = str(tmp_path / "out2")
    spark.createDataFrame([(9, "x")], "doc_id long, text string").write.parquet(
        f"{out2}/stream={_stream_id(ck2)}/batch_id={0:012d}"
    )
    assert read_clean_corpus_output(spark, out2, ck2).count() == 1


def test_stream_hot_key_calibration_rolling_detector(spark, tmp_path):
    """r9 directive #6: the hot list derives from a rolling window of the
    SAME stream via a foreachBatch sampler. Asserts (a) the rolling
    detector sees only the retained recent windows — a key that was hot
    long ago but went quiet is NOT detected, while the currently-hot key
    is; (b) the count table stays bounded (old windows pruned); (c) a
    restarted/replayed stream folds nothing twice; (d) the derived list —
    and a deliberately STALE one — leave the salted join row-identical,
    with only the spread degraded."""
    from datalakefoundation_spark.streaming.ops import (
        detect_hot_keys_rolling,
        salted_stream_stream_join,
        stream_hot_key_calibration,
        stream_stream_join,
    )
    from datalakefoundation_spark.tables.lake_table import LakeTable

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    counts = str(tmp_path / "counts")

    # phase 1 (old windows, minutes 0-9): user 7 is the heavy hitter
    batch1 = [(i, _ts(i % 10, i % 50), 7 if i % 2 == 0 else 20 + i % 9, "view", 1.0)
              for i in range(200)]
    # phase 2 (recent windows, minutes 30-39): user 3 takes over, 7 goes quiet
    batch2 = [(1000 + i, _ts(30 + i % 10, i % 50), 3 if i % 2 == 0 else 40 + i % 9, "view", 1.0)
              for i in range(200)]
    _write_events(spark, src, batch1)
    q = stream_hot_key_calibration(
        read_event_stream(spark, src, max_files_per_trigger=1),
        counts, ck, window="5 minutes", retention_windows=2,
    )
    q.awaitTermination(120)
    assert 7 in detect_hot_keys_rolling(
        spark, counts, last_windows=2, min_share=0.2
    )

    _write_events(spark, src, batch2)
    q = stream_hot_key_calibration(
        read_event_stream(spark, src, max_files_per_trigger=1),
        counts, ck, window="5 minutes", retention_windows=2,
    )
    q.awaitTermination(120)
    hot = detect_hot_keys_rolling(spark, counts, last_windows=2, min_share=0.2)
    assert 3 in hot and 7 not in hot, hot

    # (b) bounded: phase-1 windows (minute 0-9) pruned past the retention
    # horizon of the newest window (minute 35)
    stored = LakeTable(spark, counts).read()
    starts = {r["window_start"].minute for r in stored.select("window_start").distinct().collect()}
    assert starts <= {25, 30, 35}, starts

    # (c) replay/restart with the same checkpoint folds nothing twice
    before = stored.count()
    q = stream_hot_key_calibration(
        read_event_stream(spark, src, max_files_per_trigger=1),
        counts, ck, window="5 minutes", retention_windows=2,
    )
    q.awaitTermination(120)
    assert LakeTable(spark, counts).read().count() == before

    # (d) calibrated AND stale lists are result-invisible on the join
    left = spark.read.parquet(src)
    plain = {
        (r["l_event_id"], r["r_event_id"])
        for r in stream_stream_join(left, left, within="2 minutes").collect()
    }
    for lst in (hot, [7]):  # current calibration and the stale phase-1 list
        salted = {
            (r["l_event_id"], r["r_event_id"])
            for r in salted_stream_stream_join(
                left, left, within="2 minutes", hot_keys=lst
            ).collect()
        }
        assert salted == plain
    assert len(plain) > 0


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
def test_reconcile_clean_corpus_banded_index(spark, tmp_path):
    """r10 directive #1 end-to-end: reconcile_clean_corpus with a
    band-key-clustered companion index returns EXACTLY what the
    signature-path reconcile returns at every wave (bootstrap, bridge,
    no-op replay), maintains the companion churn-sized and idempotently,
    and records per-file band_key stats that provably skip files for
    narrow key sets."""
    import os as _os
    import time as _time

    from datalakefoundation_spark.streaming.ops import (
        reconcile_clean_corpus,
        stream_clean_corpus,
    )
    from datalakefoundation_spark.tables.lake_table import (
        LakeTable,
        prune_spec_isin,
        segment_may_match,
    )
    from tests.helpers import find_bridge_fixture

    fixture = find_bridge_fixture(spark)
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    out, index = str(tmp_path / "out"), str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    assign_b, assign_p = str(tmp_path / "assign_b"), str(tmp_path / "assign_p")
    banded_path = str(tmp_path / "banded")
    kw = dict(min_tokens=3, redact_pii=False)

    def write_batch(df, order):
        df.coalesce(1).write.mode("append").parquet(src)
        t = _time.time() - 3600 + order * 60
        for root, _dirs, files in _os.walk(src):
            for f in files:
                p = _os.path.join(root, f)
                if _os.path.getmtime(p) > t:
                    _os.utime(p, (t, t))

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_clean_corpus(
            stream, out, index, ckpt, clean_kwargs=kw
        ).awaitTermination(180)

    def both(**kwargs):
        b = {r["doc_id"] for r in reconcile_clean_corpus(
            spark, out, index, ckpt, assign_b,
            banded_index_path=banded_path, band_cluster_files=4,
            # force the companion read: at 4 files the self-pricing guard
            # would correctly fall back to the inline join, but this test
            # exists to exercise the banded join path itself
            banded_max_read_fraction=1.0, **kwargs
        ).collect()}
        p = {r["doc_id"] for r in reconcile_clean_corpus(
            spark, out, index, ckpt, assign_p, **kwargs
        ).collect()}
        assert b == p, (b, p)
        return b

    # wave 1 (bootstrap: companion built pre-clustered), wave 2 (bridge:
    # frontier read through the pruned companion), wave 3 (no-op replay)
    write_batch(fixture.where("doc_id < 10"), 1)
    run()
    assert both() == {1, 3}
    t = LakeTable(spark, banded_path)
    assert t.exists()
    v1 = t.latest_manifest().version

    write_batch(fixture.where("doc_id = 10"), 2)
    run()
    assert both() == {1}
    v2 = t.latest_manifest().version
    assert v2 == v1 + 1  # ONE churn-sized append, not a rebuild
    assert both() == {1}  # replay: reconcile no-ops...
    assert t.latest_manifest().version == v2  # ...and so does the companion

    # companion rows = band rows of the whole index (4 bands per doc)
    idx_rows = LakeTable(spark, index).read().count()
    assert t.read().count() == 4 * idx_rows

    # per-file stats on band_key exist and the isin spec can prove files
    # disjoint: a single mid-range key must keep strictly fewer files than
    # the clustered layout holds (the mechanism the 100 TB skip rides)
    mf = t.latest_manifest()
    fstats = [
        (s, p, st) for s in mf.segments for p, st in (s.files or {}).items()
        if (st or {}).get("band_key", {}).get("min") is not None
    ]
    assert len(fstats) >= 4, "per-file band_key stats must be recorded"
    keys = sorted(st["band_key"]["min"] for _s, _p, st in fstats)
    spec = prune_spec_isin("band_key", [keys[len(keys) // 2]])
    kept = sum(1 for _s, _p, st in fstats if segment_may_match(st, spec))
    assert 1 <= kept < len(fstats), (kept, len(fstats))


def test_banded_read_fraction_prices_the_prune(spark, tmp_path):
    """The banded reconcile path is self-pricing: _banded_read_fraction
    reads the price from manifest stats alone, and reconcile_clean_corpus
    under the DEFAULT guard falls back to the inline join when the prune
    would not pay — with results identical either way (the fallback IS
    the sig path; pinned against the forced-banded and plain twins)."""
    from datalakefoundation_spark.streaming.ops import _banded_read_fraction
    from datalakefoundation_spark.tables.lake_table import (
        LakeTable,
        prune_spec_isin,
    )

    path = str(tmp_path / "b")
    t = LakeTable(spark, path, stats_columns=("band_key",))
    rows = [(i, 0, f"{i:064x}") for i in range(256)]
    df = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_key string"
    ).repartitionByRange(8, "band_key").sortWithinPartitions("band_key")
    t.overwrite(df)

    assert _banded_read_fraction(t, None) == 1.0
    # every file's range hit: fraction 1 -> the default guard falls back
    allspec = prune_spec_isin("band_key", [r[2] for r in rows])
    assert _banded_read_fraction(t, allspec) == 1.0
    # one key: at most 1-2 of 8 files read -> the guard lets it through
    one = prune_spec_isin("band_key", [rows[100][2]])
    assert _banded_read_fraction(t, one) <= 0.25
    # a key in nobody's range: nothing read
    none = prune_spec_isin("band_key", ["z" * 64])
    assert _banded_read_fraction(t, none) == 0.0


def test_index_batch_key_stats_shortcuts(spark, tmp_path):
    """r10 scale trim: replay checks and batch-key discovery on the
    signature index read MANIFEST STATS, not data. Single-key appends
    derive the exact key set; a mixed-key segment (the replay_rebuild
    shape) forces the safe fallback (None); the pruned replay check
    answers without a corpus scan and stays exact."""
    from datalakefoundation_spark.streaming.ops import (
        _index_batch_keys_from_manifest,
        _index_has_batch_key,
        _index_table,
    )

    path = str(tmp_path / "idx")
    t = _index_table(spark, path)
    for key in ("s1:0", "s1:1", "s1:2"):
        t.append(
            spark.createDataFrame(
                [(1, key), (2, key)], "doc_id long, __batch_key string"
            )
        )
    assert _index_batch_keys_from_manifest(t) == {"s1:0", "s1:1", "s1:2"}
    assert _index_has_batch_key(t, "s1:1")
    assert not _index_has_batch_key(t, "s1:9")

    # a mixed-key segment (replay_rebuild writes one): fallback, not a
    # wrong set
    t.append(
        spark.createDataFrame(
            [(3, "s1:3"), (4, "s1:4")], "doc_id long, __batch_key string"
        )
    )
    assert _index_batch_keys_from_manifest(t) is None
    assert _index_has_batch_key(t, "s1:4")

    # stats-less table (pre-r10 writer): fallback + exact check via scan
    from datalakefoundation_spark.tables.lake_table import LakeTable

    p2 = str(tmp_path / "old")
    t2 = LakeTable(spark, p2)
    t2.append(
        spark.createDataFrame([(1, "s2:0")], "doc_id long, __batch_key string")
    )
    assert _index_batch_keys_from_manifest(t2) is None
    assert _index_has_batch_key(t2, "s2:0")
    assert not _index_has_batch_key(t2, "s2:1")
