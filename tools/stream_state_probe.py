"""Streaming state-size evidence under load (VERDICT r5 directive #6).

Exactly-once and batch-equivalence of the streaming operators are pinned
by tests/test_streaming.py; the missing evidence is the BOUNDED-STATE
claim: drive ~1M events with a skewed key distribution through the
watermarked stream-stream join and through sessionization as a sequence
of micro-batches whose event time ADVANCES, record the state store's
``numRowsTotal`` per micro-batch (query progress), and assert the series
plateaus instead of growing with ingested volume.

* ``stream_stream_join``: watermark eviction is the mechanism — buffered
  rows age out once the watermark passes their joinable horizon, so state
  tracks the rows inside ~(watermark + within) of the frontier (~2-3
  batches' worth), not the 2 x 1M rows ingested.
* ``sessionize``: state is one row per live key (applyInPandasWithState
  with a processing-time timeout) — bounded by the key universe, flat
  once every user has appeared, regardless of event volume.

Event shape: batch b covers minute b (timestamps advance batch to batch);
keys are Zipf(1.1)-skewed over a 10k-user universe — the rank-1 key
naturally carries ~6% of every batch (the skew the directive names).
No extra forced-hot share: the join's output/state work for the hot key
is quadratic in its per-batch count (both streams replay the same
events), so hot-share is the probe's COST dial, not its state dial — a
forced 15% made each micro-batch a 56M-pair join (hours of wall) while
measuring exactly the same eviction behavior.

Asserted (recorded in BASELINE.md):
  * join state max over the last quarter of batches <= 1.3 x max over the
    second quarter (plateau, not growth);
  * join final state rows < 25% of total ingested rows;
  * sessionize state rows == live-key universe (flat) by mid-run.

Usage: python tools/stream_state_probe.py [batches] [events_per_batch] [legs]
  legs: comma list of join,join_salted,join_salted_hot,join_preagg,
        join_session,join_session_hot,sessionize
  (default 50 20000 join,sessionize)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.session import get_spark  # noqa: E402
from datalakefoundation_spark.streaming.ops import (  # noqa: E402
    salted_stream_stream_join,
    session_overlap_join,
    sessionize,
    stream_stream_join,
    windowed_stream_join,
)

USERS = 10_000
SEED = 20260815


def write_batches(spark, path: str, batches: int, per_batch: int) -> None:
    """Batch b: timestamps uniform inside minute b, keys Zipf-skewed with a
    hot key (user 0) at ~15%. Files written sequentially so the file
    source (maxFilesPerTrigger=1) replays them in event-time order."""
    rng = np.random.default_rng(SEED)
    ranks = np.arange(1, USERS + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()
    for b in range(batches):
        users = rng.choice(USERS, size=per_batch, p=p)  # rank-1 ~6%/batch
        offs = rng.integers(0, 60_000, size=per_batch)  # ms within the minute
        pdf = {
            "user_id": users.astype(np.int64),
            "ts_ms": (np.int64(b) * 60_000 + offs).astype(np.int64),
            "event_id": (np.int64(b) * per_batch + np.arange(per_batch)).astype(
                np.int64
            ),
        }
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame(pdf)).select(
            "user_id",
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
            "event_id",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{path}/b{b:04d}")
        # one file per logical batch at the top level for the file source
        # (it lists files recursively; keep each batch one parquet part)
        time.sleep(0.05)


from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _ProgressTap(StreamingQueryListener):
    """Complete per-batch progress capture via listener, not polling.

    ``q.recentProgress`` keeps only the last ~100 updates
    (spark.sql.streaming.numRecentProgressUpdates); with small CLI batch
    sizes fast micro-batches are evicted between 2 s polls, undercounting
    ingestion (the poll loop then spins to its deadline and the final
    assert fires) and silently dropping points from the state series. A
    registered listener receives EVERY progress event regardless of batch
    rate. Attach around exactly one query at a time (the probe's runs are
    sequential) and remove in ``finally``."""

    def __init__(self) -> None:
        self.state: dict[int, int] = {}
        self.rows: dict[int, int] = {}

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        b = p.batchId
        self.rows[b] = p.numInputRows
        if p.stateOperators:
            # SUM across operators: chained stateful plans (preagg form =
            # two aggs + a join) report one entry per operator, and
            # entry [0] alone can be a 0-row operator
            self.state[b] = sum(op.numRowsTotal for op in p.stateOperators)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def ingested(self) -> int:
        return sum(self.rows.values())

    def state_series(self) -> list[int]:
        return [self.state[b] for b in sorted(self.state)]


def run_join(spark, src: str, ckpt: str, form: str = "plain") -> list[int]:
    """``form`` selects the hot-key front-end under test:

    * plain   — stream_stream_join: the rank-1 key's whole pair product
                and state go through ONE state partition (r7: 27M
                pairs/batch for a 6% key — the wall is the pair product).
    * salted  — salted_stream_stream_join: identical result rows, hot
                pair product and state spread over salt_buckets=8 state
                partitions (right state ×8; wall becomes parallel).
    * salted_hot — salted_stream_stream_join(hot_keys=[0]): identical
                result rows again, but ONLY the rank-1 key is replicated —
                right state ×(1 + 7·hot_share) ≈ plain-level instead of
                the blanket ×8, with the hot pair product still spread
                over 8 buckets (salted-level wall). The r9 directive's
                head-to-head: plain-level state plateau, salted-level wall.
    * preagg  — windowed_stream_join: per-(key, minute) aggregates
                equi-joined; the pair product is GONE (1×1 per window),
                state is per-window aggregate rows — the wall left is
                eviction + aggregation, which is the directive's target
                shape for hot keys when per-event pairs aren't needed.
    """
    schema = "user_id long, ts timestamp, event_id long"
    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    if form == "plain":
        joined = stream_stream_join(left, right, key="user_id")
    elif form == "salted":
        joined = salted_stream_stream_join(
            left, right, key="user_id", salt_buckets=8
        )
    elif form == "salted_hot":
        # user 0 IS the Zipf rank-1 key (~6%/batch) — the static list a
        # calibration window (detect_hot_keys) would produce on this data
        joined = salted_stream_stream_join(
            left, right, key="user_id", salt_buckets=8, hot_keys=[0]
        )
    elif form == "preagg":
        joined = windowed_stream_join(
            left,
            right,
            left_aggs=[F.count("*").alias("l_n"), F.sum("event_id").alias("l_sum")],
            right_aggs=[F.count("*").alias("r_n")],
            key="user_id",
            window="1 minute",
        )
    elif form in ("session", "session_hot"):
        # exercise session_overlap_join's state eviction under the same
        # Zipf skew: each event becomes a closed 30 s pseudo-session, so
        # two sessions of a key overlap iff their events are within 30 s —
        # the operator's watermark + max_session range bound is what must
        # keep the buffered-session state at an eviction plateau.
        # session_hot (r10 directive #4): the rank-1 key's session pairs
        # otherwise all flow through ONE state partition — the hot-key
        # front-end spreads them over salt_buckets at hot-scoped state
        # cost, row-identical output (asserted in tests/test_streaming.py)
        def mk(s):
            return s.select(
                "user_id",
                (F.col("ts") - F.expr("INTERVAL 30 seconds")).alias(
                    "session_start"
                ),
                F.col("ts").alias("session_end"),
                F.lit(1).cast("long").alias("n_events"),
                F.lit(True).alias("closed"),
            )

        joined = session_overlap_join(
            mk(left),
            mk(right),
            key="user_id",
            left_watermark="2 minutes",
            right_watermark="2 minutes",
            max_session="1 minute",
            hot_keys=[0] if form == "session_hot" else None,
            salt_buckets=8,
        )
    else:
        raise ValueError(f"unknown join form: {form}")
    agg = joined.groupBy().count()  # tiny sink: we only want the state metrics
    tap = _ProgressTap()
    spark.streams.addListener(tap)
    try:
        q = (
            joined.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        time.sleep(3)  # listener events are delivered async; let them drain
    finally:
        spark.streams.removeListener(tap)
    del agg
    return tap.state_series()


def run_sessionize(spark, src: str, ckpt: str, total_rows: int) -> list[int]:
    """Poll-and-stop runner. availableNow CANNOT be used here: with
    ProcessingTimeTimeout state pending, the drained query keeps
    scheduling timeout-check micro-batches (~1/s) whose clock never
    passes the 30-minute deadlines — measured 2 500+ empty batches with
    zero timeouts fired before this leg was rewritten. The probe's
    evidence is the state series across the DATA batches (growth to the
    key universe, then flat), so run under the default trigger with a
    listener capturing every batch (see _ProgressTap — recentProgress is
    a bounded buffer), and stop once every input row is ingested and a
    few drain batches confirm the plateau."""
    schema = "user_id long, ts timestamp, event_id long"
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    tap = _ProgressTap()
    spark.streams.addListener(tap)
    idle = 0
    deadline = time.time() + 3600
    try:
        q = (
            sessionize(events)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            while idle < 5 and time.time() < deadline:
                time.sleep(2)
                idle = idle + 1 if tap.ingested() >= total_rows else 0
        finally:
            q.stop()
        time.sleep(3)  # drain async listener events
    finally:
        spark.streams.removeListener(tap)
    assert tap.ingested() >= total_rows, (tap.ingested(), total_rows)
    return tap.state_series()


def _assert_plateau(
    rows: list[int], total: int, state_factor: float, batches: int
) -> None:
    n = len(rows)
    assert n >= 8, f"too few progress records: {n}"
    q2 = max(rows[n // 4 : n // 2])
    q4 = max(rows[3 * n // 4 :])
    assert q4 <= 1.3 * q2, (
        f"join state still growing: q2max={q2} q4max={q4} series={rows}"
    )
    if batches >= 16:
        # the plateau is ~4 batches' worth of both sides; the fraction-of-
        # ingest bound is only meaningful once ingest dwarfs the plateau
        assert rows[-1] < state_factor * 2 * total, (
            f"join final state too large: {rows[-1]} vs {2 * total} ingested"
        )


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    legs = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["join", "sessionize"]
    )
    known = {
        "join", "join_salted", "join_salted_hot", "join_preagg",
        "join_session", "join_session_hot", "sessionize",
    }
    bad = [leg for leg in legs if leg not in known]
    if bad:
        # validate BEFORE write_batches spends minutes generating data
        raise SystemExit(f"unknown legs {bad}; choose from {sorted(known)}")
    spark = get_spark("stream-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    total = batches * per_batch
    out: dict = {"batches": batches, "events_per_batch": per_batch, "total": total}
    with tempfile.TemporaryDirectory() as tmp:
        write_batches(spark, f"{tmp}/src", batches, per_batch)

        series: dict[str, list[int]] = {}
        for leg in legs:
            t0 = time.time()
            if leg == "sessionize":
                series[leg] = run_sessionize(
                    spark, f"{tmp}/src", f"{tmp}/ck_{leg}", total
                )
            else:
                form = {"join": "plain", "join_salted": "salted",
                        "join_salted_hot": "salted_hot",
                        "join_preagg": "preagg",
                        "join_session": "session",
                        "join_session_hot": "session_hot"}[leg]
                series[leg] = run_join(spark, f"{tmp}/src", f"{tmp}/ck_{leg}", form)
            out[f"{leg}_wall_s"] = round(time.time() - t0, 1)
            out[f"{leg}_state_rows"] = series[leg]

    print(json.dumps(out), flush=True)

    if "join" in series:
        _assert_plateau(series["join"], total, 0.25, batches)
    if "join_salted" in series:
        # right state is ×8 replicas: same eviction plateau, bigger constant
        _assert_plateau(series["join_salted"], total, 8 * 0.25, batches)
    if "join_salted_hot" in series:
        # hot-key-scoped: only the rank-1 key (~6%) is replicated, so the
        # plateau must sit at plain level ×(1 + 7·0.06) ≈ 1.4, nowhere near
        # the blanket ×8 — the whole point of the scoped form
        _assert_plateau(series["join_salted_hot"], total, 2 * 0.25, batches)
        if "join_salted" in series:
            assert max(series["join_salted_hot"]) < 0.5 * max(series["join_salted"]), (
                "hot-scoped state should undercut blanket-salted state by >2x: "
                f"hot={max(series['join_salted_hot'])} "
                f"blanket={max(series['join_salted'])}"
            )
        if "join" in series:
            assert max(series["join_salted_hot"]) < 2.0 * max(series["join"]), (
                "hot-scoped state should stay near plain level: "
                f"hot={max(series['join_salted_hot'])} plain={max(series['join'])}"
            )
    if "join_session" in series:
        # closed-session buffers evict at the watermark + max_session
        # horizon, same plateau discipline as the per-event join
        _assert_plateau(series["join_session"], total, 0.25, batches)
    if "join_session_hot" in series:
        # hot-key-scoped session salting: rank-1 key (~6%) replicated x8 on
        # the right only -> plain-level state plateau...
        _assert_plateau(series["join_session_hot"], total, 2 * 0.25, batches)
        if "join_session" in series:
            assert max(series["join_session_hot"]) < 2.0 * max(series["join_session"]), (
                "hot-scoped session state should stay near plain level: "
                f"hot={max(series['join_session_hot'])} "
                f"plain={max(series['join_session'])}"
            )
            # ...at a materially lower wall (the hot key's pair product
            # spreads over 8 state partitions instead of serializing on 1)
            assert out["join_session_hot_wall_s"] < 0.6 * out["join_session_wall_s"], (
                "hot-scoped session join should cut the hot-partition wall: "
                f"hot={out['join_session_hot_wall_s']}s "
                f"plain={out['join_session_wall_s']}s"
            )
    if "join_preagg" in series:
        # per-window aggregates: state ∝ live (key, window) pairs, far below
        # the per-event buffers of the pairwise forms
        _assert_plateau(series["join_preagg"], total, 0.25, batches)
        if "join" in series:
            assert max(series["join_preagg"]) < max(series["join"]), (
                "preagg state should undercut the per-event join's"
            )
        else:
            print("note: join leg not run — preagg-vs-join state comparison skipped")
    if "sessionize" in series:
        sess_rows = series["sessionize"]
        m = len(sess_rows)
        assert max(sess_rows[m // 2 :]) <= USERS, (
            f"sessionize state exceeds the key universe: {max(sess_rows[m // 2:])}"
        )
        assert sess_rows[-1] <= sess_rows[m // 2] * 1.05 + 1, (
            f"sessionize state not flat: {sess_rows}"
        )
    print("STREAM STATE PROBE OK")


if __name__ == "__main__":
    main()
